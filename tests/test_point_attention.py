"""Oracle tests for the edge-list point-attention / RPE ops.

Mirrors the reference's kernel-vs-oracle harness
(`mask3d/utils/pointops2/functions/test_attention_op_step1.py` etc.): every
op is compared against a brute-force numpy implementation, including
gradients where the CUDA originals define a backward.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mask3d_tpu.ops import (
    aggregation,
    attention_step1,
    attention_step2,
    attention_step2_with_rel_pos_value,
    dot_prod_with_idx,
)

N, M, H, C, L, K = 50, 200, 4, 8, 13, 6


@pytest.fixture(scope="module")
def edges():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(N, H, C)).astype(np.float32)
    k = rng.normal(size=(N, H, C)).astype(np.float32)
    v = rng.normal(size=(N, H, C)).astype(np.float32)
    i0 = np.sort(rng.integers(0, N, size=M)).astype(np.int32)
    i1 = rng.integers(0, N, size=M).astype(np.int32)
    ok = rng.random(M) < 0.9
    return q, k, v, i0, i1, ok


def test_attention_step1_oracle(edges):
    q, k, v, i0, i1, ok = edges
    out = np.asarray(attention_step1(q, k, i0, i1, edge_ok=ok))
    ref = np.einsum("mhc,mhc->mh", q[i0], k[i1]) * ok[:, None]
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_attention_step2_oracle(edges):
    q, k, v, i0, i1, ok = edges
    attn = np.asarray(attention_step1(q, k, i0, i1))
    out = np.asarray(attention_step2(attn, v, i0, i1, N, edge_ok=ok))
    ref = np.zeros((N, H, C), np.float32)
    for m in range(M):
        if ok[m]:
            ref[i0[m]] += attn[m][:, None] * v[i1[m]]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_attention_step2_grad(edges):
    """The CUDA originals define backwards; here autodiff must match a
    numerically-differentiated loss."""
    q, k, v, i0, i1, ok = edges

    def loss(attn, vv):
        o = attention_step2(attn, vv, i0, i1, N)
        return 0.5 * jnp.sum(o * o)

    attn = np.asarray(attention_step1(q, k, i0, i1))
    g_attn, g_v = jax.grad(loss, argnums=(0, 1))(attn, jnp.asarray(v))
    # Closed form: dL/dattn[m] = <out[i0[m]], v[i1[m]]> per head;
    # dL/dv[n] = sum_{m: i1[m]==n} attn[m] * out[i0[m]].
    out = np.asarray(attention_step2(attn, v, i0, i1, N))
    ref_attn = np.einsum("mhc,mhc->mh", out[i0], v[i1])
    ref_v = np.zeros_like(v)
    for m in range(M):
        ref_v[i1[m]] += attn[m][:, None] * out[i0[m]]
    np.testing.assert_allclose(g_attn, ref_attn, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(g_v, ref_v, rtol=1e-3, atol=1e-3)


def test_dot_prod_with_idx_oracle(edges):
    q, k, v, i0, i1, ok = edges
    rng = np.random.default_rng(1)
    table = rng.normal(size=(L, H, C, 3)).astype(np.float32)
    rel = rng.integers(0, L, size=(M, 3)).astype(np.int32)
    out = np.asarray(dot_prod_with_idx(q, i0, table, rel))
    rpe = (
        table[rel[:, 0], :, :, 0]
        + table[rel[:, 1], :, :, 1]
        + table[rel[:, 2], :, :, 2]
    )
    ref = np.einsum("mhc,mhc->mh", q[i0], rpe)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_attention_step2_with_rel_pos_value_oracle(edges):
    q, k, v, i0, i1, ok = edges
    rng = np.random.default_rng(2)
    table = rng.normal(size=(L, H, C, 3)).astype(np.float32)
    rel = rng.integers(0, L, size=(M, 3)).astype(np.int32)
    attn = np.asarray(attention_step1(q, k, i0, i1))
    out = np.asarray(
        attention_step2_with_rel_pos_value(attn, v, i0, i1, table, rel, N)
    )
    rpe = (
        table[rel[:, 0], :, :, 0]
        + table[rel[:, 1], :, :, 1]
        + table[rel[:, 2], :, :, 2]
    )
    ref = np.zeros((N, H, C), np.float32)
    for m in range(M):
        ref[i0[m]] += attn[m][:, None] * (v[i1[m]] + rpe[m])
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_aggregation_oracle():
    rng = np.random.default_rng(3)
    c, cp = 12, 4
    feats = rng.normal(size=(N, c)).astype(np.float32)
    pos = rng.normal(size=(N, K, c)).astype(np.float32)
    w = rng.normal(size=(N, K, cp)).astype(np.float32)
    idx = rng.integers(0, N, size=(N, K)).astype(np.int32)
    out = np.asarray(aggregation(feats, pos, w, idx))
    share = c // cp
    ref = np.zeros((N, c), np.float32)
    for n in range(N):
        for j in range(K):
            for ci in range(c):
                ref[n, ci] += (feats[idx[n, j], ci] + pos[n, j, ci]) * w[
                    n, j, ci // share
                ]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
