"""Fused masked cross-attention kernel vs the one-shot softmax oracle.

Runs through the Pallas interpreter on the CPU test backend; the compiled
Mosaic path is exercised on real TPU by the bench/profiling scripts
(docs/ARCHITECTURE.md perf history records the measured numbers).
"""

import numpy as np
import jax
import jax.numpy as jnp

from mask3d_tpu.ops.pallas_attention import masked_cross_attention


def oracle(q, k, v, mask, num_heads):
    b, nq, d = q.shape
    hd = d // num_heads

    def split(x):
        return x.reshape(x.shape[:-1] + (num_heads, hd))

    logits = jnp.einsum("bqhd,bkhd->bhqk", split(q), split(k))
    logits = logits / jnp.sqrt(jnp.float32(hd))
    logits = jnp.where(mask[:, None], jnp.float32(-1e9), logits)
    att = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", att, split(v))
    return out.reshape(b, nq, d)


def test_masked_cross_attention_matches_oneshot():
    rng = np.random.default_rng(3)
    B, Q, S, D, H = 2, 25, 256, 64, 8
    q = jnp.asarray(rng.normal(size=(B, Q, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, D)), jnp.float32)
    mask = jnp.asarray(rng.random((B, Q, S)) < 0.4)
    mask = mask.at[0, 3].set(True)   # fully-blocked row -> uniform
    mask = mask.at[1, 0].set(False)  # fully-open row

    ref = oracle(q, k, v, mask, H)
    got = masked_cross_attention(q, k, v, mask, H, tile=64, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_masked_cross_attention_bf16():
    rng = np.random.default_rng(5)
    B, Q, S, D, H = 1, 8, 128, 32, 4
    q = jnp.asarray(rng.normal(size=(B, Q, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, S, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, S, D)), jnp.bfloat16)
    mask = jnp.asarray(rng.random((B, Q, S)) < 0.3)
    ref = oracle(q.astype(jnp.float32), k.astype(jnp.float32),
                 v.astype(jnp.float32), mask, H)
    got = masked_cross_attention(q, k, v, mask, H, tile=32, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref), rtol=2e-2, atol=2e-2
    )


def test_masked_cross_attention_grad_matches_oneshot():
    """custom_vjp backward (exact VJP of the one-shot formulation) vs
    autodiff of the oracle — the kernel must be trainable."""
    rng = np.random.default_rng(11)
    B, Q, S, D, H = 2, 9, 128, 32, 4
    q = jnp.asarray(rng.normal(size=(B, Q, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, D)), jnp.float32)
    mask = jnp.asarray(rng.random((B, Q, S)) < 0.4)
    mask = mask.at[0, 2].set(True)  # fully-blocked row
    cot = jnp.asarray(rng.normal(size=(B, Q, D)), jnp.float32)

    def f_kernel(q, k, v):
        out = masked_cross_attention(q, k, v, mask, H, tile=32,
                                     interpret=True)
        return jnp.sum(out * cot)

    def f_oracle(q, k, v):
        return jnp.sum(oracle(q, k, v, mask, H) * cot)

    g_kernel = jax.grad(f_kernel, argnums=(0, 1, 2))(q, k, v)
    g_oracle = jax.grad(f_oracle, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_kernel, g_oracle, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5,
            err_msg=f"d{name}",
        )
