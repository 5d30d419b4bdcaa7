"""Winograd F(2,3)^3 conv: XLA reference and Pallas kernel vs the direct
dense conv oracle (`dense_ops.dense_conv_same`)."""

import numpy as np
import jax.numpy as jnp

from mask3d_tpu.sparse.dense_ops import dense_conv_same
from mask3d_tpu.sparse.winograd import winograd_conv3_ref
from mask3d_tpu.sparse.pallas_winograd import winograd_conv_same


def _case(dims, cin, cout, seed=0):
    rng = np.random.default_rng(seed)
    B = 2
    occ = (rng.random((B,) + dims + (1,)) < 0.2).astype(np.float32)
    x = rng.normal(size=(B,) + dims + (cin,)).astype(np.float32) * occ
    w = (rng.normal(size=(27, cin, cout)) * 0.2).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(w), jnp.asarray(occ)


def test_winograd_ref_matches_direct():
    x, w, occ = _case((8, 6, 5), 7, 9)
    ref = np.asarray(dense_conv_same(x, w, occ))
    got = np.asarray(winograd_conv3_ref(x, w, occ))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_winograd_pallas_matches_direct():
    # grid-bucket-shaped dims (multiples of 8; even z)
    x, w, occ = _case((16, 8, 6), 5, 12, seed=3)
    ref = np.asarray(dense_conv_same(
        x.astype(jnp.bfloat16), w, occ, compute_dtype=jnp.bfloat16
    ), np.float32)
    got = np.asarray(
        winograd_conv_same(x, w, occ), np.float32
    )
    v = np.asarray(occ[..., 0] > 0)
    scale = max(np.abs(ref[v]).max(), 1e-6)
    assert np.abs((got - ref)[v]).max() / scale < 5e-2


def test_winograd_pallas_bias():
    x, w, occ = _case((8, 8, 4), 4, 6, seed=5)
    b = jnp.asarray(np.random.default_rng(7).normal(size=(6,)), jnp.float32)
    ref = np.asarray(dense_conv_same(
        x.astype(jnp.bfloat16), w, occ, bias=b, compute_dtype=jnp.bfloat16
    ), np.float32)
    got = np.asarray(winograd_conv_same(x, w, occ, bias=b), np.float32)
    v = np.asarray(occ[..., 0] > 0)
    scale = max(np.abs(ref[v]).max(), 1e-6)
    assert np.abs((got - ref)[v]).max() / scale < 5e-2
