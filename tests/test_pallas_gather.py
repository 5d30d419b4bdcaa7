"""Oracle tests for the monotone-window Pallas row gather (interpreter mode
on the CPU test backend; the Mosaic path is TPU-only)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mask3d_tpu.sparse.pallas_gather import monotone_gather, supports


def oracle(src, idx, ok):
    rows = np.take_along_axis(
        np.asarray(src, np.float32), np.asarray(idx)[..., None], axis=1
    )
    return np.where(np.asarray(ok)[..., None], rows, 0.0)


@pytest.mark.parametrize("seed", [0, 1])
def test_monotone_gather_fast_path(seed):
    rng = np.random.default_rng(seed)
    b, n, c, m = 2, 4096, 24, 512
    src = rng.normal(size=(b, n, c)).astype(np.float32)
    # monotone indices with small strides: fast-path premise holds
    idx = np.cumsum(rng.integers(1, 6, size=(b, m)), axis=1).astype(np.int32)
    ok = rng.random((b, m)) < 0.9
    assert supports(m, n, tile=256, window=2048)
    out = np.asarray(monotone_gather(src, idx, ok, 256, 2048))
    ref = oracle(src, idx, ok)
    # bf16 compute on the fast path
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)


def test_monotone_gather_fallback_on_violation():
    rng = np.random.default_rng(2)
    b, n, c, m = 1, 4096, 8, 512
    src = rng.normal(size=(b, n, c)).astype(np.float32)
    # scrambled indices: premise violated -> exact XLA fallback (f32)
    idx = rng.integers(0, n, size=(b, m)).astype(np.int32)
    ok = np.ones((b, m), bool)
    out = np.asarray(monotone_gather(src, idx, ok, 256, 2048))
    np.testing.assert_array_equal(out, oracle(src, idx, ok))


def test_monotone_gather_grad():
    rng = np.random.default_rng(3)
    b, n, c, m = 1, 4096, 8, 256
    src = rng.normal(size=(b, n, c)).astype(np.float32)
    idx = np.cumsum(rng.integers(1, 8, size=(b, m)), axis=1).astype(np.int32)
    ok = np.ones((b, m), bool)

    def loss(s):
        return jnp.sum(monotone_gather(s, idx, ok, 256, 2048) ** 2)

    g = np.asarray(jax.grad(loss)(jnp.asarray(src)))
    # closed form: dL/dsrc[j] = 2 * sum_{i: idx[i]==j} out[i]
    out = oracle(src, idx, ok)
    ref = np.zeros_like(src)
    for i in range(m):
        ref[0, idx[0, i]] += 2.0 * out[0, i]
    np.testing.assert_allclose(g, ref, rtol=2e-2, atol=2e-2)


def test_monotone_gather_odd_tile_count_multi_item():
    """nt odd (M/tile = 3) across multiple items: the double-buffer slot
    must follow GLOBAL step parity (b * nt + i) — per-item parity would
    read a stale window / wait on the wrong semaphore at item boundaries
    when nt is odd."""
    rng = np.random.default_rng(7)
    b, n, c, m, tile = 3, 4096, 24, 768, 256
    assert (m // tile) % 2 == 1
    src = rng.normal(size=(b, n, c)).astype(np.float32)
    idx = np.cumsum(rng.integers(1, 5, size=(b, m)), axis=1).astype(np.int32)
    ok = rng.random((b, m)) < 0.9
    assert supports(m, n, tile=tile, window=2048)
    out = np.asarray(monotone_gather(src, idx, ok, tile, 2048))
    ref = oracle(src, idx, ok)
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)


def test_monotone_gather_f32_exact():
    """f32 sources select in f32 on the fast path — exact (each output row
    is a single 1.0 * v product), no bf16 rounding."""
    rng = np.random.default_rng(11)
    b, n, c, m = 2, 4096, 3, 512
    src = rng.normal(size=(b, n, c)).astype(np.float32) * 1e3
    idx = np.cumsum(rng.integers(1, 6, size=(b, m)), axis=1).astype(np.int32)
    ok = rng.random((b, m)) < 0.9
    out = np.asarray(monotone_gather(src, idx, ok, 256, 2048))
    np.testing.assert_array_equal(out, oracle(src, idx, ok))


def test_gather_rows_monotone_matches_xla():
    """dense_ops.gather_rows(monotone=True) == the XLA take_along path on a
    real SparseLevel (static keys are lexicographic, hence monotone)."""
    from mask3d_tpu.sparse import dense_ops
    from tests.test_sparse_core import make_batch

    rng = np.random.default_rng(5)
    grid = (16, 16, 8)  # cells=2048, capacity 1024 -> ratio 2, window 1024
    level, _ = make_batch(rng, num_items=2, dims=grid, max_pts=800,
                          capacity=1024)
    from mask3d_tpu.sparse.pallas_gather import supports as _sup
    assert _sup(1024, 2048, dense_ops._GATHER_TILE,
                dense_ops._auto_window(2048, 1024))
    for dt in (np.float32, jnp.bfloat16):
        feats = rng.normal(size=(2, 1024, 7)).astype(np.float32)
        dense = dense_ops.scatter_rows(
            jnp.asarray(feats).astype(dt), level, grid)
        fast = dense_ops.gather_rows(dense, level, grid, monotone=True)
        slow = dense_ops.gather_rows(dense, level, grid, monotone=False)
        assert fast.dtype == dense.dtype
        np.testing.assert_array_equal(
            np.asarray(fast, np.float32), np.asarray(slow, np.float32))
