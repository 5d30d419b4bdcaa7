"""Windowed Pallas sparse-conv kernel vs the XLA gather oracle.

Runs through the Pallas interpreter on the CPU test backend (the compiled
Mosaic path is exercised on the real chip by `backbone_impl=gather_pallas`
benches). Covers: forward parity on a realistic sorted voxel batch, the
window-violation fallback, gradient parity (custom_vjp backward), and the
backbone-level integration.
"""

import numpy as np
import jax
import jax.numpy as jnp

from mask3d_tpu.sparse import build_sparse_batch
from mask3d_tpu.sparse.ops import sparse_conv
from mask3d_tpu.sparse.pallas_conv import sparse_conv_pallas, supports


def _batch(dims=(32, 32, 16), n_cap=512, seed=0, B=2):
    rng = np.random.default_rng(seed)
    coords = np.zeros((B, n_cap, 3), np.int32)
    counts = np.zeros(B, np.int32)
    for b in range(B):
        n = rng.integers(n_cap // 2, n_cap - 16)
        pts = np.stack(
            [
                rng.integers(0, dims[0], n),
                rng.integers(0, dims[1], n),
                np.minimum(rng.integers(0, 5, n), dims[2] - 1),
            ],
            axis=1,
        ).astype(np.int32)
        pts = np.unique(pts, axis=0)
        key = (pts[:, 0] * dims[1] + pts[:, 1]) * dims[2] + pts[:, 2]
        pts = pts[np.argsort(key)]
        coords[b, : len(pts)] = pts
        counts[b] = len(pts)
    dims_arr = np.tile(np.array(dims, np.int32), (B, 1))
    sb = build_sparse_batch(
        coords, counts, dims_arr, level_capacities=[256, 128, 64, 32],
        conv1_kernel_size=3,
    )
    return sb


def test_supports():
    assert supports(65536)
    assert supports(1024)
    assert not supports(512)  # smaller than the window
    assert not supports(1024 + 128)  # not tile-aligned


def test_forward_matches_xla_oracle():
    sb = _batch(n_cap=512)
    level = sb.levels[0]
    n = level.key.shape[1]
    cin, cout = 8, 16
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.normal(size=(2, n, cin)), jnp.float32)
    feats = jnp.where(level.valid[..., None], feats, 0)
    w = jnp.asarray(rng.normal(size=(27, cin, cout)) * 0.1, jnp.float32)
    idx, ok = sb.nbr_idx[0], sb.nbr_ok[0]

    out_p = sparse_conv_pallas(feats, w, idx, ok, 128, 256)
    out_x = sparse_conv(feats, w, idx, ok)
    v = np.asarray(level.valid)
    np.testing.assert_allclose(
        np.asarray(out_p)[v], np.asarray(out_x)[v], rtol=2e-2, atol=2e-2
    )


def test_row_chunked_path_matches_unchunked(monkeypatch):
    """Levels whose grid-step count exceeds the prefetch-SMEM bound are
    row-chunked across several pallas_calls (full feats ride along, only
    output tiles split). Force chunking at test scale and check parity
    against the single-call result."""
    from mask3d_tpu.sparse import pallas_conv as pc

    sb = _batch(n_cap=512)
    level = sb.levels[0]
    n = level.key.shape[1]
    rng = np.random.default_rng(7)
    feats = jnp.asarray(rng.normal(size=(2, n, 8)), jnp.float32)
    feats = jnp.where(level.valid[..., None], feats, 0)
    w = jnp.asarray(rng.normal(size=(27, 8, 8)) * 0.1, jnp.float32)
    idx, ok = sb.nbr_idx[0], sb.nbr_ok[0]

    out_one = sparse_conv_pallas(feats, w, idx, ok, 128, 256)
    # n=512, tile=128, B=2 -> nt=4, grid steps 8; bound of 2 forces
    # max_nt=1 -> 4 chunks per item.
    monkeypatch.setattr(pc, "_MAX_GRID_STEPS", 2)
    out_chunked = sparse_conv_pallas(feats, w, idx, ok, 128, 256)
    np.testing.assert_array_equal(
        np.asarray(out_one), np.asarray(out_chunked)
    )


def test_window_violation_falls_back_exactly():
    """A window much smaller than the index spread forces the premise check
    to fail; the cond must take the exact XLA branch (same result)."""
    sb = _batch(n_cap=512)
    level = sb.levels[0]
    n = level.key.shape[1]
    rng = np.random.default_rng(2)
    feats = jnp.asarray(rng.normal(size=(2, n, 4)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(27, 4, 4)) * 0.1, jnp.float32)
    idx, ok = sb.nbr_idx[0], sb.nbr_ok[0]

    # window == tile: x-offsets of a 32^2 slab spread farther than 128 rows.
    out_small = sparse_conv_pallas(feats, w, idx, ok, 128, 128)
    out_x = sparse_conv(feats, w, idx, ok)
    v = np.asarray(level.valid)
    np.testing.assert_allclose(
        np.asarray(out_small)[v], np.asarray(out_x)[v], rtol=2e-2, atol=2e-2
    )


def test_gradients_match_xla():
    sb = _batch(n_cap=512)
    level = sb.levels[0]
    n = level.key.shape[1]
    rng = np.random.default_rng(3)
    feats = jnp.asarray(rng.normal(size=(2, n, 8)), jnp.float32)
    feats = jnp.where(level.valid[..., None], feats, 0)
    w = jnp.asarray(rng.normal(size=(27, 8, 8)) * 0.1, jnp.float32)
    idx, ok = sb.nbr_idx[0], sb.nbr_ok[0]

    def loss_p(f, w):
        return jnp.sum(sparse_conv_pallas(f, w, idx, ok, 128, 256) ** 2)

    def loss_x(f, w):
        return jnp.sum(sparse_conv(f, w, idx, ok) ** 2)

    gp_f, gp_w = jax.grad(loss_p, argnums=(0, 1))(feats, w)
    gx_f, gx_w = jax.grad(loss_x, argnums=(0, 1))(feats, w)
    np.testing.assert_allclose(
        np.asarray(gp_f), np.asarray(gx_f), rtol=5e-2, atol=5e-2
    )
    np.testing.assert_allclose(
        np.asarray(gp_w), np.asarray(gx_w), rtol=5e-2, atol=5e-2
    )


def test_backbone_gather_pallas_matches_gather():
    """backbone_impl=gather_pallas == gather at the model level (bf16
    tolerance; level-0 capacity 1024 is eligible, coarser levels fall back
    statically via supports())."""
    from typing import Sequence

    from mask3d_tpu.models.backbone import Res16UNet14A

    class Shallow(Res16UNet14A):
        LAYERS: Sequence[int] = (1, 1, 1, 1, 1, 1, 1, 1)

    sb = _batch(dims=(48, 48, 16), n_cap=1024)
    n = sb.levels[0].key.shape[1]
    feats = jnp.ones((2, n, 1), jnp.float32)

    m_g = Shallow(in_channels=1, conv1_kernel_size=3, impl="gather")
    params = m_g.init(jax.random.PRNGKey(0), feats, sb)
    out_g, _ = m_g.apply(params, feats, sb)

    m_p = Shallow(in_channels=1, conv1_kernel_size=3, impl="gather_pallas")
    out_p, _ = m_p.apply(params, feats, sb)

    # The pallas path computes in bf16 while the oracle runs fp32; through a
    # full UNet a tiny tail of elements drifts past a plain allclose, so
    # assert on the error distribution instead.
    v = np.asarray(sb.levels[0].valid)
    diff = np.abs(np.asarray(out_p)[v] - np.asarray(out_g)[v])
    assert np.mean(diff) < 5e-3, np.mean(diff)
    assert np.quantile(diff, 0.999) < 5e-2, np.quantile(diff, 0.999)
    assert np.max(diff) < 0.3, np.max(diff)


def test_forward_gather_select_matches_xla_oracle():
    """select="gather" (Mosaic dynamic_gather selection) parity with the
    XLA oracle — same contract as the one-hot select path."""
    sb = _batch(n_cap=512)
    level = sb.levels[0]
    n = level.key.shape[1]
    cin, cout = 8, 16
    rng = np.random.default_rng(7)
    feats = jnp.asarray(rng.normal(size=(2, n, cin)), jnp.float32)
    feats = jnp.where(level.valid[..., None], feats, 0)
    w = jnp.asarray(rng.normal(size=(27, cin, cout)) * 0.1, jnp.float32)
    idx, ok = sb.nbr_idx[0], sb.nbr_ok[0]

    out_g = sparse_conv_pallas(feats, w, idx, ok, 128, 256, "gather")
    out_x = sparse_conv(feats, w, idx, ok)
    v = np.asarray(level.valid)
    np.testing.assert_allclose(
        np.asarray(out_g)[v], np.asarray(out_x)[v], rtol=2e-2, atol=2e-2
    )


def test_forward_grouped_window_matches_xla_oracle():
    """window_mode="grouped_dx" (one DMA per dx-group) parity with the XLA
    oracle, under both selection mechanisms."""
    sb = _batch(n_cap=512)
    level = sb.levels[0]
    n = level.key.shape[1]
    cin, cout = 8, 16
    rng = np.random.default_rng(11)
    feats = jnp.asarray(rng.normal(size=(2, n, cin)), jnp.float32)
    feats = jnp.where(level.valid[..., None], feats, 0)
    w = jnp.asarray(rng.normal(size=(27, cin, cout)) * 0.1, jnp.float32)
    idx, ok = sb.nbr_idx[0], sb.nbr_ok[0]

    out_x = sparse_conv(feats, w, idx, ok)
    v = np.asarray(level.valid)
    for select in ("onehot", "gather"):
        out_g = sparse_conv_pallas(
            feats, w, idx, ok, 128, 256, select, "grouped_dx"
        )
        np.testing.assert_allclose(
            np.asarray(out_g)[v], np.asarray(out_x)[v],
            rtol=2e-2, atol=2e-2, err_msg=select,
        )
