"""Dense-grid execution parity: dense conv path == gather conv path.

The dense backbone path must be numerically identical to the gather path
(same params, submanifold masking == missing-neighbor zeros)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mask3d_tpu.sparse import (
    build_base_level,
    build_sparse_batch,
    cube_offsets,
    downsample_level,
    neighbor_map,
    sparse_conv,
    sparse_conv_down,
    sparse_conv_tr,
    instance_norm,
)
from mask3d_tpu.sparse import dense_ops
from tests.test_sparse_core import make_batch


GRID = (16, 16, 8)


def make_level(rng):
    return make_batch(rng, num_items=2, dims=GRID, max_pts=80, capacity=128)


def test_scatter_gather_roundtrip(rng):
    level, _ = make_level(rng)
    feats = rng.normal(size=(2, level.capacity, 5)).astype(np.float32)
    feats[~np.asarray(level.valid)] = 0
    dense = dense_ops.scatter_rows(jnp.asarray(feats), level, GRID)
    back = dense_ops.gather_rows(dense, level, GRID)
    np.testing.assert_array_equal(np.asarray(back), feats)
    # occupancy counts match
    occ = dense_ops.occupancy(level, GRID)
    assert int(np.asarray(occ).sum()) == int(np.asarray(level.count).sum())


def test_dense_conv_same_matches_gather(rng):
    level, _ = make_level(rng)
    cin, cout = 5, 6
    feats = rng.normal(size=(2, level.capacity, cin)).astype(np.float32)
    feats[~np.asarray(level.valid)] = 0
    for radius in (1, 2):
        offsets = cube_offsets(radius)
        w = rng.normal(size=(len(offsets), cin, cout)).astype(np.float32)
        idx, ok = neighbor_map(level, offsets)
        ref = sparse_conv(jnp.asarray(feats), jnp.asarray(w), idx, ok)
        dense = dense_ops.scatter_rows(jnp.asarray(feats), level, GRID)
        out_d = dense_ops.dense_conv_same(
            dense, jnp.asarray(w), dense_ops.occupancy(level, GRID)
        )
        got = dense_ops.gather_rows(out_d, level, GRID)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4
        )


def test_dense_conv_same_int8_close_to_fp32(rng):
    """int8 dynamic quantization (per-in-channel activation scales folded
    into per-out-channel weight scales) tracks the fp32 conv to ~1% of
    the output scale, and keeps exact zeros at unoccupied cells."""
    level, _ = make_level(rng)
    cin, cout = 8, 6
    feats = rng.normal(size=(2, level.capacity, cin)).astype(np.float32)
    # heterogeneous per-channel ranges to exercise the per-channel scales
    feats *= (10.0 ** rng.uniform(-2, 2, size=cin)).astype(np.float32)
    feats[~np.asarray(level.valid)] = 0
    w = rng.normal(size=(27, cin, cout)).astype(np.float32)
    dense = dense_ops.scatter_rows(jnp.asarray(feats), level, GRID)
    occ = dense_ops.occupancy(level, GRID)
    bias = rng.normal(size=cout).astype(np.float32)
    ref = np.asarray(dense_ops.dense_conv_same(
        dense, jnp.asarray(w), occ, bias=jnp.asarray(bias)))
    got = np.asarray(dense_ops.dense_conv_same_int8(
        dense, jnp.asarray(w), occ, bias=jnp.asarray(bias),
        out_dtype=jnp.float32))
    # unoccupied cells exactly zero (submanifold invariant)
    unocc = np.asarray(occ)[..., 0] == 0
    assert np.all(got[unocc] == 0)
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() < 0.02 * scale, (
        np.abs(got - ref).max(), scale
    )


def test_dense_conv_down_matches_gather(rng):
    level, _ = make_level(rng)
    coarse, pool = downsample_level(level, 128)
    grid_c = tuple(d // 2 for d in GRID)
    cin, cout = 4, 5
    feats = rng.normal(size=(2, level.capacity, cin)).astype(np.float32)
    feats[~np.asarray(level.valid)] = 0
    w = rng.normal(size=(8, cin, cout)).astype(np.float32)
    ref = sparse_conv_down(
        jnp.asarray(feats), jnp.asarray(w), pool, coarse.capacity
    )
    dense = dense_ops.scatter_rows(jnp.asarray(feats), level, GRID)
    out_d = dense_ops.dense_conv_down(
        dense, jnp.asarray(w), dense_ops.occupancy(coarse, grid_c)
    )
    got = dense_ops.gather_rows(out_d, coarse, grid_c)
    # Compare rows of the coarse level
    cv = np.asarray(coarse.valid)
    np.testing.assert_allclose(
        np.asarray(got)[cv], np.asarray(ref)[cv], rtol=1e-4, atol=1e-4
    )


def test_dense_conv_tr_matches_gather(rng):
    level, _ = make_level(rng)
    coarse, pool = downsample_level(level, 128)
    grid_c = tuple(d // 2 for d in GRID)
    cin, cout = 4, 5
    cfeats = rng.normal(size=(2, coarse.capacity, cin)).astype(np.float32)
    cfeats[~np.asarray(coarse.valid)] = 0
    w = rng.normal(size=(8, cin, cout)).astype(np.float32)
    ref = sparse_conv_tr(jnp.asarray(cfeats), jnp.asarray(w), pool, level.valid)
    dense_c = dense_ops.scatter_rows(jnp.asarray(cfeats), coarse, grid_c)
    out_d = dense_ops.dense_conv_tr(
        dense_c, jnp.asarray(w), dense_ops.occupancy(level, GRID)
    )
    got = dense_ops.gather_rows(out_d, level, GRID)
    v = np.asarray(level.valid)
    np.testing.assert_allclose(
        np.asarray(got)[v], np.asarray(ref)[v], rtol=1e-4, atol=1e-4
    )


def test_dense_instance_norm_matches_rows(rng):
    level, _ = make_level(rng)
    c = 6
    feats = rng.normal(size=(2, level.capacity, c)).astype(np.float32) * 2
    feats[~np.asarray(level.valid)] = 0
    gamma = rng.normal(size=(c,)).astype(np.float32)
    beta = rng.normal(size=(c,)).astype(np.float32)
    ref = instance_norm(
        jnp.asarray(feats), level.valid, jnp.asarray(gamma), jnp.asarray(beta)
    )
    dense = dense_ops.scatter_rows(jnp.asarray(feats), level, GRID)
    out_d = dense_ops.dense_instance_norm(
        dense, dense_ops.occupancy(level, GRID), jnp.asarray(gamma),
        jnp.asarray(beta),
    )
    got = dense_ops.gather_rows(out_d, level, GRID)
    v = np.asarray(level.valid)
    np.testing.assert_allclose(
        np.asarray(got)[v], np.asarray(ref)[v], rtol=1e-3, atol=1e-3
    )


def test_backbone_dense_matches_gather(rng):
    """Full Res16UNet forward: identical outputs from both impls."""
    from mask3d_tpu.models.backbone import Res16UNet14A

    level, _ = make_batch(rng, num_items=2, dims=(16, 16, 16), max_pts=200,
                          capacity=256)
    grid_dims = tuple(
        (16 >> l, 16 >> l, 16 >> l) for l in range(5)
    )
    cells = tuple(int(np.prod(d)) for d in grid_dims)
    sb_g = build_sparse_batch(
        level.coords, level.count, level.dims,
        level_capacities=[256, 128, 64, 32], conv1_kernel_size=3,
        grid_cells=cells,
    )
    sb_d = build_sparse_batch(
        level.coords, level.count, level.dims,
        level_capacities=[256, 128, 64, 32], conv1_kernel_size=None,
        build_block_maps=False, grid_cells=cells,
    )
    feats = jnp.ones((2, 256, 1), jnp.float32)
    feats = jnp.where(level.valid[..., None], feats, 0)

    mg = Res16UNet14A(in_channels=1, conv1_kernel_size=3, impl="gather")
    md = Res16UNet14A(in_channels=1, conv1_kernel_size=3, impl="dense")
    params = mg.init(jax.random.PRNGKey(0), feats, sb_g)
    out_g, fmaps_g = mg.apply(params, feats, sb_g)
    out_d, fmaps_d = md.apply(params, feats, sb_d, grid_dims)

    v = np.asarray(level.valid)
    np.testing.assert_allclose(
        np.asarray(out_d)[v], np.asarray(out_g)[v], rtol=2e-3, atol=2e-3
    )
    for fg, fd, lv in zip(fmaps_g, fmaps_d, reversed(sb_g.levels)):
        lvv = np.asarray(lv.valid)
        np.testing.assert_allclose(
            np.asarray(fd)[lvv], np.asarray(fg)[lvv], rtol=2e-3, atol=2e-3
        )


def test_dense_pyramid_matches_row_pyramid(rng):
    """downsample_level_dense must produce the identical coarse level and
    PoolMap as the argsort-based row build."""
    level, _ = make_batch(rng, num_items=2, dims=(16, 16, 8), max_pts=200,
                          capacity=256)
    coarse_r, pool_r = downsample_level(level, 256)
    coarse_d, pool_d, occ_c = dense_ops.downsample_level_dense(
        level, (16, 16, 8), 256)
    # coarse occupancy grid == scatter of the coarse rows
    np.testing.assert_array_equal(
        np.asarray(occ_c), np.asarray(dense_ops.occupancy(coarse_d, (8, 8, 4)))
    )
    for field in ("key", "coords", "valid", "count", "dims"):
        np.testing.assert_array_equal(
            np.asarray(getattr(coarse_r, field)),
            np.asarray(getattr(coarse_d, field)), err_msg=field,
        )
    for field in ("parent", "kidx", "nchild"):
        np.testing.assert_array_equal(
            np.asarray(getattr(pool_r, field)),
            np.asarray(getattr(pool_d, field)), err_msg=field,
        )
    assert not np.asarray(pool_d.overflow).any()


def test_dense_pyramid_overflow_flag(rng):
    level, _ = make_batch(rng, num_items=2, dims=(16, 16, 8), max_pts=200,
                          capacity=256)
    _, pool_d, _ = dense_ops.downsample_level_dense(level, (16, 16, 8), 8)
    assert np.asarray(pool_d.overflow).all()


def test_pooled_row_pyramid_matches_avg_pool_chain(rng):
    """Grid-space mean-pool pyramid == row-space avg_pool-over-PoolMap chain
    (the dense model path vs the gather model path, models/mask3d.py)."""
    from mask3d_tpu.sparse.ops import avg_pool

    level, _ = make_batch(rng, num_items=2, dims=(16, 16, 16), max_pts=200,
                          capacity=256)
    grid_dims = tuple((16 >> l, 16 >> l, 16 >> l) for l in range(5))
    caps = [256, 128, 64, 32]
    sb = build_sparse_batch(
        level.coords, level.count, level.dims, level_capacities=caps,
        conv1_kernel_size=None, build_block_maps=False, grid_dims=grid_dims,
    )
    assert not any(np.asarray(p.overflow).any() for p in sb.pools)

    feats = rng.normal(size=(2, 256, 7)).astype(np.float32)
    feats[~np.asarray(sb.levels[0].valid)] = 0
    coords_f = np.asarray(sb.levels[0].coords, np.float32)
    coords_f[~np.asarray(sb.levels[0].valid)] = 0

    # Row-space chain (gather path).
    fused = jnp.concatenate([jnp.asarray(coords_f), jnp.asarray(feats)], -1)
    rows_ref = []
    x = fused
    for i, pool in enumerate(sb.pools):
        x = avg_pool(x, pool, sb.levels[i + 1].capacity)
        rows_ref.append(x)

    # Grid-space chain (dense path).
    cgrid = dense_ops.cell_coord_grid(grid_dims[0], 2)
    cgrid = cgrid * dense_ops.occupancy(sb.levels[0], grid_dims[0])
    fgrid = dense_ops.scatter_rows(jnp.asarray(feats), sb.levels[0],
                                   grid_dims[0])
    got = dense_ops.pooled_row_pyramid(
        [cgrid, fgrid], sb.occ, sb.levels, grid_dims
    )
    assert len(got) == len(rows_ref)
    for li, ((crow, frow), ref) in enumerate(zip(got, rows_ref), start=1):
        v = np.asarray(sb.levels[li].valid)
        np.testing.assert_allclose(
            np.asarray(crow)[v], np.asarray(ref)[..., :3][v],
            rtol=1e-5, atol=1e-5, err_msg=f"coords level {li}",
        )
        np.testing.assert_allclose(
            np.asarray(frow)[v], np.asarray(ref)[..., 3:][v],
            rtol=1e-5, atol=1e-5, err_msg=f"feats level {li}",
        )


def test_dense_conv_same_zfold_matches_direct(rng):
    """z-folded conv (stem fast path) is numerically identical to the
    direct 3D formulation, including bias and k=5 with Cin=1."""
    level, _ = make_level(rng)
    occ = dense_ops.occupancy(level, GRID)
    for radius, cin, cout, bias in ((1, 5, 6, False), (2, 1, 8, True)):
        k3 = (2 * radius + 1) ** 3
        w = rng.normal(size=(k3, cin, cout)).astype(np.float32)
        b = rng.normal(size=(cout,)).astype(np.float32) if bias else None
        feats = rng.normal(size=(2, level.capacity, cin)).astype(np.float32)
        feats[~np.asarray(level.valid)] = 0
        dense = dense_ops.scatter_rows(jnp.asarray(feats), level, GRID)
        ref = dense_ops.dense_conv_same(dense, jnp.asarray(w), occ, bias=b)
        got = dense_ops.dense_conv_same_zfold(
            dense, jnp.asarray(w), occ, bias=b
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4
        )


def test_dense_basic_stage_folded_matches_unfolded(rng):
    """The z-folded identity-residual BasicBlock stage equals the 5D
    conv/IN/relu/residual chain (the stage-1 fast path)."""
    level, _ = make_level(rng)
    occ = dense_ops.occupancy(level, GRID)
    c, n = 8, 2
    feats = rng.normal(size=(2, level.capacity, c)).astype(np.float32)
    feats[~np.asarray(level.valid)] = 0
    x = dense_ops.scatter_rows(jnp.asarray(feats), level, GRID)
    blocks = []
    for _i in range(n):
        blocks.append({
            "w1": jnp.asarray(
                rng.normal(size=(27, c, c)).astype(np.float32) * 0.2),
            "g1": jnp.asarray(
                (1 + 0.2 * rng.normal(size=c)).astype(np.float32)),
            "b1": jnp.asarray(
                (0.1 * rng.normal(size=c)).astype(np.float32)),
            "w2": jnp.asarray(
                rng.normal(size=(27, c, c)).astype(np.float32) * 0.2),
            "g2": jnp.asarray(
                (1 + 0.2 * rng.normal(size=c)).astype(np.float32)),
            "b2": jnp.asarray(
                (0.1 * rng.normal(size=c)).astype(np.float32)),
        })

    ref = x
    for blk in blocks:
        h = dense_ops.dense_conv_same(ref, blk["w1"], occ)
        h = jnp.maximum(
            dense_ops.dense_instance_norm(h, occ, blk["g1"], blk["b1"]), 0)
        h = dense_ops.dense_conv_same(h, blk["w2"], occ)
        h = dense_ops.dense_instance_norm(h, occ, blk["g2"], blk["b2"])
        ref = jnp.maximum(h + ref, 0)

    got = dense_ops.dense_basic_stage_folded(x, occ, blocks)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_dense_stem_fused_matches_unfused(rng):
    """Fused stem (zfold conv + InstanceNorm + ReLU in the folded layout)
    is numerically identical to the unfused chain."""
    level, _ = make_level(rng)
    occ = dense_ops.occupancy(level, GRID)
    for cin, cout, bias in ((1, 8, False), (3, 6, True)):
        w = rng.normal(size=(125, cin, cout)).astype(np.float32)
        b = rng.normal(size=(cout,)).astype(np.float32) if bias else None
        gamma = rng.normal(size=(cout,)).astype(np.float32)
        beta = rng.normal(size=(cout,)).astype(np.float32)
        feats = rng.normal(size=(2, level.capacity, cin)).astype(np.float32)
        feats[~np.asarray(level.valid)] = 0
        dense = dense_ops.scatter_rows(jnp.asarray(feats), level, GRID)
        ref = dense_ops.dense_conv_same_zfold(dense, jnp.asarray(w), occ,
                                              bias=b)
        ref = jnp.maximum(dense_ops.dense_instance_norm(
            ref, occ, jnp.asarray(gamma), jnp.asarray(beta)), 0)
        got = dense_ops.dense_stem_fused(
            dense, jnp.asarray(w), occ, jnp.asarray(gamma),
            jnp.asarray(beta), bias=b,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5
        )
        # submanifold invariant: unoccupied cells exactly zero
        unocc = np.asarray(occ)[..., 0] == 0
        assert np.all(np.asarray(got)[unocc] == 0)


def test_dense_conv_same_int8_static_bound(rng):
    """`act_bound` static scales: (a) a bound equal to the true absmax
    reproduces the dynamic-scale result exactly; (b) a looser bound stays
    within the dynamic path's error envelope; (c) values beyond the bound
    SATURATE (clip) rather than wrap."""
    level, _ = make_level(rng)
    cin, cout = 8, 6
    feats = rng.normal(size=(2, level.capacity, cin)).astype(np.float32)
    feats *= (10.0 ** rng.uniform(-1, 1, size=cin)).astype(np.float32)
    feats[~np.asarray(level.valid)] = 0
    w = rng.normal(size=(27, cin, cout)).astype(np.float32)
    dense = dense_ops.scatter_rows(jnp.asarray(feats), level, GRID)
    occ = dense_ops.occupancy(level, GRID)
    ref_fp32 = np.asarray(dense_ops.dense_conv_same(dense, jnp.asarray(w),
                                                    occ))
    dyn = np.asarray(dense_ops.dense_conv_same_int8(
        dense, jnp.asarray(w), occ, out_dtype=jnp.float32))
    absmax = jnp.max(jnp.abs(dense), axis=(0, 1, 2, 3))
    exact = np.asarray(dense_ops.dense_conv_same_int8(
        dense, jnp.asarray(w), occ, out_dtype=jnp.float32,
        act_bound=absmax))
    np.testing.assert_array_equal(exact, dyn)
    scale = np.abs(ref_fp32).max()
    loose = np.asarray(dense_ops.dense_conv_same_int8(
        dense, jnp.asarray(w), occ, out_dtype=jnp.float32,
        act_bound=absmax * 1.5))
    assert np.abs(loose - ref_fp32).max() < 0.03 * scale
    # (c) a bound BELOW the true absmax saturates: output stays finite and
    # within the error of clipping x to the bound (no wraparound garbage).
    tight = np.asarray(dense_ops.dense_conv_same_int8(
        dense, jnp.asarray(w), occ, out_dtype=jnp.float32,
        act_bound=absmax * 0.5))
    clipped = jnp.clip(dense, -absmax * 0.5, absmax * 0.5)
    ref_clip = np.asarray(dense_ops.dense_conv_same(
        clipped, jnp.asarray(w), occ))
    assert np.isfinite(tight).all()
    assert np.abs(tight - ref_clip).max() < 0.03 * np.abs(ref_clip).max()


def test_int8_qgrid_conv_matches_quantize_at_conv(rng):
    """A QGrid-fed int8 conv (int8_residual junction output) must be
    BIT-IDENTICAL to quantizing the same bf16 tensor at the conv entry
    with the same static bound — quantize_static shares the exact math."""
    level, _ = make_level(rng)
    cin, cout = 8, 6
    feats = rng.normal(size=(2, level.capacity, cin)).astype(np.float32)
    feats[~np.asarray(level.valid)] = 0
    w = rng.normal(size=(27, cin, cout)).astype(np.float32)
    dense = dense_ops.scatter_rows(jnp.asarray(feats), level, GRID)
    occ = dense_ops.occupancy(level, GRID)
    bound = jnp.max(jnp.abs(dense), axis=(0, 1, 2, 3)) * 1.3 + 0.1
    at_conv = np.asarray(dense_ops.dense_conv_same_int8(
        dense, jnp.asarray(w), occ, out_dtype=jnp.float32,
        act_bound=bound))
    qg = dense_ops.quantize_static(dense, bound)
    pre_q = np.asarray(dense_ops.dense_conv_same_int8(
        qg, jnp.asarray(w), occ, out_dtype=jnp.float32))
    np.testing.assert_array_equal(at_conv, pre_q)
    # dequantize roundtrip error bounded by half a quant step per channel
    deq = np.asarray(dense_ops.dequantize(qg))
    step = np.asarray(qg.scale)
    assert (np.abs(deq - np.asarray(dense)) <= 0.5 * step + 1e-6).all()


def test_backbone_int8_residual_close_to_int8(rng):
    """Full 34C dense forward: int8_residual (QGrid junctions) vs plain
    int8 — the only numeric delta is the residual path reading the
    dequantized junction output, bounded by the static-bound quant step."""
    from mask3d_tpu.models.backbone import Res16UNet34C

    level, _ = make_batch(rng, num_items=2, dims=(16, 16, 16), max_pts=200,
                          capacity=256)
    grid_dims = tuple((16 >> l,) * 3 for l in range(5))
    cells = tuple(int(np.prod(d)) for d in grid_dims)
    sb = build_sparse_batch(
        level.coords, level.count, level.dims,
        level_capacities=[256, 128, 64, 32], conv1_kernel_size=None,
        build_block_maps=False, grid_cells=cells,
    )
    feats = jnp.ones((2, 256, 1), jnp.float32)
    feats = jnp.where(level.valid[..., None], feats, 0)

    kw = dict(in_channels=1, conv1_kernel_size=3, impl="dense",
              int8_stride1=True, int8_act_sigma=10.0)
    m0 = Res16UNet34C(**kw)
    m1 = Res16UNet34C(**kw, int8_residual=True)
    mf = Res16UNet34C(in_channels=1, conv1_kernel_size=3, impl="dense")
    params = m0.init(jax.random.PRNGKey(0), feats, sb, grid_dims)
    out0, f0 = m0.apply(params, feats, sb, grid_dims)
    out1, f1 = m1.apply(params, feats, sb, grid_dims)
    outf, _ = mf.apply(params, feats, sb, grid_dims)

    v = np.asarray(level.valid)
    a0, a1 = np.asarray(out0)[v], np.asarray(out1)[v]
    af = np.asarray(outf)[v]
    # The flag must stay within the EXISTING int8-vs-fp32 error envelope
    # (the residual deq adds at most the same static-bound quant step the
    # conv inputs already take; at init the sigma-10 bounds are worst-case
    # sums, so absolute errors are dominated by that shared step scale —
    # the trained-model mAP gate lives in tests/test_e2e.py).
    err0 = np.abs(a0 - af).max()
    err1 = np.abs(a1 - af).max()
    assert err1 <= 2.5 * max(err0, 1e-3), (err0, err1)
    # and on average the outputs track the plain-int8 path closely
    assert np.abs(a1 - a0).mean() < 0.02 * np.abs(a0).max()
    # sigma=0 disables the QGrid path entirely: bit-identical outputs.
    m_off = Res16UNet34C(in_channels=1, conv1_kernel_size=3, impl="dense",
                         int8_stride1=True, int8_act_sigma=0.0,
                         int8_residual=True)
    m_ref = Res16UNet34C(in_channels=1, conv1_kernel_size=3, impl="dense",
                         int8_stride1=True, int8_act_sigma=0.0)
    o_off, _ = m_off.apply(params, feats, sb, grid_dims)
    o_ref, _ = m_ref.apply(params, feats, sb, grid_dims)
    np.testing.assert_array_equal(np.asarray(o_off), np.asarray(o_ref))


def test_backbone_dense_matches_gather_odd_chain(rng):
    """8-multiple grid buckets give ceil-div level chains with ODD coarse
    dims (24 -> 12 -> 6 -> 3 -> 2). The padded dense pool/stride-2 ops must
    stay numerically identical to the gather path there."""
    from mask3d_tpu.models.backbone import Res16UNet14A

    level, _ = make_batch(rng, num_items=2, dims=(17, 17, 17), max_pts=220,
                          capacity=256)
    grid_dims = [(24, 24, 24)]
    for _ in range(4):
        grid_dims.append(
            tuple(((d - 1) >> 1) + 1 for d in grid_dims[-1])
        )
    grid_dims = tuple(grid_dims)
    assert grid_dims[3] == (3, 3, 3)
    cells = tuple(int(np.prod(d)) for d in grid_dims)
    caps = [256, 128, 64, 32]
    sb_g = build_sparse_batch(
        level.coords, level.count, level.dims, level_capacities=caps,
        conv1_kernel_size=3, grid_cells=cells,
    )
    sb_d = build_sparse_batch(
        level.coords, level.count, level.dims, level_capacities=caps,
        conv1_kernel_size=None, build_block_maps=False,
        grid_dims=grid_dims,
    )
    # Pyramid itself matches the argsort-based row build at every level.
    for lg, ld in zip(sb_g.levels, sb_d.levels):
        for field in ("key", "coords", "valid", "count", "dims"):
            np.testing.assert_array_equal(
                np.asarray(getattr(lg, field)),
                np.asarray(getattr(ld, field)), err_msg=field,
            )

    feats = jnp.ones((2, 256, 1), jnp.float32)
    feats = jnp.where(level.valid[..., None], feats, 0)
    mg = Res16UNet14A(in_channels=1, conv1_kernel_size=3, impl="gather")
    md = Res16UNet14A(in_channels=1, conv1_kernel_size=3, impl="dense")
    params = mg.init(jax.random.PRNGKey(0), feats, sb_g)
    out_g, fmaps_g = mg.apply(params, feats, sb_g)
    out_d, fmaps_d = md.apply(params, feats, sb_d, grid_dims)
    v = np.asarray(level.valid)
    np.testing.assert_allclose(
        np.asarray(out_d)[v], np.asarray(out_g)[v], rtol=2e-3, atol=2e-3
    )
    for fg, fd, lv in zip(fmaps_g, fmaps_d, reversed(sb_g.levels)):
        lvv = np.asarray(lv.valid)
        np.testing.assert_allclose(
            np.asarray(fd)[lvv], np.asarray(fg)[lvv], rtol=2e-3, atol=2e-3
        )

    # Grid-space mean-pool pyramid parity on the same odd chain.
    from mask3d_tpu.sparse.ops import avg_pool

    f2 = rng.normal(size=(2, 256, 7)).astype(np.float32)
    f2[~np.asarray(sb_d.levels[0].valid)] = 0
    x = jnp.asarray(f2)
    rows_ref = []
    for i, pool in enumerate(sb_g.pools):
        x = avg_pool(x, pool, sb_g.levels[i + 1].capacity)
        rows_ref.append(x)
    fgrid = dense_ops.scatter_rows(jnp.asarray(f2), sb_d.levels[0],
                                   grid_dims[0])
    got = dense_ops.pooled_row_pyramid(
        [fgrid], sb_d.occ, sb_d.levels, grid_dims
    )
    for li, ((frow,), ref) in enumerate(zip(got, rows_ref), start=1):
        vv = np.asarray(sb_d.levels[li].valid)
        np.testing.assert_allclose(
            np.asarray(frow)[vv], np.asarray(ref)[vv],
            rtol=1e-5, atol=1e-5, err_msg=f"feats level {li}",
        )
