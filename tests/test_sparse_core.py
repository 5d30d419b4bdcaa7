"""Sparse substrate tests: kernel maps and convs vs brute-force numpy oracles.

Mirrors the reference's op-level verification pattern — every custom kernel is
checked against a pure-framework oracle (reference pattern:
`mask3d/third_party/pointnet2/pointnet2_test.py`, `RoomFormer/models/ops/test.py`).
"""

import numpy as np
import jax.numpy as jnp

from mask3d_tpu.sparse import (
    build_base_level,
    build_pyramid,
    build_sparse_batch,
    cube_offsets,
    downsample_level,
    neighbor_map,
    avg_pool,
    instance_norm,
    sparse_conv,
    sparse_conv_down,
    sparse_conv_tr,
)


def make_batch(rng, num_items=3, dims=(9, 8, 7), max_pts=60, capacity=96):
    """Random sorted padded voxel batch + per-item coordinate sets."""
    coords = np.zeros((num_items, capacity, 3), np.int32)
    counts = np.zeros((num_items,), np.int32)
    coords_list = []
    for b in range(num_items):
        n = rng.integers(5, max_pts)
        pts = np.unique(
            rng.integers(0, dims, size=(n, 3)).astype(np.int32), axis=0
        )
        coords_list.append(pts)
        coords[b, : len(pts)] = pts
        counts[b] = len(pts)
    dims_arr = np.tile(np.array(dims, np.int32), (num_items, 1))
    level = build_base_level(coords, counts, dims_arr)
    return level, coords_list


def test_base_level_sorted(rng):
    level, coords_list = make_batch(rng)
    key = np.asarray(level.key)
    for b, pts in enumerate(coords_list):
        assert np.all(np.diff(key[b]) >= 0)
        n = len(pts)
        got = np.asarray(level.coords)[b, :n]
        assert np.array_equal(got, pts)  # np.unique order == key order
        assert np.asarray(level.valid)[b].sum() == n


def test_downsample_matches_numpy_unique(rng):
    level, coords_list = make_batch(rng)
    coarse, pool = downsample_level(level, 96)
    assert not np.asarray(pool.overflow).any()
    for b, pts in enumerate(coords_list):
        exp = np.unique(pts >> 1, axis=0)
        n = int(np.asarray(coarse.count)[b])
        assert n == len(exp)
        got = np.asarray(coarse.coords)[b, :n]
        assert np.array_equal(got, exp)
        # Parent relation: fine coords >> 1 equals parent coarse coords
        parent = np.asarray(pool.parent)[b]
        v = np.asarray(level.valid)[b]
        cc = np.asarray(coarse.coords)[b]
        fc = np.asarray(level.coords)[b]
        assert np.array_equal(cc[parent[v]], fc[v] >> 1)
        assert np.asarray(pool.nchild)[b].sum() == int(
            np.asarray(level.count)[b]
        )


def test_neighbor_map_bruteforce(rng):
    level, coords_list = make_batch(rng)
    offsets = cube_offsets(1)
    idx, ok = neighbor_map(level, offsets, chunk=7)
    idx, ok = np.asarray(idx), np.asarray(ok)
    for b in range(level.batch_size):
        v = np.asarray(level.valid)[b]
        c_all = np.asarray(level.coords)[b]
        table = {tuple(map(int, c)): i for i, c in enumerate(c_all) if v[i]}
        for i in range(level.capacity):
            if not v[i]:
                assert not ok[b, i].any()
                continue
            for k, off in enumerate(offsets):
                q = tuple(map(int, c_all[i] + off))
                if q in table:
                    assert ok[b, i, k] and idx[b, i, k] == table[q]
                else:
                    assert not ok[b, i, k]


def test_sparse_conv_vs_dense_oracle(rng):
    dims, B = (9, 8, 7), 3
    level, _ = make_batch(rng, num_items=B, dims=dims)
    cin, cout = 5, 6
    feats = rng.normal(size=(B, level.capacity, cin)).astype(np.float32)
    v = np.asarray(level.valid)
    feats[~v] = 0
    offsets = cube_offsets(1)
    w = rng.normal(size=(len(offsets), cin, cout)).astype(np.float32) * 0.3
    idx, ok = neighbor_map(level, offsets)
    out = np.asarray(sparse_conv(jnp.asarray(feats), jnp.asarray(w), idx, ok))

    # Dense oracle: scatter to a dense grid, shift-and-matmul per offset.
    dense = np.zeros((B, *dims, cin), np.float64)
    bb, rr = np.nonzero(v)
    cc = np.asarray(level.coords)[bb, rr]
    dense[bb, cc[:, 0], cc[:, 1], cc[:, 2]] = feats[bb, rr]

    exp_dense = np.zeros((B, *dims, cout))
    for k, (dx, dy, dz) in enumerate(offsets):
        shifted = np.zeros_like(dense)
        xs = slice(max(0, dx), dims[0] + min(0, dx))
        ys = slice(max(0, dy), dims[1] + min(0, dy))
        zs = slice(max(0, dz), dims[2] + min(0, dz))
        xd = slice(max(0, -dx), dims[0] + min(0, -dx))
        yd = slice(max(0, -dy), dims[1] + min(0, -dy))
        zd = slice(max(0, -dz), dims[2] + min(0, -dz))
        shifted[:, xd, yd, zd] = dense[:, xs, ys, zs]
        exp_dense += shifted @ w[k].astype(np.float64)

    for b, r in zip(bb, rr):
        x, y, z = np.asarray(level.coords)[b, r]
        np.testing.assert_allclose(
            out[b, r], exp_dense[b, x, y, z], rtol=1e-4, atol=1e-4
        )


def test_conv_down_tr_and_pool(rng):
    dims, B = (9, 8, 7), 2
    level, _ = make_batch(rng, num_items=B, dims=dims)
    coarse, pool = downsample_level(level, 96)
    cin, cout = 4, 5
    feats = rng.normal(size=(B, level.capacity, cin)).astype(np.float32)
    v = np.asarray(level.valid)
    feats[~v] = 0
    w = rng.normal(size=(8, cin, cout)).astype(np.float32)

    out = np.asarray(
        sparse_conv_down(jnp.asarray(feats), jnp.asarray(w), pool, coarse.capacity)
    )
    parent = np.asarray(pool.parent)
    kidx = np.asarray(pool.kidx)
    exp = np.zeros((B, coarse.capacity, cout))
    for b in range(B):
        for i in np.nonzero(v[b])[0]:
            exp[b, parent[b, i]] += feats[b, i] @ w[kidx[b, i]]
    np.testing.assert_allclose(out, exp, rtol=1e-4, atol=1e-4)

    # Transposed conv back to fine level
    cfeats = rng.normal(size=(B, coarse.capacity, cin)).astype(np.float32)
    cfeats[~np.asarray(coarse.valid)] = 0
    out_tr = np.asarray(
        sparse_conv_tr(jnp.asarray(cfeats), jnp.asarray(w), pool, level.valid)
    )
    for b in range(B):
        for i in range(level.capacity):
            if v[b, i]:
                np.testing.assert_allclose(
                    out_tr[b, i],
                    cfeats[b, parent[b, i]] @ w[kidx[b, i]],
                    rtol=1e-4,
                    atol=1e-4,
                )
            else:
                np.testing.assert_allclose(out_tr[b, i], 0)

    # Avg pool over existing children
    pooled = np.asarray(avg_pool(jnp.asarray(feats), pool, coarse.capacity))
    sums = np.zeros((B, coarse.capacity, cin))
    cnts = np.zeros((B, coarse.capacity))
    for b in range(B):
        for i in np.nonzero(v[b])[0]:
            sums[b, parent[b, i]] += feats[b, i]
            cnts[b, parent[b, i]] += 1
    exp_pool = sums / np.maximum(cnts, 1)[..., None]
    np.testing.assert_allclose(pooled, exp_pool, rtol=1e-4, atol=1e-4)


def test_instance_norm(rng):
    level, coords_list = make_batch(rng)
    c = 6
    B = level.batch_size
    feats = rng.normal(size=(B, level.capacity, c)).astype(np.float32) * 3 + 1
    gamma = rng.normal(size=(c,)).astype(np.float32)
    beta = rng.normal(size=(c,)).astype(np.float32)
    out = np.asarray(
        instance_norm(
            jnp.asarray(feats), level.valid,
            jnp.asarray(gamma), jnp.asarray(beta), eps=1e-5,
        )
    )
    v = np.asarray(level.valid)
    for b in range(B):
        x = feats[b][v[b]]
        mu, var = x.mean(0), x.var(0)
        exp = (x - mu) / np.sqrt(var + 1e-5) * gamma + beta
        np.testing.assert_allclose(out[b][v[b]], exp, rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(out[b][~v[b]], 0)


def test_pyramid_shapes(rng):
    level, _ = make_batch(rng, dims=(16, 16, 8))
    levels, pools = build_pyramid(level, [96, 48, 48, 48])
    assert len(levels) == 5 and len(pools) == 4
    strides = [lv.stride for lv in levels]
    assert strides == [1, 2, 4, 8, 16]
    counts = np.stack([np.asarray(lv.count) for lv in levels])
    assert np.all(counts[:-1] >= counts[1:])
    assert np.all(counts[-1] >= 1)  # every item still present


def test_build_sparse_batch(rng):
    level, coords_list = make_batch(rng, dims=(16, 16, 8))
    sb = build_sparse_batch(
        level.coords, level.count, level.dims,
        level_capacities=[96, 48, 48, 48],
        conv1_kernel_size=5,
    )
    assert sb.num_levels == 5
    assert len(sb.nbr_idx) == 5
    assert sb.nbr0_idx.shape == (level.batch_size, level.capacity, 125)
    # Center offset of the 5^3 map must be the identity lookup.
    center = 125 // 2
    v = np.asarray(sb.levels[0].valid)
    idx = np.asarray(sb.nbr0_idx)[..., center]
    ok = np.asarray(sb.nbr0_ok)[..., center]
    rows = np.tile(np.arange(level.capacity), (level.batch_size, 1))
    assert np.array_equal(ok, v)
    assert np.array_equal(idx[v], rows[v])


def test_neighbor_map_table_matches_search(rng):
    from mask3d_tpu.sparse.core import build_row_table, neighbor_map_table

    level, _ = make_batch(rng, dims=(16, 16, 8))
    offsets = cube_offsets(2)  # 5^3 kernel
    idx_s, ok_s = neighbor_map(level, offsets)
    table = build_row_table(level, 16 * 16 * 8)
    idx_t, ok_t = neighbor_map_table(level, table, offsets, chunk=17)
    assert np.array_equal(np.asarray(ok_s), np.asarray(ok_t))
    # indices must agree wherever the neighbor exists
    ok = np.asarray(ok_s)
    assert np.array_equal(np.asarray(idx_s)[ok], np.asarray(idx_t)[ok])


def test_build_sparse_batch_with_grid_cells(rng):
    level, _ = make_batch(rng, dims=(16, 16, 8))
    kw = dict(level_capacities=[96, 48, 48, 48], conv1_kernel_size=5)
    sb_search = build_sparse_batch(level.coords, level.count, level.dims, **kw)
    sb_table = build_sparse_batch(
        level.coords, level.count, level.dims,
        grid_cells=(2048, 512, 128, 64, 64), **kw,
    )
    for a, b in zip(sb_search.nbr_ok, sb_table.nbr_ok):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    ok = np.asarray(sb_search.nbr0_ok)
    assert np.array_equal(
        np.asarray(sb_search.nbr0_idx)[ok], np.asarray(sb_table.nbr0_idx)[ok]
    )


def test_unpack_keys_roundtrip(rng):
    from mask3d_tpu.sparse import pack_keys, unpack_keys

    level, _ = make_batch(rng, num_items=3, dims=(9, 8, 7))
    keys = np.asarray(level.key)
    dims = np.asarray(level.dims)
    coords = np.asarray(unpack_keys(jnp.asarray(keys), jnp.asarray(dims)))
    valid = np.asarray(level.valid)
    np.testing.assert_array_equal(
        coords[valid], np.asarray(level.coords)[valid]
    )
