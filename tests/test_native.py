"""Native C++ host-kernel parity tests vs the numpy implementations."""

import numpy as np
import pytest

from mask3d_tpu.native import downsample_native, get_lib, voxelize_native
from mask3d_tpu.data.collate import voxelize_item


needs_native = pytest.mark.skipif(
    get_lib() is None, reason="no C++ toolchain"
)


@needs_native
def test_voxelize_native_matches_numpy(rng):
    coords = (rng.normal(size=(5000, 3)) * 30).astype(np.float32)
    coords[:, 2] *= 0.2
    nat = voxelize_native(coords)
    uniq_np, keep_np, dims_np = voxelize_item(coords, use_native=False)
    uniq_c, keep_c, dims_c = nat
    assert np.array_equal(dims_c, dims_np)
    assert np.array_equal(uniq_c, uniq_np)
    assert np.array_equal(keep_c, keep_np)


@needs_native
def test_voxelize_native_duplicate_first_index(rng):
    # Many exact duplicates: keep the smallest original row index.
    base = rng.integers(0, 5, (40, 3)).astype(np.float32)
    coords = np.concatenate([base, base, base])
    uniq_c, keep_c, dims_c = voxelize_native(coords)
    uniq_np, keep_np, _ = voxelize_item(coords, use_native=False)
    assert np.array_equal(uniq_c, uniq_np)
    assert np.array_equal(keep_c, keep_np)
    assert (keep_c < 40).all()


@needs_native
def test_voxelize_native_huge_sparse_grid(rng):
    # key_bits + idx_bits > 64: a handful of points spread over a ~2^20
    # extent per axis (key_bits = 60) with 64 points (idx_bits = 6) forces
    # the no-packing comparison-sort fallback. Must still match numpy.
    # (Such grids are rejected by voxelize_item's int32-key contract, so
    # oracle directly against np.unique rather than voxelize_item.)
    coords = rng.uniform(0, 1_000_000, (64, 3)).astype(np.float32)
    coords[1] = coords[0]  # at least one duplicate voxel
    uniq_c, keep_c, dims_c = voxelize_native(coords)
    ci = coords.astype(np.int32)
    ci = ci - ci.min(axis=0)
    uniq_np, keep_np = np.unique(ci, axis=0, return_index=True)
    assert np.array_equal(dims_c, uniq_np.max(axis=0) + 1)
    assert np.array_equal(uniq_c, uniq_np)
    assert np.array_equal(keep_c, keep_np)


@needs_native
def test_downsample_native_matches_numpy(rng):
    coords = rng.uniform(-4000, 4000, (3000, 3))
    vs = 150.0
    vox_c, keep_c = downsample_native(coords, vs)
    mins = coords.min(0)
    vox = np.floor((coords - mins) / vs).astype(np.int64)
    uniq_np, keep_np = np.unique(vox, axis=0, return_index=True)
    assert np.array_equal(vox_c, uniq_np)
    assert np.array_equal(keep_c, keep_np)


@needs_native
def test_native_is_faster_than_numpy(rng):
    import time

    coords = (rng.normal(size=(400_000, 3)) * 100).astype(np.float32)
    voxelize_native(coords)  # warm
    t0 = time.perf_counter()
    voxelize_native(coords)
    t_nat = time.perf_counter() - t0
    t0 = time.perf_counter()
    voxelize_item(coords, use_native=False)
    t_np = time.perf_counter() - t0
    # informative, not flaky: just require it's not drastically slower
    assert t_nat < t_np * 2.0, (t_nat, t_np)
