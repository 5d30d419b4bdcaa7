"""Data layer tests: PLY/LAS round-trips, dataset readers, augmentations."""

import os

import numpy as np
import pytest

from mask3d_tpu.data.augment import make_augmentation
from mask3d_tpu.data.datasets import (
    S3DISSegmentationDataset,
    Structured3DSegmentationDataset,
)
from mask3d_tpu.data.las import read_las, write_las
from mask3d_tpu.data.ply import read_ply, write_ply


def test_ply_ascii_roundtrip(tmp_path, rng):
    n = 50
    arrays = {
        "x": rng.integers(0, 100, n).astype(np.int32),
        "y": rng.integers(0, 100, n).astype(np.int32),
        "z": rng.integers(0, 100, n).astype(np.int32),
        "type": rng.integers(0, 21, n).astype(np.int32),
        "room_id": rng.integers(0, 9, n).astype(np.int32),
    }
    p = str(tmp_path / "pc.ply")
    write_ply(p, arrays, text=True)
    back = read_ply(p)
    for k in arrays:
        assert np.array_equal(back[k], arrays[k]), k


def test_ply_binary_roundtrip(tmp_path, rng):
    n = 30
    arrays = {
        "x": rng.normal(size=n).astype(np.float32),
        "y": rng.normal(size=n).astype(np.float32),
        "z": rng.normal(size=n).astype(np.float32),
        "red": rng.integers(0, 255, n).astype(np.uint8),
    }
    p = str(tmp_path / "pc_bin.ply")
    write_ply(p, arrays, text=False)
    back = read_ply(p)
    for k in arrays:
        assert np.array_equal(back[k], arrays[k]), k


def test_las_roundtrip(tmp_path, rng):
    n = 40
    coords = rng.integers(0, 500, (n, 3)).astype(np.float64)
    extra = {
        "type": rng.integers(0, 21, n).astype(np.int32),
        "room_id": rng.integers(0, 9, n).astype(np.int32),
        "score_pred": rng.random(n).astype(np.float32),
    }
    p = str(tmp_path / "pc.las")
    write_las(p, coords, extra_dims=extra)
    back = read_las(p)
    np.testing.assert_allclose(back["xyz"], coords)
    for k in extra:
        np.testing.assert_allclose(back[k], extra[k])


def _write_scene(root, scene, rng, n=100, with_invalid=True):
    d = os.path.join(root, scene)
    os.makedirs(d, exist_ok=True)
    sem = rng.integers(1, 17, n).astype(np.int32)
    if with_invalid:
        sem[:5] = 21  # undefined-polygon class, must be dropped
    arrays = {
        "x": rng.integers(0, 60, n).astype(np.int32),
        "y": rng.integers(0, 60, n).astype(np.int32),
        "z": rng.integers(0, 20, n).astype(np.int32),
        "type": sem,
        "room_id": rng.integers(0, 5, n).astype(np.int32),
    }
    write_ply(os.path.join(d, "point_cloud_rasterized_150.ply"), arrays)
    return arrays


def test_structured3d_dataset(tmp_path, rng):
    root = str(tmp_path)
    for scene in ["scene_00001", "scene_00002", "scene_03100", "scene_03400"]:
        _write_scene(root, scene, rng)
    train = Structured3DSegmentationDataset(root, mode="train")
    val = Structured3DSegmentationDataset(root, mode="validation")
    test = Structured3DSegmentationDataset(root, mode="test")
    assert train.data == ["scene_00001", "scene_00002"]
    assert val.data == ["scene_03100"]
    assert test.data == ["scene_03400"]

    item = train[0]
    # class 21 dropped, semantics collapsed to is_room
    assert (item["labels"][:, 0] <= 1).all()
    assert len(item["coordinates"]) == len(item["labels"])
    assert item["scene"] == "scene_00001"
    assert (item["features"] == 1).all()


def test_structured3d_valid_scenes_file(tmp_path, rng):
    root = str(tmp_path / "data")
    os.makedirs(root)
    for scene in ["scene_00001", "scene_00002"]:
        _write_scene(root, scene, rng)
    vf = str(tmp_path / "valid.txt")
    with open(vf, "w") as f:
        f.write("scene_00001\nscene_99999\n")
    ds = Structured3DSegmentationDataset(
        root, mode="train", valid_scenes_file_path=vf
    )
    assert ds.data == ["scene_00001"]


def test_s3dis_dataset(tmp_path, rng):
    root = str(tmp_path)
    for area in ["area_1", "area_2", "area_3", "area_4", "area_5", "area_6"]:
        _write_scene(root, area, rng, with_invalid=False)
    train = S3DISSegmentationDataset(root, mode="train")
    val = S3DISSegmentationDataset(root, mode="validation")
    assert len(train.data) == 5 and val.data == ["area_5"]
    item = val[0]
    assert (item["labels"][:, 0] == 1).all()  # everything is_room


def test_augmentations_preserve_alignment(rng):
    aug = make_augmentation("s3dis", seed=0)
    pts = rng.normal(size=(200, 3)).astype(np.float32) * 10
    feats = np.ones((200, 1), np.float32)
    labels = np.stack(
        [np.ones(200, np.int32), rng.integers(1, 5, 200)], axis=1
    )
    out = aug(pts, feats, labels)
    assert len(out["points"]) == len(out["features"]) == len(out["labels"])
    assert len(out["points"]) <= 200  # dropout may remove points


def test_dropout_keeps_raw_arrays_aligned(tmp_path, rng):
    """Row-dropping augmentation must subset raw_* by the same rows
    (regression: raw arrays were truncated by [:len(coords)], shifting
    every row after a dropped one)."""
    root = str(tmp_path)
    d = os.path.join(root, "area_1")
    os.makedirs(d)
    n = 300
    arrays = {
        "x": rng.integers(0, 60, n).astype(np.int32),
        "y": rng.integers(0, 60, n).astype(np.int32),
        "z": rng.integers(0, 20, n).astype(np.int32),
        "type": np.ones(n, np.int32),
        # unique instance id per row: a row-identity fingerprint that
        # rides through augmentation inside `labels`
        "room_id": np.arange(1, n + 1, dtype=np.int32),
    }
    write_ply(os.path.join(d, "point_cloud_rasterized_150.ply"), arrays)

    dropped = False
    for seed in range(20):
        ds = S3DISSegmentationDataset(
            root, mode="train", volume_augmentations="s3dis",
            augmentation_seed=seed,
        )
        item = ds[0]
        m = len(item["coordinates"])
        assert len(item["raw_coordinates"]) == m
        assert len(item["raw_labels"]) == m
        # raw_labels[i] must be the same row as labels[i]
        np.testing.assert_array_equal(item["labels"], item["raw_labels"])
        # raw coords must be the original (untransformed) rows of the
        # same points: match them through the fingerprint
        orig_xyz = np.stack(
            [arrays["x"], arrays["y"], arrays["z"]], axis=1
        ).astype(np.float32)
        fingerprint = item["labels"][:, 1] - 1  # room_id -> original row
        np.testing.assert_array_equal(
            item["raw_coordinates"], orig_xyz[fingerprint]
        )
        dropped |= m < n
    assert dropped, "no seed exercised random_dropout; test is vacuous"


def test_rotation_preserves_distances(rng):
    from mask3d_tpu.data.augment import rotate_around_axis

    fn = rotate_around_axis((0, 0, 1), (-np.pi, np.pi))
    pts = rng.normal(size=(50, 3)).astype(np.float64)
    out, _, _ = fn(np.random.default_rng(1), pts.copy(), None, None)
    d0 = np.linalg.norm(pts[0] - pts[1])
    d1 = np.linalg.norm(out[0] - out[1])
    np.testing.assert_allclose(d0, d1, rtol=1e-6)
    # z distances unchanged for z-axis rotation
    np.testing.assert_allclose(pts[:, 2], out[:, 2], atol=1e-9)


def test_key_transfer_codec_roundtrip():
    """u8-delta key codec: encode on host, decode under jit, bit-exact."""
    import jax

    from mask3d_tpu.data.transfer import decode_keys_u8, encode_keys_u8

    rng = np.random.default_rng(0)
    b, n = 3, 512
    keys = np.zeros((b, n), np.int32)
    counts = np.array([500, 1, 512], np.int32)
    dims = rng.integers(1, 100, size=(b, 3)).astype(np.int32)
    for i in range(b):
        # sorted unique keys with occasional huge gaps (escape path)
        deltas = rng.integers(1, 40, size=counts[i])
        deltas[rng.random(counts[i]) < 0.01] += 100_000
        deltas[0] = rng.integers(0, 500_000)
        keys[i, :counts[i]] = np.cumsum(deltas)
    buf = encode_keys_u8(keys, counts, dims)
    dk, dc, dd = decode_keys_u8(jax.numpy.asarray(buf), b, n)
    np.testing.assert_array_equal(np.asarray(dc), counts)
    np.testing.assert_array_equal(np.asarray(dd), dims)
    for i in range(b):
        np.testing.assert_array_equal(
            np.asarray(dk)[i, :counts[i]], keys[i, :counts[i]]
        )

    # escape-capacity overflow is a loud error
    import pytest

    huge = np.cumsum(np.full((1, n), 300, np.int64), axis=1).astype(np.int32)
    with pytest.raises(ValueError, match="escape"):
        encode_keys_u8(huge, np.array([n], np.int32),
                       np.ones((1, 3), np.int32), escape_capacity=4)


def test_native_pack_encode_matches_numpy():
    """C++ fused pack+encode (`native.pack_encode_u8`) is byte-identical to
    pack_keys + encode_keys_u8 on random sorted voxel batches."""
    import pytest

    from mask3d_tpu.data.transfer import encode_keys_u8
    from mask3d_tpu.native import pack_encode_u8_native
    from mask3d_tpu.sparse.core import pack_keys

    if pack_encode_u8_native(
        np.zeros((1, 4, 3), np.int32), np.array([1], np.int32),
        np.ones((1, 3), np.int32),
    ) is None:
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(7)
    for trial in range(5):
        b, n = 4, 1024
        dims = rng.integers(8, 300, size=(b, 3)).astype(np.int32)
        coords = np.zeros((b, n, 3), np.int32)
        counts = rng.integers(0, n + 1, size=b).astype(np.int32)
        counts[0] = n  # full item
        for i in range(b):
            c = counts[i]
            if c == 0:
                continue
            cells = int(dims[i].prod())
            keys = np.sort(
                rng.choice(cells, size=min(int(c), cells), replace=False)
            )
            counts[i] = len(keys)
            z = keys % dims[i, 2]
            y = (keys // dims[i, 2]) % dims[i, 1]
            x = keys // (dims[i, 2] * dims[i, 1])
            coords[i, : len(keys)] = np.stack([x, y, z], axis=-1)
        ref_keys = pack_keys(coords, dims[:, None, :]).astype(np.int32)
        ref = encode_keys_u8(ref_keys, counts, dims)
        got = pack_encode_u8_native(coords, counts, dims)
        np.testing.assert_array_equal(got, ref)

    # escape overflow raises like the numpy path
    big = np.zeros((1, 64, 3), np.int32)
    big[0, :, 0] = np.arange(64) * 5  # delta 5*dy*dz >= 255
    with pytest.raises(ValueError, match="escape"):
        pack_encode_u8_native(
            big, np.array([64], np.int32),
            np.array([[320, 10, 10]], np.int32), escape_capacity=4,
        )


def test_make_crops_quadrants():
    """Reference make_crops (`mask3d/datasets/utils.py:332-383`): centered
    quadrant crops with one guard point per quadrant (label 255), each crop
    re-centered."""
    from mask3d_tpu.data.augment import make_crops

    rng = np.random.default_rng(0)
    pts = rng.uniform(-10, 10, (400, 3)).astype(np.float32)
    item = {
        "coordinates": pts,
        "features": np.ones((400, 1), np.float32),
        "labels": np.ones((400, 2), np.int32),
        "scene": "s",
    }
    crops = make_crops([item])
    assert len(crops) == 4
    total = sum(len(c["coordinates"]) for c in crops)
    assert total == 400 + 4  # every point lands in exactly one quadrant
    for c in crops:
        assert np.abs(c["coordinates"].mean(0)).max() < 1e-4  # re-centered
        assert (c["labels"] == 255).all(axis=1).sum() == 1  # one guard


def test_random_cuboid_reference_semantics():
    from mask3d_tpu.data.augment import RandomCuboid

    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 20, (5000, 3))
    # Too-small cloud: keep everything.
    rc = RandomCuboid(min_points=10000)
    assert rc(pts, rng).all()
    # Normal: the kept set fits in an xy box of side crop_length.
    rc = RandomCuboid(min_points=100, crop_length=6.0)
    sel = rc(pts, rng)
    assert sel.sum() >= 100
    kept = pts[sel][:, :2]
    span = kept.max(0) - kept.min(0)
    assert (span <= 6.0 + 1e-9).all(), span
    # Impossible demand within the window: fallback keeps everything.
    rc = RandomCuboid(min_points=4999, crop_length=1.0)
    assert rc(pts, rng).all()


def test_collate_small_crops_wiring():
    from mask3d_tpu.data import VoxelizeCollate, make_synthetic_scene

    rng = np.random.default_rng(2)
    items = [make_synthetic_scene(rng, num_rooms_x=2, num_rooms_y=2,
                                  room_size=10, height=5, jitter=0.0,
                                  dropout=0.3)]
    hb = VoxelizeCollate(mode="train", small_crops=True,
                         point_bucket_multiple=512)(items)
    assert hb.device.coords.shape[0] == 4  # 1 scene -> 4 quadrant crops
    hb2 = VoxelizeCollate(mode="train", very_small_crops=True,
                          point_bucket_multiple=512)(items)
    assert hb2.device.coords.shape[0] == 16
    # test mode: crops disabled (reference gates on "train" in mode)
    hb3 = VoxelizeCollate(mode="test", small_crops=True,
                          point_bucket_multiple=512)(items)
    assert hb3.device.coords.shape[0] == 1


def test_host_pyramid_matches_device_build():
    """Host-computed coarse pyramid keys (coarse_pyramid_host + the u8
    pyramid codec) must reproduce the device `downsample_level_dense`
    levels BIT-exactly, including capacity truncation + overflow flags."""
    import jax.numpy as jnp

    from mask3d_tpu.data.transfer import (
        coarse_pyramid_host,
        decode_pyramid_u8,
        encode_pyramid_u8,
    )
    from mask3d_tpu.sparse import build_sparse_batch
    from mask3d_tpu.sparse.core import pack_keys

    rng = np.random.default_rng(5)
    b, n = 3, 256
    dims_max = np.array([24, 20, 12])
    coords = np.zeros((b, n, 3), np.int32)
    counts = np.array([256, 40, 3], np.int32)
    dims = np.zeros((b, 3), np.int32)
    for i in range(b):
        c = rng.integers(0, dims_max, size=(n, 3))
        c = np.unique(c, axis=0)[: counts[i]]
        counts[i] = len(c)
        dims[i] = c.max(axis=0) + 1 if len(c) else 1
        k = pack_keys(c, dims[i][None])
        coords[i, : counts[i]] = c[np.argsort(k, kind="stable")]
    grid_dims = []
    d = dims_max.copy()
    for _ in range(5):
        grid_dims.append(tuple(int(v) for v in d))
        d = ((d - 1) >> 1) + 1
    # level-1 capacity of 32 FORCES truncation+overflow on item 0
    caps = [32, 64, 32, 16]

    kw = dict(level_capacities=caps, conv1_kernel_size=None,
              build_block_maps=False, grid_dims=grid_dims)
    sb_dev = build_sparse_batch(jnp.asarray(coords), jnp.asarray(counts),
                                jnp.asarray(dims), build_pool_parents=False,
                                **kw)
    buf = encode_pyramid_u8(coords, counts, dims, caps)
    (k0, c0, d0), coarse = decode_pyramid_u8(jnp.asarray(buf), b, n, caps)
    np.testing.assert_array_equal(np.asarray(c0), counts)
    sb_host = build_sparse_batch(jnp.asarray(coords), jnp.asarray(counts),
                                 jnp.asarray(dims),
                                 precomputed_levels=coarse, **kw)

    assert any(np.asarray(p.overflow).any() for p in sb_host.pools)
    for lv_d, lv_h in zip(sb_dev.levels, sb_host.levels):
        for field in ("key", "coords", "valid", "count", "dims"):
            np.testing.assert_array_equal(
                np.asarray(getattr(lv_d, field)),
                np.asarray(getattr(lv_h, field)), err_msg=field,
            )
    for od, oh in zip(sb_dev.occ, sb_host.occ):
        np.testing.assert_array_equal(np.asarray(od), np.asarray(oh))
    for pd, ph in zip(sb_dev.pools, sb_host.pools):
        np.testing.assert_array_equal(
            np.asarray(pd.overflow), np.asarray(ph.overflow)
        )
    # host coarse keys are themselves what the codec shipped
    host_levels = coarse_pyramid_host(coords, counts, dims, caps)
    for (hk, hraw, hd), (ck, craw, cd) in zip(host_levels, coarse):
        np.testing.assert_array_equal(hraw, np.asarray(craw))
        np.testing.assert_array_equal(hd, np.asarray(cd))


def test_native_coarse_pyramid_matches_numpy():
    """C++ fused coarse-pyramid encode is byte-identical to the numpy
    coarse_pyramid_host + encode_keys_u8 path (incl. capacity truncation
    and escape records)."""
    import pytest

    from mask3d_tpu.data.transfer import coarse_pyramid_host, encode_keys_u8
    from mask3d_tpu.native import coarse_pyramid_encode_u8_native
    from mask3d_tpu.sparse.core import pack_keys

    rng = np.random.default_rng(9)
    b, n = 4, 512
    coords = np.zeros((b, n, 3), np.int32)
    counts = np.zeros(b, np.int32)
    dims = np.ones((b, 3), np.int32)
    for i in range(b):
        c = rng.integers(0, [40, 30, 14], size=(n, 3))
        c = np.unique(c, axis=0)
        counts[i] = min(len(c), n)
        c = c[: counts[i]]
        if len(c):
            dims[i] = c.max(axis=0) + 1
            k = pack_keys(c, dims[i][None])
            coords[i, : counts[i]] = c[np.argsort(k, kind="stable")]
    counts[3] = 0  # empty item
    caps = [64, 96, 32, 8]  # cap 64 forces truncation at level 1
    esc = 64

    got = coarse_pyramid_encode_u8_native(coords, counts, dims, caps, esc)
    if got is None:
        pytest.skip("native library unavailable")
    want = np.concatenate([
        encode_keys_u8(keys, raw, d, esc)
        for keys, raw, d in coarse_pyramid_host(coords, counts, dims, caps)
    ])
    np.testing.assert_array_equal(got, want)
