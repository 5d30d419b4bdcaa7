"""Differential validation of the voxel-grid downsampler (P3).

Imports the REFERENCE `downsample_ply.py` (laspy/plyfile stubbed — the
math is pure numpy) and fuzzes random labelled point clouds through its
`downsample_point_cloud` (the point-cloud reader is injectable) and ours,
asserting exact equality of the rasterized label cuboid and every sparse
output column.
"""

import logging
import sys

import numpy as np
import pytest

from mask3d_tpu.preprocess.downsample import (
    downsample_point_cloud as our_downsample,
)

from tests.test_evaluator_differential import _stub  # noqa: F401

REF_DIR = "/root/reference/datasets_preprocess/downsample_point_cloud"


@pytest.fixture(scope="module")
def ref_downsample():
    stubs = {
        "laspy": _stub("laspy"),
        "plyfile": _stub("plyfile", PlyData=object, PlyElement=object),
        "loguru": _stub("loguru", logger=logging.getLogger("loguru")),
    }
    saved = {k: sys.modules.get(k) for k in stubs}
    saved.setdefault("downsample_ply", sys.modules.get("downsample_ply"))
    sys.modules.pop("downsample_ply", None)
    sys.modules.update(stubs)
    sys.path.insert(0, REF_DIR)
    try:
        import importlib

        mod = importlib.import_module("downsample_ply")
        yield mod.downsample_point_cloud
    finally:
        sys.path.remove(REF_DIR)
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def test_downsample_differential_fuzz(ref_downsample):
    rng = np.random.default_rng(20260820)
    for trial in range(30):
        n = int(rng.integers(50, 4000))
        # mm-scale coords incl. negative origins and duplicate positions
        coords = rng.uniform(-5000, 15000, size=(n, 3))
        dup = rng.random(n) < 0.3
        coords[dup] = coords[rng.integers(0, n, size=int(dup.sum()))]
        types = rng.integers(0, 22, size=n)
        room_ids = rng.integers(0, 30, size=n)
        voxel_size = int(rng.choice([100, 150, 200]))

        ref_cuboid, ref_sparse = ref_downsample(
            "unused-path", voxel_size,
            lambda _p: (coords, types, room_ids),
        )
        our_cuboid, our_sparse = our_downsample(
            coords, types, room_ids, voxel_size
        )

        np.testing.assert_array_equal(
            our_cuboid, ref_cuboid, err_msg=f"cuboid trial {trial}"
        )
        for col in ("x", "y", "z", "type", "room_id"):
            np.testing.assert_array_equal(
                our_sparse[col], ref_sparse[col],
                err_msg=f"{col} trial {trial}",
            )
