"""Differential validation of the RoomFormer polygon utilities.

Imports the REFERENCE `RoomFormer/util/poly_ops.py` (torch+numpy only)
and fuzzes random polygons through `is_clockwise` / `resort_corners` /
`get_all_order_corners` vs `mask3d_tpu/baseline/poly_ops.py`.
"""

import sys

import numpy as np
import pytest

from mask3d_tpu.baseline.poly_ops import (
    all_cyclic_orders,
    is_clockwise,
    resort_corners,
)

REF_DIR = "/root/reference/RoomFormer/util"


@pytest.fixture(scope="module")
def ref_poly_ops():
    torch = pytest.importorskip("torch")  # noqa: F841
    saved = sys.modules.get("poly_ops")
    sys.modules.pop("poly_ops", None)
    sys.path.insert(0, REF_DIR)
    try:
        import importlib

        yield importlib.import_module("poly_ops")
    finally:
        sys.path.remove(REF_DIR)
        if saved is None:
            sys.modules.pop("poly_ops", None)
        else:
            sys.modules["poly_ops"] = saved


def test_poly_ops_differential_fuzz(ref_poly_ops):
    import torch

    rng = np.random.default_rng(20260822)
    for trial in range(80):
        k = int(rng.integers(3, 12))
        # integer image coordinates like the 256x256 density frame
        poly = rng.integers(0, 256, size=(k, 2)).astype(np.float64)

        assert is_clockwise(poly) == ref_poly_ops.is_clockwise(
            poly.tolist()
        ), f"is_clockwise trial {trial}"

        flat = poly.reshape(-1)
        np.testing.assert_array_equal(
            resort_corners(flat.copy()),
            ref_poly_ops.resort_corners(flat.copy()),
            err_msg=f"resort_corners trial {trial}",
        )

        np.testing.assert_array_equal(
            all_cyclic_orders(flat),
            ref_poly_ops.get_all_order_corners(
                torch.as_tensor(flat)
            ).numpy(),
            err_msg=f"cyclic orders trial {trial}",
        )
