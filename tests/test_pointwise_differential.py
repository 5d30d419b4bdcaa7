"""Differential validation of the mask-wise -> point-wise conversions.

Imports the REFERENCE `utils/utils.py` (laspy/loguru stubbed; pandas is
real) and fuzzes random prediction/gt mask stacks through
`get_pointwise_from_maskwise_{preds,gt}` and
`make_points_instance_id_look_nice` vs our `mask3d_tpu/evalm/pointwise.py`,
asserting exact array equality (overlap-overwrite order included).
"""

import logging
import sys

import numpy as np
import pytest

from mask3d_tpu.evalm.pointwise import (
    pointwise_from_maskwise_gt,
    pointwise_from_maskwise_preds,
    renumber_instance_ids,
)

from tests.test_evaluator_differential import _stub  # noqa: F401

REF = "/root/reference/mask3d"


@pytest.fixture(scope="module")
def ref_utils():
    stubs = {
        "laspy": _stub(
            "laspy",
            LasHeader=object,
            ExtraBytesParams=object,
            LasData=object,
        ),
        "loguru": _stub("loguru", logger=logging.getLogger("loguru")),
    }
    saved = {k: sys.modules.get(k) for k in stubs}
    for k in ("utils", "utils.utils"):
        saved.setdefault(k, sys.modules.get(k))
        sys.modules.pop(k, None)
    sys.modules.update(stubs)
    sys.path.insert(0, REF)
    try:
        import importlib

        yield importlib.import_module("utils.utils")
    finally:
        sys.path.remove(REF)
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def test_pointwise_differential_fuzz(ref_utils):
    rng = np.random.default_rng(20260821)
    for trial in range(60):
        n = int(rng.integers(20, 300))
        m = int(rng.integers(0, 8))
        pred_masks = (rng.random((n, m)) < rng.uniform(0.05, 0.5)).astype(
            np.float32
        )
        pred_classes = rng.integers(1, 22, size=m).astype(np.int64)
        pred_scores = np.sort(rng.random(m).astype(np.float32))[::-1].copy()

        ref_c, ref_i, ref_s = ref_utils.get_pointwise_from_maskwise_preds(
            pred_masks, pred_classes, pred_scores, n
        )
        our_c, our_i, our_s = pointwise_from_maskwise_preds(
            pred_masks, pred_classes, pred_scores, n
        )
        np.testing.assert_array_equal(our_c, ref_c, err_msg=f"cls {trial}")
        np.testing.assert_array_equal(our_i, ref_i, err_msg=f"iid {trial}")
        np.testing.assert_array_equal(our_s, ref_s, err_msg=f"score {trial}")

        n_gt = int(rng.integers(0, 6))
        gt_masks = rng.random((n_gt, n)) < 0.3
        gt_labels = rng.integers(1, 22, size=n_gt).astype(np.int64)
        ref_gc, ref_gi = ref_utils.get_pointwise_from_maskwise_gt(
            gt_labels, gt_masks, n
        )
        our_gc, our_gi = pointwise_from_maskwise_gt(gt_labels, gt_masks, n)
        np.testing.assert_array_equal(our_gc, ref_gc)
        np.testing.assert_array_equal(our_gi, ref_gi)

        np.testing.assert_array_equal(
            renumber_instance_ids(ref_i),
            ref_utils.make_points_instance_id_look_nice(ref_i),
        )
