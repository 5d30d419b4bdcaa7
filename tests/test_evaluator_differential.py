"""Differential validation of the acceptance oracle.

Imports the REFERENCE evaluator (`/root/reference/mask3d/benchmark/
evaluate_semantic_instance.py`) directly — its math is numpy+scipy; only
its import-time dependencies (plyfile/laspy/loguru, the MinkowskiEngine-
touching dataset modules) are stubbed — and fuzzes hundreds of random
scenes through both implementations asserting metric equality.

This upgrades `mask3d_tpu/evalm` from "faithful by construction" (7 hand-
derived golden cases in test_evaluator.py) to "faithful by measurement".
"""

import logging
import sys
import types

import numpy as np
import pytest

from mask3d_tpu.evalm import Mask3DEvaluator

REF = "/root/reference/mask3d"


def _stub(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    return m


@pytest.fixture(scope="module")
def ref_evaluator_cls():
    torch = pytest.importorskip("torch")  # noqa: F841 (ref uses torch tensors)

    class _Stru3D:
        # Only DATASET_CLASSES is read by the evaluator
        # (evaluate_semantic_instance.py:22-27); value mirrors
        # semseg_structured3d.py:17-43 (all room types collapsed).
        DATASET_CLASSES = {1: "is_room"}

    class _ItemTargets:  # used as a type annotation only
        pass

    stubs = {
        "plyfile": _stub("plyfile", PlyData=object, PlyElement=object),
        "laspy": _stub("laspy"),
        "loguru": _stub("loguru", logger=logging.getLogger("loguru")),
        "datasets": _stub("datasets"),
        "datasets.semseg_structured3d": _stub(
            "datasets.semseg_structured3d",
            Structured3DSegmentationDataset=_Stru3D,
        ),
        "datasets.utils": _stub("datasets.utils", ItemTargets=_ItemTargets),
    }
    saved = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    sys.path.insert(0, REF)
    try:
        import importlib

        mod = importlib.import_module("benchmark.evaluate_semantic_instance")
        yield mod.Mask3DEvaluator
    finally:
        sys.path.remove(REF)
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def _torch_targets(targets):
    import torch

    out = []
    for t in targets:
        masks = np.asarray(t["masks"], bool)
        shim = types.SimpleNamespace(
            instances_labels=torch.as_tensor(
                np.asarray(t["labels"], np.int64)
            ),
            instances_masks=torch.as_tensor(masks),
            points_instance_ids=torch.zeros(
                masks.shape[1] if masks.ndim == 2 else 0, dtype=torch.long
            ),
        )
        out.append(shim)
    return out


def _torch_preds(preds):
    """Reference copy of preds: pred_classes must be a torch tensor
    (evaluate_semantic_instance.py:298 `.detach().cpu().item()`)."""
    import torch

    return [
        dict(p, pred_classes=torch.as_tensor(
            np.asarray(p["pred_classes"], np.int64)
        ))
        for p in preds
    ]


def _random_scene(rng, scene_name):
    """One fuzzed item: clustered gt instances + noisy predictions."""
    n = int(rng.integers(60, 500))
    n_gt = int(rng.integers(0, 7))
    gt_masks = np.zeros((n_gt, n), bool)
    # contiguous-ish gt segments with occasional overlap-free jitter
    if n_gt:
        bounds = np.sort(rng.choice(n, size=n_gt + 1, replace=False))
        for i in range(n_gt):
            gt_masks[i, bounds[i]:bounds[i + 1]] = True
            drop = rng.random(n) < 0.1
            gt_masks[i] &= ~drop
    keep = gt_masks.any(axis=1)
    gt_masks = gt_masks[keep]
    n_gt = int(keep.sum())
    gt_labels = np.ones(n_gt, np.int64)

    m = int(rng.integers(0, 9))
    pred_masks = np.zeros((n, m), bool)
    for j in range(m):
        if n_gt and rng.random() < 0.7:
            # perturbed copy of a gt instance
            src = gt_masks[rng.integers(0, n_gt)].copy()
            flip = rng.random(n) < rng.uniform(0.0, 0.35)
            src ^= flip
            pred_masks[:, j] = src
        else:
            # random blob (possibly empty)
            sz = int(rng.integers(0, max(2, n // 3)))
            idx = rng.choice(n, size=sz, replace=False)
            pred_masks[idx, j] = True
    scores = np.sort(rng.random(m).astype(np.float32))[::-1].copy()
    classes = np.ones(m, np.int64)

    pred = {
        "pred_masks": pred_masks,
        "pred_classes": classes,
        "pred_scores": scores,
        "scene": scene_name,
    }
    target = {"labels": gt_labels, "masks": gt_masks}
    return pred, target


SCALAR_KEYS = [
    "mean_ap", "mean_ap_50", "mean_ap_25",
    "mean_precision_50", "mean_recall_50", "mean_f1_50",
    "mean_match_IoU", "successfully_detected_rooms",
]


def _assert_metrics_equal(ours, ref, prefix, ctx):
    for key in SCALAR_KEYS:
        a = ours[f"{prefix}_{key}"]
        b = ref[f"{prefix}_{key}"]
        if np.isnan(a) or np.isnan(b):
            assert np.isnan(a) and np.isnan(b), (key, a, b, ctx)
        else:
            np.testing.assert_allclose(a, b, rtol=0, atol=0,
                                       err_msg=f"{key} {ctx}")


def test_evaluator_differential_fuzz(ref_evaluator_cls):
    rng = np.random.default_rng(20260817)
    ref_ev = ref_evaluator_cls(False, False)
    our_ev = Mask3DEvaluator()
    n_batches = 150
    for bi in range(n_batches):
        bs = int(rng.integers(1, 4))
        preds, targets = [], []
        for ii in range(bs):
            p, t = _random_scene(rng, f"scene_{bi}_{ii}")
            preds.append(p)
            targets.append(t)
        ours = our_ev.evaluate(preds, targets, "test")
        ref = ref_ev.evaluate(_torch_preds(preds), _torch_targets(targets), "test")
        _assert_metrics_equal(ours, ref, "test", f"batch {bi}")


def test_evaluator_differential_edge_cases(ref_evaluator_cls):
    ref_ev = ref_evaluator_cls(False, False)
    our_ev = Mask3DEvaluator()
    n = 40

    # no predictions at all
    preds = [{
        "pred_masks": np.zeros((n, 0), bool),
        "pred_classes": np.zeros(0, np.int64),
        "pred_scores": np.zeros(0, np.float32),
        "scene": "empty_pred",
    }]
    gt = np.zeros((2, n), bool)
    gt[0, :10] = True
    gt[1, 20:] = True
    targets = [{"labels": np.ones(2, np.int64), "masks": gt}]
    ours = our_ev.evaluate(preds, targets, "test")
    ref = ref_ev.evaluate(_torch_preds(preds), _torch_targets(targets), "test")
    _assert_metrics_equal(ours, ref, "test", "empty preds")

    # no ground truth
    preds2 = [{
        "pred_masks": gt.T.copy(),
        "pred_classes": np.ones(2, np.int64),
        "pred_scores": np.array([0.9, 0.4], np.float32),
        "scene": "empty_gt",
    }]
    targets2 = [{
        "labels": np.zeros(0, np.int64), "masks": np.zeros((0, n), bool)
    }]
    ours = our_ev.evaluate(preds2, targets2, "test")
    ref = ref_ev.evaluate(_torch_preds(preds2), _torch_targets(targets2), "test")
    _assert_metrics_equal(ours, ref, "test", "empty gt")

    # perfect prediction
    ours = our_ev.evaluate(
        preds2,
        [{"labels": np.ones(2, np.int64), "masks": gt}],
        "test",
    )
    ref = ref_ev.evaluate(
        _torch_preds(preds2),
        _torch_targets([{"labels": np.ones(2, np.int64), "masks": gt}]),
        "test",
    )
    _assert_metrics_equal(ours, ref, "test", "perfect")
    assert ours["test_mean_ap_50"] == 1.0
