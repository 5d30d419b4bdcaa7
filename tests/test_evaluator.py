"""Evaluator golden tests: hand-computed AP/precision/recall/SDR cases.

The reference evaluator (`mask3d/benchmark/evaluate_semantic_instance.py`)
cannot be imported here (it drags in MinkowskiEngine), so these cases were
derived by hand-executing its algorithm; they pin the exact greedy-matching
and PR-integration semantics.
"""

import numpy as np
import pytest

from mask3d_tpu.evalm import Mask3DEvaluator


def make_scene():
    """100 points: gt A = 0..39, gt B = 40..79, 80..99 = background (void)."""
    n = 100
    masks = np.zeros((2, n), bool)
    masks[0, :40] = True
    masks[1, 40:80] = True
    labels = np.array([1, 1])
    return n, labels, masks


def pred_dict(masks_cols, scores, n):
    m = np.zeros((n, len(masks_cols)))
    for i, c in enumerate(masks_cols):
        m[c, i] = 1
    return {
        "pred_classes": np.ones(len(masks_cols), np.int32),
        "pred_masks": m,
        "pred_scores": np.asarray(scores, np.float32),
        "scene": "test_scene",
    }


def test_perfect_prediction():
    n, labels, masks = make_scene()
    pred = pred_dict(
        [np.arange(40), np.arange(40, 80)], [0.9, 0.8], n
    )
    ev = Mask3DEvaluator()
    m = ev.evaluate([pred], [{"labels": labels, "masks": masks}], "val")
    assert m["val_mean_ap"] == pytest.approx(1.0)
    assert m["val_mean_ap_50"] == pytest.approx(1.0)
    assert m["val_mean_ap_25"] == pytest.approx(1.0)
    assert m["val_mean_precision_50"] == pytest.approx(1.0)
    assert m["val_mean_recall_50"] == pytest.approx(1.0)
    assert m["val_mean_f1_50"] == pytest.approx(1.0)
    assert m["val_mean_match_IoU"] == pytest.approx(1.0)
    assert m["val_successfully_detected_rooms"] == pytest.approx(0.0)


def test_no_predictions():
    n, labels, masks = make_scene()
    pred = pred_dict([], [], n)
    ev = Mask3DEvaluator()
    m = ev.evaluate([pred], [{"labels": labels, "masks": masks}], "val")
    assert m["val_mean_ap"] == pytest.approx(0.0)
    assert m["val_mean_recall_50"] == pytest.approx(0.0)
    assert m["val_mean_precision_50"] == pytest.approx(0.0)
    assert m["val_successfully_detected_rooms"] == pytest.approx(-2.0)


def test_half_overlap():
    """Pred 1 = exact A; pred 2 covers half of B (IoU 0.5, not > 0.5).

    Hand-derived from the reference algorithm: AP = 0.5 at every threshold
    in {0.5..0.9} (y_true=[1,0], hard FN=1), AP25 = 1.0.
    """
    n, labels, masks = make_scene()
    pred = pred_dict(
        [np.arange(40), np.arange(40, 60)], [0.9, 0.8], n
    )
    ev = Mask3DEvaluator()
    m = ev.evaluate([pred], [{"labels": labels, "masks": masks}], "val")
    assert m["val_mean_ap"] == pytest.approx(0.5)
    assert m["val_mean_ap_50"] == pytest.approx(0.5)
    assert m["val_mean_ap_25"] == pytest.approx(1.0)
    assert m["val_mean_precision_50"] == pytest.approx(0.5)
    assert m["val_mean_recall_50"] == pytest.approx(0.5)
    assert m["val_mean_f1_50"] == pytest.approx(0.5)
    assert m["val_mean_match_IoU"] == pytest.approx(1.0)  # only A matched
    assert m["val_successfully_detected_rooms"] == pytest.approx(-1.0)


def test_duplicate_prediction_is_false_positive():
    """Two identical predictions of A: the lower-score one counts as FP."""
    n, labels, masks = make_scene()
    pred = pred_dict([np.arange(40), np.arange(40)], [0.9, 0.7], n)
    ev = Mask3DEvaluator()
    m = ev.evaluate([pred], [{"labels": labels, "masks": masks}], "val")
    # y_true=[1,0] (A matched at 0.9, duplicate FP at 0.7), hard FN for B.
    assert m["val_mean_ap_50"] == pytest.approx(0.5)
    # Pointwise: the duplicate is fully overwritten by the higher-score mask,
    # so only ONE pred instance survives pointwise conversion -> P=1, R=0.5.
    assert m["val_mean_precision_50"] == pytest.approx(1.0)
    assert m["val_mean_recall_50"] == pytest.approx(0.5)


def test_void_points_do_not_penalize():
    """A prediction mostly on void (background) points is not an FP in AP."""
    n, labels, masks = make_scene()
    # Highest-scored pred: 20 void points + 5 points of A ->
    # proportion_ignore = 0.8, ignored at thresholds < 0.8.
    cols = [np.concatenate([np.arange(80, 100), np.arange(5)]),
            np.arange(40), np.arange(40, 80)]
    pred = pred_dict(cols, [0.9, 0.85, 0.8], n)
    ev = Mask3DEvaluator()
    m = ev.evaluate([pred], [{"labels": labels, "masks": masks}], "val")
    # Thresholds 0.5..0.75 (6 of them): void pred ignored -> AP 1. At
    # thr 0.8, 0.85, 0.9 it becomes a top-scored FP -> AP 5/12
    # (hand-executed PR integration of y=[1@.85, 1@.8, 0@.9]).
    assert m["val_mean_ap_50"] == pytest.approx(1.0)
    assert m["val_mean_ap_25"] == pytest.approx(1.0)
    assert m["val_mean_ap"] == pytest.approx((6 * 1.0 + 3 * 5 / 12) / 9)


def test_batch_of_two_items():
    n, labels, masks = make_scene()
    p1 = pred_dict([np.arange(40), np.arange(40, 80)], [0.9, 0.8], n)
    p2 = pred_dict([np.arange(40)], [0.7], n)
    ev = Mask3DEvaluator()
    m = ev.evaluate(
        [p1, p2],
        [{"labels": labels, "masks": masks}] * 2,
        "test",
    )
    # 3 TPs of 4 gt instances; 0 FPs.
    assert m["test_mean_precision_50"] == pytest.approx(1.0)
    assert m["test_mean_recall_50"] == pytest.approx(0.75)
    assert m["test_successfully_detected_rooms"] == pytest.approx(-0.5)


def test_best_worst_scene_tracking():
    n, labels, masks = make_scene()
    ev = Mask3DEvaluator(debug_best_worst_scenes=True)
    good = pred_dict([np.arange(40), np.arange(40, 80)], [0.9, 0.8], n)
    good["scene"] = "good"
    bad = pred_dict([], [], n)
    bad["scene"] = "bad"
    ev.evaluate([good], [{"labels": labels, "masks": masks}], "test")
    ev.evaluate([bad], [{"labels": labels, "masks": masks}], "test")
    hi, lo = ev.get_highest_lowest_metric_scenes("mean_ap", 1)
    assert hi[0][0] == "good" and lo[0][0] == "bad"
