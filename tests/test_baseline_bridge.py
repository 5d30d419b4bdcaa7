"""RoomFormer bridge tests: polygon predictions scored by the evaluator."""

import numpy as np
import pytest

from mask3d_tpu.baseline import (
    density_normalization,
    points_to_density_map,
    polygons_to_mask3d_prediction,
)
from mask3d_tpu.baseline.roomformer_bridge import (
    evaluate_roomformer_scene,
    map_points_to_density,
)
from mask3d_tpu.evalm import Mask3DEvaluator


def two_room_scene(n_per_room=400, seed=0):
    """Two rooms side by side in world coordinates (mm)."""
    rng = np.random.default_rng(seed)
    r1 = np.stack(
        [rng.uniform(0, 5000, n_per_room), rng.uniform(0, 5000, n_per_room),
         rng.uniform(0, 2800, n_per_room)], axis=1
    )
    r2 = np.stack(
        [rng.uniform(6000, 11000, n_per_room),
         rng.uniform(0, 5000, n_per_room),
         rng.uniform(0, 2800, n_per_room)], axis=1
    )
    coords = np.concatenate([r1, r2])
    labels = np.stack(
        [np.ones(2 * n_per_room, np.int32),
         np.concatenate([np.ones(n_per_room, np.int32),
                         np.full(n_per_room, 2, np.int32)])],
        axis=1,
    )
    return {
        "coordinates": coords,
        "labels": labels,
        "scene": "scene_00001",
    }


def room_polygon_in_density(coords, xy_min, xy_max):
    """World-frame rectangle -> density-frame polygon."""
    norm = density_normalization(coords)
    corners = np.array(
        [
            [xy_min[0], xy_min[1], 0],
            [xy_max[0], xy_min[1], 0],
            [xy_max[0], xy_max[1], 0],
            [xy_min[0], xy_max[1], 0],
        ],
        np.float64,
    )
    return map_points_to_density(corners, norm).astype(np.float64)


def test_density_map():
    item = two_room_scene()
    img = points_to_density_map(item["coordinates"])
    assert img.shape == (256, 256)
    assert img.max() == 1.0
    assert (img > 0).sum() > 100


def test_perfect_polygons_score_perfectly():
    item = two_room_scene()
    coords = item["coordinates"]
    polys = [
        room_polygon_in_density(coords, (-100, -100), (5100, 5100)),
        room_polygon_in_density(coords, (5900, -100), (11100, 5100)),
    ]
    m = evaluate_roomformer_scene(
        item, polys, Mask3DEvaluator(), log_prefix="test"
    )
    assert m["test_mean_ap_50"] == pytest.approx(1.0)
    assert m["test_mean_recall_50"] == pytest.approx(1.0)
    assert m["test_successfully_detected_rooms"] == pytest.approx(0.0)


def test_one_missing_room():
    item = two_room_scene()
    coords = item["coordinates"]
    polys = [room_polygon_in_density(coords, (-100, -100), (5100, 5100))]
    m = evaluate_roomformer_scene(
        item, polys, Mask3DEvaluator(), log_prefix="test"
    )
    assert m["test_mean_recall_50"] == pytest.approx(0.5)
    assert m["test_mean_precision_50"] == pytest.approx(1.0)
    assert m["test_successfully_detected_rooms"] == pytest.approx(-1.0)


def test_prediction_dict_shape():
    item = two_room_scene()
    pred = polygons_to_mask3d_prediction(
        item["coordinates"],
        [np.array([[10, 10], [50, 10], [50, 50], [10, 50]], float)],
        "s",
    )
    assert pred["pred_masks"].shape == (len(item["coordinates"]), 1)
    assert pred["pred_scores"].tolist() == [1.0]
    assert pred["pred_classes"].tolist() == [1]


def test_export_scene_las(tmp_path):
    """`--export_las` path: one gt+prediction .las per scene (reference
    RoomFormer/engine.py:391-404), readable back with the same dims."""
    from mask3d_tpu.baseline.engine import FloorplanTrainer
    from mask3d_tpu.data.las import read_las

    item = two_room_scene()
    item["features"] = np.ones((len(item["coordinates"]), 1), np.float32)
    polys = [
        room_polygon_in_density(item["coordinates"], (0, 0), (5000, 5000)),
        room_polygon_in_density(item["coordinates"], (6000, 0),
                                (11000, 5000)),
    ]
    las_dir = str(tmp_path / "las")
    FloorplanTrainer._export_scene_las(None, item, polys, las_dir)
    import os

    path = os.path.join(las_dir, "test_scene_00001.las")
    assert os.path.exists(path)
    out = read_las(path)
    assert len(out["xyz"]) == len(item["coordinates"])
    for dim in ("class", "class_pred", "instance", "instance_pred",
                "score_pred"):
        assert dim in out, out.keys()
