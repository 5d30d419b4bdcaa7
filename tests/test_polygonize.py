"""Oracle tests for the numpy mask->polygon extraction (R5).

Reference protocol: `RoomFormer/s3d_floorplan_eval/Evaluator/Evaluator.py:
25-60` (cv2 findContours + approxPolyDP + fillPoly). Oracles here are
synthetic rectilinear rooms whose true corner polygons are known exactly.
"""

import numpy as np
import pytest

from mask3d_tpu.baseline.polygonize import (
    approx_poly_dp,
    arc_length,
    contour_area,
    fill_polygon,
    polygonize_mask,
    trace_outer_contour,
)


def rect_mask(h, w, y0, y1, x0, x1):
    m = np.zeros((h, w), np.uint8)
    m[y0:y1, x0:x1] = 1
    return m


def corners_match(poly, expected, tol=1.5):
    """Every expected corner has a polygon vertex within `tol` px and the
    counts agree (cyclic order/orientation free)."""
    poly = np.asarray(poly, np.float64)
    expected = np.asarray(expected, np.float64)
    assert len(poly) == len(expected), (poly, expected)
    d = np.linalg.norm(poly[None] - expected[:, None], axis=-1).min(axis=1)
    assert d.max() <= tol, (poly, expected, d)


def test_rectangle_polygonizes_to_four_corners():
    m = rect_mask(64, 64, 10, 40, 5, 50)
    poly, filled = polygonize_mask(m, degree=0.01)
    # boundary pixels: x in [5, 49], y in [10, 39]
    corners_match(poly, [(5, 10), (49, 10), (49, 39), (5, 39)])
    # refilled map reproduces the mask (IoU ~= 1 up to boundary rounding)
    inter = float(np.logical_and(filled > 0, m > 0).sum())
    union = float(np.logical_or(filled > 0, m > 0).sum())
    assert inter / union > 0.95, inter / union


def test_l_shape_polygonizes_to_six_corners():
    m = np.zeros((64, 64), np.uint8)
    m[10:50, 10:30] = 1
    m[10:30, 10:50] = 1
    poly, filled = polygonize_mask(m, degree=0.01)
    corners_match(
        poly,
        [(10, 10), (49, 10), (49, 29), (29, 29), (29, 49), (10, 49)],
    )
    inter = float(np.logical_and(filled > 0, m > 0).sum())
    union = float(np.logical_or(filled > 0, m > 0).sum())
    assert inter / union > 0.95, inter / union


def test_largest_component_wins():
    # Two disjoint rooms: the polygon must come from the bigger one
    # (reference keeps the max-area contour, Evaluator.py:37-43).
    m = rect_mask(64, 64, 2, 8, 2, 8)
    m[20:60, 20:60] = 1
    poly, _ = polygonize_mask(m, degree=0.01)
    corners_match(poly, [(20, 20), (59, 20), (59, 59), (20, 59)])


def test_empty_and_single_pixel():
    poly, filled = polygonize_mask(np.zeros((16, 16), np.uint8))
    assert poly.shape == (0, 2) and filled.sum() == 0
    m = np.zeros((16, 16), np.uint8)
    m[5, 7] = 1
    poly, filled = polygonize_mask(m)
    assert len(poly) >= 1
    assert tuple(poly[0]) == (7, 5)


def test_trace_covers_all_border_pixels():
    # CHAIN_APPROX_NONE parity: the chain visits every border pixel of a
    # filled rectangle exactly once (perimeter pixel count).
    m = rect_mask(32, 32, 4, 14, 6, 20)  # 10 x 14 pixel block
    chain = trace_outer_contour(m)
    hsz, wsz = 10, 14
    expected = 2 * (hsz + wsz) - 4
    assert len(chain) == expected, (len(chain), expected)
    assert len(set(map(tuple, chain))) == len(chain)
    # area/perimeter agree with the analytic values of the pixel-border
    # polygon (w-1) x (h-1)
    assert contour_area(chain) == pytest.approx((wsz - 1) * (hsz - 1))
    assert arc_length(chain) == pytest.approx(2 * (wsz - 1 + hsz - 1))


def test_dp_reduces_collinear_chain():
    # A noisy straight line simplifies to its endpoints.
    xs = np.arange(0, 50)
    pts = np.stack([xs, np.zeros_like(xs)], axis=1)
    out = approx_poly_dp(pts, eps=1.0)
    assert len(out) <= 3


def test_fill_polygon_rect():
    filled = fill_polygon(np.array([(5, 10), (49, 10), (49, 39), (5, 39)]),
                          64, 64)
    ref = np.zeros((64, 64), np.float32)
    ref[10:40, 5:50] = 1
    inter = float(np.logical_and(filled > 0, ref > 0).sum())
    union = float(np.logical_or(filled > 0, ref > 0).sum())
    assert inter / union > 0.95


def test_evaluator_from_masks_end_to_end():
    """Mask-in metric protocol: perfect rasterized predictions score
    room/corner/angle F1 == 1.0 on rectilinear rooms."""
    from mask3d_tpu.baseline.floorplan_eval import FloorplanEvaluator

    rooms = [
        np.array([(20, 20), (100, 20), (100, 80), (20, 80)]),
        np.array([(120, 30), (200, 30), (200, 90), (160, 90),
                  (160, 140), (120, 140)]),
    ]
    masks = [
        np.zeros((256, 256), np.uint8) for _ in rooms
    ]
    for m, p in zip(masks, rooms):
        from mask3d_tpu.baseline.polygonize import fill_polygon

        m[:] = fill_polygon(p, 256, 256).astype(np.uint8)
    ev = FloorplanEvaluator()
    ev.evaluate_scene_masks(masks, masks)
    out = ev.summarize()
    assert out["room_f1"] == 1.0, out
    assert out["corner_f1"] == 1.0, out
    assert out["angle_f1"] == 1.0, out


def test_diagonal_shape_stable():
    # Non-rectilinear blob: polygonize runs, fills, and the refill IoU is
    # reasonable (DP at 1% perimeter).
    yy, xx = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    m = ((np.abs(xx - 32) + np.abs(yy - 32)) < 20).astype(np.uint8)  # rhombus
    poly, filled = polygonize_mask(m, degree=0.01)
    assert 3 <= len(poly) <= 12
    inter = float(np.logical_and(filled > 0, m > 0).sum())
    union = float(np.logical_or(filled > 0, m > 0).sum())
    assert inter / union > 0.9, inter / union
