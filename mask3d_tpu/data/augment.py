"""Point-cloud augmentations (volumentations replacement).

The reference drives `volumentations` from YAML configs
(`mask3d/conf/augmentation/volumentations_aug_stru3d.yaml` etc., loaded at
`mask3d/datasets/semseg_structured3d.py:69`). The library is tiny for the
subset used; this module re-implements exactly those transforms:

- stru3d preset: Scale3d +-0.1 p=0.5; RotateAroundAxis3d z +-pi p=0.5;
  y +-pi/24 p=0.5; x +-pi/24 p=0.5
- s3dis / matterport3d presets: RandomDropout3d 0.1 p=0.5; Scale3d +-0.3
  p=0.75; rotate z +-pi p=0.75; y +-pi/12 p=0.5; x +-pi/12 p=0.5
  (`volumentations_aug_s3dis.yaml`, `volumentations_aug_matterport3d.yaml`)

Rotations are about the cloud centroid (the downstream pipeline is
translation invariant: voxelization re-shifts to non-negative and the PE
normalizes per-item min/max).
"""

from __future__ import annotations

import math
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

Transform = Tuple[float, Callable]  # (probability, fn(rng, pts, feats, labels))


def scale3d(limits: Sequence[Tuple[float, float]]):
    def fn(rng, pts, feats, labels):
        s = np.array(
            [1.0 + rng.uniform(lo, hi) for lo, hi in limits], np.float32
        )
        return pts * s, feats, labels

    return fn


def rotate_around_axis(axis: Sequence[float], limit: Tuple[float, float]):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)

    def fn(rng, pts, feats, labels):
        theta = rng.uniform(*limit)
        k = axis
        kx, ky, kz = k
        ct, st = math.cos(theta), math.sin(theta)
        K = np.array([[0, -kz, ky], [kz, 0, -kx], [-ky, kx, 0]])
        R = np.eye(3) + st * K + (1 - ct) * (K @ K)
        center = pts.mean(axis=0, keepdims=True)
        return ((pts - center) @ R.T + center).astype(pts.dtype), feats, labels

    return fn


def random_dropout(ratio: float):
    def fn(rng, pts, feats, labels):
        keep = rng.random(len(pts)) >= ratio
        if not keep.any():
            return pts, feats, labels
        # 4th element: keep-mask so callers can subset parallel arrays
        # (raw_coordinates etc.) consistently — volumentations keeps all
        # arrays aligned by transforming them together; here Compose
        # threads the cumulative kept-row indices instead.
        return pts[keep], feats[keep], labels[keep], keep

    return fn


class Compose:
    def __init__(self, transforms: List[Transform],
                 seed: Optional[int] = None):
        self.transforms = transforms
        self.rng = np.random.default_rng(seed)

    def __call__(self, points, features, labels):
        kept = np.arange(len(points))
        for p, fn in self.transforms:
            if self.rng.random() < p:
                out = fn(self.rng, points, features, labels)
                if len(out) == 4:  # row-dropping transform: cumulate keep
                    points, features, labels, keep = out
                    kept = kept[keep]
                else:
                    points, features, labels = out
        return {
            "points": points,
            "features": features,
            "labels": labels,
            "kept_indices": kept,
        }


PI = math.pi


def make_augmentation(name: Optional[str], seed: Optional[int] = None
                      ) -> Optional[Compose]:
    if name in (None, "none", ""):
        return None
    if name == "stru3d":
        return Compose(
            [
                (0.5, scale3d([(-0.1, 0.1)] * 3)),
                (0.5, rotate_around_axis((0, 0, 1), (-PI, PI))),
                (0.5, rotate_around_axis((0, 1, 0), (-PI / 24, PI / 24))),
                (0.5, rotate_around_axis((1, 0, 0), (-PI / 24, PI / 24))),
            ],
            seed,
        )
    if name in ("s3dis", "matterport3d"):
        return Compose(
            [
                (0.5, random_dropout(0.1)),
                (0.75, scale3d([(-0.3, 0.3)] * 3)),
                (0.75, rotate_around_axis((0, 0, 1), (-PI, PI))),
                (0.5, rotate_around_axis((0, 1, 0), (-PI / 12, PI / 12))),
                (0.5, rotate_around_axis((1, 0, 0), (-PI / 12, PI / 12))),
            ],
            seed,
        )
    raise ValueError(f"unknown augmentation preset: {name}")


def make_crops(items, rng: Optional[np.random.Generator] = None):
    """Quadrant crops of each scene (reference `make_crops`,
    `mask3d/datasets/utils.py:332-383`, enabled by the latent
    `small_crops`/`very_small_crops` collation options): center the cloud,
    add one guard point per quadrant, emit the four xy-quadrants re-centered.
    """
    out = []
    for item in items:
        pts = np.asarray(item["coordinates"], np.float32).copy()
        feats = np.asarray(item["features"]).copy()
        labels = np.asarray(item["labels"]).copy()
        pts -= pts.mean(0)
        guards = np.array(
            [[0.1, 0.1, 0.1], [0.1, -0.1, 0.1],
             [-0.1, 0.1, 0.1], [-0.1, -0.1, 0.1]], np.float32
        )
        pts = np.vstack([pts, guards])
        feats = np.vstack([feats, np.zeros((4, feats.shape[1]), feats.dtype)])
        labels = np.vstack(
            [labels, np.full((4, labels.shape[1]), 255, labels.dtype)]
        )
        for sx, sy in ((1, 1), (1, -1), (-1, 1), (-1, -1)):
            sel = (pts[:, 0] * sx > 0) & (pts[:, 1] * sy > 0)
            if sel.sum() <= 1:
                continue
            crop_pts = pts[sel] - pts[sel].mean(0)
            out.append(
                {
                    **item,
                    "coordinates": crop_pts,
                    "features": feats[sel],
                    "labels": labels[sel],
                    "raw_coordinates": crop_pts.copy(),
                    "raw_features": feats[sel].copy(),
                    "raw_labels": labels[sel].copy(),
                }
            )
    return out


def random_cuboid_crop(rng, points, features, labels, min_points: int = 30000,
                       aspect: float = 0.8, min_crop: float = 0.5,
                       max_crop: float = 1.0, max_tries: int = 100):
    """RandomCuboid crop (reference `mask3d/datasets/random_cuboid.py:17-96`,
    latent behind the `cropping` config): sample an axis-aligned xy cuboid of
    random relative size with bounded aspect ratio; keep the crop if enough
    points survive, else return the input unchanged."""
    span = points.max(0) - points.min(0)
    for _ in range(max_tries):
        crop = min_crop + rng.random(3) * (max_crop - min_crop)
        if crop[0] / crop[1] < aspect or crop[1] / crop[0] < aspect:
            continue
        size = span * crop
        lo = points.min(0) + rng.random(3) * (span - size)
        hi = lo + size
        sel = np.all((points[:, :3] >= lo) & (points[:, :3] <= hi), axis=1)
        if sel.sum() >= min_points or sel.sum() == len(points):
            return points[sel], features[sel], labels[sel]
    return points, features, labels
