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
        return pts[keep], feats[keep], labels[keep]

    return fn


class Compose:
    def __init__(self, transforms: List[Transform],
                 seed: Optional[int] = None):
        self.transforms = transforms
        self.rng = np.random.default_rng(seed)

    def __call__(self, points, features, labels):
        for p, fn in self.transforms:
            if self.rng.random() < p:
                points, features, labels = fn(
                    self.rng, points, features, labels
                )
        return {"points": points, "features": features, "labels": labels}


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
