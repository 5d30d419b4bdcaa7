"""Write a synthetic Structured3D-format dataset to disk.

Produces `<root>/scene_NNNNN/point_cloud_rasterized_<rf>.ply` artifacts
(fields x, y, z, type, room_id — exactly what
`Structured3DSegmentationDataset.load` reads,
`mask3d_tpu/data/datasets.py:112-118`; reference artifact contract:
`mask3d/datasets/semseg_structured3d.py` + preprocessing output) so the
SHIPPED entry path — experiment launch scripts -> `python -m
mask3d_tpu.cli` -> trainer -> evaluator — can be driven end-to-end at
data scale without the (license-gated) Structured3D download.

Scene numbering follows the reference split rule
(`semseg_structured3d.py:137-146`): train scenes are numbered from 0
(< 3000), validation from 3000 (< 3250). The scene-shape mixture matches
the reference dataset statistics (BASELINE.md: 1-22 rooms/scene, avg
6.23) — same mixture as tools/train_rehearsal.py.

Usage:
    python tools/make_synthetic_dataset.py <root> [n_train] [n_val] [seed]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from mask3d_tpu.data import make_synthetic_scene
from mask3d_tpu.data.ply import write_ply

# (nx, ny, multi_floor) -> rooms = nx*ny*(2 if mf); mixture mean 6.22,
# range 1-18 (<= num_queries 25 with matcher slack).
CONFIGS = [
    ((1, 1, False), 0.10),   # 1 room
    ((2, 1, False), 0.16),   # 2
    ((2, 2, False), 0.22),   # 4
    ((3, 2, False), 0.22),   # 6
    ((2, 2, True), 0.12),    # 8
    ((3, 2, True), 0.10),    # 12
    ((3, 3, True), 0.06),    # 18
    ((4, 3, False), 0.02),   # 12
]


def make_item(rng):
    probs = np.array([w for _, w in CONFIGS])
    probs = probs / probs.sum()
    (nx, ny, mf) = CONFIGS[rng.choice(len(CONFIGS), p=probs)][0]
    rooms = nx * ny * (2 if mf else 1)
    # room_size varies so point counts span the dataset's range; cap
    # room-heavy scenes so every scene fits one point bucket.
    hi = min(45, 29 + int(17 * np.sqrt(8.0 / max(rooms, 8))))
    size = int(rng.integers(28, hi))
    return make_synthetic_scene(
        rng, num_rooms_x=nx, num_rooms_y=ny, room_size=size,
        height=14, jitter=0.3, dropout=0.25, multi_floor=mf,
    )


def write_scene(root, scene_name, item, rasterization_factor=150):
    d = os.path.join(root, scene_name)
    os.makedirs(d, exist_ok=True)
    coords = item["coordinates"].astype(np.float32)
    labels = item["labels"]
    write_ply(
        os.path.join(
            d, f"point_cloud_rasterized_{rasterization_factor}.ply"
        ),
        {
            "x": coords[:, 0], "y": coords[:, 1], "z": coords[:, 2],
            # semantic "type" (all is_room class 1 here) + instance id
            "type": labels[:, 0].astype(np.int32),
            "room_id": labels[:, 1].astype(np.int32),
        },
        text=False,
    )


def main(root, n_train=256, n_val=32, n_test=None, seed=0,
         rasterization_factor=150):
    if n_test is None:
        n_test = n_val
    rng = np.random.default_rng(seed)
    counts = []
    # split numbering per semseg_structured3d.py:137-146:
    # train < 3000 <= validation < 3250 <= test < 3500
    for base, n in ((0, n_train), (3000, n_val), (3250, n_test)):
        for i in range(n):
            item = make_item(rng)
            write_scene(root, f"scene_{base + i:05d}", item,
                        rasterization_factor)
            counts.append(len(item["coordinates"]))
    print(
        f"wrote {n_train} train + {n_val} val + {n_test} test scenes to "
        f"{root}; points/scene min/avg/max = {min(counts)}/"
        f"{int(np.mean(counts))}/{max(counts)}"
    )


if __name__ == "__main__":
    a = sys.argv[1:]
    main(
        a[0],
        int(a[1]) if len(a) > 1 else 256,
        int(a[2]) if len(a) > 2 else 32,
        int(a[3]) if len(a) > 3 else None,
        int(a[4]) if len(a) > 4 else 0,
    )
