"""Profile the host collation pipeline phase-by-phase (1-core host).

Collation runs on feeder threads overlapped with device compute; on this
1-core host its total cost bounds the pipeline lead (bench starve time).
No jax import — pure host work.

Usage: python tools/profile_collate.py [reps]
"""

import sys
import time

import numpy as np

from mask3d_tpu.data import VoxelizeCollate, make_synthetic_scene
from mask3d_tpu.data.collate import build_item_target, voxelize_item
from mask3d_tpu.data.transfer import encode_batch_u8


def main(reps: int = 8, batch_size: int = 8):
    r = np.random.default_rng(0)
    items = [
        make_synthetic_scene(
            r, num_rooms_x=3, num_rooms_y=2, room_size=36, height=18,
            jitter=0.3, dropout=0.2, multi_floor=True,
        )
        for _ in range(batch_size)
    ]
    collate = VoxelizeCollate(point_bucket_multiple=65536)

    # Warm caches / imports.
    host = collate(items)
    print(f"n_cap={host.device.coords.shape[1]} "
          f"counts={host.device.counts.tolist()}")

    def bench(name, fn):
        t = time.perf_counter()
        for _ in range(reps):
            out = fn()
        dt = (time.perf_counter() - t) / reps * 1e3
        print(f"{name:<28s} {dt:8.2f} ms/batch")
        return out

    bench("collate total", lambda: collate(items))

    # Phase splits (per batch of 8 items)
    def vox_all():
        return [voxelize_item(it["coordinates"]) for it in items]

    voxed = bench("  voxelize_item x8", vox_all)

    keeps = [k for _, k, _ in voxed]
    labelss = [
        np.asarray(it["labels"])[k].astype(np.int32)
        for it, k in zip(items, keeps)
    ]

    def gather_all():
        out = []
        for it, k in zip(items, keeps):
            out.append((
                np.asarray(it["labels"])[k].astype(np.int32),
                np.asarray(it["features"])[k].astype(np.float32),
                np.asarray(it["raw_coordinates"])[k],
                np.asarray(it["raw_features"])[k],
                np.asarray(it["raw_labels"])[k],
            ))
        return out

    bench("  keep-gather x8", gather_all)

    def targets_all():
        return [
            build_item_target(lb, (), (-1, 0)) for lb in labelss
        ]

    bench("  build_item_target x8", targets_all)

    dev = host.device
    bench("  encode_batch_u8",
          lambda: encode_batch_u8(np.asarray(dev.coords), dev.counts,
                                  dev.dims))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
