"""Benchmark: points/sec/chip for voxelize+infer on Structured3D-like scenes.

Measures the end-to-end inference pipeline of the flagship model (Mask3D +
Res16UNet34C, reference config `mask3d/conf/model/mask3d.yaml`): host
voxelizing collation -> device sparse-context build + full eval forward.
This matches the reference's runtime measurement contract (per-item split
timings over data prep + forward, `mask3d/utils/measure_runtime.py`,
`mask3d/trainer/trainer.py:271-295`).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "points/sec/chip", "vs_baseline": N}

`vs_baseline` is relative to an ESTIMATED reference-pipeline throughput of
1.0e6 points/sec on A100 (the reference publishes no numbers —
`BASELINE.md`; this anchor is a single-GPU ME-pipeline estimate for ~50k
-voxel scenes and is held fixed across rounds so the ratio is comparable).
"""

import json
import time

import numpy as np


BASELINE_POINTS_PER_SEC = 1.0e6  # estimated A100 reference pipeline


def main(batch_size: int = 8):
    import jax
    import jax.numpy as jnp

    from mask3d_tpu.config import Config, apply_overrides
    from mask3d_tpu.data import VoxelizeCollate, make_synthetic_scene
    from mask3d_tpu.sparse import build_sparse_batch
    from mask3d_tpu.train.loop import _sb_kwargs, init_state, level_capacities

    cfg = Config()  # full-size flagship (hidden 128, Q 25, Res16UNet34C)
    apply_overrides(cfg, ["data.point_bucket_multiple=65536"])

    # Scenes sized like Structured3D at rasterization 150mm (~50k voxels).
    rng = np.random.default_rng(0)
    items = [
        make_synthetic_scene(
            rng, num_rooms_x=3, num_rooms_y=2, room_size=36, height=18,
            jitter=0.3, dropout=0.2, multi_floor=True,
        )
        for _ in range(batch_size)
    ]
    collate = VoxelizeCollate(point_bucket_multiple=65536)

    t0 = time.perf_counter()
    host = collate(items)
    collate_time = time.perf_counter() - t0
    batch = host.device
    n_points = int(np.asarray(batch.counts).sum())

    state, model, _, _ = init_state(cfg, batch)

    @jax.jit
    def infer(params, buffers, coords, counts, dims, feats):
        sb = build_sparse_batch(
            coords, counts, dims,
            level_capacities(cfg, coords.shape[1]),
            **_sb_kwargs(cfg, batch.grid_dims),
        )
        out = model.apply(
            {"params": params, "buffers": buffers},
            sb, feats, coords.astype(jnp.float32), True,
            grid_dims=batch.grid_dims,
        )
        return out.pred_class, out.pred_masks

    args = (state.params, state.buffers, batch.coords, batch.counts,
            batch.dims, batch.feats)

    # Warmup / compile. NOTE: timing fences use jax.device_get of a small
    # output slice — on remote-tunnel backends `block_until_ready` has been
    # observed to return before device execution finishes, which silently
    # inflates throughput numbers.
    _ = jax.device_get(infer(*args)[0])

    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        res = infer(*args)
        _ = jax.device_get(res[0])
    infer_time = (time.perf_counter() - t0) / iters

    # Voxelize+infer throughput: host collate amortized once per batch.
    total_time = infer_time + collate_time
    pps = n_points / total_time
    print(
        json.dumps(
            {
                "metric": "points/sec/chip (voxelize+infer, Structured3D-like"
                          f" {n_points} pts, batch {batch_size},"
                          " Mask3D+Res16UNet34C)",
                "value": round(pps, 1),
                "unit": "points/sec",
                "vs_baseline": round(pps / BASELINE_POINTS_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    import sys

    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
