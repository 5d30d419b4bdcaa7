"""Large-scene data point: `backbone_impl=gather_pallas` where dense can't run.

The dense-grid fast path materializes [B, Gx, Gy, Gz, C] activation grids;
for big scans those exceed one chip's HBM (docs/ARCHITECTURE.md "Known
limits"). This tool measures the advertised fallback — the windowed Pallas
gather-conv (`sparse/pallas_conv.py`) — on a synthetic scene built to that
regime, and the plain XLA gather formulation on the same scene for contrast.

Scene: a long open hall scan (floor + ceiling + two side walls + interior
clutter), ~5% cell occupancy. Surface-scan geometry with no wall
perpendicular to the x (key-major) axis, so per-offset neighbor windows stay
small and the Pallas window premise holds — the regime the kernel exists
for (the FLOP ledger in docs/ARCHITECTURE.md: the one-hot select wins below
~5-9% occupancy; flagship room scenes at ~10% stay on the dense path).

Run ON THE REAL CHIP: python tools/bench_large_scene.py
Prints grid size, the dense-path HBM arithmetic, and pts/s for both impls.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_hall_scene(rng, length=1920, width=160, height=64, n_boxes=260):
    """Open-hall surface scan: floor, ceiling, two y-side walls, clutter.

    No x-perpendicular wall: in x-major key order such a wall packs a full
    y*z cross-section of rows between the x-1 and x+1 neighbor slabs of
    every tile that touches it, blowing the static window. Real large
    scans of this shape (halls, corridors, terrain strips) are the
    gather_pallas use case; boxy multi-room buildings at dense-grid scale
    should shard the scene (sp) or crop instead.

    Clutter is CLUSTERED (furniture-like box surfaces), as in a real
    scan — a scanner sees object surfaces, not isolated voxels teleported
    uniformly through the air. (The pre-round-5 version drew uniform
    random cells; that unphysical distribution puts >= 1 point in ~every
    brick-sized region, which no spatial-decomposition executor — ours
    or any blocked-sparse GPU library — can exploit.)
    """
    xs = np.arange(length)
    ys = np.arange(width)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    gx, gy = gx.ravel(), gy.ravel()
    pts = [
        np.stack([gx, gy, np.zeros_like(gx)], 1),           # floor
        np.stack([gx, gy, np.full_like(gx, height - 1)], 1),  # ceiling
    ]
    zs = np.arange(height)
    wgx, wgz = np.meshgrid(xs, zs, indexing="ij")
    for wy in (0, width - 1):  # two side walls (parallel to x)
        pts.append(
            np.stack(
                [wgx.ravel(), np.full(wgx.size, wy), wgz.ravel()], 1
            )
        )
    # interior clutter: furniture-like boxes (top + 4 side surfaces)
    for _ in range(n_boxes):
        sx = int(rng.integers(6, 40))
        sy = int(rng.integers(6, 24))
        sz = int(rng.integers(4, 20))
        x0 = int(rng.integers(0, length - sx))
        y0 = int(rng.integers(1, width - 1 - sy))
        bx = np.arange(x0, x0 + sx)
        by = np.arange(y0, y0 + sy)
        bz = np.arange(1, 1 + sz)
        fx, fy = np.meshgrid(bx, by, indexing="ij")
        pts.append(np.stack(  # top face
            [fx.ravel(), fy.ravel(), np.full(fx.size, 1 + sz)], 1))
        wx, wz = np.meshgrid(bx, bz, indexing="ij")
        for yy in (y0, y0 + sy - 1):
            pts.append(np.stack(
                [wx.ravel(), np.full(wx.size, yy), wz.ravel()], 1))
        wy2, wz2 = np.meshgrid(by, bz, indexing="ij")
        for xx in (x0, x0 + sx - 1):
            pts.append(np.stack(
                [np.full(wy2.size, xx), wy2.ravel(), wz2.ravel()], 1))
    coords = np.concatenate(pts).astype(np.float32)
    coords += rng.normal(scale=0.3, size=coords.shape).astype(np.float32)
    # instance labels: x-segments (content irrelevant to the forward bench)
    seg = np.clip(coords[:, 0] // (length // 12), 0, 11).astype(np.int32)
    labels = np.stack([np.ones_like(seg), seg], 1)
    features = np.ones((len(coords), 1), np.float32)
    return {
        "coordinates": coords,
        "features": features,
        "labels": labels,
        "raw_coordinates": coords.copy(),
        "raw_features": features.copy(),
        "raw_labels": labels.copy(),
        "scene": "hall",
        "idx": 0,
    }


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mask3d_tpu.config import Config, apply_overrides
    from mask3d_tpu.data import VoxelizeCollate
    from mask3d_tpu.sparse import build_sparse_batch
    from mask3d_tpu.train.loop import _sb_kwargs, init_state, level_capacities

    rng = np.random.default_rng(0)
    item = make_hall_scene(rng)
    collate = VoxelizeCollate(point_bucket_multiple=65536)
    host = collate([item])
    batch = host.device
    n_cap = batch.coords.shape[1]
    gd0 = batch.grid_dims[0]
    cells = gd0[0] * gd0[1] * gd0[2]
    n_rows = int(np.asarray(batch.counts).sum())
    # Dense-path HBM arithmetic: each stride-1 96-ch bf16 activation grid
    # is cells*96*2 bytes; the forward keeps >= 4 such grids live (conv
    # in/out + two skip tensors) plus the 32-ch stem and f32 norm stats.
    grid_gb = cells * 96 * 2 / 1e9
    print(
        f"scene: {n_rows} pts, grid {gd0} = {cells/1e6:.1f}M cells "
        f"(occupancy {n_rows/cells:.3f}); one 96-ch bf16 dense grid = "
        f"{grid_gb:.2f} GB -> >= {4*grid_gb:.1f} GB live on the dense "
        f"path: exceeds the 15.75 GB chip. gather paths only.",
        flush=True,
    )

    # Brick geometry for the "bricked" variant: first brick shape that
    # divides the bucketed grid dims; capacity = occupied bricks + 15%.
    brick = next(
        bd for bd in ((32, 8, 8), (16, 16, 8), (16, 8, 8), (8, 8, 8))
        if all(int(g) % b == 0 for g, b in zip(gd0, bd))
    )
    c_np = np.asarray(batch.coords[0])[: int(np.asarray(batch.counts)[0])]
    bkeys = np.unique(
        (c_np[:, 0] // brick[0] * (int(gd0[1]) // brick[1])
         + c_np[:, 1] // brick[1]) * (int(gd0[2]) // brick[2])
        + c_np[:, 2] // brick[2]
    )
    nb = len(bkeys)
    brick_cap = -(-int(nb * 1.15) // 256) * 256
    bcells = nb * brick[0] * brick[1] * brick[2]
    print(
        f"bricks {brick}: {nb} occupied of "
        f"{cells // (brick[0]*brick[1]*brick[2])} slots -> {bcells/1e6:.1f}M "
        f"brick cells ({bcells/cells:.2f}x of dense; one 96-ch bf16 brick "
        f"tensor = {brick_cap * brick[0]*brick[1]*brick[2]*96*2/1e9:.2f} GB)",
        flush=True,
    )

    if "--dry" in sys.argv:  # host-side geometry check only (CPU-safe)
        return

    results = {}
    variants = (
        ("bricked", "per_offset"),
        ("gather_pallas", "per_offset"),
        ("gather_pallas+grouped_dx", "grouped_dx"),
        ("gather", "per_offset"),
    )
    for name, window_mode in variants:
        impl = name.split("+")[0]
        cfg = Config()
        apply_overrides(cfg, [
            "data.point_bucket_multiple=65536",
            "model.compute_dtype=bfloat16",
            f"model.backbone_impl={impl}",
            f"model.pallas_window_mode={window_mode}",
            f"model.brick_dims=[{brick[0]},{brick[1]},{brick[2]}]",
            f"model.brick_capacity={brick_cap}",
        ])
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
                grid_dims=batch.grid_dims, aux_masks=False,
            )
            return out.pred_class, out.pred_masks

        args = (
            state.params, state.buffers,
            jnp.asarray(batch.coords), jnp.asarray(batch.counts),
            jnp.asarray(batch.dims),
            jnp.ones(batch.coords.shape[:2] + (1,), jnp.float32),
        )
        t0 = time.perf_counter()
        _ = jax.device_get(infer(*args)[0])  # compile + warm
        print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s",
              flush=True)
        # Amortized honest timing: N dispatches, one device_get fence
        # (per-call timings carry +/-100 ms of tunnel RPC noise, CLAUDE.md).
        reps = 4
        t0 = time.perf_counter()
        outs = [infer(*args) for _ in range(reps)]
        _ = jax.device_get(outs[-1][0])
        dt = (time.perf_counter() - t0) / reps
        pps = n_rows / dt
        results[name] = (dt, pps)
        print(f"{name}: {dt*1e3:.0f} ms/forward = {pps/1e6:.3f}M pts/s",
              flush=True)

    dt_b, pps_b = results["bricked"]
    dt_p, pps_p = results["gather_pallas"]
    dt_g, pps_g = results["gather_pallas+grouped_dx"]
    dt_x, pps_x = results["gather"]
    print(
        f"RESULT large-scene ({n_rows} pts, {cells/1e6:.1f}M cells): "
        f"bricked {pps_b/1e6:.3f}M | "
        f"gather_pallas {pps_p/1e6:.3f}M (grouped_dx {pps_g/1e6:.3f}M) "
        f"vs XLA gather {pps_x/1e6:.3f}M pts/s "
        f"(bricked {dt_x/dt_b:.2f}x of gather)",
        flush=True,
    )


if __name__ == "__main__":
    main()
