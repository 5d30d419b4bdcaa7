"""Micro-bench: Mosaic `tpu.dynamic_gather` vs the one-hot select matmul.

Decides the windowed sparse-conv kernel's selection mechanism
(`sparse/pallas_conv.py`): per (tile, offset) the kernel must realize
`window[loc[t]]` for T output rows from a [W, Cin] VMEM window. The
shipped kernel does it as an MXU one-hot matmul `[T, W] @ [W, C]` whose
FLOPs (W/Cout x the weight matmul) are exactly why the sparse path loses
to dense at ~9% occupancy (docs/ARCHITECTURE.md FLOP ledger). Mosaic's
`tpu.dynamic_gather` (reached via `jnp.take_along_axis` with
operand-batched dims, jax/_src/pallas/mosaic/lowering.py:_gather_lowering
_rule) is a VPU gather with NO MXU work — if it sustains sublane spans of
W=512..2048 on v5e, sparse conv drops to true sparse FLOPs (~11x less
than dense at flagship occupancy).

Timing is amortized (N back-to-back dispatches, ONE device_get fence —
per-call timings carry +/-100 ms of tunnel RPC noise, CLAUDE.md).

Run ON THE REAL CHIP (ambient env): python tools/bench_dynamic_gather.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update(
        "jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu"
    )
    print("devices:", jax.devices())
    C = 128
    REPS = 64  # gathers per kernel call (amortize pallas_call overhead)

    def gather_kernel(idx_ref, x_ref, o_ref):
        w = x_ref.shape[0]
        acc = jnp.zeros_like(o_ref)
        for r in range(REPS):
            idx = jnp.broadcast_to(
                (idx_ref[...] + r) % w, (w, C)
            )
            acc = acc + jnp.take_along_axis(x_ref[...], idx, axis=0)
        o_ref[...] = acc

    def onehot_kernel(idx_ref, x_ref, o_ref):
        w = x_ref.shape[0]
        col = jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)
        acc = jnp.zeros((w, C), jnp.float32)
        for r in range(REPS):
            loc = (idx_ref[...] + r) % w  # [w, 1]
            sel = (col == loc).astype(jnp.bfloat16)
            acc = acc + jnp.dot(
                sel, x_ref[...], preferred_element_type=jnp.float32
            )
        o_ref[...] = acc.astype(o_ref.dtype)

    def run(name, kernel, w, out_dtype=jnp.bfloat16):
        @jax.jit
        def f(idx, x):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((w, C), out_dtype),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                interpret=jax.default_backend() != "tpu",
            )(idx, x)

        rng = np.random.default_rng(0)
        idx = jnp.asarray(rng.integers(0, w, (w, 1)), jnp.int32)
        x = jnp.asarray(rng.normal(size=(w, C)), jnp.bfloat16)
        try:
            out = f(idx, x)
            got = np.asarray(jax.device_get(out), np.float32)
        except Exception as e:
            print(f"{name:24s} W={w:5d}: COMPILE/RUN FAILED: "
                  f"{type(e).__name__}: {str(e)[:200]}")
            return
        # correctness: sum over REPS shifted gathers
        xi = np.asarray(x, np.float32)
        ref = np.zeros((w, C), np.float32)
        for r in range(REPS):
            ref += xi[(np.asarray(idx)[:, 0] + r) % w]
        err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-6)
        n_timed = 30
        t0 = time.perf_counter()
        for _ in range(n_timed):
            out = f(idx, x)
        _ = jax.device_get(out)  # single fence
        dt = (time.perf_counter() - t0) / (n_timed * REPS)
        rows_per_s = w / dt
        print(f"{name:24s} W={w:5d}: {dt*1e6:8.2f} us/gather "
              f"({rows_per_s/1e6:8.1f} M rows/s)  rel_err={err:.2e}")

    for w in (256, 512, 1024, 2048):
        run("dynamic_gather", gather_kernel, w)
    for w in (256, 512, 1024):
        run("onehot_matmul", onehot_kernel, w)

    # XLA take_along_axis baseline at matching total work
    for w in (512, 1024):
        rng = np.random.default_rng(0)
        idx = jnp.asarray(rng.integers(0, w, (REPS, w)), jnp.int32)
        x = jnp.asarray(rng.normal(size=(w, C)), jnp.bfloat16)

        @jax.jit
        def g(idx, x):
            return jnp.take_along_axis(
                x[None], idx[..., None], axis=1
            ).sum(0)

        out = jax.device_get(g(idx, x))
        n_timed = 30
        t0 = time.perf_counter()
        for _ in range(n_timed):
            out = g(idx, x)
        _ = jax.device_get(out)
        dt = (time.perf_counter() - t0) / (n_timed * REPS)
        print(f"{'xla_gather':24s} W={w:5d}: {dt*1e6:8.2f} us/gather "
              f"({w/dt/1e6:8.1f} M rows/s)")


def conv_ab():
    """Full windowed-conv A/B at flagship level-0 shape: select=onehot vs
    select=gather vs the XLA gather formulation. Mirrors the realistic
    surface-scene batch the 4.0x onehot number was measured on."""
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu"
    )
    from mask3d_tpu.sparse import build_sparse_batch
    from mask3d_tpu.sparse.ops import sparse_conv
    from mask3d_tpu.sparse.pallas_conv import sparse_conv_pallas

    B, NCAP = 8, 65536
    DIMS = (160, 160, 40)
    rng = np.random.default_rng(0)
    coords = np.zeros((B, NCAP, 3), np.int32)
    counts = np.zeros(B, np.int32)
    for b in range(B):
        # surface-like: floor/ceiling slabs + wall sheets (monotone-window
        # friendly like real scenes, unlike uniform noise)
        pts = []
        for z in (0, DIMS[2] - 1):
            xy = rng.integers(0, DIMS[0], (12000, 2))
            pts.append(np.concatenate(
                [xy, np.full((len(xy), 1), z)], axis=1))
        for x in rng.integers(0, DIMS[0], 12):
            yz = np.stack(np.meshgrid(
                np.arange(DIMS[1]), np.arange(DIMS[2]),
                indexing="ij"), -1).reshape(-1, 2)
            yz = yz[rng.random(len(yz)) < 0.5]
            pts.append(np.concatenate(
                [np.full((len(yz), 1), x), yz], axis=1))
        pts = np.unique(np.concatenate(pts).astype(np.int32), axis=0)
        if len(pts) > NCAP - 64:
            pts = pts[rng.choice(len(pts), NCAP - 64, replace=False)]
        key = (pts[:, 0] * DIMS[1] + pts[:, 1]) * DIMS[2] + pts[:, 2]
        pts = pts[np.argsort(key)]
        coords[b, : len(pts)] = pts
        counts[b] = len(pts)
    dims_arr = np.tile(np.array(DIMS, np.int32), (B, 1))
    sb = build_sparse_batch(
        coords, counts, dims_arr,
        level_capacities=[32768, 16384, 8192, 4096],
        conv1_kernel_size=3,
    )
    level = sb.levels[0]
    idx, ok = sb.nbr_idx[0], sb.nbr_ok[0]
    cin = cout = 96
    feats = jnp.asarray(
        rng.normal(size=(B, NCAP, cin)), jnp.bfloat16)
    feats = jnp.where(level.valid[..., None], feats, 0)
    w = jnp.asarray(rng.normal(size=(27, cin, cout)) * 0.1, jnp.float32)
    print(f"rows/item: {counts.tolist()}")

    # Report whether each config's window premise holds (else the timing
    # below measures the XLA fallback, not the kernel).
    idx_h, ok_h = np.asarray(idx), np.asarray(ok)
    for tile, window, grouped in (
        (256, 1024, False), (256, 1024, True), (256, 2048, True)
    ):
        nt = NCAP // tile
        it = idx_h.reshape(B, nt, tile, 27)
        ot = ok_h.reshape(B, nt, tile, 27)
        masked = np.where(ot, it, NCAP - 1)
        bases = np.maximum(
            np.minimum(masked.min(axis=2), NCAP - window), 0)
        if grouped:
            bases = np.minimum(
                bases.reshape(B, nt, 3, 9).min(axis=3), NCAP - window)
            bases = np.repeat(bases, 9, axis=2)
        per = (np.maximum(bases, 0) & ~15)[:, :, None, :]
        hit = bool(np.where(ot, it - per < window, True).all())
        print(f"premise tile={tile} W={window} grouped={grouped}: "
              f"hit={hit}")

    variants = {
        "pallas_onehot": jax.jit(lambda f, w: sparse_conv_pallas(
            f, w, idx, ok, 256, 1024, "onehot")),
        "pallas_gather": jax.jit(lambda f, w: sparse_conv_pallas(
            f, w, idx, ok, 256, 1024, "gather")),
        "grp_onehot_w1024": jax.jit(lambda f, w: sparse_conv_pallas(
            f, w, idx, ok, 256, 1024, "onehot", "grouped_dx")),
        "grp_gather_w1024": jax.jit(lambda f, w: sparse_conv_pallas(
            f, w, idx, ok, 256, 1024, "gather", "grouped_dx")),
        "grp_gather_w2048": jax.jit(lambda f, w: sparse_conv_pallas(
            f, w, idx, ok, 256, 2048, "gather", "grouped_dx")),
        "xla_gather": jax.jit(lambda f, w: sparse_conv(
            f, w, idx, ok, compute_dtype=jnp.bfloat16)),
    }
    ref = None
    for name, fn in variants.items():
        try:
            out = jax.device_get(fn(feats, w))
        except Exception as e:
            print(f"{name:16s}: FAILED {type(e).__name__}: {str(e)[:300]}")
            continue
        if ref is None:
            ref = np.asarray(out, np.float32)
            err = 0.0
        else:
            o = np.asarray(out, np.float32)
            err = (np.abs(o - ref).max()
                   / max(np.abs(ref).max(), 1e-6))
        n_timed = 10
        t0 = time.perf_counter()
        for _ in range(n_timed):
            out = fn(feats, w)
        _ = jax.device_get(out)
        dt = (time.perf_counter() - t0) / n_timed
        print(f"{name:16s}: {dt*1e3:8.2f} ms/conv  rel_err={err:.2e}")


if __name__ == "__main__":
    main()
    conv_ab()
