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


if __name__ == "__main__":
    main()
