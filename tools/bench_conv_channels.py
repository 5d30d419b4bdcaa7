"""Does padding the 96-lane int8 convs to 128 channels buy anything?

The four stride-1 conv+stats fusions run at ~54% of the measured int8
matmul rate (docs/ARCHITECTURE.md round-4 trace); VERDICT r3 suggested
channel padding 96->128 ("cheap FLOPs-wise at int8"). But the TPU memory
layout already lane-pads 96->128 (T(8,128) tiling, 1.33x expansion seen
in XLA buffer dumps), so the MXU may already be doing 128-lane work and
the pad would buy nothing. This measures it directly: an
L0 int8 conv at half the bench batch (B=4, 358400 cells/item — the
per-item grid matches the bench L0 scale; B halved to fit alongside) at
Cin=Cout=96 vs zero-padded 128, raw conv and the shipped
`dense_conv_same_int8` (static act_bound epilogue) forms.

Run ON THE REAL CHIP: python tools/bench_conv_channels.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")

from mask3d_tpu.sparse.dense_ops import dense_conv_same_int8

B, GX, GY, GZ = 4, 112, 80, 40  # 358400 cells/item, bench L0 scale
OCC = 0.11
N_ITER = 20


def timed(name, fn, *args, flops=None):
    f = jax.jit(fn)
    _ = jax.device_get(jnp.ravel(jax.tree_util.tree_leaves(f(*args))[0])[:8])
    t0 = time.perf_counter()
    outs = [f(*args) for _ in range(N_ITER)]
    _ = jax.device_get(jnp.ravel(jax.tree_util.tree_leaves(outs[-1])[0])[:8])
    dt = (time.perf_counter() - t0) / N_ITER * 1e3
    extra = f"   {flops / (dt / 1e3) / 1e12:7.1f} TFLOP/s" if flops else ""
    print(f"{name:44s} {dt:8.3f} ms{extra}", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    occ = (rng.random((B, GX, GY, GZ, 1)) < OCC).astype(np.float32)
    cells = B * GX * GY * GZ

    for c in (96, 128):
        x = (rng.standard_normal((B, GX, GY, GZ, c)) * 8).astype(np.float32)
        x = jnp.asarray(x * occ, jnp.bfloat16)
        w = jnp.asarray(
            rng.standard_normal((27, c, c)) * 0.05, jnp.float32
        )
        bound = jnp.full((c,), 24.0, jnp.float32)
        fl = 2 * cells * 27 * c * c
        timed(
            f"dense_conv_same_int8 C={c} (static bound)",
            lambda xx, ww, oo, bb=bound: dense_conv_same_int8(
                xx, ww, oo, act_bound=bb
            ),
            x, w, jnp.asarray(occ, jnp.bfloat16), flops=fl,
        )
        # raw int8 conv, no quantize/epilogue: the MXU-only floor
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / 0.2), -127, 127
                      ).astype(jnp.int8)
        wq = jnp.clip(jnp.round(w * 400), -127, 127).astype(jnp.int8)
        wq5 = wq.reshape(3, 3, 3, c, c)
        timed(
            f"raw int8 conv C={c} (i32 acc)",
            lambda a, b: jax.lax.conv_general_dilated(
                a, b, (1, 1, 1), "SAME",
                dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
                preferred_element_type=jnp.int32,
            ).astype(jnp.bfloat16),
            xq, wq5, flops=fl,
        )
        # zero-padded-to-128 variant of the 96 case: same real FLOPs,
        # answers "does the pad change the schedule" directly
        if c == 96:
            xp = jnp.pad(xq, ((0, 0),) * 4 + ((0, 32),))
            wp = jnp.pad(wq5, ((0, 0),) * 3 + ((0, 32), (0, 32)))
            timed(
                "raw int8 conv 96 zero-padded to 128",
                lambda a, b: jax.lax.conv_general_dilated(
                    a, b, (1, 1, 1), "SAME",
                    dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.bfloat16),
                xp, wp, flops=fl,
            )


if __name__ == "__main__":
    main()
