"""Is int8 worth pursuing on this v5e? Raw MXU matmul rate + conv lowering.

1) bf16 vs int8 dot_general at MXU-saturating shape.
2) Small int8 conv: print the optimized HLO head to see the lowering
   (the flagship-shape int8 conv OOM'd the chip - diagnose why).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")

M, KK, N = 8192, 4096, 4096
N_ITER = 30


def timed(name, fn, *args, flops=None):
    f = jax.jit(fn)
    _ = jax.device_get(jnp.ravel(jax.tree_util.tree_leaves(f(*args))[0])[:8])
    t0 = time.perf_counter()
    outs = [f(*args) for _ in range(N_ITER)]
    _ = jax.device_get(jnp.ravel(jax.tree_util.tree_leaves(outs[-1])[0])[:8])
    dt = (time.perf_counter() - t0) / N_ITER * 1e3
    extra = f"   {flops/ (dt/1e3) / 1e12:7.1f} TFLOP/s" if flops else ""
    print(f"{name:36s} {dt:8.3f} ms{extra}")
    return dt


def main():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((M, KK)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((KK, N)), jnp.bfloat16)
    ai = (a * 10).astype(jnp.int8)
    bi = (b * 10).astype(jnp.int8)
    fl = 2 * M * KK * N

    timed("bf16 matmul (f32 acc)", lambda x, y: jnp.dot(
        x, y, preferred_element_type=jnp.float32), a, b, flops=fl)
    timed("int8 matmul (i32 acc)", lambda x, y: jnp.dot(
        x, y, preferred_element_type=jnp.int32), ai, bi, flops=fl)

    # small int8 conv lowering
    x = (rng.standard_normal((2, 32, 32, 16, 96)) * 10).astype(np.int8)
    w = (rng.standard_normal((3, 3, 3, 96, 96)) * 10).astype(np.int8)

    def conv_i8(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), "SAME",
            dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
            preferred_element_type=jnp.int32,
        )

    lowered = jax.jit(conv_i8).lower(jnp.asarray(x), jnp.asarray(w))
    comp = lowered.compile()
    hlo = comp.as_text()
    print("\n--- int8 conv optimized HLO (conv/convert lines) ---")
    for line in hlo.splitlines():
        s = line.strip()
        if ("convolution" in s or "convert" in s or "dot(" in s) and len(s) < 400:
            print(s[:240])
    # and time it
    timed("int8 conv 32x32x16 (small)", conv_i8,
          jnp.asarray(x), jnp.asarray(w))

    def conv_bf(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), "SAME",
            dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
            preferred_element_type=jnp.bfloat16,
        )
    timed("bf16 conv 32x32x16 (small)", conv_bf,
          jnp.asarray(x, dtype=jnp.bfloat16), jnp.asarray(w, jnp.bfloat16))


if __name__ == "__main__":
    main()
