"""Micro-bench conv variants at the flagship level-0 shape on real TPU.

Question: what does an int8 3^3 conv buy vs the shipped bf16 conv on v5e
(peak 394 TOPS int8 vs 197 TFLOPs bf16)? Also isolates the cost of the
fused instance-norm stats and of the quantize/dequant passes a dynamic
int8 path would add.

Timing discipline per CLAUDE.md: dispatch N calls back-to-back, fence with
jax.device_get of a small slice, divide.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, GX, GY, GZ, C = 8, 112, 80, 40, 96
K = 3
N_ITER = 20

DN = jax.lax.ConvDimensionNumbers(
    lhs_spec=(0, 4, 1, 2, 3),  # NCHW-ish: actually (N, C, X, Y, Z) positions
    rhs_spec=(4, 3, 0, 1, 2),
    out_spec=(0, 4, 1, 2, 3),
)


def conv(x, w, **kw):
    # x [B, GX, GY, GZ, Cin], w [3,3,3,Cin,Cout]
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1, 1), padding="SAME",
        dimension_numbers=("NXYZC", "XYZIO", "NXYZC"), **kw
    )


def timed(name, fn, *args):
    f = jax.jit(fn)
    o = f(*args)
    first = jax.tree_util.tree_leaves(o)[0]
    _ = jax.device_get(jnp.ravel(first)[:8])  # compile+warm
    t0 = time.perf_counter()
    outs = [f(*args) for _ in range(N_ITER)]
    _ = jax.device_get(jnp.ravel(jax.tree_util.tree_leaves(outs[-1])[0])[:8])
    dt = (time.perf_counter() - t0) / N_ITER * 1e3
    flops = 2 * B * GX * GY * GZ * 27 * C * C
    print(f"{name:42s} {dt:8.2f} ms   {flops/dt/1e9:7.1f} GFLOP/s(useful)")
    return dt


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, GX, GY, GZ, C)), jnp.bfloat16)
    w = jnp.asarray(
        rng.standard_normal((K, K, K, C, C)) * 0.05, jnp.bfloat16
    )
    occ = jnp.asarray(rng.random((B, GX, GY, GZ, 1)) < 0.125, jnp.bfloat16)
    xq = (x * 12.0).astype(jnp.int8)
    wq = (w * 600.0).astype(jnp.int8)

    def bf16_conv(x, w):
        return conv(x, w, preferred_element_type=jnp.bfloat16)

    def bf16_conv_stats(x, w, occ):
        y = conv(x, w, preferred_element_type=jnp.bfloat16) * occ
        s1 = jnp.sum(y.astype(jnp.float32), axis=(1, 2, 3))
        s2 = jnp.sum(jnp.square(y.astype(jnp.float32)), axis=(1, 2, 3))
        return s1, s2, y

    def int8_conv(xq, wq):
        return conv(xq, wq, preferred_element_type=jnp.int32)

    def int8_conv_deq(xq, wq, occ):
        y = conv(xq, wq, preferred_element_type=jnp.int32)
        return y.astype(jnp.bfloat16) * (occ * (1.0 / 7200.0))

    def int8_full(x, w_pre, occ):
        # dynamic per-tensor activation quant + int8 conv + dequant epi
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
        s = amax / 127.0
        xq = jnp.round(x.astype(jnp.float32) / s).astype(jnp.int8)
        y = conv(xq, w_pre, preferred_element_type=jnp.int32)
        return y.astype(jnp.bfloat16) * (occ * (s / 600.0).astype(jnp.bfloat16))

    t_bf = timed("bf16 conv", bf16_conv, x, w)
    timed("bf16 conv + IN stats + occ", bf16_conv_stats, x, w, occ)
    t_i8 = timed("int8 conv (pre-quantized)", int8_conv, xq, wq)
    timed("int8 conv + dequant*occ", int8_conv_deq, xq, wq, occ)
    timed("int8 dyn-quant + conv + dequant", int8_full, x, wq, occ)
    print(f"int8/bf16 conv ratio: {t_bf/t_i8:.2f}x")


if __name__ == "__main__":
    main()
