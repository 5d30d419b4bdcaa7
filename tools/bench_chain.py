"""A/B the fused Pallas int8 block-chain vs the unfused XLA int8 path.

Flagship stage-8 shape: B=8, L0 grid (112, 80, 40), cin=128 (cat of
convtr7's 96 + the 32-ch stem skip), planes=96, 2 BasicBlocks — the 58 ms
L0 chain of the 86.2 ms bench forward (docs/ARCHITECTURE.md r4 trace).

Run ON THE REAL CHIP (takes the tunnel; touch /tmp/tpu_pause first if
the datascale supervisor is live):

    touch /tmp/tpu_pause
    python tools/bench_chain.py [tile] [sub]
    rm /tmp/tpu_pause

Timing is device_get-fenced (block_until_ready returns early through the
axon tunnel — .claude/skills/verify/SKILL.md).
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

from mask3d_tpu.sparse import dense_ops
from mask3d_tpu.sparse import pallas_chain as pc

B, DIMS = 8, (112, 80, 40)
CIN, PLANES = 128, 96
OCC_P = 0.108  # measured bench-scene voxel occupancy
N_ITER = 12
TILE = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
SUB = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
KDEPTH = int(sys.argv[3]) if len(sys.argv) > 3 else 2


def timed(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(N_ITER):
        out = fn(*args)
    # fence through the tunnel with a small fetch
    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(leaf.ravel()[:4])
    dt = (time.perf_counter() - t0) / N_ITER
    print(f"{name:34s} {dt * 1e3:8.2f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    occ = (rng.random((B,) + DIMS + (1,)) < OCC_P).astype(np.float32)
    x = (rng.standard_normal((B,) + DIMS + (CIN,)).astype(np.float32)
         * occ).astype(jnp.bfloat16)
    x, occ = jnp.asarray(x), jnp.asarray(occ)
    bound = jnp.asarray(
        np.abs(rng.standard_normal(CIN)).astype(np.float32) + 1.0)
    sigma = 10.0

    def mk(ci, co, k=27):
        return jnp.asarray(
            rng.standard_normal((k, ci, co)).astype(np.float32) * 0.05)

    def nrm():
        return (jnp.asarray(1 + 0.1 * rng.standard_normal(PLANES)
                            .astype(np.float32)),
                jnp.asarray(0.1 * rng.standard_normal(PLANES)
                            .astype(np.float32)))

    blocks = []
    for i in range(2):
        ci = CIN if i == 0 else PLANES
        g1, b1 = nrm()
        g2, b2 = nrm()
        blk = dict(w1=mk(ci, PLANES), g1=g1, b1=b1,
                   w2=mk(PLANES, PLANES), g2=g2, b2=b2)
        if i == 0:
            gd, bd = nrm()
            blk.update(wd=mk(ci, PLANES, 1), gd=gd, bd=bd)
        blocks.append(blk)

    def xla_block(x, bnd, blk):
        def sig(g, b):
            return sigma * jnp.abs(g) + jnp.abs(b)
        out = dense_ops.dense_conv_same_int8(
            x, blk["w1"], occ, out_dtype=jnp.bfloat16, act_bound=bnd)
        out = jax.nn.relu(dense_ops.dense_instance_norm(
            out, occ, blk["g1"], blk["b1"]))
        out = dense_ops.dense_conv_same_int8(
            out, blk["w2"], occ, out_dtype=jnp.bfloat16,
            act_bound=sig(blk["g1"], blk["b1"]))
        out = dense_ops.dense_instance_norm(out, occ, blk["g2"], blk["b2"])
        if "wd" in blk:
            res = dense_ops.dense_conv_same_int8(
                x, blk["wd"], occ, out_dtype=jnp.bfloat16, act_bound=bnd)
            res = dense_ops.dense_instance_norm(
                res, occ, blk["gd"], blk["bd"])
            bres = sig(blk["gd"], blk["bd"])
        else:
            res, bres = x, bnd
        y = jax.nn.relu(out.astype(jnp.float32) + res.astype(jnp.float32))
        return y.astype(jnp.bfloat16), sig(blk["g2"], blk["b2"]) + bres

    @jax.jit
    def xla_stage(x):
        out, bnd = x, bound
        for blk in blocks:
            out, bnd = xla_block(out, bnd, blk)
        return out

    @jax.jit
    def fused_stage(x):
        y, _ = pc.fused_basic_stage(
            x, bound, occ, blocks, DIMS, sigma, tile=TILE, sub=SUB,
            kdepth=KDEPTH)
        return y

    print(f"# B={B} dims={DIMS} cin={CIN} planes={PLANES} occ={OCC_P} "
          f"tile={TILE} sub={SUB} kdepth={KDEPTH} "
          f"backend={jax.default_backend()}")
    t_x = timed("xla int8 stage (2 blocks)", xla_stage, x)
    t_f = timed("fused pallas chain", fused_stage, x)
    print(f"# speedup: {t_x / t_f:.3f}x  (delta {1e3 * (t_x - t_f):.2f} ms"
          f" per forward)")

    # sanity: outputs agree within quantize tolerance
    a = np.asarray(xla_stage(x), np.float32)
    f = np.asarray(fused_stage(x), np.float32)
    d = np.abs(a - f)
    print(f"# parity: max|d|={d.max():.4f} mean|d|={d.mean():.6f} "
          f"(quant steps ~{float(jnp.max(bound)) / 127:.4f})")


if __name__ == "__main__":
    main()
