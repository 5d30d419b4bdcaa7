"""Micro-bench: fused Pallas masked cross-attention vs the XLA paths.

Compares, at flagship eval shapes (Mask3D decoder cross-attention,
`mask3d/models/mask3d.py:658-747` semantics: Q~25 queries over a full
padded level of S keys, boolean block-mask):

  - pallas   : ops/pallas_attention.masked_cross_attention (tile sweep)
  - chunked  : models/mask3d._chunked_attention (lax.scan online softmax)
  - oneshot  : materialized [B, h, Q, S] logits (XLA fusion baseline)

Timing is amortized (N back-to-back dispatches, ONE device_get fence —
per-call timings carry +/-100 ms of tunnel RPC noise, CLAUDE.md) and each
variant is parity-checked against the one-shot f32 reference first.

Run ON THE REAL CHIP (ambient env): python tools/bench_attention.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("MASK3D_COMPILE_CACHE", "/root/repo/.jax_cache_tpu"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mask3d_tpu.models.mask3d import _chunked_attention
    from mask3d_tpu.ops.pallas_attention import masked_cross_attention

    B, Q, D, H = 8, 25, 128, 8
    hd = D // H
    rng = np.random.default_rng(0)

    smoke = bool(os.environ.get("MASK3D_ATTN_SMOKE"))
    sizes = (2048,) if smoke else (16384, 65536)
    n_iter = 3 if smoke else 30
    for S in sizes:
        q = jnp.asarray(rng.normal(size=(B, Q, D)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, S, D)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, S, D)), jnp.float32)
        # realistic block-mask: ~60% of keys blocked per query + fully
        # padded tail, a couple of all-blocked rows (degenerate case)
        mask = rng.random((B, Q, S)) < 0.6
        mask[:, :, int(S * 0.7):] = True
        mask[:, 3] = True
        mask = jnp.asarray(mask)

        def heads(x):
            return x.reshape(x.shape[0], x.shape[1], H, hd).transpose(
                0, 2, 1, 3)

        @jax.jit
        def oneshot(q, k, v, mask):
            qh, kh, vh = heads(q), heads(k), heads(v)
            logits = jnp.einsum("bhqd,bhsd->bhqs", qh, kh) / (hd ** 0.5)
            logits = jnp.where(mask[:, None], -1e9, logits)
            out = jnp.einsum(
                "bhqs,bhsd->bhqd", jax.nn.softmax(logits, axis=-1), vh)
            return out.transpose(0, 2, 1, 3).reshape(B, Q, D)

        @jax.jit
        def chunked(q, k, v, mask):
            # _chunked_attention takes/returns [B, n, h, hd] layout
            qh = q.reshape(B, Q, H, hd)
            kh = k.reshape(B, S, H, hd)
            vh = v.reshape(B, S, H, hd)
            return _chunked_attention(
                qh, kh, vh, mask, min(4096, S)).reshape(B, Q, D)

        ref = np.asarray(jax.device_get(oneshot(q, k, v, mask)))

        variants = {"oneshot": oneshot, "chunked": chunked}
        for tile in (512, 1024, 2048):
            variants[f"pallas_t{tile}"] = jax.jit(
                lambda q, k, v, m, t=tile: masked_cross_attention(
                    q, k, v, m, H, tile=t))

        print(f"== S={S} (B={B} Q={Q} D={D} h={H}) ==", flush=True)
        for name, fn in variants.items():
            try:
                out = np.asarray(jax.device_get(fn(q, k, v, mask)))
            except Exception as e:
                print(f"  {name:12s} FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
                continue
            err = np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-9)
            n = n_iter
            t0 = time.time()
            outs = [fn(q, k, v, mask) for _ in range(n)]
            jax.device_get(outs[-1][0, 0, :4])  # fence (device_get, not
            # block_until_ready — the tunnel returns early on the latter)
            dt = (time.time() - t0) / n * 1e3
            print(f"  {name:12s} {dt:8.2f} ms/call  rel_err={err:.2e}",
                  flush=True)


if __name__ == "__main__":
    main()
