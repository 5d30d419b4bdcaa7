"""Pallas TPU kernel for monotone row gathers.

XLA's row gather on TPU runs at ~65M rows/s regardless of width (measured
— docs/ARCHITECTURE.md): `take_along_axis` lowers to a per-row dynamic
-slice loop. The dense-grid backbone's row taps (`dense_ops.gather_rows`)
gather rows in SORTED cell order (keys ascend per item), so the source
indices of T consecutive output rows live in one contiguous window of the
flattened source — the same structural premise as the windowed sparse-conv
kernel (`pallas_conv.py`). Per tile this kernel:

  1. async-DMAs the window `src[base : base+W1]` HBM→VMEM (double-buffered
     across tiles); a second overflow window `[base+W1 : base+W1+W2]` is
     DMA'd and selected ONLY when the tile's span exceeds W1 (predicated —
     room-scene spans have a short tail: W1 sized to the ~p95 span, W1+W2
     to the max);
  2. builds the one-hot selection `S[t, j] = (idx[t] - base == j)` on the
     VPU;
  3. emits `S @ window` — MXU matmuls, f32 accumulate.

(A `[cells, B, C]` transposed view would be byte-identical to the dense
grid's native layout and avoid a relayout copy, but Mosaic rejects DMA
slices of size 1 on the tiled batch/sublane dim — measured on v5e; the
batch dim must stay the untiled major dim.)

The premise (span < W1 + W2) is checked on device and a `lax.cond` falls
back to the exact XLA gather when any tile violates it, so the op is always
exact. The op is linear with fixed indices; backward is the exact XLA
scatter (custom_vjp). One-hot selection is exact in any dtype (each output
row sums exactly one `1.0 * v` product): bf16 sources select at full MXU
rate, f32 sources (e.g. pooled coords) select in f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(W1, W2, bases_ref, idx_ref, ok_ref, src_ref, out_ref,
            win1, win2, sem1, sem2, *, T, cdt):
    b = pl.program_id(0)
    i = pl.program_id(1)
    nt = pl.num_programs(1)
    step = b * nt + i  # global step: slot parity must be global, not
    # per-item, or odd-nt items would wait on the wrong buffer slot.

    def dma1(slot, bi, ti):
        # bf16 dynamic HBM slices compile only with the start provably
        # divisible by the bf16 sublane tiling (16): bases are pre-aligned
        # (& ~15) by the wrapper and asserted here via multiple_of.
        base = pl.multiple_of(bases_ref[bi, ti], 16)
        return pltpu.make_async_copy(
            src_ref.at[bi, pl.ds(base, W1), :],
            win1.at[slot],
            sem1.at[slot],
        )

    @pl.when(step == 0)
    def _start_first():
        dma1(0, 0, 0).start()

    # Prefetch the next tile's primary window while this one computes.
    nxt_i = jnp.where(i + 1 < nt, i + 1, 0)
    nxt_b = jnp.where(i + 1 < nt, b, b + 1)
    last = (b == pl.num_programs(0) - 1) & (i == nt - 1)

    @pl.when(~last)
    def _start_next():
        dma1((step + 1) % 2, nxt_b, nxt_i).start()

    slot = step % 2
    dma1(slot, b, i).wait()
    base = bases_ref[b, i]
    loc = idx_ref[0, 0, :, 0] - base  # [T]
    okv = ok_ref[0, 0, :, 0]
    col = jax.lax.broadcasted_iota(jnp.int32, (T, W1), 1)
    sel = (col == loc[:, None]) & okv[:, None]
    out_ref[0, 0] = jnp.dot(
        sel.astype(cdt), win1[slot],
        preferred_element_type=jnp.float32,
    )

    if W2 == 0:
        return

    # Overflow tier: rows with loc >= W1 (rare — spans past ~p95).
    over = jnp.any(okv & (loc >= W1))

    @pl.when(over)
    def _second_tier():
        base2 = pl.multiple_of(base + W1, 16)
        cp = pltpu.make_async_copy(
            src_ref.at[b, pl.ds(base2, W2), :], win2, sem2
        )
        cp.start()
        cp.wait()
        col2 = jax.lax.broadcasted_iota(jnp.int32, (T, W2), 1)
        sel2 = (col2 == (loc - W1)[:, None]) & okv[:, None]
        out_ref[0, 0] += jnp.dot(
            sel2.astype(cdt), win2[...],
            preferred_element_type=jnp.float32,
        )


def _pallas_branch(src, idx, ok, bases, tile, w1, w2):
    b, n, c = src.shape
    m = idx.shape[1]
    nt = m // tile
    cdt = src.dtype if src.dtype == jnp.float32 else jnp.bfloat16
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nt),
        in_specs=[
            # trailing unit dim keeps the (sublane, lane) block dims
            # Mosaic-aligned (tile, 1) — same layout as pallas_conv
            pl.BlockSpec((1, 1, tile, 1), lambda bi, ti, _s: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile, 1), lambda bi, ti, _s: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # src stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, 1, tile, c), lambda bi, ti, _s: (bi, ti, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, w1, c), cdt),
            pltpu.VMEM((max(w2, 16), c), cdt),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, w1, w2, T=tile, cdt=cdt),
        out_shape=jax.ShapeDtypeStruct((b, nt, tile, c), jnp.float32),
        grid_spec=grid_spec,
        interpret=jax.default_backend() != "tpu",
        cost_estimate=pl.CostEstimate(
            flops=2 * b * m * w1 * c,
            bytes_accessed=b * nt * w1 * c * 2 + b * m * c * 4,
            transcendentals=0,
        ),
    )(
        bases,
        idx.reshape(b, nt, tile, 1),
        ok.reshape(b, nt, tile, 1),
        src.astype(cdt),
    )
    return out.reshape(b, m, c)


def _forward(src, idx, ok, tile, window):
    b, n, c = src.shape
    m = idx.shape[1]
    nt = m // tile
    w1, w2 = window if isinstance(window, tuple) else (window, 0)
    wtot = w1 + w2
    idx_t = idx.reshape(b, nt, tile)
    ok_t = ok.reshape(b, nt, tile)
    masked = jnp.where(ok_t, idx_t, n - 1)
    bases = jnp.minimum(jnp.min(masked, axis=2), n - wtot)
    bases = jnp.maximum(bases, 0).astype(jnp.int32)
    # Mosaic requires the dynamic HBM slice start to be provably divisible
    # by the bf16 sublane tiling (16): align down (paired with
    # `pl.multiple_of(..., 16)` in the kernel — measured working on v5e;
    # 8-alignment is NOT sufficient for bf16). Aligning down only widens
    # each tile's effective window.
    bases = bases & ~15
    all_hit = jnp.all(
        jnp.where(ok_t, idx_t - bases[:, :, None] < wtot, True)
    )

    def fast(s):
        # Mosaic requires HBM DMA slices to span full 128-lane tiles
        # (measured: 96- and 3-lane slices fail to compile on v5e): pad
        # the channel dim to a multiple of 128 (zeros; exact) and strip it
        # from the output.
        cp = (-c) % 128
        if cp:
            s = jnp.pad(s, ((0, 0), (0, 0), (0, cp)))
        out = _pallas_branch(s, idx, ok, bases, tile, w1, w2)
        return out[..., :c] if cp else out

    def slow(s):
        rows = jnp.take_along_axis(
            s.astype(jnp.float32), idx[..., None], axis=1
        )
        return jnp.where(ok[..., None], rows, 0.0)

    return jax.lax.cond(all_hit, fast, slow, src)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def monotone_gather(src, idx, ok, tile=256, window=(2048, 2048)):
    """out[b, i] = src[b, idx[b, i]] (0 where ~ok), f32 [B, M, C].

    `idx` must be (approximately) monotone non-decreasing per item for the
    fast path — sorted-key row taps satisfy this; arbitrary indices fall
    back to the exact XLA gather. `window` is `(W1, W2)`: W1 is the
    always-fetched primary window, W2 the predicated overflow tier (an int
    means `(w, 0)`). Requires M % tile == 0 and N >= W1 + W2 (see
    `supports`). bf16 compute for bf16 sources, f32 for f32 — exact either
    way (one-hot), f32 accumulate.
    """
    return _forward(src, idx, ok, tile, window)


def _fwd(src, idx, ok, tile, window):
    return _forward(src, idx, ok, tile, window), (src, idx, ok)


def _bwd(tile, window, res, g):
    src, idx, ok = res
    b = src.shape[0]
    contrib = jnp.where(ok[..., None], g.astype(jnp.float32), 0.0)
    b_idx = jnp.arange(b, dtype=jnp.int32)[:, None]
    dsrc = jnp.zeros(src.shape, jnp.float32).at[b_idx, idx].add(contrib)
    return dsrc.astype(src.dtype), None, None


monotone_gather.defvjp(_fwd, _bwd)


def supports(m_rows: int, n_src: int, tile: int = 256,
             window=(2048, 2048)) -> bool:
    """Static eligibility for capacity-M gathers from an N-row source.

    The kernel's DMA correctness additionally assumes W1 % 16 == 0 (the
    second-tier base uses `pl.multiple_of(base + W1, 16)`) and W2 == 0 or
    W2 >= 16 (the win2 scratch is max(W2, 16) rows but the copy transfers
    W2 rows) — `_auto_window` values always satisfy both, but a
    caller-supplied window must be validated here so a violation falls
    back to the exact XLA path instead of miscompiling.
    """
    w1, w2 = window if isinstance(window, tuple) else (window, 0)
    if w1 % 16 != 0 or (w2 != 0 and w2 < 16):
        return False
    return m_rows % tile == 0 and n_src >= w1 + w2
