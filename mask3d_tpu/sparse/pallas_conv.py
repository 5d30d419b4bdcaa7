"""Pallas TPU kernel for gather-path sparse convolution.

The general (`impl="gather"`) backbone path computes, per kernel offset k,
`out[p] += feats[nbr_idx[p, k]] @ weight[k]` (`mask3d_tpu/sparse/ops.py`
`sparse_conv`, the ME MinkowskiConvolution equivalent). On TPU the XLA row
gather is the bottleneck: ~65M rows/s regardless of formulation, ~125M
gathered rows per Res16UNet forward (measured — see docs/ARCHITECTURE.md).

This kernel replaces each gather with MXU work by exploiting a structural
property of the substrate: rows are sorted by linearized voxel key, and for
a fixed offset the neighbor keys of consecutive rows are shifted by a
constant, so the *valid* entries of `nbr_idx[:, k]` are monotone
non-decreasing. Within a tile of T consecutive output rows, all neighbors
therefore live in a contiguous window of the input rows. Per (tile, k):

  1. async-DMA the window `feats[base : base+W]` from HBM into VMEM
     (double-buffered across k — the next window loads while this one
     computes);
  2. build the one-hot selection `S[t, j] = (nbr_idx[t] - base == j)`
     on the VPU;
  3. `acc += (S @ window) @ weight[k]` — two MXU matmuls, bf16 inputs,
     f32 accumulation.

The window premise is data-dependent (spread of neighbor indices within a
tile), so the wrapper verifies it on device (`all_hit`) and falls back to
the exact XLA gather formulation via `lax.cond` when any tile/offset
violates it — the op is exact by construction, never approximate. Real
room-scene levels satisfy W = 4T for every offset of a 3^3 kernel (z/y
neighbors are ~T apart; x neighbors are bounded by slab-occupancy ratios).

The op is linear in (feats, weight) with fixed indices, so the backward
pass is implemented exactly with XLA scatter/gather matmuls (custom_vjp) —
training works, and the Pallas path accelerates the forward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mask3d_tpu.sparse import ops as _xla_ops

# Max pallas grid steps (b * tiles) per call: the prefetched-scalar SMEM
# footprint scales with grid steps on the remote v5e build (2048 measured
# OK, ~3300 overflows 1 MB). Larger levels are row-chunked in `_forward`.
_MAX_GRID_STEPS = 2048


def _kernel(K, W, select, bases_ref, idx_ref, ok_ref, w_ref, f_ref, out_ref,
            fwin, sem, acc):
    """Grid (B, nT). Per step: T output rows of one item.

    bases_ref: i32[B * nT * K] scalar-prefetch, FLAT (window starts,
    clamped so [base, base+W) is in range). Flat on purpose: a [B, nT, K]
    scalar-prefetch operand is lane-padded K->128 in SMEM (1 MB — overflows
    the budget on real scene shapes); the 1-D layout stays at 4*B*nT*K
    bytes. idx/ok blocks: [1, 1, T, K] VMEM. w_ref: bf16[K, Cin, Cout]
    VMEM. f_ref: bf16[B, N, Cin] in HBM/ANY. out block: f32[1, 1, T,
    Cout]. Scratch: fwin bf16[2, W, Cin], DMA semaphores [2], acc f32[T,
    Cout].

    `select` picks how `window[loc[t]]` is realized per offset:
      - "onehot": MXU one-hot matmul `[T, W] @ [W, C]` — costs W/Cout x the
        weight matmul in FLOPs (the reason the sparse path loses to dense
        at ~9% occupancy, docs/ARCHITECTURE.md FLOP ledger);
      - "gather": Mosaic `tpu.dynamic_gather` (VPU, no MXU work). The
        lowering only accepts the operand-batched same-shape form
        `take_along_axis([W, C], [W, C], axis=0)`, so indices are padded
        T->W and the first T gathered rows are used.
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    nt = pl.num_programs(1)
    T = idx_ref.shape[2]
    tile_off = (b * nt + i) * K

    def dma(slot, k):
        # bf16 dynamic HBM slice: start must be provably 16-divisible
        # (bf16 sublane tiling; bases pre-aligned by the wrapper).
        base = pl.multiple_of(bases_ref[tile_off + k], 16)
        return pltpu.make_async_copy(
            f_ref.at[b, pl.ds(base, W), :],
            fwin.at[slot],
            sem.at[slot],
        )

    dma(0, 0).start()
    acc[:] = jnp.zeros_like(acc)
    if select == "onehot":
        col = jax.lax.broadcasted_iota(jnp.int32, (T, W), 1)
    for k in range(K):  # static unroll: K is 27 (or 125 for the stem conv)
        slot = k % 2
        if k + 1 < K:
            dma((k + 1) % 2, k + 1).start()
        dma(slot, k).wait()
        loc = idx_ref[0, 0, :, k] - bases_ref[tile_off + k]
        ok_k = ok_ref[0, 0, :, k]
        if select == "gather":
            locw = jnp.where(ok_k, loc, 0)[:, None]  # [T, 1]
            loc_full = jnp.pad(locw, ((0, W - T), (0, 0)))
            idxm = jnp.broadcast_to(loc_full, (W, fwin.shape[-1]))
            g_full = jnp.take_along_axis(fwin[slot], idxm, axis=0)
            g = jnp.where(ok_k[:, None], g_full[:T], 0)
        else:
            sel = (col == loc[:, None]) & ok_k[:, None]
            s = sel.astype(jnp.bfloat16)
            g = jnp.dot(
                s, fwin[slot], preferred_element_type=jnp.float32
            ).astype(jnp.bfloat16)
        acc[:] += jnp.dot(
            g, w_ref[k], preferred_element_type=jnp.float32,
        )
    out_ref[0, 0] = acc[:]


def _kernel_grouped(K, G, W, select, bases_ref, idx_ref, ok_ref, w_ref,
                    f_ref, out_ref, fwin, sem, acc):
    """Grouped-window variant: ONE DMA per dx-group instead of per offset.

    `cube_offsets` enumerates x-major, so offsets k in [g*gsz, (g+1)*gsz)
    share the same x displacement; their neighbor rows live within a
    common window (x displacement dominates the row distance in x-major
    sorted order — y/z displacements only shift by intra-slab occupancy).
    DMA traffic per tile drops from K windows to G (9x for a 3^3 kernel),
    and each window amortizes gsz select+matmul steps of compute, so the
    double-buffered prefetch hides essentially all of it.

    bases_ref: i32[B * nT * G] flat group-window starts. Other refs as in
    `_kernel`.
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    nt = pl.num_programs(1)
    T = idx_ref.shape[2]
    gsz = K // G
    tile_off = (b * nt + i) * G

    def dma(slot, g):
        base = pl.multiple_of(bases_ref[tile_off + g], 16)
        return pltpu.make_async_copy(
            f_ref.at[b, pl.ds(base, W), :],
            fwin.at[slot],
            sem.at[slot],
        )

    dma(0, 0).start()
    acc[:] = jnp.zeros_like(acc)
    if select == "onehot":
        col = jax.lax.broadcasted_iota(jnp.int32, (T, W), 1)
    for g in range(G):
        slot = g % 2
        if g + 1 < G:
            dma((g + 1) % 2, g + 1).start()
        dma(slot, g).wait()
        for j in range(gsz):
            k = g * gsz + j
            loc = idx_ref[0, 0, :, k] - bases_ref[tile_off + g]
            ok_k = ok_ref[0, 0, :, k]
            if select == "gather":
                locw = jnp.where(ok_k, loc, 0)[:, None]
                loc_full = jnp.pad(locw, ((0, W - T), (0, 0)))
                idxm = jnp.broadcast_to(loc_full, (W, fwin.shape[-1]))
                g_full = jnp.take_along_axis(fwin[slot], idxm, axis=0)
                gv = jnp.where(ok_k[:, None], g_full[:T], 0)
            else:
                sel = (col == loc[:, None]) & ok_k[:, None]
                s = sel.astype(jnp.bfloat16)
                gv = jnp.dot(
                    s, fwin[slot], preferred_element_type=jnp.float32
                ).astype(jnp.bfloat16)
            acc[:] += jnp.dot(
                gv, w_ref[k], preferred_element_type=jnp.float32,
            )
    out_ref[0, 0] = acc[:]


def _pallas_branch(feats, weight, idx_t, ok_t, bases, tile, window,
                   select, window_mode="per_offset"):
    # Output rows come from idx (may be a row-chunk of the level); feats is
    # always the FULL source array (windows index absolute rows in HBM).
    b, n, cin = feats.shape
    m = idx_t.shape[1]
    k = weight.shape[0]
    cout = weight.shape[-1]
    nt = m // tile
    if window_mode == "grouped_dx":
        g = round(k ** (1.0 / 3.0))
        kern = functools.partial(_kernel_grouped, k, g, window, select)
    else:
        kern = functools.partial(_kernel, k, window, select)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, 1, tile, k), lambda bi, ti, _s: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile, k), lambda bi, ti, _s: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weight, whole
            pl.BlockSpec(memory_space=pl.ANY),  # feats stay in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, 1, tile, cout), lambda bi, ti, _s: (bi, ti, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, window, cin), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((tile, cout), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, nt, tile, cout), jnp.float32),
        grid_spec=grid_spec,
        # Tests run on the CPU backend via the Pallas interpreter; the
        # compiled Mosaic path is TPU-only.
        interpret=jax.default_backend() != "tpu",
        cost_estimate=pl.CostEstimate(
            flops=2 * b * m * k * (window + cout) * cin,
            bytes_accessed=b * nt * k * window * cin * 2
            + b * m * k * 8 + b * m * cout * 4,
            transcendentals=0,
        ),
    )(
        bases.reshape(-1),  # flat: avoids K->128 SMEM lane padding
        idx_t.reshape(b, nt, tile, k),
        ok_t.reshape(b, nt, tile, k),
        weight.astype(jnp.bfloat16),
        feats.astype(jnp.bfloat16),
    )
    return out.reshape(b, m, cout)


def _forward(feats, weight, nbr_idx, nbr_ok, tile, window, select,
             window_mode="per_offset"):
    b, n, _ = feats.shape
    k = weight.shape[0]
    nt = n // tile
    idx_t = nbr_idx.reshape(b, nt, tile, k)
    ok_t = nbr_ok.reshape(b, nt, tile, k)

    # Window start per (item, tile, offset): min valid neighbor index,
    # clamped so the DMA slice [base, base+W) stays in range.
    masked = jnp.where(ok_t, idx_t, n - 1)
    bases = jnp.minimum(jnp.min(masked, axis=2), n - window)
    bases = jnp.maximum(bases, 0).astype(jnp.int32)
    if window_mode == "grouped_dx":
        # One window per dx-group (x-major offset enumeration): the group
        # base is the min over its offsets' bases.
        g = round(k ** (1.0 / 3.0))
        bases = jnp.min(
            bases.reshape(b, nt, g, k // g), axis=3
        )
        bases = jnp.minimum(bases, n - window)
        per_off = jnp.repeat(bases, k // g, axis=2)
    else:
        per_off = bases
    bases = jnp.maximum(bases, 0).astype(jnp.int32)
    # bf16 sublane tiling: the kernel asserts 16-divisible DMA starts.
    bases = bases & ~15
    per_off = jnp.maximum(per_off, 0).astype(jnp.int32) & ~15
    # Every valid neighbor must fall inside its tile's window, else the
    # premise fails for this input and we take the exact XLA fallback.
    all_hit = jnp.all(
        jnp.where(ok_t, idx_t - per_off[:, :, None, :] < window, True)
    )

    def fast(f, w):
        # Mosaic requires HBM DMA slices to span full 128-lane tiles: pad
        # Cin to a multiple of 128 on both feats and weight (zeros; the
        # extra input channels contribute exactly 0).
        cin = f.shape[-1]
        c_pad = (-cin) % 128
        if c_pad:
            f = jnp.pad(f, ((0, 0), (0, 0), (0, c_pad)))
            w = jnp.pad(w, ((0, 0), (0, c_pad), (0, 0)))
        # The remote v5e build's SMEM budget for the prefetched scalar
        # operand scales with the number of grid steps (b*nt); measured:
        # 2048 steps compile (flagship A/B shape), ~3300 overflow the 1 MB
        # SMEM ("prefetched SMEM operand 0", hall-scene capacity 851968).
        # Chunk the row axis so each pallas_call stays <= _MAX_GRID_STEPS
        # steps; the full (channel-padded) feats array rides along
        # unsliced — windows index absolute rows in HBM, so splitting the
        # output tiles is free.
        max_nt = max(_MAX_GRID_STEPS // b, 1)
        if nt <= max_nt:
            return _pallas_branch(
                f, w, nbr_idx, nbr_ok, bases, tile, window, select,
                window_mode,
            )
        outs = []
        for t0 in range(0, nt, max_nt):
            t1 = min(t0 + max_nt, nt)
            outs.append(_pallas_branch(
                f, w,
                nbr_idx[:, t0 * tile:t1 * tile],
                nbr_ok[:, t0 * tile:t1 * tile],
                bases[:, t0:t1], tile, window, select, window_mode,
            ))
        return jnp.concatenate(outs, axis=1)

    def slow(f, w):
        return _xla_ops.sparse_conv(
            f, w, nbr_idx, nbr_ok, compute_dtype=jnp.bfloat16
        ).astype(jnp.float32)

    return jax.lax.cond(all_hit, fast, slow, feats, weight)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def sparse_conv_pallas(feats, weight, nbr_idx, nbr_ok, tile=256,
                       window=1024, select="onehot",
                       window_mode="per_offset"):
    """Sparse conv (same contract as `ops.sparse_conv`, bias-free) with the
    windowed Pallas forward. Returns f32 [B, N, Cout].

    Requirements checked by `supports()`: N % tile == 0 and N >= window.
    bf16 compute, f32 accumulation (matches the TPU matmul default the
    rest of the stack uses).
    """
    return _forward(feats, weight, nbr_idx, nbr_ok, tile, window, select,
                    window_mode)


def _fwd(feats, weight, nbr_idx, nbr_ok, tile, window, select, window_mode):
    out = _forward(feats, weight, nbr_idx, nbr_ok, tile, window, select,
                   window_mode)
    return out, (feats, weight, nbr_idx, nbr_ok)


def _bwd(tile, window, select, window_mode, res, g):
    feats, weight, nbr_idx, nbr_ok = res
    b, n, cin = feats.shape
    g = g.astype(jnp.float32)

    def step(carry, xs):
        df_acc, dw_acc_unused = carry
        w_k, idx_k, ok_k, k = xs
        # dF: scatter-add g @ W[k]^T at the gathered rows.
        contrib = jnp.where(
            ok_k[..., None],
            jnp.dot(g, w_k.T.astype(jnp.float32),
                    preferred_element_type=jnp.float32),
            0.0,
        )
        bidx = jnp.arange(b, dtype=jnp.int32)[:, None]
        df_acc = df_acc.at[bidx, idx_k].add(contrib)
        # dW[k]: gathered feats^T @ g over (B, N).
        gath = _xla_ops.gather_rows(feats.astype(jnp.float32), idx_k, ok_k)
        dw_k = jnp.einsum("bnc,bnd->cd", gath, g)
        return (df_acc, None), dw_k

    (df, _), dw = jax.lax.scan(
        step,
        (jnp.zeros((b, n, cin), jnp.float32), None),
        (
            weight,
            jnp.moveaxis(nbr_idx, -1, 0),
            jnp.moveaxis(nbr_ok, -1, 0),
            jnp.arange(weight.shape[0]),
        ),
    )
    return df.astype(feats.dtype), dw.astype(weight.dtype), None, None


sparse_conv_pallas.defvjp(_fwd, _bwd)


def supports(n_rows: int, tile: int = 256, window: int = 1024) -> bool:
    """Static eligibility of the Pallas path for a level of capacity N."""
    return n_rows % tile == 0 and n_rows >= window


def resolve_select(select: str) -> str:
    """Downgrade `select="gather"` to `"onehot"` when the dynamic-gather
    kernel variant does not compile on this backend build.

    `tpu.dynamic_gather` availability/constraints vary across remote
    libtpu rotations (docs/ARCHITECTURE.md: the variant compiled locally
    but 500'd remotely on 2026-08-18); a config flag must not be able to
    hard-crash the forward. One-time probe at a tiny representative shape
    (tile 256, window 256, 128 channels — the lane/sublane regime the
    Mosaic lowering depends on); non-TPU backends run the interpreter and
    need no probe.
    """
    if select != "gather":
        return select
    import jax as _jax

    if _jax.default_backend() != "tpu":
        return select
    from mask3d_tpu.utils import probe

    def _build():
        import numpy as np

        n, k, c = 256, 27, 128
        feats = np.zeros((1, n, c), np.float32)
        w = np.zeros((k, c, c), np.float32)
        idx = np.zeros((1, n, k), np.int32)
        ok = np.ones((1, n, k), bool)
        _jax.jit(
            lambda f, ww, i, o: sparse_conv_pallas(
                f, ww, i, o, tile=256, window=256, select="gather"
            )
        ).lower(feats, w, idx, ok).compile()

    return (
        "gather" if probe.compiles("pallas_conv:gather", _build)
        else "onehot"
    )
