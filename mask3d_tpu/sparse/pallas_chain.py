"""Pallas TPU fused int8 residual block-chain for the dense eval path.

THE round-5 device lever (VERDICT r4 item 1). The dense int8 L0 chain
(reference semantics: `mask3d/models/modules/resnet_block.py:7-68`
BasicBlock stacks on the stride-1 grid, `mask3d/models/res16unet.py`
stage 8) spends ~15 ms/forward of its 58 ms in ELEMENTWISE passes that
XLA cannot fuse into the convs: standalone quantize clamps (read bf16 +
write s8 at the bandwidth floor), residual add+relu epilogues, and the
InstanceNorm affine applications between convs (op dump 2026-08-19,
docs/ARCHITECTURE.md). This module replaces the whole chain with Pallas
kernels in which those passes ride the VPU *inside* the conv kernels,
overlapped with MXU work, so their HBM round-trips vanish.

Design (TPU-first, no reference analogue — the reference runs cuDNN/ME
kernels per op):

- **Packed-row layout** `[B, RB, 128]`: the dense grid [B, X, Y, Z, C]
  is zero-padded by (2, 1, 1) voxels per side, flattened to rows in
  (x, y, z) order, lane-padded C -> 128 (the physical XLA tiling pads
  lanes to 128 anyway, so the extra lanes are FREE bandwidth-wise), and
  placed at row offset A (the apron) inside a buffer whose length is a
  multiple of the tile size. In this layout a 3^3 conv tap (dx, dy, dz)
  is a CONSTANT row shift dx*YP*ZP + dy*ZP + dz, so a tile of T output
  rows consumes one contiguous window of T + 2A input rows: the conv
  becomes 27 static-slice [T, 128] @ [128, 128] int8 MXU dots with NO
  gathers, reshapes, or lane concats (all measured Mosaic-vocabulary
  traps — docs/ARCHITECTURE.md Winograd post-mortem).

- **Occupancy rides lane `cout`** (submanifold masking needs the occ
  grid in every pass): the quantized input's lane `cin` holds occ in
  {0, 1}, the weight embedding puts a single 1 at
  [center_tap, cin, cout], so the i32 accumulator's lane `cout` IS the
  center cell's occupancy — the epilogue masks with it, writes it
  through to the raw output's lane `cout`, and the next kernel's
  prologue masks with THAT. No separate occ operand, no relayouts.

- **Two-pass InstanceNorm stays two-pass** (stats are global per (item,
  channel)), but both passes fuse into adjacent convs: each conv kernel
  accumulates masked sum/sumsq of its raw output across grid steps
  (stats output revisited per item), a tiny XLA op turns them into the
  affine (A = gamma*rsqrt(var+eps), B = beta - mean*A — exactly
  `dense_ops.dense_instance_norm`'s math), and the NEXT kernel's
  prologue applies affine -> relu -> static-bound quantize (and the
  residual join, for the block-junction kernel) in-register on its
  input window before the dots.

Kernel chain for a 2-block stage (e.g. the flagship's stage 8, the
96-channel L0 stride-1 chain):

    XLA   : quantize(cat) -> pack           (entry)
    K_entry: conv1_b0 + 1x1 downsample      -> raw1, res_raw, stats x2
    K_mid  : [affine1+relu+q] conv2_b0      -> raw2, stats
    K_junc : [affine2 + res-affine + relu + q] conv1_b1
                                            -> y0_q, raw1', stats
    K_mid  : [affine1'+relu+q] conv2_b1     -> raw2', stats
    XLA   : affine2' + deq(y0_q) + relu -> unpack (final join)

Exactness: the int8 conv math (static-bound activation quantize, scale
folding, per-cout weight quantize, i32 accumulation, f32 requant)
mirrors `dense_ops.dense_conv_same_int8` term for term; the affine
mirrors `dense_ops.dense_instance_norm`. Oracle-tested in
tests/test_pallas_chain.py (interpret mode, CPU); chain-level parity
vs the unfused XLA int8 path is gated by the e2e mAP tests.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
# Padding per side in (x, y, z). PX=2 so an interior row's conv window
# never reaches outside the content region (reach < 2*YP*ZP): the apron
# and the tail stay write-only garbage that interior outputs never read.
PX, PY, PZ = 2, 1, 1
# Smallest grid (padded rows) worth routing through the fused chain: the
# quantum-aligned buffers waste up to `tile` rows of padding, so tiny
# coarse-level grids (e.g. the 1/16-stride encoder stage) stay on the
# unfused XLA path. Tests monkeypatch this to 0.
MIN_ROWS = 16384


def _align(n: int, m: int) -> int:
    return -(-n // m) * m


class PackSpec(NamedTuple):
    """Static geometry of the packed-row layout for one grid level.

    `quantum` fixes the content length (rounded up to a multiple), so
    kernels over the SAME buffers may use any tile that divides it —
    e.g. the junction kernel (two bf16 windows) runs at half the tile
    of the mid kernel to stay under the ~16 MB VMEM budget."""

    dims: Tuple[int, int, int]  # unpadded grid (X, Y, Z)
    quantum: int                # content-row alignment (max tile)

    @property
    def padded(self):
        x, y, z = self.dims
        return (x + 2 * PX, y + 2 * PY, z + 2 * PZ)

    @property
    def rows(self) -> int:  # content rows R
        xp, yp, zp = self.padded
        return xp * yp * zp

    @property
    def reach(self) -> int:  # max |row shift| of a 3^3 tap
        _, yp, zp = self.padded
        return yp * zp + zp + 1

    @property
    def apron(self) -> int:  # A, aligned for int8/bf16 DMA starts
        return _align(self.reach, 32)

    @property
    def content_rows(self) -> int:  # R rounded up to the quantum
        return _align(self.rows, self.quantum)

    @property
    def buf_rows(self) -> int:  # RB
        return self.content_rows + 2 * self.apron

    def offsets(self) -> Tuple[int, ...]:
        """Row shift per tap, x-major (matches weight ravel order of
        `dense_conv_same`'s k^3 cube: weight[(dx*3+dy)*3+dz])."""
        _, yp, zp = self.padded
        return tuple(
            dx * yp * zp + dy * zp + dz
            for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)
        )


def make_pack_spec(grid_dims: Sequence[int],
                   quantum: int = 8192) -> PackSpec:
    assert quantum % 32 == 0
    return PackSpec(tuple(int(d) for d in grid_dims), int(quantum))


# ---------------------------------------------------------------- XLA side


def pack_grid(x, spec: PackSpec, fill_lane: Optional[int] = None):
    """[B, X, Y, Z, C] -> packed rows [B, RB, 128] (same dtype).

    `fill_lane`: optionally writes 1 at that lane for every CONTENT row
    that is occupied — pass the occ grid via `x`'s channels instead; this
    is only used to embed the occupancy channel when packing quantized
    entry activations (lane `cin` <- occ).
    """
    del fill_lane
    b, X, Y, Z, c = x.shape
    assert (X, Y, Z) == spec.dims, (x.shape, spec.dims)
    assert c <= LANES
    xp = jnp.pad(x, ((0, 0), (PX, PX), (PY, PY), (PZ, PZ), (0, LANES - c)))
    rows = xp.reshape(b, spec.rows, LANES)
    buf = jnp.zeros((b, spec.buf_rows, LANES), x.dtype)
    return jax.lax.dynamic_update_slice(buf, rows, (0, spec.apron, 0))


def unpack_grid(buf, spec: PackSpec, channels: int):
    """Packed rows [B, RB, 128] -> [B, X, Y, Z, channels]."""
    b = buf.shape[0]
    xp, yp, zp = spec.padded
    rows = jax.lax.dynamic_slice(
        buf, (0, spec.apron, 0), (b, spec.rows, LANES)
    )
    grid = rows.reshape(b, xp, yp, zp, LANES)
    return grid[:, PX:xp - PX, PY:yp - PY, PZ:zp - PZ, :channels]


def quantize_pack(x, bound, occ, spec: PackSpec):
    """Entry quantize + pack: bf16/f32 grid -> packed int8 rows with the
    occupancy riding lane `cin` (cin < 128) or a separate occ pack
    (cin == 128). Mirrors `dense_ops.dense_conv_same_int8`'s activation
    quantization bit for bit (same `* (1/s)` form).
    """
    c = x.shape[-1]
    sx = jnp.maximum(bound.astype(jnp.float32), 1e-8) * (1.0 / 127.0)
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) * (1.0 / sx)), -127.0, 127.0
    ).astype(jnp.int8)
    q = q * occ.astype(jnp.int8)  # submanifold zeros (occ in {0,1})
    if c < LANES:
        q = jnp.concatenate([q, occ.astype(jnp.int8)], axis=-1)
        return pack_grid(q, spec), sx
    return pack_grid(q, spec), sx


def prep_weights_int8(weight, act_scale, cin: int, cout: int,
                      occ_in: Optional[int], occ_out: Optional[int]):
    """Quantize + embed a conv weight into [K, 128, 128] int8.

    Mirrors `dense_conv_same_int8`: fold the (static) activation scales
    into the weight, per-cout absmax quantize. `occ_in`/`occ_out`: lane
    indices carrying occupancy; a single 1 at
    [center, occ_in, occ_out] (with requant scale 1) forwards occupancy
    through the dot. Returns (wq int8 [K,128,128], sw f32 [128]).
    """
    k = weight.shape[0]
    w = weight.astype(jnp.float32)
    wf = w * act_scale[None, :, None]
    aw = jnp.max(jnp.abs(wf), axis=(0, 1))
    sw = jnp.maximum(aw, 1e-12) * (1.0 / 127.0)
    wq = jnp.clip(jnp.round(wf / sw), -127.0, 127.0).astype(jnp.int8)

    full = jnp.zeros((k, LANES, LANES), jnp.int8)
    full = jax.lax.dynamic_update_slice(full, wq, (0, 0, 0))
    sw_full = jnp.ones((LANES,), jnp.float32)
    sw_full = jax.lax.dynamic_update_slice(sw_full, sw, (0,))
    if occ_in is not None and occ_out is not None:
        center = (k - 1) // 2  # 13 for 3^3, 0 for 1x1
        full = full.at[center, occ_in, occ_out].set(1)
    return full, sw_full


def pair_weights(wq):
    """[27, 128, 128] int8 -> [14, 256, 128]: stack taps (2p, 2p+1) on the
    contraction axis so each kernel dot contracts K=256 (`kdepth=2`).

    MEASURED DEAD END on v5e (tools/bench_chain.py 2026-08-21, flagship
    stage-8 shape): 169.9 ms vs 78.4 ms for the unpaired K=128 dots
    (0.65x vs the XLA int8 stage). The hypothesis was that the int8 MXU
    needs >= 256-deep contractions for its full rate; in practice the
    pair staging dominates — Mosaic rejects a direct lane-concat of two
    window slices whose sublane offsets differ ("offset mismatch on
    non-concat dimension"), and the scratch-buffer staging (two stores +
    one load per pair, `pair_buf` in `_chain_body`) compiles to
    relayout-heavy VPU copies that cost more than the dots save. Kept
    behind `kdepth=2` (default 1) with interpret-mode parity coverage."""
    k = wq.shape[0]
    assert k == 27, k
    pad = jnp.concatenate([wq, jnp.zeros((1,) + wq.shape[1:], wq.dtype)])
    return pad.reshape(14, 2 * LANES, LANES)


def in_affine(stats_sum, stats_sq, count, gamma, beta, cout: int,
              eps: float = 1e-5):
    """InstanceNorm affine consts from kernel-accumulated masked stats.

    Mirrors `dense_ops.dense_instance_norm`: mean = sum/cnt,
    var = max(sq/cnt - mean^2, 0), A = gamma*rsqrt(var+eps),
    B = beta - mean*A. Lanes >= cout are forced to (A=1, B=0) so the
    occupancy lane passes through the prologue untouched.
    Returns (A, B) f32 [B, 128].
    """
    cnt = jnp.maximum(count.astype(jnp.float32), 1.0)[:, None]
    mean = stats_sum / cnt
    var = jnp.maximum(stats_sq / cnt - mean * mean, 0.0)
    rs = jax.lax.rsqrt(var + eps)
    g = jnp.zeros((LANES,), jnp.float32).at[:cout].set(
        gamma.astype(jnp.float32))
    bt = jnp.zeros((LANES,), jnp.float32).at[:cout].set(
        beta.astype(jnp.float32))
    A = rs * g
    B = bt - mean * A
    lane = jnp.arange(LANES)
    A = jnp.where(lane[None, :] < cout, A, 1.0)
    B = jnp.where(lane[None, :] < cout, B, 0.0)
    return A, B


def quant_consts(bound, cout: int):
    """Static-bound quantize scale vector for a prologue: inv_s [128]
    (127/bound on real lanes, 1 on the occupancy lane so occ -> 1)."""
    s = jnp.maximum(bound.astype(jnp.float32), 1e-8) * (1.0 / 127.0)
    inv = jnp.zeros((LANES,), jnp.float32).at[:cout].set(1.0 / s)
    lane = jnp.arange(LANES)
    return jnp.where(lane < cout, inv, 1.0), s


# ------------------------------------------------------------- the kernel


# consts rows (f32 [B, 7, 128] operand, blocked per item)
_CA, _CB, _CAR, _CBR, _CINV, _CSW, _CSWD = range(7)
NCONSTS = 7


def _chain_body(spec: PackSpec, tile: int, sub: int, offsets, mode: str,
                res_int8: bool,
                occ_lane: int, out_lane: int, n_stats: int,
                consts_ref, w_ref, wd_ref, x_any, res_any, occ_any,
                raw_any, res_out_any, yq_any, stats_ref,
                win, res_win, occ_win, hq, pair_buf, acc, accd,
                stage_raw, stage_res, stage_yq,
                sem_in, sem_res, sem_occ, sem_raw, sem_resout, sem_yq):
    """One grid step (b, i): T output rows via n_sub sub-tiles.

    mode: "entry" (int8 window, no prologue, optional 2nd 1x1 conv) |
    "mid" (bf16 raw window, affine prologue) | "junction" (bf16 raw +
    residual windows, join prologue, emits y_q).
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    nT = pl.num_programs(1)
    nB = pl.num_programs(0)
    T, A, S = tile, spec.apron, sub
    W = T + 2 * A
    n_sub = T // S
    lin = b * nT + i

    def in_dma(slot, bb, ii):
        start = pl.multiple_of(ii * T, 32)
        return pltpu.make_async_copy(
            x_any.at[bb, pl.ds(start, W), :], win.at[slot],
            sem_in.at[slot])

    def res_dma(slot, bb, ii):
        start = pl.multiple_of(ii * T, 32)
        return pltpu.make_async_copy(
            res_any.at[bb, pl.ds(start, W), :], res_win.at[slot],
            sem_res.at[slot])

    def occ_dma(slot, bb, ii):
        start = pl.multiple_of(ii * T + A, 32)
        return pltpu.make_async_copy(
            occ_any.at[bb, pl.ds(start, T), :], occ_win.at[slot],
            sem_occ.at[slot])

    def start_all(slot, bb, ii):
        in_dma(slot, bb, ii).start()
        if mode == "junction":
            res_dma(slot, bb, ii).start()
        if mode == "entry":
            occ_dma(slot, bb, ii).start()

    # Cross-step double buffering: step `lin` computes from slot lin%2
    # while slot (lin+1)%2 loads the next step's windows.
    @pl.when(lin == 0)
    def _():
        start_all(0, b, i)

    nxt = lin + 1

    @pl.when(nxt < nB * nT)
    def _():
        start_all(nxt % 2, nxt // nT, nxt % nT)

    cur = lin % 2
    in_dma(cur, b, i).wait()
    if mode == "junction":
        res_dma(cur, b, i).wait()
    if mode == "entry":
        occ_dma(cur, b, i).wait()

    @pl.when(i == 0)
    def _():
        stats_ref[0] = jnp.zeros_like(stats_ref[0])

    cA = consts_ref[0, _CA, :]
    cB = consts_ref[0, _CB, :]
    cAr = consts_ref[0, _CAR, :]
    cBr = consts_ref[0, _CBR, :]
    cInv = consts_ref[0, _CINV, :]
    cSw = consts_ref[0, _CSW, :]
    cSwd = consts_ref[0, _CSWD, :]

    # Output DMAs are reconstructed at wait time from the global sub-tile
    # index g (g enumerates (b, i, s)): item = g // (nT*n_sub), row =
    # A + (g mod nT*n_sub) * S within that item's buffer.
    def b_of(g):
        return g // (nT * n_sub)

    def row_of(g):
        return pl.multiple_of(A + (g % (nT * n_sub)) * S, 32)

    def raw_out_dma(slot, g):
        return pltpu.make_async_copy(
            stage_raw.at[slot], raw_any.at[b_of(g), pl.ds(row_of(g), S), :],
            sem_raw.at[slot])

    def res_out_dma(slot, g):
        return pltpu.make_async_copy(
            stage_res.at[slot],
            res_out_any.at[b_of(g), pl.ds(row_of(g), S), :],
            sem_resout.at[slot])

    def yq_out_dma(slot, g):
        return pltpu.make_async_copy(
            stage_yq.at[slot], yq_any.at[b_of(g), pl.ds(row_of(g), S), :],
            sem_yq.at[slot])

    lane = jax.lax.broadcasted_iota(jnp.int32, (S, LANES), 1)

    for s in range(n_sub):  # static unroll
        g = lin * n_sub + s
        slot = s % 2

        # drain the DMA that used this staging slot two sub-tiles ago
        @pl.when(g >= 2)
        def _(slot=slot, g=g):
            raw_out_dma(slot, g - 2).wait()
            if wd_ref is not None:
                res_out_dma(slot, g - 2).wait()
            if mode == "junction":
                yq_out_dma(slot, g - 2).wait()

        if mode == "entry":
            src = win  # int8 window; taps slice it directly
            tap_base = s * S + A
        else:
            # prologue: affine (+ residual join) + relu + quantize on the
            # sub-window [s*S, s*S + S + 2A) of the raw window
            seg = win[cur][s * S: s * S + S + 2 * A].astype(jnp.float32)
            h = seg * cA[None, :] + cB[None, :]
            if mode == "junction":
                rseg = res_win[cur][s * S: s * S + S + 2 * A].astype(
                    jnp.float32)
                h = h + rseg * cAr[None, :] + cBr[None, :]
            occw = seg[:, occ_lane:occ_lane + 1] > 0.5
            h = jnp.maximum(h, 0.0)
            q = jnp.clip(jnp.round(h * cInv[None, :]), -127.0, 127.0)
            hq[:] = jnp.where(occw, q, 0.0).astype(jnp.int8)
            if mode == "junction":
                stage_yq[slot] = hq[A: A + S]
                yq_out_dma(slot, g).start()
            src = None
            tap_base = A

        def tap(off):
            if mode == "entry":
                return win[cur][tap_base + off: tap_base + off + S]
            return hq[tap_base + off: tap_base + off + S]

        if w_ref.shape[1] == 2 * LANES:
            # 14 K=256 int8 MXU dots over tap PAIRS (`pair_weights`): the
            # int8 MXU needs >= 256-deep contractions for its full rate.
            # The pair is staged through a [S, 256] VMEM scratch (two
            # lane-block stores + one load) — a direct tpu.concatenate of
            # two window slices is rejected by Mosaic when their sublane
            # offsets differ ("offset mismatch on non-concat dimension").
            for p in range(w_ref.shape[0]):
                pair_buf[:, :LANES] = tap(offsets[2 * p])
                pair_buf[:, LANES:] = tap(
                    offsets[min(2 * p + 1, len(offsets) - 1)])
                d = jax.lax.dot_general(
                    pair_buf[:], w_ref[p], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                if p == 0:
                    acc[:] = d
                else:
                    acc[:] += d
        else:
            # 27 accumulated int8 MXU dots
            for k, off in enumerate(offsets):
                a_k = tap(off)
                d = jax.lax.dot_general(
                    a_k, w_ref[k], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                if k == 0:
                    acc[:] = d
                else:
                    acc[:] += d

        accf = acc[:].astype(jnp.float32)
        if mode == "entry":
            occ_seg = occ_win[cur][s * S: (s + 1) * S].astype(jnp.float32)
            raw = accf * cSw[None, :] * occ_seg
            rawb = jnp.where(lane == out_lane, occ_seg, raw).astype(
                jnp.bfloat16)
        else:
            occv = accf[:, out_lane:out_lane + 1] > 0.5
            raw = jnp.where(occv, accf * cSw[None, :], 0.0)
            rawb = raw.astype(jnp.bfloat16)
        stage_raw[slot] = rawb
        raw_out_dma(slot, g).start()

        r32 = rawb.astype(jnp.float32)
        stats_ref[0, 0, :] += jnp.sum(r32, axis=0)
        stats_ref[0, 1, :] += jnp.sum(r32 * r32, axis=0)

        if mode == "entry" and wd_ref is not None:
            ctr = win[cur][tap_base: tap_base + S]
            dd = jax.lax.dot_general(
                ctr, wd_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            accd[:] = dd
            rawd = accd[:].astype(jnp.float32) * cSwd[None, :] * occ_seg
            rawdb = jnp.where(lane == out_lane, occ_seg, rawd).astype(
                jnp.bfloat16)
            stage_res[slot] = rawdb
            res_out_dma(slot, g).start()
            d32 = rawdb.astype(jnp.float32)
            stats_ref[0, 2, :] += jnp.sum(d32, axis=0)
            stats_ref[0, 3, :] += jnp.sum(d32 * d32, axis=0)

    # final drain so the kernel never ends with in-flight output DMAs
    @pl.when(lin == nB * nT - 1)
    def _():
        gl = lin * n_sub + n_sub - 1
        for back in (1, 0):
            g = gl - back

            @pl.when(g >= 0)
            def _(g=g, back=back):
                slot = (n_sub - 1 - back) % 2
                raw_out_dma(slot, g).wait()
                if wd_ref is not None:
                    res_out_dma(slot, g).wait()
                if mode == "junction":
                    yq_out_dma(slot, g).wait()


def chain_conv(x_packed, wq, consts, spec: PackSpec, mode: str,
               tile: int, sub: int,
               res_packed=None, occ_packed=None, wdq=None,
               cout: int = 96, interpret: bool = False,
               kdepth: int = 1):
    """One fused conv kernel over packed rows.

    x_packed: [B, RB, 128] — int8 quantized input ("entry") or bf16 raw
    conv output ("mid"/"junction"). wq: int8 [K, 128, 128] embedded
    weights (`prep_weights_int8`). consts: f32 [B, NCONSTS, 128]
    (affine/join/quantize/requant rows — identity rows where unused).
    res_packed ("junction"): residual rows, int8 or bf16.
    occ_packed ("entry"): int8 occupancy rows (all lanes = occ).
    wdq ("entry", optional): second 1x1 conv (residual downsample).

    Returns (raw, stats) / (raw, res_raw, stats) / (raw, yq, stats):
    raw bf16 [B, RB, 128] with lane `cout` = occupancy; stats f32
    [B, n_stats, 128] masked sum/sumsq of each bf16 output.
    """
    assert mode in ("entry", "mid", "junction")
    B, RB, _ = x_packed.shape
    assert RB == spec.buf_rows, (RB, spec.buf_rows)
    T, A, S = int(tile), spec.apron, int(sub)
    W = T + 2 * A
    assert spec.content_rows % T == 0 and T % S == 0 and S % 32 == 0
    ntiles = spec.content_rows // T
    n_sub = T // S
    assert n_sub >= 2 and n_sub % 2 == 0, \
        "staging slot parity needs an even number of sub-tiles"
    offsets = spec.offsets() if wq.shape[0] == 27 else (0,)
    paired = kdepth == 2 and wq.shape[0] == 27
    if paired:
        wq = pair_weights(wq)
    has_second = mode == "entry" and wdq is not None
    n_stats = 4 if has_second else 2
    res_int8 = res_packed is not None and res_packed.dtype == jnp.int8

    in_dt = x_packed.dtype
    out_shapes = [
        jax.ShapeDtypeStruct((B, RB, LANES), jnp.bfloat16),  # raw
    ]
    if has_second:
        out_shapes.append(
            jax.ShapeDtypeStruct((B, RB, LANES), jnp.bfloat16))
    if mode == "junction":
        out_shapes.append(jax.ShapeDtypeStruct((B, RB, LANES), jnp.int8))
    out_shapes.append(
        jax.ShapeDtypeStruct((B, n_stats, LANES), jnp.float32))

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = [
        pl.BlockSpec(
            (1, NCONSTS, LANES), lambda b, i: (b, 0, 0),
            memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),  # wq
    ]
    inputs = [consts, wq]
    if has_second:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        inputs.append(wdq)
    in_specs.append(any_spec)
    inputs.append(x_packed)
    if mode == "junction":
        in_specs.append(any_spec)
        inputs.append(res_packed)
    if mode == "entry":
        in_specs.append(any_spec)
        inputs.append(occ_packed)

    out_specs = [any_spec] * (len(out_shapes) - 1) + [
        pl.BlockSpec((1, n_stats, LANES), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM)
    ]

    scratch = [
        pltpu.VMEM((2, W, LANES), in_dt),                      # win
        (pltpu.VMEM((2, W, LANES), res_packed.dtype)
         if mode == "junction" else None),                     # res_win
        (pltpu.VMEM((2, T, LANES), jnp.int8)
         if mode == "entry" else None),                        # occ_win
        (pltpu.VMEM((S + 2 * A, LANES), jnp.int8)
         if mode != "entry" else None),                        # hq
        (pltpu.VMEM((S, 2 * LANES), jnp.int8)
         if paired else None),                                 # pair_buf
        pltpu.VMEM((S, LANES), jnp.int32),                     # acc
        (pltpu.VMEM((S, LANES), jnp.int32)
         if has_second else None),                             # accd
        pltpu.VMEM((2, S, LANES), jnp.bfloat16),               # stage_raw
        (pltpu.VMEM((2, S, LANES), jnp.bfloat16)
         if has_second else None),                             # stage_res
        (pltpu.VMEM((2, S, LANES), jnp.int8)
         if mode == "junction" else None),                     # stage_yq
        pltpu.SemaphoreType.DMA((2,)),                         # sem_in
        (pltpu.SemaphoreType.DMA((2,))
         if mode == "junction" else None),                     # sem_res
        (pltpu.SemaphoreType.DMA((2,))
         if mode == "entry" else None),                        # sem_occ
        pltpu.SemaphoreType.DMA((2,)),                         # sem_raw
        (pltpu.SemaphoreType.DMA((2,))
         if has_second else None),                             # sem_resout
        (pltpu.SemaphoreType.DMA((2,))
         if mode == "junction" else None),                     # sem_yq
    ]
    live = [i for i, s in enumerate(scratch) if s is not None]

    def body(*refs):
        n_in = len(inputs)
        ins = refs[:n_in]
        outs = refs[n_in:n_in + len(out_shapes)]
        scr = refs[n_in + len(out_shapes):]
        full_scr = [None] * len(scratch)
        for j, idx in enumerate(live):
            full_scr[idx] = scr[j]
        (win, res_win, occ_win, hq, pair_buf, acc, accd, stage_raw,
         stage_res, stage_yq, sem_in, sem_res, sem_occ, sem_raw,
         sem_resout, sem_yq) = full_scr

        consts_ref = ins[0]
        w_ref = ins[1]
        p = 2
        wd_ref = None
        if has_second:
            wd_ref = ins[p]
            p += 1
        x_any = ins[p]
        p += 1
        res_any = occ_any = None
        if mode == "junction":
            res_any = ins[p]
            p += 1
        if mode == "entry":
            occ_any = ins[p]
            p += 1

        raw_any = outs[0]
        o = 1
        res_out_any = yq_any = None
        if has_second:
            res_out_any = outs[o]
            o += 1
        if mode == "junction":
            yq_any = outs[o]
            o += 1
        stats_ref = outs[o]

        _chain_body(
            spec, T, S, offsets, mode, res_int8, cout, cout, n_stats,
            consts_ref, w_ref, wd_ref, x_any, res_any, occ_any,
            raw_any, res_out_any, yq_any, stats_ref,
            win, res_win, occ_win, hq, pair_buf, acc, accd,
            stage_raw, stage_res, stage_yq,
            sem_in, sem_res, sem_occ, sem_raw, sem_resout, sem_yq)

    out = pl.pallas_call(
        body,
        grid=(B, ntiles),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[s for s in scratch if s is not None],
        interpret=interpret,
    )(*inputs)
    return out


# ------------------------------------------------------- stage orchestrator


def _pad_vec(v, cout: int, fill: float = 0.0):
    """[cout] f32 -> [128] with `fill` beyond cout."""
    out = jnp.full((LANES,), fill, jnp.float32)
    return jax.lax.dynamic_update_slice(out, v.astype(jnp.float32), (0,))


def _consts(B, A=None, Bc=None, Ar=None, Br=None, inv=None, sw=None,
            swd=None):
    """Assemble the [B, NCONSTS, 128] consts operand (identity rows where
    a kernel variant does not use them). Per-item rows (A, B, Ar, Br from
    InstanceNorm stats) may be [B, 128]; static rows [128] broadcast."""
    def row(v, default):
        if v is None:
            v = jnp.full((LANES,), default, jnp.float32)
        v = jnp.asarray(v, jnp.float32)
        if v.ndim == 1:
            v = jnp.broadcast_to(v[None], (B, LANES))
        return v
    rows = [row(A, 1.0), row(Bc, 0.0), row(Ar, 0.0), row(Br, 0.0),
            row(inv, 1.0), row(sw, 1.0), row(swd, 1.0)]
    return jnp.stack(rows, axis=1)


def fused_basic_stage(x, bound_in, occ, blocks, grid_dims,
                      sigma: float, eps: float = 1e-5,
                      tile: int = 8192, sub: int = 2048,
                      interpret: bool = False, kdepth: int = 1):
    """Run a stack of BasicBlocks (stride-1, one grid level) through the
    fused kernel chain. Semantics mirror `Res16UNetBase._block` on the
    dense int8 path (static-sigma activation bounds, int8 residual
    junctions): conv -> IN -> relu -> conv -> IN -> (+residual) -> relu
    per block, with block0's residual through a 1x1 conv + IN when
    cin != planes (`mask3d/models/modules/resnet_block.py:7-68`).

    x: [B, X, Y, Z, cin] bf16/f32, zeros at unoccupied cells.
    bound_in: f32 [cin] static bound on |x| (sigma-derived upstream).
    occ: [B, X, Y, Z, 1] occupancy in {0, 1}.
    blocks: per-block param dicts w1,g1,b1,w2,g2,b2 (+ wd,gd,bd on
    block 0 when cin != planes).
    Returns (y bf16 [B, X, Y, Z, planes], bound_out f32 [planes]).
    """
    B = x.shape[0]
    cin = x.shape[-1]
    planes = blocks[0]["w1"].shape[-1]
    assert planes < LANES, "occupancy needs a spare lane beyond cout"
    assert cin <= LANES
    n = len(blocks)
    spec = make_pack_spec(grid_dims, quantum=tile)
    # the junction kernel holds TWO double-buffered bf16 windows (raw +
    # residual); run it at half tile to stay under the ~16 MB VMEM budget
    kw = dict(tile=tile, sub=sub, interpret=interpret, kdepth=kdepth)
    kw_j = dict(tile=tile // 2, sub=sub // 2, interpret=interpret,
                kdepth=kdepth)
    count = jnp.sum(occ.astype(jnp.float32), axis=(1, 2, 3))[:, 0]

    def sig_bound(g, b):
        return sigma * jnp.abs(g.astype(jnp.float32)) + jnp.abs(
            b.astype(jnp.float32))

    xq_pack, sx = quantize_pack(x, bound_in, occ, spec)
    occ_pack = pack_grid(
        jnp.broadcast_to(occ, x.shape[:4] + (LANES,)).astype(jnp.int8),
        spec)

    has_down = cin != planes
    b0 = blocks[0]
    wq1, sw1 = prep_weights_int8(b0["w1"], sx, cin, planes, None, None)
    wdq = swd = None
    if has_down:
        wdq, swd = prep_weights_int8(
            b0["wd"], sx, cin, planes, None, None)
    consts0 = _consts(B, sw=sw1, swd=swd)
    outs = chain_conv(xq_pack, wq1, consts0, spec, "entry",
                      occ_packed=occ_pack, wdq=wdq, cout=planes, **kw)
    if has_down:
        raw1, res_raw, stats = outs
    else:
        raw1, stats = outs
        res_raw = None

    # residual of block 0
    if has_down:
        res_arr = None  # filled after stats -> affine below
    else:
        res_arr = xq_pack
        res_A = jnp.where(jnp.arange(LANES) < planes,
                          _pad_vec(sx, cin, 1.0), 0.0)
        res_B = None
        bres = bound_in

    y_bound = None
    for idx in range(n):
        blk = blocks[idx]
        A1, B1 = in_affine(stats[:, 0], stats[:, 1], count,
                           blk["g1"], blk["b1"], planes, eps)
        bound1 = sig_bound(blk["g1"], blk["b1"])
        inv1, s1 = quant_consts(bound1, planes)
        wq2, sw2 = prep_weights_int8(
            blk["w2"], s1, planes, planes, planes, planes)
        consts_m = _consts(B, A=A1, Bc=B1, inv=inv1, sw=sw2)
        raw2, stats2 = chain_conv(raw1, wq2, consts_m, spec, "mid",
                                  cout=planes, **kw)
        A2, B2 = in_affine(stats2[:, 0], stats2[:, 1], count,
                           blk["g2"], blk["b2"], planes, eps)
        bound2 = sig_bound(blk["g2"], blk["b2"])
        if idx == 0 and has_down:
            Ad, Bd = in_affine(stats[:, 2], stats[:, 3], count,
                               blk["gd"], blk["bd"], planes, eps)
            # zero the residual affine beyond the real channels: the raw
            # occupancy lane must flow through the join via the MAIN
            # affine only (A=1 there), not get doubled by the residual's
            lane_ix = jnp.arange(LANES)[None, :]
            Ad = jnp.where(lane_ix < planes, Ad, 0.0)
            res_arr, res_A, res_B = res_raw, Ad, Bd
            bres = sig_bound(blk["gd"], blk["bd"])
        y_bound = bound2 + _pad_vec(bres, planes)[:planes]

        if idx < n - 1:
            nxt = blocks[idx + 1]
            inv_y, s_y = quant_consts(y_bound, planes)
            wq1n, sw1n = prep_weights_int8(
                nxt["w1"], s_y, planes, planes, planes, planes)
            consts_j = _consts(B, A=A2, Bc=B2, Ar=res_A, Br=res_B,
                               inv=inv_y, sw=sw1n)
            raw1, yq, stats = chain_conv(
                raw2, wq1n, consts_j, spec, "junction",
                res_packed=res_arr, cout=planes, **kw_j)
            # identity residual of the NEXT block = this junction's y
            res_arr = yq
            res_A = jnp.where(jnp.arange(LANES) < planes,
                              _pad_vec(s_y, planes, 1.0), 0.0)
            res_B = None
            bres = y_bound
        else:
            # final join in XLA (the stage output feeds taps/skips as
            # bf16; one fused elementwise pass)
            raw2_g = unpack_grid(raw2, spec, planes).astype(jnp.float32)
            occf = occ.astype(jnp.float32)
            o2 = raw2_g * A2[:, None, None, None, :planes] \
                + occf * B2[:, None, None, None, :planes]
            res_g = unpack_grid(res_arr, spec, planes)
            if res_arr.dtype == jnp.int8:
                # static per-channel dequant scale (identity residual)
                res_t = res_g.astype(jnp.float32) \
                    * res_A[None, None, None, None, :planes]
            else:
                res_t = res_g.astype(jnp.float32) \
                    * res_A[:, None, None, None, :planes] \
                    + occf * res_B[:, None, None, None, :planes]
            y = jnp.maximum(o2 + res_t, 0.0)
            return y.astype(jnp.bfloat16), y_bound


def pallas_chain_available() -> bool:
    """One-time compile probe (remote libtpu builds rotate — see
    utils/probe.py): True when the fused chain kernels Mosaic-compile on
    this backend. Non-TPU backends use the interpreter (always True)."""
    if jax.default_backend() != "tpu":
        return True
    from mask3d_tpu.utils import probe

    def _build():
        dims = (8, 6, 6)
        spec = make_pack_spec(dims, quantum=128)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((1,) + dims + (96,)),
                        jnp.bfloat16)
        occ = jnp.ones((1,) + dims + (1,), jnp.float32)
        bound = jnp.ones((96,), jnp.float32)

        @jax.jit
        def run(x):
            xq, sx = quantize_pack(x, bound, occ, spec)
            occ_pack = pack_grid(
                jnp.broadcast_to(occ, x.shape[:4] + (LANES,)).astype(
                    jnp.int8), spec)
            w = jnp.ones((27, 96, 96), jnp.float32) * 0.01
            wq, sw = prep_weights_int8(w, sx, 96, 96, None, None)
            consts = _consts(1, sw=sw)
            raw, stats = chain_conv(xq, wq, consts, spec, "entry",
                                    tile=128, sub=32,
                                    occ_packed=occ_pack, cout=96)
            # one junction probe too (the most complex variant)
            A = jnp.ones((LANES,), jnp.float32)
            Bc = jnp.zeros((LANES,), jnp.float32)
            inv, s1 = quant_consts(bound, 96)
            wq2, sw2 = prep_weights_int8(w, s1, 96, 96, 96, 96)
            cj = _consts(1, A=A, Bc=Bc, Ar=A * 0.01, inv=inv, sw=sw2)
            r2, yq, st2 = chain_conv(raw, wq2, cj, spec, "junction",
                                     tile=128, sub=32,
                                     res_packed=xq, cout=96)
            return r2[0, 0, 0] + yq[0, 0, 0].astype(jnp.float32)

        jax.block_until_ready(run(x))

    return probe.compiles("pallas_chain", _build)
