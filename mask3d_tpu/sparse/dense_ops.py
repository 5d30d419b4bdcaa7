"""Dense-grid execution of sparse (submanifold) convolutions.

TPU-first alternative to gather-matmul sparse convolution: room-scene voxel
grids are small (10^5-10^6 cells), so the backbone can scatter its rows into
the dense grid once, run every convolution as `lax.conv_general_dilated`
(pure MXU work — no gathers), and gather rows back only at the feature-map
tap points. Submanifold semantics (outputs only at occupied voxels —
MinkowskiEngine convolution behavior, consumed via
`mask3d/models/modules/common.py:128-160`) are preserved by re-masking with
the occupancy grid after every conv; zero padding equals the missing-neighbor
zeros of the gather path, so both paths are numerically identical (tested in
`tests/test_dense_ops.py`).

Measured motivation: XLA TPU row gathers run at ~65M rows/s, making the
gather path ~10 s/batch; dense conv on these grids is MXU-bound instead.

Weight layout compatibility: a gather-path weight `[K, Cin, Cout]` with the
`cube_offsets` enumeration (x-major, z-fastest == C-order ravel of the
kernel cube) reshapes directly to `[kx, ky, kz, Cin, Cout]`.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mask3d_tpu.sparse.core import SparseLevel
from mask3d_tpu.sparse import pallas_gather

_DN = ("NHWDC", "HWDIO", "NHWDC")  # 3 spatial dims, feature-last


def static_keys(level: SparseLevel, grid_dims: Sequence[int]):
    """Linear cell index of each row in the STATIC batch grid (the per-item
    `level.key` uses per-item dims and cannot index a shared dense grid)."""
    gx, gy, gz = grid_dims
    c = level.coords
    return (c[..., 0] * gy + c[..., 1]) * gz + c[..., 2]


def scatter_rows(feats, level: SparseLevel, grid_dims: Sequence[int]):
    """[B, N, C] rows -> [B, Gx, Gy, Gz, C] dense grid (zeros elsewhere)."""
    b, _, c = feats.shape
    gx, gy, gz = grid_dims
    cells = gx * gy * gz
    key = jnp.where(static_keys(level, grid_dims) < cells,
                    static_keys(level, grid_dims), cells)
    key = jnp.where(level.valid, key, cells)
    b_idx = jnp.arange(b, dtype=jnp.int32)[:, None]
    flat = (
        jnp.zeros((b, cells + 1, c), feats.dtype)
        .at[b_idx, key]
        .set(feats, mode="drop")
    )
    return flat[:, :cells].reshape(b, gx, gy, gz, c)


_GATHER_TILE = 128


def _auto_window(cells: int, n_rows: int) -> tuple:
    """Static (W1, W2) windows for the monotone-gather fast path: W1 covers
    the measured ~p95 per-tile key span of room scenes at tile 128
    (docs/ARCHITECTURE.md), W1+W2 the max with ~1.2-2.5x headroom; a batch
    violating W1+W2 falls back to the exact XLA gather."""
    ratio = cells / n_rows
    if ratio >= 3.0:
        return (1792, 2048)
    if ratio >= 1.0:
        return (768, 1024)
    if ratio >= 0.2:
        return (384, 512)
    return (256, 256)


def gather_rows(dense, level: SparseLevel, grid_dims: Sequence[int],
                monotone: bool | None = None):
    """[B, Gx, Gy, Gz, C] -> [B, N, C] rows of this level (padding zeroed).

    `monotone=None` auto-selects the Pallas monotone-gather kernel on TPU
    (static keys ascend per item — `static_keys` is lexicographic in
    (x, y, z)); XLA's row gather runs at ~65M rows/s regardless of width,
    while the windowed one-hot select rides the MXU.
    """
    b = dense.shape[0]
    c = dense.shape[-1]
    n = level.valid.shape[1]
    cells = grid_dims[0] * grid_dims[1] * grid_dims[2]
    key = jnp.clip(static_keys(level, grid_dims), 0, cells - 1)
    flat = dense.reshape(b, cells, c)
    if monotone is None:
        # Default OFF: measured on v5e (2026-08-18), the windowed one-hot
        # kernel beats the raw XLA gather per-op (4.2 vs 7.9 ms on the
        # level-0 tap) but the Mosaic DMA constraints force a channel pad
        # to 128 lanes plus a {2,0,1}->{2,1,0} relayout copy, and the
        # lax.cond fallback wrapper adds operand overhead — end-to-end the
        # chain is a wash (docs/ARCHITECTURE.md). Kept as an explicit
        # opt-in for much sparser scenes (gather_pallas-scale grids).
        monotone = False
    if monotone:
        window = _auto_window(cells, n)
        if pallas_gather.supports(n, cells, _GATHER_TILE, window):
            rows = pallas_gather.monotone_gather(
                flat, key, level.valid, _GATHER_TILE, window
            )
            return rows.astype(dense.dtype)
    # Gather over the grid's NATIVE physical order: XLA lays the dense
    # grids out as [x, y, z, b, c] (batch second-minor — trace layout
    # {4,0,3,2,1}), so the batch-major [B, cells, C] gather operand costs
    # a full relayout copy (+2.2 ms on the L0 flagship tap, copy.2123 in
    # the device trace). A logical transpose to [cells, b, c] + reshape to
    # [cells*B, C] is a free bitcast of that layout, and the row gather
    # (flat index key*B + b) runs straight off it.
    if cells * b < 2**31:
        flat_t = jnp.transpose(flat, (1, 0, 2)).reshape(cells * b, c)
        idx = key * b + jnp.arange(b, dtype=key.dtype)[:, None]
        rows = jnp.take(flat_t, idx, axis=0)
    else:
        # cells*b would overflow the int32 flat index (grids this large
        # normally run backbone_impl=gather_pallas, but stay correct):
        # per-item batched gather, no flat-index arithmetic.
        rows = jnp.take_along_axis(
            flat, key[..., None].astype(jnp.int32), axis=1
        )
    return jnp.where(level.valid[..., None], rows, 0)


def occupancy(level: SparseLevel, grid_dims: Sequence[int], dtype=jnp.float32):
    """[B, Gx, Gy, Gz, 1] indicator of occupied cells at this level."""
    ones = jnp.ones(level.valid.shape + (1,), dtype)
    ones = jnp.where(level.valid[..., None], ones, 0)
    return scatter_rows(ones, level, grid_dims)


def _conv(x, w, strides, padding, transpose=False, out_dtype=jnp.float32):
    """MXU accumulation is always f32; `out_dtype` only sets the element
    type the conv WRITES. Emitting bf16 directly (instead of f32 + a later
    cast) halves the conv-output HBM traffic on the stride-1 grids — the
    dominant write stream of the dense backbone — at the cost of applying
    bias/mask after the single f32->bf16 rounding instead of before."""
    if transpose:
        return jax.lax.conv_transpose(
            x, w, strides=strides, padding=padding, dimension_numbers=_DN,
            preferred_element_type=out_dtype,
        )
    return jax.lax.conv_general_dilated(
        x, w, window_strides=strides, padding=padding,
        dimension_numbers=_DN,
        preferred_element_type=out_dtype,
    )


def dense_conv_same(x, weight, occ, bias=None, compute_dtype=None):
    """Same-stride submanifold conv. weight: [K, Cin, Cout] (cube ravel)."""
    k = round(weight.shape[0] ** (1.0 / 3.0))
    assert k**3 == weight.shape[0], weight.shape
    w = weight.reshape(k, k, k, weight.shape[1], weight.shape[2])
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    out = _conv(x, w, (1, 1, 1), "SAME", out_dtype=x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out * occ.astype(out.dtype)


class QGrid(NamedTuple):
    """Statically-quantized dense grid: `deq = q * scale` (per channel).

    Produced at block junctions when `model.int8_residual` is set: the
    intermediate block output is materialized ONLY as int8 (its bf16 form
    never hits HBM), halving the junction-epilogue bandwidth — the
    epilogue+quantize passes were 18.3 ms of the 86.2 ms flagship forward
    (jax.profiler op dump, 2026-08-19). Consumers: the next block's conv
    (which needs exactly this int8 form) and its residual path
    (dequantized in-register inside the join pass).
    """

    q: jnp.ndarray      # int8 [B, Gx, Gy, Gz, C]
    scale: jnp.ndarray  # f32 [C], dequant scale (= bound / 127)


def quantize_static(x, bound):
    """Quantize with the static per-channel bound — bit-identical to the
    input quantization inside `dense_conv_same_int8` given the same bound
    (shared math so QGrid-fed convs match quantize-at-conv exactly)."""
    sx = jnp.maximum(bound.astype(jnp.float32), 1e-8) * (1.0 / 127.0)
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) * (1.0 / sx)), -127.0, 127.0
    ).astype(jnp.int8)
    return QGrid(q, sx)


def dequantize(qg: QGrid, dtype=jnp.float32):
    return (qg.q.astype(jnp.float32) * qg.scale).astype(dtype)


def dense_conv_same_int8(x, weight, occ, bias=None, out_dtype=jnp.bfloat16,
                         act_bound=None):
    """Dynamically-quantized int8 submanifold conv (inference fast path).

    v5e int8 MXU sustains ~1.5x the bf16 matmul rate (tools/bench_int8.py:
    178.8 vs 119.8 TFLOP/s measured 2026-08-19); the four stride-1 convs
    are 41% of the flagship device forward, so stage-8 runs them in int8
    at eval when `model.int8_stride1` is set (parity gate:
    tests/test_e2e.py::test_int8_eval_metrics_match_fp32).

    Scheme: per-input-channel dynamic activation scales (absmax over the
    batch grid — a [Cin] reduction that XLA fuses with the producer pass),
    folded into the weight before its own per-output-channel quantization;
    i32 MXU accumulation; f32 requant epilogue fused into the conv output
    (never materializing the i32 grid — the round-2 OOM came from emitting
    s32 as the conv result). Submanifold zeros quantize to 0, so the
    occupancy re-mask semantics are unchanged.

    `act_bound` (f32[Cin], optional): a STATIC per-channel bound on |x|
    derived from the producing InstanceNorm's affine params
    (`model.int8_act_sigma` — see backbone.py). Skips the absmax reduce
    pass entirely; values beyond the bound saturate at +-127 (the clip
    below). k=1 weights make this the int8 1x1 (downsample) conv.
    """
    k = round(weight.shape[0] ** (1.0 / 3.0))
    assert k**3 == weight.shape[0], weight.shape
    cin, cout = weight.shape[1], weight.shape[2]
    w = weight.reshape(k, k, k, cin, cout).astype(jnp.float32)

    if isinstance(x, QGrid):
        # Pre-quantized by the producing block junction (int8_residual):
        # no quantize pass at all — the junction already wrote int8.
        xq, sx = x.q, x.scale
    else:
        if act_bound is None:
            ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(0, 1, 2, 3))
        else:
            ax = act_bound.astype(jnp.float32)  # [Cin]
        sx = jnp.maximum(ax, 1e-8) * (1.0 / 127.0)
        xq = jnp.clip(
            jnp.round(x.astype(jnp.float32) * (1.0 / sx)), -127.0, 127.0
        ).astype(jnp.int8)

    wf = w * sx[None, None, None, :, None]  # fold activation scales
    aw = jnp.max(jnp.abs(wf), axis=(0, 1, 2, 3))  # [Cout]
    sw = jnp.maximum(aw, 1e-12) * (1.0 / 127.0)
    wq = jnp.clip(jnp.round(wf / sw), -127.0, 127.0).astype(jnp.int8)

    acc = jax.lax.conv_general_dilated(
        xq, wq, window_strides=(1, 1, 1), padding="SAME",
        dimension_numbers=_DN, preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * sw
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return (out * occ.astype(out.dtype)).astype(out_dtype)


def _zfold_conv(x, weight, compute_dtype=None):
    """k^3 conv as a banded 2D conv with z folded into the feature dims.

    For tiny contraction dims (k^3 * Cin, e.g. the 5^3 stem conv on the
    1-channel all-ones input) the direct 3D convolution starves the MXU —
    measured 30.6 ms of a 218 ms flagship forward on v5e. Folding z makes
    the per-(x, y) contraction (k^2 * Z * Cin) x (Z * Cout) — MXU-shaped —
    at the cost of the banded weight's zeros. The banded 2D weight
    w2d[dx, dy, z_in*Cin+ci, z_out*Cout+co] = w[dx, dy, z_in-z_out+r, ci, co]
    (zero outside the band) makes this numerically identical to the 3D
    conv (oracle-tested in tests/test_dense_ops.py).

    Returns the FOLDED output [B, Gx, Gy, Gz*Cout] (index = z*Cout + c).
    """
    b, gx, gy, gz, cin = x.shape
    k = round(weight.shape[0] ** (1.0 / 3.0))
    assert k**3 == weight.shape[0], weight.shape
    cout = weight.shape[-1]
    w = weight.reshape(k, k, k, cin, cout)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    r = k // 2
    # E[dz, z_in, z_out] = 1 iff z_in == z_out + dz - r (static 0/1 bands).
    band = np.stack([np.eye(gz, gz, k=-(dz - r)) for dz in range(k)])
    w2d = jnp.einsum(
        "dzo,xydcf->xyzcof", jnp.asarray(band, w.dtype), w
    ).reshape(k, k, gz * cin, gz * cout)
    return jax.lax.conv_general_dilated(
        x.reshape(b, gx, gy, gz * cin), w2d, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )


def dense_conv_same_zfold(x, weight, occ, bias=None, compute_dtype=None):
    """`dense_conv_same` computed via `_zfold_conv` (numerically identical,
    oracle-tested in tests/test_dense_ops.py)."""
    b, gx, gy, gz, _ = x.shape
    cout = weight.shape[-1]
    out = _zfold_conv(x, weight, compute_dtype).reshape(b, gx, gy, gz, cout)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out * occ.astype(out.dtype)


def dense_stem_fused(x, weight, occ, gamma, beta, bias=None,
                     compute_dtype=None, eps=1e-5):
    """Fused stem: zfold conv + InstanceNorm + ReLU in the FOLDED layout.

    Numerically identical to
    `relu(dense_instance_norm(dense_conv_same_zfold(x, w, occ, bias), occ,
    gamma, beta))` (oracle-tested in tests/test_dense_ops.py), but the norm
    stats and affine+relu run on the conv's native [B, Gx, Gy, Gz*C] folded
    tensor: the 32-channel 5D form pads to 128 lanes (4x wasted HBM per
    pass) and forces relayout copies around the elementwise chain; the
    folded chain does one transpose-fusion write at the end.
    """
    b, gx, gy, gz, _ = x.shape
    cout = weight.shape[-1]
    yf = _zfold_conv(x, weight, compute_dtype)
    # [B, Gx, Gy, Gz*Cout], z-major folding (index = z*Cout + c)
    if bias is not None:
        yf = yf + jnp.tile(bias, gz).astype(yf.dtype)
    occf = occ.reshape(b, gx, gy, gz)
    # z-major repeat of the occupancy into the folded lanes, in yf's dtype
    # (the 0/1 mask multiply is exact in bf16; keeping the [B,Gx,Gy,Gz*C]
    # intermediate out of f32 halves its HBM footprint — the f32 occr
    # variant materialized a transposed f32 copy, ~1.8 ms on v5e).
    occy = jnp.repeat(
        occf.astype(yf.dtype), cout, axis=-1, total_repeat_length=gz * cout
    )
    # Masked IN stats per (item, channel): fold-aware — sum over (x, y)
    # keeps the folded lanes, then the tiny [B, Gz*C] -> [B, C] z-reduce.
    ym = (yf * occy).astype(jnp.float32)
    s1 = jnp.sum(ym, axis=(1, 2)).reshape(b, gz, cout).sum(axis=1)
    s2 = jnp.sum(ym * ym, axis=(1, 2)).reshape(b, gz, cout).sum(axis=1)
    cnt = jnp.maximum(
        jnp.sum(occf.astype(jnp.float32), axis=(1, 2, 3)), 1.0
    )[:, None]  # [B, 1]
    mean = s1 / cnt
    var = jnp.maximum(s2 / cnt - mean * mean, 0.0)
    rs = jax.lax.rsqrt(var + eps)
    kk = (rs * gamma).astype(yf.dtype)  # [B, C]
    tt = (beta - mean * rs * gamma).astype(yf.dtype)  # [B, C]
    # Affine + occupancy re-mask + relu, still folded: out = relu(
    # (y*occ)*k + occ*t) with k/t tiled over z (z-major). The reshape to
    # 5D at the end is the single transpose-fusion write.
    kf = jnp.tile(kk, (1, gz))[:, None, None, :]  # [B, 1, 1, Gz*C]
    tf = jnp.tile(tt, (1, gz))[:, None, None, :]
    out = jnp.maximum(yf * occy * kf + occy * tf, 0)
    return out.reshape(b, gx, gy, gz, cout)


def dense_basic_stage_folded(x, occ, blocks, compute_dtype=None, eps=1e-5):
    """An identity-residual BasicBlock stack in the z-FOLDED layout.

    The narrow (<= 32-ch) stages pad to 128 lanes in the 5D layout — 4x
    wasted HBM on every conv/norm/relu pass plus relayout copies (the
    stem had the same disease; `dense_stem_fused`). This runs the WHOLE
    stage folded: one reshape in, per-block [banded conv2d -> IN -> relu
    -> banded conv2d -> IN -> +residual -> relu] with the norm stats
    computed fold-aware, one reshape out. Numerically equivalent to the
    unfolded `dense_conv_same`/`dense_instance_norm` chain (the banded
    weight adds exact-zero products only; oracle-tested in
    tests/test_dense_ops.py).

    blocks: per-block dicts w1,g1,b1,w2,g2,b2 with cin == cout == C
    (identity residuals — the reference's stage-1/2 shape,
    `mask3d/models/resnet_block.py:7-40`).
    """
    b, gx, gy, gz, c = x.shape
    dt = compute_dtype or x.dtype
    k = round(blocks[0]["w1"].shape[0] ** (1.0 / 3.0))
    band = jnp.asarray(
        np.stack([np.eye(gz, gz, k=-(dz - k // 2)) for dz in range(k)]),
        dt,
    )

    def w2d(w):
        wk = w.reshape(k, k, k, c, c).astype(dt)
        return jnp.einsum("dzo,xydcf->xyzcof", band, wk).reshape(
            k, k, gz * c, gz * c)

    xf = x.astype(dt).reshape(b, gx, gy, gz * c)
    occf = occ.reshape(b, gx, gy, gz)
    occy = jnp.repeat(
        occf.astype(dt), c, axis=-1, total_repeat_length=gz * c)
    cnt = jnp.maximum(
        jnp.sum(occf.astype(jnp.float32), axis=(1, 2, 3)), 1.0
    )[:, None]

    def conv(h, w):
        return jax.lax.conv_general_dilated(
            h, w2d(w), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=h.dtype,
        )

    def norm(yf, gamma, beta):
        """Masked-IN affine consts (kf, tf) tiled over the fold."""
        ym = (yf * occy).astype(jnp.float32)
        s1 = jnp.sum(ym, axis=(1, 2)).reshape(b, gz, c).sum(axis=1)
        s2 = jnp.sum(ym * ym, axis=(1, 2)).reshape(b, gz, c).sum(axis=1)
        mean = s1 / cnt
        var = jnp.maximum(s2 / cnt - mean * mean, 0.0)
        rs = jax.lax.rsqrt(var + eps)
        kk = (rs * gamma).astype(dt)
        tt = (beta - mean * rs * gamma).astype(dt)
        kf = jnp.tile(kk, (1, gz))[:, None, None, :]
        tf = jnp.tile(tt, (1, gz))[:, None, None, :]
        return kf, tf

    for blk in blocks:
        y1 = conv(xf, blk["w1"])
        k1, t1 = norm(y1, blk["g1"], blk["b1"])
        h = jnp.maximum(y1 * occy * k1 + occy * t1, 0)
        y2 = conv(h, blk["w2"])
        k2, t2 = norm(y2, blk["g2"], blk["b2"])
        xf = jnp.maximum(y2 * occy * k2 + occy * t2 + xf, 0)
    return xf.reshape(b, gx, gy, gz, c)


def dense_conv_down(x, weight, occ_coarse, bias=None, compute_dtype=None):
    """Stride-2 kernel-2 conv; odd grid dims are zero-padded up (the
    missing children of a boundary coarse cell are exactly the gather
    path's out-of-range zeros). weight: [8, Cin, Cout] with the 3-bit
    (x,y,z) child enumeration (== C-order [2,2,2] ravel)."""
    w = weight.reshape(2, 2, 2, weight.shape[1], weight.shape[2])
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    pads = (
        (0, 0),
        (0, x.shape[1] % 2), (0, x.shape[2] % 2), (0, x.shape[3] % 2),
        (0, 0),
    )
    if any(p[1] for p in pads):
        x = jnp.pad(x, pads)
    out = _conv(x, w, (2, 2, 2), "VALID", out_dtype=x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out * occ_coarse.astype(out.dtype)


def dense_conv_tr(x, weight, occ_fine, bias=None, compute_dtype=None):
    """Transposed stride-2 kernel-2 conv: out[2i+d] = in[i] @ w[d].

    `lax.conv_transpose` applies the kernel spatially mirrored relative to
    this contract, so the cube axes are flipped here.
    """
    w = weight.reshape(2, 2, 2, weight.shape[1], weight.shape[2])
    w = w[::-1, ::-1, ::-1]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    out = _conv(x, w, (2, 2, 2), "VALID", transpose=True, out_dtype=x.dtype)
    # Odd fine dims: the last coarse cell's high-half children fall past
    # the fine extent — slice them off.
    fx, fy, fz = occ_fine.shape[1:4]
    out = out[:, :fx, :fy, :fz]
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out * occ_fine.astype(out.dtype)


def dense_instance_norm(x, occ, gamma, beta, eps=1e-5):
    """Per-item per-channel norm over occupied cells (ME InstanceNorm).

    PRECONDITION: unoccupied cells of `x` are exactly 0 (every producer —
    conv epilogues, scatters, cat — masks by `occ`). The stats then need
    no mask, and the normalize collapses to ONE fused multiply-add in
    x's dtype: out = x*k + occ*t with per-(item, channel)
    k = gamma/sqrt(var+eps), t = beta - mean*k — empty cells stay 0
    (x=0, occ=0). The previous formulation materialized an f32 copy of
    the whole grid and re-masked after the affine; on v5e the four
    stride-1 norms were the single largest cost of the flagship forward
    (~13.5 ms each, jax.profiler trace 2026-08-18).
    """
    axes = (1, 2, 3)
    x32 = x.astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(occ.astype(jnp.float32), axis=axes), 1.0)
    cnt = cnt[:, None, None, None, :]
    mean = jnp.sum(x32, axis=axes, keepdims=True) / cnt
    sq = jnp.sum(x32 * x32, axis=axes, keepdims=True) / cnt
    var = jnp.maximum(sq - mean * mean, 0.0)
    rs = jax.lax.rsqrt(var + eps)
    k = (rs * gamma).astype(x.dtype)
    t = ((beta - mean * rs * gamma)).astype(x.dtype)
    return x * k + occ.astype(x.dtype) * t


def _pool_pad(x):
    """Right-pad odd spatial dims so stride-2 windows cover the last
    slab (reduce_window fills the pad with the init value — identity)."""
    return (
        (0, 0),
        (0, x.shape[1] % 2), (0, x.shape[2] % 2), (0, x.shape[3] % 2),
        (0, 0),
    )


def maxpool2(occ):
    """2x2x2 stride-2 max pooling of a dense grid [B, X, Y, Z, C]; odd
    dims pool their lone boundary slab (output = ceil(d/2))."""
    return jax.lax.reduce_window(
        occ, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 2, 2, 2, 1),
        window_strides=(1, 2, 2, 2, 1),
        padding=_pool_pad(occ),
    )


def sumpool2(x):
    """2x2x2 stride-2 sum pooling of a dense grid [B, X, Y, Z, C]; odd
    dims pool their lone boundary slab (output = ceil(d/2))."""
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        window_dimensions=(1, 2, 2, 2, 1),
        window_strides=(1, 2, 2, 2, 1),
        padding=_pool_pad(x),
    )


def cell_coord_grid(grid_dims, batch: int, dtype=jnp.float32):
    """[B, Gx, Gy, Gz, 3] grid whose value at each cell is its own (x, y, z)
    cell index — the dense-grid form of `SparseLevel.coords` rows."""
    gx, gy, gz = grid_dims
    cx = jax.lax.broadcasted_iota(dtype, (gx, gy, gz), 0)
    cy = jax.lax.broadcasted_iota(dtype, (gx, gy, gz), 1)
    cz = jax.lax.broadcasted_iota(dtype, (gx, gy, gz), 2)
    g = jnp.stack([cx, cy, cz], axis=-1)
    return jnp.broadcast_to(g[None], (batch,) + g.shape)


def pooled_row_pyramid(grids, occ, levels, grid_dims, constrain=None):
    """Mean-pooled feature pyramid computed on dense grids.

    Grid-space equivalent of chaining `ops.avg_pool` over PoolMaps
    (reference: repeated MinkowskiAvgPooling, `mask3d/models/mask3d.py:
    286-299,546-547`): at each coarser level an occupied cell's value is
    the occupancy-weighted mean of its occupied children. Yields, per
    coarser level (`levels[1:]`), the ROW forms of every input grid,
    gathered at that level's rows.

    `grids`: list of [B, Gx, Gy, Gz, C_j] arrays with zeros at unoccupied
    cells; each is pooled in f32 but STORED back in its own dtype — the
    dominant HBM cost is re-reading the level-0 grid, so a bf16 backbone
    grid stays bf16 (a fused f32 concat of all inputs was measured ~55 ms
    SLOWER per forward on v5e than the row-space segment-sum chain it
    replaced; per-grid native-dtype pooling is what wins). `occ`: per-level
    occupancy grids (`SparseBatch.occ`); unoccupied coarse cells stay zero
    because all their children are zero.
    """
    gs = list(grids)
    occ_f = occ[0].astype(jnp.float32)
    out = []
    for li in range(1, len(levels)):
        n = jnp.maximum(sumpool2(occ_f), 1.0)
        pooled = []
        for g in gs:
            p = (sumpool2(g.astype(jnp.float32)) / n).astype(g.dtype)
            if constrain is not None:
                p = constrain(p, li)
            pooled.append(p)
        gs = pooled
        occ_f = occ[li].astype(jnp.float32)
        out.append([
            gather_rows(g, levels[li], grid_dims[li]) for g in gs
        ])
    return out


def level_from_keys(keys, raw_count, dims, stride: int, capacity: int):
    """SparseLevel from host-precomputed sorted keys (see
    `data/transfer.py::coarse_pyramid_host`): same padding conventions as
    `downsample_level_dense` (key INT32_MAX, coords 0, count clamped to
    capacity) so the two builds are bit-identical (tested)."""
    from mask3d_tpu.sparse.core import INT32_MAX, unpack_keys

    count = jnp.minimum(raw_count, capacity)
    rows = jnp.arange(capacity, dtype=jnp.int32)[None]
    valid = rows < count[:, None]
    key = jnp.where(valid, keys, INT32_MAX)
    coords = jnp.where(valid[..., None], unpack_keys(keys, dims), 0)
    return SparseLevel(key=key, coords=coords, valid=valid, count=count,
                       dims=dims, stride=stride)


def downsample_level_dense(level: SparseLevel, grid_dims, capacity: int,
                           occ_f=None, with_parent: bool = True):
    """Dense-grid construction of the stride-2 coarse level + PoolMap.

    Replaces the argsort-based `core.downsample_level` when static grid dims
    are available: coarse occupancy = maxpool of fine occupancy; coarse row
    enumeration = exclusive cumsum over cells (cell order == sorted key
    order); parent lookup = one gather of the fine rows. ~10x cheaper than
    per-level argsort on TPU and bit-identical (tested).

    Returns (coarse_level, pool_map, occ_coarse). Pass the fine level's
    dense occupancy as `occ_f` to reuse it (the row scatter costs ~2.4 ms
    per call at stride 1 on v5e; the chain occ -> maxpool -> occ shares it
    with the backbone via `SparseBatch.occ`).

    `with_parent=False` skips the per-fine-row parent/kidx lookup (a row
    gather, ~8 ms/forward across levels on v5e) and leaves those PoolMap
    fields None — the dense execution path pools on grids and never reads
    them (`models/mask3d.py` pooled pyramid); the gather path needs them.
    """
    from mask3d_tpu.sparse.core import INT32_MAX, pack_keys

    b = level.key.shape[0]
    gx, gy, gz = grid_dims
    cgx, cgy, cgz = (
        ((gx - 1) >> 1) + 1, ((gy - 1) >> 1) + 1, ((gz - 1) >> 1) + 1
    )
    cells_c = cgx * cgy * cgz

    if occ_f is None:
        occ_f = occupancy(level, grid_dims, dtype=jnp.float32)
    occ_c = maxpool2(occ_f)  # [B, cgx, cgy, cgz, 1]
    nchild_grid = sumpool2(occ_f)
    flat_c = occ_c.reshape(b, cells_c)
    flat_n = nchild_grid.reshape(b, cells_c)

    is_occ = flat_c > 0
    pos = jnp.cumsum(flat_c.astype(jnp.int32), axis=1) - is_occ.astype(
        jnp.int32
    )  # exclusive cumsum at occupied cells
    count_c = jnp.sum(is_occ.astype(jnp.int32), axis=1)
    overflow = count_c > capacity

    write_row = jnp.where(is_occ & (pos < capacity), pos, capacity)
    b_idx = jnp.arange(b, dtype=jnp.int32)[:, None]
    # Scatter the LINEAR cell index (1 channel) and unravel to (x, y, z)
    # afterwards — scatter cost is per row-channel, so this is 3x cheaper
    # than scattering the xyz triple (~2 ms/forward across levels on v5e).
    # Dropped/overflow rows land on 0, which unravels to (0, 0, 0) — the
    # same padding value the old 3-channel scatter left behind.
    cell = jnp.broadcast_to(
        jnp.arange(cells_c, dtype=jnp.int32)[None], (b, cells_c)
    )
    cellrow = (
        jnp.zeros((b, capacity + 1), jnp.int32)
        .at[b_idx, write_row]
        .set(cell, mode="drop")[:, :capacity]
    )
    coords_c = jnp.stack(
        [
            cellrow // (cgz * cgy),
            (cellrow // cgz) % cgy,
            cellrow % cgz,
        ],
        axis=-1,
    )
    nchild = (
        jnp.zeros((b, capacity + 1), jnp.int32)
        .at[b_idx, write_row]
        .set(flat_n.astype(jnp.int32), mode="drop")[:, :capacity]
    )
    rows = jnp.arange(capacity, dtype=jnp.int32)[None]
    valid_c = rows < jnp.minimum(count_c, capacity)[:, None]

    dims_c = ((level.dims - 1) >> 1) + 1
    key_c = jnp.where(
        valid_c, pack_keys(coords_c, dims_c[:, None, :]), INT32_MAX
    )

    parent = kidx = None
    if with_parent:
        # Parent row per fine row: gather the coarse position grid at each
        # fine row's parent cell.
        pc = level.coords >> 1
        pcell = (pc[..., 0] * cgy + pc[..., 1]) * cgz + pc[..., 2]
        pcell = jnp.where(level.valid, pcell, 0)
        parent_pos = jnp.take_along_axis(pos, pcell, axis=1)
        parent = jnp.where(
            level.valid & (parent_pos < capacity), parent_pos, capacity
        )
        kidx = (
            (level.coords[..., 0] & 1) * 4
            + (level.coords[..., 1] & 1) * 2
            + (level.coords[..., 2] & 1)
        )

    coarse = SparseLevel(
        key=key_c, coords=coords_c, valid=valid_c,
        count=jnp.minimum(count_c, capacity), dims=dims_c,
        stride=level.stride * 2,
    )
    from mask3d_tpu.sparse.core import PoolMap

    pool = PoolMap(parent=parent, kidx=kidx, nchild=nchild, overflow=overflow)
    return coarse, pool, occ_c
