"""Res16UNet sparse-conv backbones on the TPU sparse substrate.

Capability-parity rebuild of the reference backbone family
(`mask3d/models/res16unet.py:9-399`, `mask3d/models/resnet.py`,
`mask3d/models/modules/resnet_block.py`): a 4-stage stride-2 encoder and a
4-stage transposed-conv decoder with skip concatenations, InstanceNorm
everywhere (the reference deliberately replaced BatchNorm because the input
features are all-ones, `resnet_block.py:9`).

Two numerically-identical execution paths share one parameter layout
(`[K, Cin, Cout]` kernels in cube-ravel enumeration):

- `impl="gather"` — gather-matmul sparse convolution over precomputed kernel
  maps (`mask3d_tpu.sparse.ops`). General, works for any grid size.
- `impl="dense"`  — scatter the rows into the dense voxel grid once and run
  every conv as `lax.conv_general_dilated` with submanifold re-masking
  (`mask3d_tpu.sparse.dense_ops`). The TPU fast path: room-scene grids are
  small, XLA row-gathers are ~65M rows/s, and the MXU eats the dense conv
  FLOPs; this removes ~350 gather sweeps per forward.

Strided (stride-2, kernel-2) convs and transposed convs ride the octree
parent/child PoolMaps (gather impl) or strided dense convs (dense impl).
`compute_dtype=bfloat16` runs matmuls in bf16 with fp32 accumulation.

The reference defines a `final` 1x1 conv its forward never applies
(`res16unet.py:231-238` vs `:241-314`); we omit it. Returns
`(out, feature_maps)`: stride-1 features [B, N, PLANES[7]] plus the five
pyramid outputs at strides [16, 8, 4, 2, 1] (the `out_fpn=True` contract,
`res16unet.py:311-314`).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mask3d_tpu.sparse import dense_ops, pallas_conv
from mask3d_tpu.sparse.context import SparseBatch
from mask3d_tpu.sparse.ops import (
    instance_norm,
    sparse_conv,
    sparse_conv_down,
    sparse_conv_tr,
)

Dtype = Any

_KERNEL_INIT = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


class _GatherCtx:
    """Row-form execution over kernel maps (one instance per forward).

    With `use_pallas`, same-stride convolutions over eligible levels run the
    windowed Pallas kernel (`mask3d_tpu/sparse/pallas_conv.py`) instead of
    XLA row gathers; ineligible levels (capacity not tile-aligned or smaller
    than the window) keep the XLA formulation.
    """

    def __init__(self, sb: SparseBatch, compute_dtype, use_pallas=False,
                 pallas_select="onehot", pallas_window_mode="per_offset"):
        self.sb = sb
        self.dt = compute_dtype
        self.use_pallas = use_pallas
        self.window_mode = pallas_window_mode
        # Compile-probe the dynamic-gather kernel variant and downgrade to
        # "onehot" if this libtpu build rejects it (no user-reachable
        # Mosaic crash from a config flag).
        self.pallas_select = (
            pallas_conv.resolve_select(pallas_select) if use_pallas
            else pallas_select
        )

    def to_level(self, feats, level_idx):
        return feats  # rows are already per-level

    def _conv(self, feats, w, idx, ok, b):
        if self.use_pallas and pallas_conv.supports(feats.shape[1]):
            out = pallas_conv.sparse_conv_pallas(
                feats, w, idx, ok, select=self.pallas_select,
                window_mode=self.window_mode,
            )
            if b is not None:
                out = out + b
            return out.astype(feats.dtype)
        return sparse_conv(feats, w, idx, ok, bias=b, compute_dtype=self.dt)

    def conv_in(self, feats, w, b):
        return self._conv(feats, w, self.sb.nbr0_idx, self.sb.nbr0_ok, b)

    def conv3(self, feats, w, level_idx, b=None, bound=None):
        del bound  # static int8 activation bounds are a dense-impl knob
        return self._conv(
            feats, w, self.sb.nbr_idx[level_idx], self.sb.nbr_ok[level_idx],
            b,
        )

    def conv_down(self, feats, w, fine_idx):
        return sparse_conv_down(
            feats, w, self.sb.pools[fine_idx],
            self.sb.levels[fine_idx + 1].capacity, compute_dtype=self.dt,
        )

    def conv_tr(self, feats, w, coarse_idx):
        return sparse_conv_tr(
            feats, w, self.sb.pools[coarse_idx - 1],
            self.sb.levels[coarse_idx - 1].valid, compute_dtype=self.dt,
        )

    def norm(self, feats, gamma, beta, level_idx):
        return instance_norm(
            feats, self.sb.levels[level_idx].valid, gamma, beta
        )

    def conv1x1(self, feats, w, level_idx, bound=None):
        del bound
        x = feats
        if self.dt is not None:
            x = x.astype(self.dt)
        return jnp.dot(
            x, w[0].astype(x.dtype), preferred_element_type=jnp.float32
        ).astype(x.dtype)

    def cat(self, a, b):
        return jnp.concatenate([a, b], axis=-1)

    def block_join(self, out, residual, level_idx, bound=None,
                   want_q=False):
        """Residual join: relu(out + residual). `want_q` is a dense-impl
        int8 knob (QGrid junction outputs) — a no-op on the gather path."""
        del level_idx, bound, want_q
        return nn.relu(out + residual)

    def rows(self, feats, level_idx):
        return feats

    def global_mean(self, feats, level_idx):
        """Per-item mean over valid rows -> [B, 1, C] (ME GlobalPooling)."""
        valid = self.sb.levels[level_idx].valid[..., None]
        s = jnp.sum(jnp.where(valid, feats, 0), axis=1, keepdims=True)
        cnt = jnp.maximum(
            jnp.sum(valid.astype(feats.dtype), axis=1, keepdims=True), 1
        )
        return s / cnt


class _DenseCtx:
    """Dense-grid execution: rows live as [B, Gx, Gy, Gz, C] per level.

    With `sp_axis` set (sequence parallelism), every grid is constrained to
    shard its x axis and every row tensor its point axis over that mesh
    axis; row keys are x-major sorted so the two shardings are aligned
    x-slabs and XLA's partitioner inserts conv halo exchanges
    (`mask3d_tpu/parallel/mesh.py`).
    """

    def __init__(self, sb: SparseBatch, grid_dims, compute_dtype,
                 sp_axis=None, int8_stride1=False, int8_act_sigma=0.0,
                 int8_residual=False):
        from mask3d_tpu.parallel.mesh import maybe_constrain, sp_min_per_shard

        self.sb = sb
        self.dt = compute_dtype
        self.int8_l0 = int8_stride1
        self.int8_sigma = float(int8_act_sigma)
        self.int8_res = bool(int8_residual) and int8_stride1 and (
            self.int8_sigma > 0
        )
        self.grid_dims = list(grid_dims)  # per level
        # Per-level: shard the grid-x axis only while the per-shard extent
        # stays >= 2 (XLA SPMD miscompile guard, see parallel/mesh.py);
        # smaller coarse grids stay spatially replicated (they are tiny).
        self._cl = [
            (lambda x, _ok=sp_min_per_shard(int(self.grid_dims[li][0]),
                                            sp_axis):
             maybe_constrain(x, sp_axis, shard_seq=_ok))
            for li in range(len(sb.levels))
        ]
        self.occ = [
            self._cl[li](
                sb.occ[li] if len(sb.occ) == len(sb.levels)
                else dense_ops.occupancy(sb.levels[li], self.grid_dims[li])
            )
            for li in range(len(sb.levels))
        ]

    def scatter(self, feats_rows, level_idx):
        return self._cl[level_idx](dense_ops.scatter_rows(
            feats_rows, self.sb.levels[level_idx], self.grid_dims[level_idx]
        ))

    def conv_in(self, x, w, b):
        # Tiny contraction (k^3 * Cin <= 512, e.g. the 5^3 stem on the
        # 1-channel input) starves the MXU as a 3D conv; fold z into the
        # feature dims instead (numerically identical, ~10x faster).
        conv = (
            dense_ops.dense_conv_same_zfold
            if w.shape[0] * w.shape[1] <= 512
            else dense_ops.dense_conv_same
        )
        return self._cl[0](conv(
            x, w, self.occ[0], bias=b, compute_dtype=self.dt
        ))

    def stem_fused(self, x, w, gamma, beta):
        """Zfold stem conv + InstanceNorm + ReLU fused in the folded
        layout (dense_ops.dense_stem_fused — numerically identical to
        conv_in -> norm -> relu, oracle-tested)."""
        return self._cl[0](dense_ops.dense_stem_fused(
            x, w, self.occ[0], gamma, beta, compute_dtype=self.dt
        ))

    def _int8_bound(self, bound):
        """Static activation bound, only honored when int8_act_sigma>0
        (bound arrays are derived from norm affine params upstream)."""
        return bound if self.int8_sigma > 0 else None

    def conv3(self, x, w, level_idx, b=None, bound=None):
        if isinstance(x, dense_ops.QGrid) and not (
            self.int8_l0 and min(w.shape[1], w.shape[2]) >= 96
        ):
            x = dense_ops.dequantize(x, self.dt or jnp.float32)
        if (
            self.int8_l0
            and min(w.shape[1], w.shape[2]) >= 96
        ):
            # Stride-1 convs dominate the flagship device forward (the
            # four L0 ones alone were 41% pre-int8); int8 MXU runs them
            # ~2x faster (measured tools/bench_int8.py + the round-3
            # trace: 53.3 -> 27.0 ms). Only MXU-bound widths qualify
            # (>= 96 ch — the 32/64-ch encoder blocks are bandwidth-bound
            # and would pay the quantize pass for nothing); that gate
            # covers every level: the coarse 128/256-ch grids are 64-4096x
            # smaller, so their quantize passes are negligible. Eval-only
            # — see dense_conv_same_int8.
            return self._cl[level_idx](dense_ops.dense_conv_same_int8(
                x, w, self.occ[level_idx], bias=b,
                out_dtype=self.dt or jnp.float32,
                act_bound=self._int8_bound(bound),
            ))
        return self._cl[level_idx](dense_ops.dense_conv_same(
            x, w, self.occ[level_idx], bias=b, compute_dtype=self.dt
        ))

    def conv_down(self, x, w, fine_idx):
        return self._cl[fine_idx + 1](dense_ops.dense_conv_down(
            x, w, self.occ[fine_idx + 1], compute_dtype=self.dt
        ))

    def conv_tr(self, x, w, coarse_idx):
        return self._cl[coarse_idx - 1](dense_ops.dense_conv_tr(
            x, w, self.occ[coarse_idx - 1], compute_dtype=self.dt
        ))

    def norm(self, x, gamma, beta, level_idx):
        return dense_ops.dense_instance_norm(
            x, self.occ[level_idx], gamma, beta
        )

    def conv1x1(self, x, w, level_idx, bound=None):
        if isinstance(x, dense_ops.QGrid) and not (
            self.int8_l0 and min(w.shape[1], w.shape[2]) >= 96
        ):
            x = dense_ops.dequantize(x, self.dt or jnp.float32)
        if (
            self.int8_l0
            and min(w.shape[1], w.shape[2]) >= 96
        ):
            # Residual-downsample 1x1s on the big stride-1/2 grids (e.g.
            # stage 8's 128->96 on the L0 grid) ride the same int8 MXU
            # path as the 3^3 convs (k=1 weights).
            return self._cl[level_idx](dense_ops.dense_conv_same_int8(
                x, w, self.occ[level_idx],
                out_dtype=self.dt or jnp.float32,
                act_bound=self._int8_bound(bound),
            ))
        return self._cl[level_idx](dense_ops.dense_conv_same(
            x, w, self.occ[level_idx], compute_dtype=self.dt
        ))

    def cat(self, a, b):
        return jnp.concatenate([a, b], axis=-1)

    def block_join(self, out, residual, level_idx, bound=None,
                   want_q=False):
        """Residual join `relu(out + residual)`, optionally emitting the
        block output ONLY as a statically-quantized int8 grid (QGrid).

        With `model.int8_residual`: an intermediate block output is
        consumed exclusively by the next block (its int8 conv input and
        its residual path), so the join pass quantizes in place and the
        bf16 form never hits HBM — the downstream residual add dequantizes
        in-register (error = the same static-bound quantization step the
        conv input path already takes, gated by the int8 e2e parity
        tests). The epilogue+quantize passes this removes/halves were
        18.3 ms of the 86.2 ms flagship device forward (op dump
        2026-08-19)."""
        if isinstance(residual, dense_ops.QGrid):
            residual = dense_ops.dequantize(residual, out.dtype)
        y = nn.relu(out + residual)
        if want_q and self.int8_res and bound is not None:
            qg = dense_ops.quantize_static(y, bound)
            return dense_ops.QGrid(self._cl[level_idx](qg.q), qg.scale)
        return y

    def rows(self, x, level_idx):
        return dense_ops.gather_rows(
            x, self.sb.levels[level_idx], self.grid_dims[level_idx]
        )

    def global_mean(self, x, level_idx):
        """Per-item mean over occupied cells -> [B, 1, 1, 1, C]."""
        occ = self.occ[level_idx]
        s = jnp.sum(x * occ, axis=(1, 2, 3), keepdims=True)
        cnt = jnp.maximum(
            jnp.sum(occ.astype(x.dtype), axis=(1, 2, 3), keepdims=True), 1
        )
        return s / cnt


class _BrickCtx:
    """Bricked execution: level 0 as occupied dense bricks
    (`sparse/brick_ops.py`), every coarser level as a full dense grid.

    The dense path's executor for scans whose LEVEL-0 grid exceeds HBM
    (only level 0 can: stride-2 shrinks cells 8x) — same submanifold
    semantics, oracle-tested against `_DenseCtx` op for op. B=1 (the
    serving shape at this scale). Reference capability: MinkowskiEngine
    arbitrary-size scenes (`mask3d/models/res16unet.py` runs any point
    count); see tools/bench_large_scene.py for the measured A/B vs the
    gather paths."""

    def __init__(self, sb: SparseBatch, grid_dims, compute_dtype,
                 brick_dims=(16, 16, 8), brick_capacity: int = 8192):
        from mask3d_tpu.sparse import brick_ops

        assert sb.levels[0].batch_size == 1, "bricked execution is B=1"
        self.bo = brick_ops
        self.sb = sb
        self.dt = compute_dtype
        self.int8_l0 = False  # int8/QGrid fast paths are dense-impl knobs
        self.int8_sigma = 0.0
        self.int8_res = False
        self.grid_dims = list(grid_dims)
        self.spec = brick_ops.make_brick_spec(
            grid_dims[0], brick_dims, brick_capacity)
        self.tables = brick_ops.build_tables(sb.levels[0], self.spec)
        self.occ_b = brick_ops.occupancy(
            self.tables, self.spec, sb.levels[0].valid)
        have_occ = len(sb.occ) == len(sb.levels)
        self.occ = [None] + [
            sb.occ[li] if have_occ
            else dense_ops.occupancy(sb.levels[li], self.grid_dims[li])
            for li in range(1, len(sb.levels))
        ]

    def scatter(self, feats_rows, level_idx):
        if level_idx == 0:
            return self.bo.scatter_rows(feats_rows, self.tables, self.spec)
        return dense_ops.scatter_rows(
            feats_rows, self.sb.levels[level_idx], self.grid_dims[level_idx]
        )

    def conv_in(self, x, w, b):
        return self.bo.conv_same(
            x, w, self.occ_b, self.tables, self.spec, bias=b,
            compute_dtype=self.dt)

    def _int8_bound(self, bound):
        return None

    def conv3(self, x, w, level_idx, b=None, bound=None):
        del bound
        if level_idx == 0:
            return self.bo.conv_same(
                x, w, self.occ_b, self.tables, self.spec, bias=b,
                compute_dtype=self.dt)
        return dense_ops.dense_conv_same(
            x, w, self.occ[level_idx], bias=b, compute_dtype=self.dt)

    def conv_down(self, x, w, fine_idx):
        if fine_idx == 0:
            return self.bo.conv_down(
                x, w, self.occ[1], self.tables, self.spec,
                tuple(int(d) for d in self.grid_dims[1]),
                compute_dtype=self.dt)
        return dense_ops.dense_conv_down(
            x, w, self.occ[fine_idx + 1], compute_dtype=self.dt)

    def conv_tr(self, x, w, coarse_idx):
        if coarse_idx == 1:
            return self.bo.conv_tr(
                x, w, self.occ_b, self.tables, self.spec,
                compute_dtype=self.dt)
        return dense_ops.dense_conv_tr(
            x, w, self.occ[coarse_idx - 1], compute_dtype=self.dt)

    def norm(self, x, gamma, beta, level_idx):
        if level_idx == 0:
            return self.bo.instance_norm(x, self.occ_b, gamma, beta)
        return dense_ops.dense_instance_norm(
            x, self.occ[level_idx], gamma, beta)

    def conv1x1(self, x, w, level_idx, bound=None):
        del bound
        xc = x if self.dt is None else x.astype(self.dt)
        out = jnp.dot(
            xc, w[0].astype(xc.dtype), preferred_element_type=jnp.float32
        ).astype(xc.dtype)
        if level_idx == 0:
            # zeros in -> zeros out for a 1x1 (no bias), sentinel included
            return out
        return out * self.occ[level_idx].astype(out.dtype)

    def cat(self, a, b):
        return jnp.concatenate([a, b], axis=-1)

    def block_join(self, out, residual, level_idx, bound=None,
                   want_q=False):
        del level_idx, bound, want_q
        return nn.relu(out + residual)

    def rows(self, x, level_idx):
        if level_idx == 0:
            return self.bo.gather_rows(
                x, self.tables, self.spec, self.sb.levels[0].valid)
        return dense_ops.gather_rows(
            x, self.sb.levels[level_idx], self.grid_dims[level_idx])

    def global_mean(self, x, level_idx):
        if level_idx == 0:
            occ = self.occ_b.astype(x.dtype)
            s = jnp.sum(x * occ, axis=(0, 1, 2, 3), keepdims=False)
            cnt = jnp.maximum(jnp.sum(occ), 1)
            # [1, 1, 1, 1, C] per-item mean (B == 1)
            return (s / cnt)[None, None, None, None, :]
        occ = self.occ[level_idx]
        s = jnp.sum(x * occ.astype(x.dtype), axis=(1, 2, 3), keepdims=True)
        cnt = jnp.maximum(
            jnp.sum(occ.astype(x.dtype), axis=(1, 2, 3), keepdims=True), 1)
        return s / cnt


class Res16UNetBase(nn.Module):
    """Res16UNet encoder/decoder over a 5-level sparse pyramid.

    PLANES/LAYERS follow `mask3d/models/res16unet.py:11-13`; subclasses pin
    the variants (34C is the reference's shipped backbone,
    `mask3d/conf/model/mask3d.yaml:33`).
    """

    in_channels: int = 1
    conv1_kernel_size: int = 5
    compute_dtype: Optional[Dtype] = None
    impl: str = "gather"  # "gather" | "gather_pallas" | "dense" | "bricked"
    brick_dims: Sequence[int] = (16, 16, 8)  # bricked impl: brick shape
    brick_capacity: int = 8192  # bricked impl: max occupied bricks
    pallas_select: str = "onehot"  # windowed-conv selection (pallas_conv)
    pallas_window_mode: str = "per_offset"  # windowed-conv DMA schedule
    sp_axis: Optional[str] = None  # sequence-parallel mesh axis (dense impl)
    int8_stride1: bool = False  # int8 stride-1 convs (dense, eval)
    # Intermediate block outputs live as int8-only QGrids (dense int8
    # eval path; needs int8_act_sigma>0) — see `_DenseCtx.block_join`.
    int8_residual: bool = False
    # >0: STATIC int8 activation scales from InstanceNorm affine params
    # (bound sigma*|gamma|+|beta| per channel) instead of dynamic absmax
    # reduce passes — see `_act_bound` and dense_ops.dense_conv_same_int8.
    int8_act_sigma: float = 0.0
    # Fused Pallas int8 block-chain (sparse/pallas_chain.py): whole
    # >=96-ch stride-1 BasicBlock stacks run as conv kernels with the
    # IN affine / relu / quantize / residual join fused in (probe-guarded).
    pallas_chain: bool = False
    unit_features: bool = False  # input features promised constant ones
    # Run narrow (<= 32-ch) identity-residual stages in the z-folded
    # layout (dense_ops.dense_basic_stage_folded) — same lane-padding
    # disease the fused stem fixes, applied to the whole stage-1 chain.
    fold_small_stages: bool = False
    PLANES: Sequence[int] = (32, 64, 128, 256, 256, 256, 256, 256)
    LAYERS: Sequence[int] = (2, 2, 2, 2, 2, 2, 2, 2)
    INIT_DIM: int = 32
    BLOCK: str = "basic"  # "basic" | "bottleneck"
    EXPANSION: int = 1  # 4 for bottleneck variants
    SE: bool = False  # squeeze-excitation blocks (senet_block.py:8-141)
    SE_REDUCTION: int = 16

    def _kernel(self, name, k, cin, cout):
        return self.param(name + "_kernel", _KERNEL_INIT, (k, cin, cout))

    def _norm_params(self, name, c):
        return (
            self.param(name + "_scale", nn.initializers.ones, (c,)),
            self.param(name + "_bias", nn.initializers.zeros, (c,)),
        )

    def _act_bound(self, gamma, beta):
        """Static per-channel bound on |post-norm activation| for int8
        activation scales (`int8_act_sigma`).

        A post-InstanceNorm activation is standardized per (item, channel):
        z = gamma * zhat + beta with zhat of mean 0 / var 1 over occupied
        cells, so |z| <= sigma*|gamma| + |beta| for all but the
        P(|zhat| > sigma) tail — which the int8 quantizer SATURATES at
        +-127 (a clip, not an overflow). ReLU only shrinks |z|; residual
        adds sum bounds; concats concatenate them (threaded through
        __call__/_block). Replaces the per-conv dynamic absmax reduce
        passes of the round-3 scheme (~10 ms/forward on v5e). Parity gate:
        tests/test_e2e.py::test_int8_eval_metrics_match_fp32.
        """
        s = self.int8_act_sigma
        if s <= 0 or self.impl != "dense" or not self.int8_stride1:
            return None
        return s * jnp.abs(gamma.astype(jnp.float32)) + jnp.abs(
            beta.astype(jnp.float32)
        )

    @staticmethod
    def _cat_bound(a, b):
        if a is None or b is None:
            return None
        return jnp.concatenate([a, b])

    def _se(self, ctx, name, x, level_idx, c):
        """SELayer (`mask3d/models/modules/senet_block.py:8-24`): global
        pool -> bottleneck MLP -> sigmoid -> broadcast multiply (zeros at
        padding/unoccupied cells are preserved by the multiply)."""
        r = max(c // self.SE_REDUCTION, 1)
        w1 = self.param(f"{name}_se_fc1_kernel", _KERNEL_INIT, (c, r))
        b1 = self.param(f"{name}_se_fc1_bias", nn.initializers.zeros, (r,))
        w2 = self.param(f"{name}_se_fc2_kernel", _KERNEL_INIT, (r, c))
        b2 = self.param(f"{name}_se_fc2_bias", nn.initializers.zeros, (c,))
        y = ctx.global_mean(x, level_idx).astype(jnp.float32)
        y = nn.relu(jnp.dot(y, w1) + b1)
        y = nn.sigmoid(jnp.dot(y, w2) + b2)
        return x * y.astype(x.dtype)

    def _block(self, ctx, name, x, level_idx, cin, planes, bin_=None,
               want_q=False):
        """BasicBlock (`mask3d/models/modules/resnet_block.py:7-68`).

        `bin_` is the optional static activation bound on `x` (int8 scale
        derivation — `_act_bound`); returns `(out, bound_of_out)`.
        `want_q`: the output may be returned as a quantized QGrid
        (int8_residual — see `_DenseCtx.block_join`).
        """
        residual = x
        w1 = self._kernel(f"{name}_conv1", 27, cin, planes)
        g1, b1 = self._norm_params(f"{name}_norm1", planes)
        out = ctx.conv3(x, w1, level_idx, bound=bin_)
        out = nn.relu(ctx.norm(out, g1, b1, level_idx))
        w2 = self._kernel(f"{name}_conv2", 27, planes, planes)
        g2, b2 = self._norm_params(f"{name}_norm2", planes)
        out = ctx.conv3(out, w2, level_idx, bound=self._act_bound(g1, b1))
        out = ctx.norm(out, g2, b2, level_idx)
        bout = self._act_bound(g2, b2)
        if self.SE:
            # sigmoid gate in (0, 1): bounds are preserved.
            out = self._se(ctx, name, out, level_idx, planes)
        if cin != planes:
            wd = self._kernel(f"{name}_downsample", 1, cin, planes)
            gd, bd = self._norm_params(f"{name}_downsample_norm", planes)
            residual = ctx.conv1x1(residual, wd, level_idx, bound=bin_)
            residual = ctx.norm(residual, gd, bd, level_idx)
            bres = self._act_bound(gd, bd)
        else:
            bres = bin_
        bout = None if (bout is None or bres is None) else bout + bres
        return (
            ctx.block_join(out, residual, level_idx, bound=bout,
                           want_q=want_q),
            bout,
        )

    def _block_bottleneck(self, ctx, name, x, level_idx, cin, planes,
                          bin_=None, want_q=False):
        """Bottleneck block (`mask3d/models/modules/resnet_block.py:83-146`):
        1x1 reduce -> 3^3 conv -> 1x1 expand (x4), InstanceNorm."""
        e = self.EXPANSION
        residual = x
        w1 = self._kernel(f"{name}_conv1", 1, cin, planes)
        g1, b1 = self._norm_params(f"{name}_norm1", planes)
        out = nn.relu(ctx.norm(
            ctx.conv1x1(x, w1, level_idx, bound=bin_), g1, b1, level_idx
        ))
        w2 = self._kernel(f"{name}_conv2", 27, planes, planes)
        g2, b2 = self._norm_params(f"{name}_norm2", planes)
        out = nn.relu(ctx.norm(
            ctx.conv3(out, w2, level_idx, bound=self._act_bound(g1, b1)),
            g2, b2, level_idx,
        ))
        w3 = self._kernel(f"{name}_conv3", 1, planes, planes * e)
        g3, b3 = self._norm_params(f"{name}_norm3", planes * e)
        out = ctx.norm(
            ctx.conv1x1(out, w3, level_idx, bound=self._act_bound(g2, b2)),
            g3, b3, level_idx,
        )
        bout = self._act_bound(g3, b3)
        if self.SE:
            out = self._se(ctx, name, out, level_idx, planes * e)
        if cin != planes * e:
            wd = self._kernel(f"{name}_downsample", 1, cin, planes * e)
            gd, bd = self._norm_params(f"{name}_downsample_norm", planes * e)
            residual = ctx.conv1x1(residual, wd, level_idx, bound=bin_)
            residual = ctx.norm(residual, gd, bd, level_idx)
            bres = self._act_bound(gd, bd)
        else:
            bres = bin_
        bout = None if (bout is None or bres is None) else bout + bres
        return (
            ctx.block_join(out, residual, level_idx, bound=bout,
                           want_q=want_q),
            bout,
        )

    def _blocks_fused(self, ctx, stage, x, level_idx, cin, planes, n,
                      bin_):
        """Whole-stage fused Pallas int8 chain (`sparse/pallas_chain.py`):
        numerically the same BasicBlock stack as `_block` on the dense
        int8 path, with every inter-conv elementwise pass fused into the
        conv kernels. Param names match `_block` exactly, so checkpoints
        are interchangeable between the paths."""
        from mask3d_tpu.sparse import pallas_chain as _pc

        blocks = []
        for i in range(n):
            ci = cin if i == 0 else planes
            name = f"block{stage}_{i}"
            blk = {"w1": self._kernel(f"{name}_conv1", 27, ci, planes)}
            blk["g1"], blk["b1"] = self._norm_params(f"{name}_norm1",
                                                     planes)
            blk["w2"] = self._kernel(f"{name}_conv2", 27, planes, planes)
            blk["g2"], blk["b2"] = self._norm_params(f"{name}_norm2",
                                                     planes)
            if i == 0 and cin != planes:
                blk["wd"] = self._kernel(f"{name}_downsample", 1, ci,
                                         planes)
                blk["gd"], blk["bd"] = self._norm_params(
                    f"{name}_downsample_norm", planes)
            blocks.append(blk)
        y, bout = _pc.fused_basic_stage(
            x, bin_, ctx.occ[level_idx], blocks,
            ctx.grid_dims[level_idx], float(self.int8_act_sigma),
            interpret=jax.default_backend() != "tpu")
        # the kernels emit bf16 raws; downstream ops expect the model's
        # compute dtype (f32 when unset)
        return y.astype(self.compute_dtype or jnp.float32), bout

    def _blocks(self, ctx, stage, x, level_idx, cin, planes, n, bin_=None):
        if (
            self.pallas_chain
            and self.impl == "dense"
            and self.BLOCK == "basic"
            and not self.SE
            and getattr(ctx, "int8_l0", False)
            and self.int8_act_sigma > 0
            and bin_ is not None
            and not isinstance(x, dense_ops.QGrid)
            and min(cin, planes) >= 96
            and cin <= 128
            and planes < 128  # the occ channel needs a spare lane
            and self.sp_axis is None
        ):
            from mask3d_tpu.sparse import pallas_chain as _pc

            gd = ctx.grid_dims[level_idx]
            rows = (gd[0] + 4) * (gd[1] + 2) * (gd[2] + 2)
            if rows >= _pc.MIN_ROWS and _pc.pallas_chain_available():
                return self._blocks_fused(
                    ctx, stage, x, level_idx, cin, planes, n, bin_)
        if (
            self.fold_small_stages
            and self.impl == "dense"
            and self.BLOCK == "basic"
            and not self.SE
            and cin == planes
            and planes <= 32
            and self.sp_axis is None
            and not isinstance(x, dense_ops.QGrid)
        ):
            blocks = []
            for i in range(n):
                name = f"block{stage}_{i}"
                blk = {"w1": self._kernel(f"{name}_conv1", 27, planes,
                                          planes)}
                blk["g1"], blk["b1"] = self._norm_params(f"{name}_norm1",
                                                         planes)
                blk["w2"] = self._kernel(f"{name}_conv2", 27, planes,
                                         planes)
                blk["g2"], blk["b2"] = self._norm_params(f"{name}_norm2",
                                                         planes)
                blocks.append(blk)
            y = dense_ops.dense_basic_stage_folded(
                x, ctx.occ[level_idx], blocks,
                compute_dtype=self.compute_dtype)
            bnd = bin_
            for blk in blocks:
                b2 = self._act_bound(blk["g2"], blk["b2"])
                bnd = None if (bnd is None or b2 is None) else b2 + bnd
            return y, bnd

        block = (
            self._block_bottleneck if self.BLOCK == "bottleneck"
            else self._block
        )
        # int8_residual: INTERMEDIATE block outputs (consumed only by the
        # next block) may live as int8-only QGrids; the stage-final output
        # feeds skips/taps/pools and stays bf16. Gated to the conv widths
        # the int8 path covers (>= 96 ch).
        wq = (
            self.int8_residual
            and getattr(ctx, "int8_res", False)
            and planes * self.EXPANSION >= 96
        )
        for i in range(n):
            x, bin_ = block(
                ctx, f"block{stage}_{i}", x, level_idx,
                cin if i == 0 else planes * self.EXPANSION, planes,
                bin_=bin_, want_q=wq and i < n - 1,
            )
        return x, bin_

    @nn.compact
    def __call__(self, feats, sb: SparseBatch, grid_dims=None,
                 return_grid: bool = False) -> Tuple[Any, ...]:
        p = self.PLANES
        lay = self.LAYERS
        k0 = self.conv1_kernel_size ** 3

        if self.impl == "dense":
            assert grid_dims is not None, "dense impl needs static grid dims"
            ctx = _DenseCtx(sb, grid_dims, self.compute_dtype,
                            sp_axis=self.sp_axis,
                            int8_stride1=self.int8_stride1,
                            int8_act_sigma=self.int8_act_sigma,
                            int8_residual=self.int8_residual)
            if self.unit_features and self.in_channels == 1:
                # scatter(ones) == the occupancy grid, already built by
                # build_sparse_batch — one fewer full-grid row scatter
                # (~2.4 ms/batch at flagship shape on v5e).
                x = ctx.occ[0].astype(feats.dtype)
            else:
                x = ctx.scatter(feats, 0)
        elif self.impl == "bricked":
            assert grid_dims is not None, "bricked impl needs static dims"
            ctx = _BrickCtx(sb, grid_dims, self.compute_dtype,
                            brick_dims=tuple(self.brick_dims),
                            brick_capacity=self.brick_capacity)
            x = (ctx.occ_b.astype(feats.dtype)
                 if self.unit_features and self.in_channels == 1
                 else ctx.scatter(feats, 0))
        else:
            ctx = _GatherCtx(sb, self.compute_dtype,
                             use_pallas=self.impl == "gather_pallas",
                             pallas_select=self.pallas_select,
                             pallas_window_mode=self.pallas_window_mode)
            x = feats

        # --- Encoder (reference res16unet.py:244-267) ---
        w = self._kernel("conv0p1s1", k0, self.in_channels, self.INIT_DIM)
        g, b = self._norm_params("bn0", self.INIT_DIM)
        if self.impl == "dense" and k0 * self.in_channels <= 512:
            # Fused zfold conv + IN + ReLU in the folded layout (identical
            # numerics; kills the stem's 32-lane relayout passes).
            out_p1 = ctx.stem_fused(x, w, g, b)
        else:
            out = ctx.conv_in(x, w, None)
            out_p1 = nn.relu(ctx.norm(out, g, b, 0))
        b_p1 = self._act_bound(g, b)

        def down(name, x_in, fine_idx, cin, cout):
            w = self._kernel(name, 8, cin, cout)
            g, b = self._norm_params(name.replace("conv", "bn"), cout)
            out = ctx.conv_down(x_in, w, fine_idx)
            return (
                nn.relu(ctx.norm(out, g, b, fine_idx + 1)),
                self._act_bound(g, b),
            )

        # Phase markers for prefix-difference profiling (see
        # `train/loop.py::measure_model_phases`): tiny reductions sown into
        # "intermediates"; inert unless that collection is mutable.
        def mark(name, t):
            self.sow("intermediates", name, jnp.sum(t.astype(jnp.float32)))

        mark("bb_stem", out_p1)

        e = self.EXPANSION
        out, bnd = down("conv1p1s2", out_p1, 0, self.INIT_DIM, self.INIT_DIM)
        out_b1p2, b_b1p2 = self._blocks(
            ctx, 1, out, 1, self.INIT_DIM, p[0], lay[0], bnd)

        out, bnd = down("conv2p2s2", out_b1p2, 1, p[0] * e, p[0] * e)
        out_b2p4, b_b2p4 = self._blocks(
            ctx, 2, out, 2, p[0] * e, p[1], lay[1], bnd)

        out, bnd = down("conv3p4s2", out_b2p4, 2, p[1] * e, p[1] * e)
        out_b3p8, b_b3p8 = self._blocks(
            ctx, 3, out, 3, p[1] * e, p[2], lay[2], bnd)

        out, bnd = down("conv4p8s2", out_b3p8, 3, p[2] * e, p[2] * e)
        out, bnd = self._blocks(ctx, 4, out, 4, p[2] * e, p[3], lay[3], bnd)
        mark("bb_encoder", out)

        feature_maps = [ctx.rows(out, 4)]  # stride 16

        # --- Decoder (reference res16unet.py:271-309) ---
        def up(name, x_in, coarse_idx, cin, cout):
            w = self._kernel(name, 8, cin, cout)
            g, b = self._norm_params(name.replace("convtr", "bntr"), cout)
            out = ctx.conv_tr(x_in, w, coarse_idx)
            return (
                nn.relu(ctx.norm(out, g, b, coarse_idx - 1)),
                self._act_bound(g, b),
            )

        out, bnd = up("convtr4p16s2", out, 4, p[3] * e, p[4])
        out = ctx.cat(out, out_b3p8)
        out, bnd = self._blocks(ctx, 5, out, 3, p[4] + p[2] * e, p[4],
                                lay[4], self._cat_bound(bnd, b_b3p8))
        feature_maps.append(ctx.rows(out, 3))  # stride 8

        out, bnd = up("convtr5p8s2", out, 3, p[4] * e, p[5])
        out = ctx.cat(out, out_b2p4)
        out, bnd = self._blocks(ctx, 6, out, 2, p[5] + p[1] * e, p[5],
                                lay[5], self._cat_bound(bnd, b_b2p4))
        feature_maps.append(ctx.rows(out, 2))  # stride 4

        out, bnd = up("convtr6p4s2", out, 2, p[5] * e, p[6])
        out = ctx.cat(out, out_b1p2)
        out, bnd = self._blocks(ctx, 7, out, 1, p[6] + p[0] * e, p[6],
                                lay[6], self._cat_bound(bnd, b_b1p2))
        feature_maps.append(ctx.rows(out, 1))  # stride 2
        mark("bb_dec_to_s2", out)

        out, bnd = up("convtr7p2s2", out, 1, p[6] * e, p[7])
        mark("bb_convtr7", out)
        out = ctx.cat(out, out_p1)
        out, bnd = self._blocks(ctx, 8, out, 0, p[7] + self.INIT_DIM, p[7],
                                lay[7], self._cat_bound(bnd, b_p1))
        mark("bb_stage8", out)
        out_rows = ctx.rows(out, 0)
        feature_maps.append(out_rows)  # stride 1

        if return_grid:
            # Dense impl: also expose the final level-0 GRID so the caller
            # can run grid-space pooling chains (models/mask3d.py pooled
            # pyramid) without re-scattering rows. None on the gather path.
            return out_rows, feature_maps, (
                out if self.impl == "dense" else None
            )
        return out_rows, feature_maps


class Res16UNet14(Res16UNetBase):
    LAYERS: Sequence[int] = (1, 1, 1, 1, 1, 1, 1, 1)


class Res16UNet18(Res16UNetBase):
    LAYERS: Sequence[int] = (2, 2, 2, 2, 2, 2, 2, 2)


class Res16UNet34(Res16UNetBase):
    LAYERS: Sequence[int] = (2, 3, 4, 6, 2, 2, 2, 2)


class Res16UNet34A(Res16UNet34):
    PLANES: Sequence[int] = (32, 64, 128, 256, 256, 128, 64, 64)


class Res16UNet34B(Res16UNet34):
    PLANES: Sequence[int] = (32, 64, 128, 256, 256, 128, 64, 32)


class Res16UNet34C(Res16UNet34):
    """The reference's shipped backbone (`mask3d/models/res16unet.py:390`)."""

    PLANES: Sequence[int] = (32, 64, 128, 256, 256, 128, 96, 96)


class Res16UNet34D(Res16UNet34):
    PLANES: Sequence[int] = (32, 64, 128, 256, 256, 128, 96, 128)


class Res16UNet14A(Res16UNet14):
    PLANES: Sequence[int] = (32, 64, 128, 256, 128, 128, 96, 96)


class Res16UNet18A(Res16UNet18):
    PLANES: Sequence[int] = (32, 64, 128, 256, 128, 128, 96, 96)


class Res16UNet18B(Res16UNet18):
    PLANES: Sequence[int] = (32, 64, 128, 256, 128, 128, 128, 128)


class Res16UNet18D(Res16UNet18):
    PLANES: Sequence[int] = (32, 64, 128, 256, 384, 384, 384, 384)


class Res16UNet14A2(Res16UNet14A):
    LAYERS: Sequence[int] = (1, 1, 1, 1, 2, 2, 2, 2)


class Res16UNet14B(Res16UNet14):
    PLANES: Sequence[int] = (32, 64, 128, 256, 128, 128, 128, 128)


class Res16UNet14B2(Res16UNet14B):
    LAYERS: Sequence[int] = (1, 1, 1, 1, 2, 2, 2, 2)


class Res16UNet14B3(Res16UNet14B):
    LAYERS: Sequence[int] = (2, 2, 2, 2, 1, 1, 1, 1)


class Res16UNet14C(Res16UNet14):
    PLANES: Sequence[int] = (32, 64, 128, 256, 192, 192, 128, 128)


class Res16UNet14D(Res16UNet14):
    PLANES: Sequence[int] = (32, 64, 128, 256, 384, 384, 384, 384)


class Custom30M(Res16UNet34):
    """`mask3d/models/res16unet.py:394-396`."""

    PLANES: Sequence[int] = (32, 64, 128, 256, 128, 64, 64, 32)


class Res16UNet50(Res16UNetBase):
    """Bottleneck variant (`mask3d/models/res16unet.py:332-335`)."""

    LAYERS: Sequence[int] = (2, 3, 4, 6, 2, 2, 2, 2)
    BLOCK: str = "bottleneck"
    EXPANSION: int = 4


class Res16UNet101(Res16UNet50):
    LAYERS: Sequence[int] = (2, 3, 4, 23, 2, 2, 2, 2)


BACKBONES = {
    "Res16UNet14": Res16UNet14,
    "Res16UNet14A": Res16UNet14A,
    "Res16UNet14A2": Res16UNet14A2,
    "Res16UNet14B": Res16UNet14B,
    "Res16UNet14B2": Res16UNet14B2,
    "Res16UNet14B3": Res16UNet14B3,
    "Res16UNet14C": Res16UNet14C,
    "Res16UNet14D": Res16UNet14D,
    "Res16UNet18": Res16UNet18,
    "Res16UNet18A": Res16UNet18A,
    "Res16UNet18B": Res16UNet18B,
    "Res16UNet18D": Res16UNet18D,
    "Res16UNet34": Res16UNet34,
    "Res16UNet34A": Res16UNet34A,
    "Res16UNet34B": Res16UNet34B,
    "Res16UNet34C": Res16UNet34C,
    "Res16UNet34D": Res16UNet34D,
    "Res16UNet50": Res16UNet50,
    "Res16UNet101": Res16UNet101,
    "Custom30M": Custom30M,
}
