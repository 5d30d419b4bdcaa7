"""Res16UNet sparse-conv backbones on the TPU sparse substrate.

Capability-parity rebuild of the reference backbone family
(`mask3d/models/res16unet.py:9-399`, `mask3d/models/resnet.py`,
`mask3d/models/modules/resnet_block.py`): a 4-stage stride-2 encoder and a
4-stage transposed-conv decoder with skip concatenations, InstanceNorm
everywhere (the reference deliberately replaced BatchNorm because the input
features are all-ones, `resnet_block.py:9`).

TPU design notes
----------------
- All convolutions are gather-matmul ops from `mask3d_tpu.sparse.ops`;
  kernel maps come precomputed in the `SparseBatch` context, so the whole
  backbone is pure batched matmul + gather work (MXU-bound).
- Strided (stride-2, kernel-2) convs and transposed convs ride the octree
  parent/child PoolMaps — no kernel-map search at stride boundaries.
- `compute_dtype=bfloat16` runs every matmul in bf16 with fp32 accumulation
  (`preferred_element_type`), params stay fp32.
- The reference defines a `final` 1x1 conv that its forward never applies
  (`res16unet.py:231-238` vs `:241-314`); we omit it.

Returns `(out, feature_maps)` where `out` is the stride-1 feature set
([B, N, PLANES[7]]) and `feature_maps` are the five pyramid outputs at
strides [16, 8, 4, 2, 1] — the same contract as `out_fpn=True` in the
reference (`res16unet.py:311-314`).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from mask3d_tpu.sparse.context import SparseBatch
from mask3d_tpu.sparse.ops import (
    cat_features,
    instance_norm,
    sparse_conv,
    sparse_conv_down,
    sparse_conv_tr,
)

Dtype = Any

_KERNEL_INIT = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


class SparseConv(nn.Module):
    """Same-stride sparse convolution (kernel map supplied by caller)."""

    out_ch: int
    num_kernel: int
    use_bias: bool = False
    compute_dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, feats, nbr_idx, nbr_ok):
        w = self.param(
            "kernel",
            _KERNEL_INIT,
            (self.num_kernel, feats.shape[-1], self.out_ch),
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.out_ch,))
            if self.use_bias
            else None
        )
        return sparse_conv(
            feats, w, nbr_idx, nbr_ok, bias=b, compute_dtype=self.compute_dtype
        )


class SparseConv1x1(nn.Module):
    """Pointwise (1x1x1) sparse convolution == per-row dense layer."""

    out_ch: int
    use_bias: bool = True
    compute_dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, feats):
        w = self.param(
            "kernel", _KERNEL_INIT, (1, feats.shape[-1], self.out_ch)
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.out_ch,))
            if self.use_bias
            else None
        )
        x = feats
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
        out = jnp.dot(
            x,
            w[0].astype(x.dtype),
            preferred_element_type=jnp.float32,
        )
        if b is not None:
            out = out + b
        return out.astype(feats.dtype)


class SparseConvDown(nn.Module):
    """Stride-2 kernel-2 sparse convolution via the octree PoolMap."""

    out_ch: int
    use_bias: bool = False
    compute_dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, feats, pool, coarse_capacity):
        w = self.param(
            "kernel", _KERNEL_INIT, (8, feats.shape[-1], self.out_ch)
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.out_ch,))
            if self.use_bias
            else None
        )
        return sparse_conv_down(
            feats, w, pool, coarse_capacity, bias=b,
            compute_dtype=self.compute_dtype,
        )


class SparseConvTr(nn.Module):
    """Transposed stride-2 kernel-2 sparse convolution (decoder upsampling)."""

    out_ch: int
    use_bias: bool = False
    compute_dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, feats_coarse, pool, fine_valid):
        w = self.param(
            "kernel", _KERNEL_INIT, (8, feats_coarse.shape[-1], self.out_ch)
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.out_ch,))
            if self.use_bias
            else None
        )
        return sparse_conv_tr(
            feats_coarse, w, pool, fine_valid, bias=b,
            compute_dtype=self.compute_dtype,
        )


class InstanceNorm(nn.Module):
    """Per-item per-channel normalization (ME.MinkowskiInstanceNorm)."""

    @nn.compact
    def __call__(self, feats, valid):
        gamma = self.param("scale", nn.initializers.ones, (feats.shape[-1],))
        beta = self.param("bias", nn.initializers.zeros, (feats.shape[-1],))
        return instance_norm(feats, valid, gamma, beta)


class BasicBlock(nn.Module):
    """Residual block: conv3-IN-relu-conv3-IN (+1x1 shortcut) - relu.

    Mirrors `mask3d/models/modules/resnet_block.py:7-68` with InstanceNorm.
    """

    planes: int
    compute_dtype: Optional[Dtype] = None
    expansion: int = 1

    @nn.compact
    def __call__(self, feats, level, nbr_idx, nbr_ok):
        residual = feats
        out = SparseConv(self.planes, nbr_idx.shape[-1],
                         compute_dtype=self.compute_dtype)(
            feats, nbr_idx, nbr_ok
        )
        out = InstanceNorm()(out, level.valid)
        out = nn.relu(out)
        out = SparseConv(self.planes, nbr_idx.shape[-1],
                         compute_dtype=self.compute_dtype)(
            out, nbr_idx, nbr_ok
        )
        out = InstanceNorm()(out, level.valid)
        if feats.shape[-1] != self.planes * self.expansion:
            residual = SparseConv1x1(
                self.planes * self.expansion, use_bias=False,
                compute_dtype=self.compute_dtype,
            )(feats)
            residual = InstanceNorm()(residual, level.valid)
        return nn.relu(out + residual)


class Res16UNetBase(nn.Module):
    """Res16UNet encoder/decoder over a 5-level sparse pyramid.

    PLANES/LAYERS follow `mask3d/models/res16unet.py:11-13`; subclasses pin
    the variants (34C is the reference's shipped backbone,
    `mask3d/conf/model/mask3d.yaml:33`).
    """

    in_channels: int = 1
    conv1_kernel_size: int = 5
    compute_dtype: Optional[Dtype] = None
    PLANES: Sequence[int] = (32, 64, 128, 256, 256, 256, 256, 256)
    LAYERS: Sequence[int] = (2, 2, 2, 2, 2, 2, 2, 2)
    INIT_DIM: int = 32

    def _blocks(self, feats, sb: SparseBatch, level_idx: int, planes: int,
                n_blocks: int):
        lv = sb.levels[level_idx]
        for _ in range(n_blocks):
            feats = BasicBlock(planes, compute_dtype=self.compute_dtype)(
                feats, lv, sb.nbr_idx[level_idx], sb.nbr_ok[level_idx]
            )
        return feats

    @nn.compact
    def __call__(self, feats, sb: SparseBatch) -> Tuple[Any, list]:
        p = self.PLANES
        lay = self.LAYERS
        dt = self.compute_dtype

        # --- Encoder (reference res16unet.py:244-267) ---
        out = SparseConv(self.INIT_DIM, sb.nbr0_idx.shape[-1],
                         compute_dtype=dt)(feats, sb.nbr0_idx, sb.nbr0_ok)
        out = InstanceNorm()(out, sb.levels[0].valid)
        out_p1 = nn.relu(out)

        out = SparseConvDown(self.INIT_DIM, compute_dtype=dt)(
            out_p1, sb.pools[0], sb.levels[1].capacity
        )
        out = InstanceNorm()(out, sb.levels[1].valid)
        out = nn.relu(out)
        out_b1p2 = self._blocks(out, sb, 1, p[0], lay[0])

        out = SparseConvDown(p[0], compute_dtype=dt)(
            out_b1p2, sb.pools[1], sb.levels[2].capacity
        )
        out = InstanceNorm()(out, sb.levels[2].valid)
        out = nn.relu(out)
        out_b2p4 = self._blocks(out, sb, 2, p[1], lay[1])

        out = SparseConvDown(p[1], compute_dtype=dt)(
            out_b2p4, sb.pools[2], sb.levels[3].capacity
        )
        out = InstanceNorm()(out, sb.levels[3].valid)
        out = nn.relu(out)
        out_b3p8 = self._blocks(out, sb, 3, p[2], lay[2])

        out = SparseConvDown(p[2], compute_dtype=dt)(
            out_b3p8, sb.pools[3], sb.levels[4].capacity
        )
        out = InstanceNorm()(out, sb.levels[4].valid)
        out = nn.relu(out)
        out = self._blocks(out, sb, 4, p[3], lay[3])

        feature_maps = [out]  # stride 16

        # --- Decoder (reference res16unet.py:271-309) ---
        out = SparseConvTr(p[4], compute_dtype=dt)(
            out, sb.pools[3], sb.levels[3].valid
        )
        out = InstanceNorm()(out, sb.levels[3].valid)
        out = nn.relu(out)
        out = cat_features(out, out_b3p8)
        out = self._blocks(out, sb, 3, p[4], lay[4])
        feature_maps.append(out)  # stride 8

        out = SparseConvTr(p[5], compute_dtype=dt)(
            out, sb.pools[2], sb.levels[2].valid
        )
        out = InstanceNorm()(out, sb.levels[2].valid)
        out = nn.relu(out)
        out = cat_features(out, out_b2p4)
        out = self._blocks(out, sb, 2, p[5], lay[5])
        feature_maps.append(out)  # stride 4

        out = SparseConvTr(p[6], compute_dtype=dt)(
            out, sb.pools[1], sb.levels[1].valid
        )
        out = InstanceNorm()(out, sb.levels[1].valid)
        out = nn.relu(out)
        out = cat_features(out, out_b1p2)
        out = self._blocks(out, sb, 1, p[6], lay[6])
        feature_maps.append(out)  # stride 2

        out = SparseConvTr(p[7], compute_dtype=dt)(
            out, sb.pools[0], sb.levels[0].valid
        )
        out = InstanceNorm()(out, sb.levels[0].valid)
        out = nn.relu(out)
        out = cat_features(out, out_p1)
        out = self._blocks(out, sb, 0, p[7], lay[7])
        feature_maps.append(out)  # stride 1

        return out, feature_maps


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


BACKBONES = {
    "Res16UNet14": Res16UNet14,
    "Res16UNet14A": Res16UNet14A,
    "Res16UNet18": Res16UNet18,
    "Res16UNet18A": Res16UNet18A,
    "Res16UNet18B": Res16UNet18B,
    "Res16UNet34": Res16UNet34,
    "Res16UNet34A": Res16UNet34A,
    "Res16UNet34B": Res16UNet34B,
    "Res16UNet34C": Res16UNet34C,
    "Res16UNet34D": Res16UNet34D,
}
