"""MinkUNet (ResUNet) alternative-backbone family.

Capability-parity rebuild of the reference's vestigial model zoo
(`mask3d/models/resunet.py:11-305`, registered by
`mask3d/models/__init__.py:14-44` but never selected by any shipped
config): a 3-stage stride-2 encoder (strides 1->2->4->8) and a 3-stage
transposed-conv decoder with skip concatenations, closed by a
`[cat -> 1x1 conv -> norm -> relu -> 1x1 conv + bias]` head producing
`out_channels` logits per voxel (`resunet.py:180-253`).

Like Res16UNet, the reference family runs InstanceNorm everywhere
(`resunet.py:18`, same all-ones-features rationale). `ResUNet18INBN`
(`resunet.py:266-268`) mixes instance and batch norm inside the block; with
all-ones inputs the reference's own comment says batch statistics are
degenerate, so it is aliased to the instance-norm block here.

Omitted as dead code, documented for the parity audit:
- `MinkUNetHyper` (`resunet.py:308-560`) keeps `BLOCK = None` and no
  subclass ever sets it -> uninstantiable in the reference as shipped.
- `STResUNet*` / `STResTesseractUNet*` (`resunet.py:563-617`) are 4D
  spatiotemporal variants; the room-segmentation data path is 3D-only.

SE variants compose the squeeze-excitation blocks
(`mask3d/models/modules/senet_block.py:8-141`) with any backbone via the
`SE` class attribute (see `Res16UNetBase._se`).

Both execution paths (`impl="gather"`/`"dense"`) are inherited from
`Res16UNetBase`; only the topology differs.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from mask3d_tpu.models.backbone import (
    Res16UNetBase,
    _DenseCtx,
    _GatherCtx,
    _KERNEL_INIT,
)
from mask3d_tpu.sparse.context import SparseBatch


class MinkUNetBase(Res16UNetBase):
    """MinkUNetBase topology (`mask3d/models/resunet.py:11-253`).

    PLANES has 7 entries (vs Res16UNet's 8): 4 encoder stages at strides
    1/2/4/8 and 3 decoder stages back to stride 1. Returns
    `(logits, feature_maps)` with logits `[B, N, out_channels]` and the
    stride-[8, 4, 2, 1] intermediate maps (the reference returns only the
    final tensor; the maps are exposed for parity with this framework's
    backbone contract).
    """

    out_channels: int = 20
    PLANES: Sequence[int] = (64, 128, 256, 512, 256, 128, 128)
    LAYERS: Sequence[int] = (2, 2, 2, 2, 2, 2)
    INIT_DIM: int = 64

    @nn.compact
    def __call__(self, feats, sb: SparseBatch, grid_dims=None
                 ) -> Tuple[Any, list]:
        p = self.PLANES
        lay = self.LAYERS
        e = self.EXPANSION
        k0 = self.conv1_kernel_size ** 3

        if self.impl == "dense":
            assert grid_dims is not None, "dense impl needs static grid dims"
            ctx = _DenseCtx(sb, grid_dims, self.compute_dtype,
                            sp_axis=self.sp_axis)
            x = ctx.scatter(feats, 0)
        else:
            ctx = _GatherCtx(sb, self.compute_dtype,
                             use_pallas=self.impl == "gather_pallas")
            x = feats

        def down(name, x_in, fine_idx, cin):
            w = self._kernel(name, 8, cin, cin)
            g, b = self._norm_params(name.replace("conv", "bn"), cin)
            out = ctx.conv_down(x_in, w, fine_idx)
            return nn.relu(ctx.norm(out, g, b, fine_idx + 1))

        def up(name, x_in, coarse_idx, cin, cout):
            w = self._kernel(name, 8, cin, cout)
            g, b = self._norm_params(name.replace("convtr", "bntr"), cout)
            out = ctx.conv_tr(x_in, w, coarse_idx)
            return nn.relu(ctx.norm(out, g, b, coarse_idx - 1))

        # --- Encoder (reference resunet.py:208-232) ---
        w = self._kernel("conv1p1s1", k0, self.in_channels, self.INIT_DIM)
        g, b = self._norm_params("bn1", self.INIT_DIM)
        out = nn.relu(ctx.norm(ctx.conv_in(x, w, None), g, b, 0))
        out_b1p1, _ = self._blocks(ctx, 1, out, 0, self.INIT_DIM, p[0],
                                   lay[0])

        out = down("conv2p1s2", out_b1p1, 0, p[0] * e)
        out_b2p2, _ = self._blocks(ctx, 2, out, 1, p[0] * e, p[1], lay[1])

        out = down("conv3p2s2", out_b2p2, 1, p[1] * e)
        out_b3p4, _ = self._blocks(ctx, 3, out, 2, p[1] * e, p[2], lay[2])

        out = down("conv4p4s2", out_b3p4, 2, p[2] * e)
        out, _ = self._blocks(ctx, 4, out, 3, p[2] * e, p[3], lay[3])
        feature_maps = [ctx.rows(out, 3)]  # stride 8

        # --- Decoder (reference resunet.py:233-253) ---
        out = up("convtr4p8s2", out, 3, p[3] * e, p[4])
        out = ctx.cat(out, out_b3p4)
        out, _ = self._blocks(ctx, 5, out, 2, p[4] + p[2] * e, p[4],
                              lay[4])
        feature_maps.append(ctx.rows(out, 2))  # stride 4

        out = up("convtr5p4s2", out, 2, p[4] * e, p[5])
        out = ctx.cat(out, out_b2p2)
        out, _ = self._blocks(ctx, 6, out, 1, p[5] + p[1] * e, p[5],
                              lay[5])
        feature_maps.append(ctx.rows(out, 1))  # stride 2

        out = up("convtr6p2s2", out, 1, p[5] * e, p[6])
        out = ctx.cat(out, out_b1p1)

        # --- final head (reference resunet.py:180-206) ---
        cin = p[6] + p[0] * e
        wf1 = self._kernel("final_conv1", 1, cin, 512)
        gf, bf = self._norm_params("final_norm", 512)
        out = nn.relu(ctx.norm(ctx.conv1x1(out, wf1, 0), gf, bf, 0))
        wf2 = self._kernel("final_conv2", 1, 512, self.out_channels)
        bias = self.param(
            "final_conv2_bias", nn.initializers.zeros, (self.out_channels,)
        )
        out = ctx.conv1x1(out, wf2, 0) + bias

        out_rows = ctx.rows(out, 0)
        feature_maps.append(out_rows)  # stride 1
        return out_rows, feature_maps


class ResUNet14(MinkUNetBase):
    LAYERS: Sequence[int] = (1, 1, 1, 1, 1, 1)


class ResUNet18(MinkUNetBase):
    LAYERS: Sequence[int] = (2, 2, 2, 2, 2, 2)


class ResUNet18INBN(ResUNet18):
    """`resunet.py:266-268`; IN/BN mixed block aliased to IN (see module
    docstring)."""


class ResUNet34(MinkUNetBase):
    LAYERS: Sequence[int] = (3, 4, 6, 3, 2, 2)


class ResUNet50(MinkUNetBase):
    LAYERS: Sequence[int] = (3, 4, 6, 3, 2, 2)
    BLOCK: str = "bottleneck"
    EXPANSION: int = 4


class ResUNet101(MinkUNetBase):
    LAYERS: Sequence[int] = (3, 4, 23, 3, 2, 2)
    BLOCK: str = "bottleneck"
    EXPANSION: int = 4


class ResUNet14D(ResUNet14):
    PLANES: Sequence[int] = (64, 128, 256, 512, 512, 512, 512)


class ResUNet18D(ResUNet18):
    PLANES: Sequence[int] = (64, 128, 256, 512, 512, 512, 512)


class ResUNet34D(ResUNet34):
    PLANES: Sequence[int] = (64, 128, 256, 512, 512, 512, 512)


class ResUNet34E(ResUNet34):
    INIT_DIM: int = 32
    PLANES: Sequence[int] = (32, 64, 128, 256, 128, 64, 64)


class ResUNet34F(ResUNet34):
    INIT_DIM: int = 32
    PLANES: Sequence[int] = (32, 64, 128, 256, 128, 64, 32)


class SEResUNet14(ResUNet14):
    """SEBasicBlock variant (`senet_block.py:27-67`)."""

    SE: bool = True


class SEResUNet50(ResUNet50):
    """SEBottleneck variant (`senet_block.py:82-126`)."""

    SE: bool = True


RESUNETS = {
    cls.__name__: cls
    for cls in (
        ResUNet14, ResUNet18, ResUNet18INBN, ResUNet34, ResUNet50,
        ResUNet101, ResUNet14D, ResUNet18D, ResUNet34D, ResUNet34E,
        ResUNet34F, SEResUNet14, SEResUNet50,
    )
}
