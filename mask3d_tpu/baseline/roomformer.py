"""RoomFormer-TPU: two-level-query deformable-DETR floorplan model.

Capability-parity rebuild of the reference baseline model
(`RoomFormer/models/roomformer.py:22-186`,
`RoomFormer/models/deformable_transformer.py`): a 2D CNN backbone over the
256x256 density map, a multi-scale deformable-attention encoder, and a
decoder over two-level queries (num_polys x queries-per-poly) with iterative
polygon refinement. Corner-validity logits + normalized corner coordinates
per decoder layer (deep supervision).

TPU notes: deformable attention is the pure-XLA bilinear-gather op
(`deform_attn.py`); all shapes static; the backbone is a GroupNorm ResNet
(the reference uses torchvision ResNet50 — the backbone is a config choice,
not an algorithmic property).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from mask3d_tpu.baseline.deform_attn import ms_deform_attn_core

_XAVIER = nn.initializers.xavier_uniform()


def inverse_sigmoid(x, eps=1e-5):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


def sine_position_2d(h, w, dim, temperature=10000.0):
    """2D sine position embedding [H, W, dim] (DETR-style)."""
    half = dim // 2
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h * 2 * math.pi
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w * 2 * math.pi
    dim_t = temperature ** (
        2 * (jnp.arange(half, dtype=jnp.float32) // 2) / half
    )
    py = ys[:, None] / dim_t  # [H, half]
    px = xs[:, None] / dim_t
    py = jnp.stack([jnp.sin(py[:, 0::2]), jnp.cos(py[:, 1::2])], -1).reshape(
        h, -1
    )
    px = jnp.stack([jnp.sin(px[:, 0::2]), jnp.cos(px[:, 1::2])], -1).reshape(
        w, -1
    )
    return jnp.concatenate(
        [
            jnp.broadcast_to(py[:, None, :], (h, w, py.shape[-1])),
            jnp.broadcast_to(px[None, :, :], (h, w, px.shape[-1])),
        ],
        axis=-1,
    )


class ResBlock2D(nn.Module):
    ch: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.ch, (3, 3), strides=self.stride, use_bias=False)(x)
        y = nn.GroupNorm(num_groups=min(32, self.ch))(y)
        y = nn.relu(y)
        y = nn.Conv(self.ch, (3, 3), use_bias=False)(y)
        y = nn.GroupNorm(num_groups=min(32, self.ch))(y)
        if residual.shape != y.shape:
            residual = nn.Conv(
                self.ch, (1, 1), strides=self.stride, use_bias=False
            )(x)
            residual = nn.GroupNorm(num_groups=min(32, self.ch))(residual)
        return nn.relu(y + residual)


class Backbone2D(nn.Module):
    """Multi-scale 2D features at strides (4, 8, 16) (the reference returns
    torchvision ResNet50 stages, `RoomFormer/models/backbone.py`)."""

    channels: Sequence[int] = (64, 128, 256)
    blocks_per_stage: int = 2

    @nn.compact
    def __call__(self, x):  # x: [B, H, W, C]
        y = nn.Conv(self.channels[0], (7, 7), strides=2, use_bias=False)(x)
        y = nn.GroupNorm(num_groups=min(32, self.channels[0]))(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding="SAME")
        feats = []
        for si, ch in enumerate(self.channels):
            stride = 1 if si == 0 else 2
            y = ResBlock2D(ch, stride)(y)
            for _ in range(self.blocks_per_stage - 1):
                y = ResBlock2D(ch)(y)
            feats.append(y)
        return feats


class MSDeformAttnLayer(nn.Module):
    """One deformable attention op: offsets + weights from the query
    (reference `models/ops/modules/ms_deform_attn.py:30-120`)."""

    d_model: int
    n_heads: int = 8
    n_levels: int = 4
    n_points: int = 4

    @nn.compact
    def __call__(self, query, ref_points, value, spatial_shapes):
        """query [B, Q, D]; ref_points [B, Q, 2] in [0,1]; value
        [B, sum(HW), D]."""
        b, q, _ = query.shape
        h, lv, p = self.n_heads, self.n_levels, self.n_points
        hd = self.d_model // h
        v = nn.Dense(self.d_model, name="value_proj")(value)
        v = v.reshape(b, -1, h, hd)
        offsets = nn.Dense(
            h * lv * p * 2, kernel_init=nn.initializers.zeros,
            name="sampling_offsets",
        )(query).reshape(b, q, h, lv, p, 2)
        weights = nn.Dense(
            h * lv * p, kernel_init=nn.initializers.zeros, name="attn_weights"
        )(query).reshape(b, q, h, lv * p)
        weights = jax.nn.softmax(weights, axis=-1).reshape(b, q, h, lv, p)
        # offset normalizer: per-level (W, H)
        norm = jnp.asarray(
            [[w_, h_] for (h_, w_) in spatial_shapes], jnp.float32
        )  # [L, 2] as (x, y) divisor
        loc = ref_points[:, :, None, None, None, :] + offsets / norm[
            None, None, None, :, None, :
        ]
        out = ms_deform_attn_core(v, spatial_shapes, loc, weights)
        return nn.Dense(self.d_model, name="output_proj")(out)


class EncoderLayer(nn.Module):
    d_model: int
    n_heads: int
    n_levels: int
    n_points: int
    d_ffn: int = 512

    @nn.compact
    def __call__(self, src, pos, ref_points, spatial_shapes):
        a = MSDeformAttnLayer(
            self.d_model, self.n_heads, self.n_levels, self.n_points
        )(src + pos, ref_points, src, spatial_shapes)
        src = nn.LayerNorm()(src + a)
        f = nn.Dense(self.d_model, kernel_init=_XAVIER)(
            nn.relu(nn.Dense(self.d_ffn, kernel_init=_XAVIER)(src))
        )
        return nn.LayerNorm()(src + f)


class DecoderLayer(nn.Module):
    d_model: int
    n_heads: int
    n_levels: int
    n_points: int
    d_ffn: int = 512

    @nn.compact
    def __call__(self, tgt, query_pos, ref_points, memory, spatial_shapes,
                 self_attn_mask=None):
        # self attention among queries
        q = tgt + query_pos
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, qkv_features=self.d_model,
            kernel_init=_XAVIER,
        )
        mask = None
        if self_attn_mask is not None:
            mask = ~self_attn_mask[None, None]  # flax: True = attend
        t2 = attn(q, q, tgt, mask=mask)
        tgt = nn.LayerNorm()(tgt + t2)
        # deformable cross attention at the current reference points
        t2 = MSDeformAttnLayer(
            self.d_model, self.n_heads, self.n_levels, self.n_points
        )(tgt + query_pos, ref_points, memory, spatial_shapes)
        tgt = nn.LayerNorm()(tgt + t2)
        f = nn.Dense(self.d_model, kernel_init=_XAVIER)(
            nn.relu(nn.Dense(self.d_ffn, kernel_init=_XAVIER)(tgt))
        )
        return nn.LayerNorm()(tgt + f)


class RoomFormerOutput(struct.PyTreeNode):
    """aux_* stack per-decoder-layer outputs; final = index -1
    (reference out dict + aux_outputs, `roomformer.py:165-186`)."""

    aux_logits: jax.Array  # [L, B, P, Qp] corner-validity logits
    aux_coords: jax.Array  # [L, B, P, Qp, 2] normalized corner coords
    room_logits: Optional[jax.Array] = None  # [B, P, C_sem]

    @property
    def pred_logits(self):
        return self.aux_logits[-1]

    @property
    def pred_coords(self):
        return self.aux_coords[-1]


class RoomFormer(nn.Module):
    """Field defaults mirror `RoomFormer/main.py` args (hidden_dim 256,
    two-level queries 800 = 40 polys x 20 corners... the paper's stru3d
    config uses num_queries 800, num_polys 20)."""

    d_model: int = 256
    n_heads: int = 8
    n_levels: int = 4
    n_points: int = 4
    enc_layers: int = 6
    dec_layers: int = 6
    num_polys: int = 20
    num_queries: int = 800  # total corners = num_polys * queries_per_poly
    with_poly_refine: bool = True
    masked_attn: bool = False
    semantic_classes: int = -1
    backbone_channels: Sequence[int] = (64, 128, 256)

    @nn.compact
    def __call__(self, density):  # density: [B, H, W, 1]
        b = density.shape[0]
        qp = self.num_queries // self.num_polys
        feats = Backbone2D(self.backbone_channels)(density)
        # extra coarsest level
        extra = nn.Conv(self.d_model, (3, 3), strides=2, name="extra_level")(
            feats[-1]
        )
        feats = feats + [extra]

        srcs, poss, shapes = [], [], []
        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0),
            (self.n_levels, self.d_model),
        )
        for li, f in enumerate(feats):
            s = nn.Conv(self.d_model, (1, 1), name=f"input_proj_{li}")(f)
            s = nn.GroupNorm(num_groups=min(32, self.d_model))(s)
            h, w = s.shape[1], s.shape[2]
            shapes.append((h, w))
            pos = sine_position_2d(h, w, self.d_model) + level_embed[li]
            srcs.append(s.reshape(b, h * w, self.d_model))
            poss.append(
                jnp.broadcast_to(
                    pos.reshape(1, h * w, self.d_model),
                    (b, h * w, self.d_model),
                )
            )
        src = jnp.concatenate(srcs, axis=1)
        pos = jnp.concatenate(poss, axis=1)

        # encoder reference points: pixel centers per level
        refs = []
        for (h, w) in shapes:
            ys, xs = jnp.meshgrid(
                (jnp.arange(h) + 0.5) / h, (jnp.arange(w) + 0.5) / w,
                indexing="ij",
            )
            refs.append(
                jnp.stack([xs.reshape(-1), ys.reshape(-1)], -1)
            )
        enc_ref = jnp.broadcast_to(
            jnp.concatenate(refs, 0)[None], (b, src.shape[1], 2)
        )

        for i in range(self.enc_layers):
            src = EncoderLayer(
                self.d_model, self.n_heads, self.n_levels, self.n_points,
                name=f"enc_{i}",
            )(src, pos, enc_ref, shapes)

        # two-level queries
        query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (self.num_queries, 2),
        )
        tgt_embed = self.param(
            "tgt_embed", nn.initializers.normal(1.0),
            (self.num_queries, self.d_model),
        )
        tgt = jnp.broadcast_to(
            tgt_embed[None], (b, self.num_queries, self.d_model)
        )
        ref = jnp.broadcast_to(
            jax.nn.sigmoid(query_embed)[None], (b, self.num_queries, 2)
        )
        query_pos = nn.Dense(self.d_model, name="query_pos_proj")(
            jnp.broadcast_to(
                query_embed[None], (b, self.num_queries, 2)
            )
        )

        self_mask = None
        if self.masked_attn:
            # block attention across polygons (reference roomformer.py:108-115)
            qids = jnp.arange(self.num_queries) // qp
            self_mask = qids[:, None] != qids[None, :]

        logits_layers, coords_layers = [], []
        hs = None
        for i in range(self.dec_layers):
            tgt = DecoderLayer(
                self.d_model, self.n_heads, self.n_levels, self.n_points,
                name=f"dec_{i}",
            )(tgt, query_pos, ref, src, shapes, self_mask)
            hs = tgt
            suffix = i if self.with_poly_refine else 0
            delta = nn.Dense(
                2, kernel_init=nn.initializers.zeros,
                name=f"coords_embed_{suffix}",
            )(
                nn.relu(nn.Dense(self.d_model, name=f"coords_mlp1_{suffix}")(
                    nn.relu(nn.Dense(self.d_model,
                                     name=f"coords_mlp0_{suffix}")(tgt))
                ))
            )
            ref = jax.nn.sigmoid(inverse_sigmoid(ref) + delta)
            ref = jax.lax.stop_gradient(ref) if i < self.dec_layers - 1 \
                else ref
            logit = nn.Dense(
                1, bias_init=nn.initializers.constant(
                    -math.log((1 - 0.01) / 0.01)
                ),
                name=f"class_embed_{suffix}",
            )(tgt)[..., 0]
            logits_layers.append(
                logit.reshape(b, self.num_polys, qp)
            )
            coords_layers.append(
                ref.reshape(b, self.num_polys, qp, 2)
            )

        room_logits = None
        if self.semantic_classes > 0:
            pooled = hs.reshape(b, self.num_polys, qp, self.d_model).mean(2)
            room_logits = nn.Dense(
                self.semantic_classes, name="room_class_embed"
            )(pooled)

        return RoomFormerOutput(
            aux_logits=jnp.stack(logits_layers),
            aux_coords=jnp.stack(coords_layers),
            room_logits=room_logits,
        )
