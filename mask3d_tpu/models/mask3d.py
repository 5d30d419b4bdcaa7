"""Mask3D: instance-query transformer decoder over sparse voxel features.

Capability-parity rebuild of the reference model (`mask3d/models/mask3d.py:73-561`):
FPS-initialized instance queries iteratively refined by masked cross-attention
over multi-scale backbone features, with a mask module emitting per-point mask
logits + class logits after every refinement (deep supervision).

TPU design notes
----------------
- The reference loops over batch items everywhere (decomposed_features,
  per-item FPS/PE/sampling, `mask3d.py:261-278,309-317,400-465`); here every
  stage is batched over the `[B, N]` padded layout — per-item decomposition
  is the memory layout itself.
- Cross-attention memory is subsampled to the static `sample_sizes` per
  level during training exactly like the reference (`mask3d.py:400-441` —
  the reference already uses fixed-size padded sampling, which is precisely
  the XLA static-shape pattern); at eval the full (static-capacity) level is
  used with padding masks.
- The mask module's per-item `feats @ mask_embed.T` loop (`mask3d.py:534-537`)
  becomes one batched einsum `[B,N,D] x [B,Q,D] -> [B,N,Q]` (MXU).
- Attention-mask pooling to coarser levels rides the octree PoolMaps
  (reference: repeated MinkowskiAvgPooling, `mask3d.py:546-547`).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from mask3d_tpu.models.backbone import BACKBONES
from mask3d_tpu.models.posenc import (
    fourier_embeddings,
    make_gauss_b,
    sine_embeddings,
)
from mask3d_tpu.ops.fps import furthest_point_sample
from mask3d_tpu.sparse.context import SparseBatch
from mask3d_tpu.sparse.ops import avg_pool

_XAVIER = nn.initializers.xavier_uniform()


class Mask3DOutput(struct.PyTreeNode):
    """Model output (reference `ModelOutput`, `mask3d/models/mask3d.py:28-70`).

    `aux_*` stack ALL mask-module outputs in emission order; the final
    prediction is the last entry (index -1), the first L-1 entries are the
    auxiliary deep-supervision outputs.
    """

    aux_pred_class: jax.Array  # f32[L, B, Q, C+1]
    aux_pred_masks: jax.Array  # f32[L, B, N1, Q]
    sampled_coords: Optional[jax.Array]  # f32[B, Q, 3] (FPS query positions)
    backbone_feats: Optional[jax.Array]  # [B, N1, C_bb]

    @property
    def pred_class(self):
        return self.aux_pred_class[-1]

    @property
    def pred_masks(self):
        return self.aux_pred_masks[-1]


def _chunked_attention(qh, kh, vh, mask, chunk):
    """Online-softmax attention over key chunks (flash-attention schedule).

    Avoids materializing the `[B, h, Q, S]` logits in HBM — at eval the
    memory is the FULL padded level (S up to 64k), so the one-shot logits
    tensor plus its softmax round trips are pure HBM traffic that dwarfs
    the K/V reads. Accumulators are f32 regardless of compute dtype.

    qh: [B, Q, h, hd]; kh/vh: [B, S, h, hd]; mask: [B, Q, S] (True=blocked).
    Exact (up to fp reassociation) vs the one-shot softmax, including the
    all-blocked-row convention (uniform weights, matching -1e9 fill).
    """
    B, Q, h, hd = qh.shape
    S = kh.shape[1]
    nc = S // chunk
    q32 = qh.astype(jnp.float32) / jnp.sqrt(jnp.float32(hd))
    kc = kh.reshape(B, nc, chunk, h, hd).transpose(1, 0, 2, 3, 4)
    vc = vh.reshape(B, nc, chunk, h, hd).transpose(1, 0, 2, 3, 4)
    mc = mask.reshape(B, Q, nc, chunk).transpose(2, 0, 1, 3)

    def step(carry, xs):
        m, l, acc = carry
        k, v, msk = xs
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q32, k.astype(jnp.float32),
        )
        logits = jnp.where(msk[:, None], jnp.float32(-1e9), logits)
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1))
        corr = jnp.exp(m - m_new)
        p = jnp.exp(logits - m_new[..., None])
        l_new = l * corr + jnp.sum(p, axis=-1)
        acc_new = acc * corr[..., None] + jnp.einsum(
            "bhqk,bkhd->bhqd", p, v.astype(jnp.float32),
        )
        return (m_new, l_new, acc_new), None

    init = (
        jnp.full((B, h, Q), -1e9, jnp.float32),
        jnp.zeros((B, h, Q), jnp.float32),
        jnp.zeros((B, h, Q, hd), jnp.float32),
    )
    (m, l, acc), _ = jax.lax.scan(step, init, (kc, vc, mc))
    out = acc / jnp.maximum(l, 1e-20)[..., None]
    return jnp.transpose(out, (0, 2, 1, 3)).astype(qh.dtype)


class MultiheadAttention(nn.Module):
    """Standard MHA with a boolean block-mask (True = do not attend).

    `project_kv` exposes the K/V projections so callers can hoist them
    out of loops whose memory is constant (the shared-decoder rounds
    re-attend the same squeezed level features — reference
    `mask3d/models/mask3d.py:467` recomputes them every iteration).
    `chunk > 0` selects the online-softmax schedule for long memories.
    """

    d_model: int
    num_heads: int

    def setup(self):
        d = self.d_model
        self.wq = nn.Dense(d, kernel_init=_XAVIER, name="q")
        self.wk = nn.Dense(d, kernel_init=_XAVIER, name="k")
        self.wv = nn.Dense(d, kernel_init=_XAVIER, name="v")
        self.wo = nn.Dense(d, kernel_init=_XAVIER, name="out")

    def project_kv(self, k, v):
        return self.wk(k), self.wv(v)

    def __call__(self, q, k, v, mask=None, kv_proj=None, chunk=0,
                 pallas_tile=0):
        d, h = self.d_model, self.num_heads
        hd = d // h
        wq = self.wq(q)
        wk, wv = kv_proj if kv_proj is not None else self.project_kv(k, v)

        def split(x):
            return x.reshape(x.shape[:-1] + (h, hd))

        if (
            pallas_tile > 0 and mask is not None
            and wk.shape[1] % pallas_tile == 0
            and wk.shape[1] >= 2 * pallas_tile
        ):
            from mask3d_tpu.ops.pallas_attention import (
                masked_cross_attention,
                pallas_attention_available,
            )

            # libtpu builds rotate under the remote fleet and Mosaic
            # lowering of this kernel has broken across builds; probe
            # once and downgrade to the chunked/one-shot XLA path below
            # instead of crashing (VERDICT r3 item 4).
            if pallas_attention_available(d, h, pallas_tile):
                out = masked_cross_attention(
                    wq, wk, wv, mask, h, tile=pallas_tile,
                    interpret=jax.default_backend() != "tpu",
                )
                return self.wo(out)
            # Downgrade: online-softmax chunks at the tile size (same
            # O(tile) working set as the kernel would have had).
            chunk = chunk if chunk > 0 else pallas_tile

        if (
            chunk > 0 and mask is not None
            and wk.shape[1] % chunk == 0 and wk.shape[1] >= 2 * chunk
        ):
            out = _chunked_attention(
                split(wq), split(wk), split(wv), mask, chunk
            )
            return self.wo(out.reshape(out.shape[:2] + (d,)))

        logits = jnp.einsum("bqhd,bkhd->bhqk", split(wq), split(wk))
        logits = logits / jnp.sqrt(jnp.float32(hd)).astype(logits.dtype)
        if mask is not None:
            # mask: [B, Lq, Lk] -> broadcast over heads
            logits = jnp.where(mask[:, None], jnp.float32(-1e9), logits)
        att = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", att, split(wv))
        out = out.reshape(out.shape[:2] + (d,))
        return self.wo(out)


class CrossAttentionLayer(nn.Module):
    """Reference `mask3d/models/mask3d.py:658-747` (post-norm default)."""

    d_model: int
    num_heads: int
    dropout: float = 0.0
    pre_norm: bool = False

    def setup(self):
        # Explicit names preserve the param paths of the former
        # @nn.compact auto-numbering (checkpoint compatibility).
        self.attn = MultiheadAttention(
            self.d_model, self.num_heads, name="MultiheadAttention_0"
        )
        self.norm = nn.LayerNorm(name="LayerNorm_0")
        self.drop = nn.Dropout(self.dropout, name="Dropout_0")

    def project_kv(self, memory, pos):
        """K/V projections of a (memory, pos) pair — constant across the
        shared-decoder rounds, so hoistable (K attends to memory+pos,
        V to memory, reference mask3d.py:700-709)."""
        return self.attn.project_kv(memory + pos, memory)

    def __call__(self, tgt, memory, memory_mask, pos, query_pos,
                 deterministic=True, kv_proj=None, chunk=0, pallas_tile=0):
        if self.pre_norm:
            t2 = self.norm(tgt)
            t2 = self.attn(
                t2 + query_pos, memory + pos, memory, memory_mask,
                kv_proj=kv_proj, chunk=chunk, pallas_tile=pallas_tile,
            )
            return tgt + self.drop(t2, deterministic=deterministic)
        t2 = self.attn(
            tgt + query_pos, memory + pos, memory, memory_mask,
            kv_proj=kv_proj, chunk=chunk, pallas_tile=pallas_tile,
        )
        return self.norm(tgt + self.drop(t2, deterministic=deterministic))


class SelfAttentionLayer(nn.Module):
    """Reference `mask3d/models/mask3d.py:596-655`."""

    d_model: int
    num_heads: int
    dropout: float = 0.0
    pre_norm: bool = False

    @nn.compact
    def __call__(self, tgt, query_pos, deterministic=True):
        attn = MultiheadAttention(self.d_model, self.num_heads)
        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        norm = nn.LayerNorm()
        if self.pre_norm:
            t2 = norm(tgt)
            t2 = attn(t2 + query_pos, t2 + query_pos, t2)
            return tgt + drop(t2)
        t2 = attn(tgt + query_pos, tgt + query_pos, tgt)
        return norm(tgt + drop(t2))


class FFNLayer(nn.Module):
    """Reference `mask3d/models/mask3d.py:750-795`."""

    d_model: int
    dim_feedforward: int
    dropout: float = 0.0
    pre_norm: bool = False

    @nn.compact
    def __call__(self, tgt, deterministic=True):
        lin1 = nn.Dense(self.dim_feedforward, kernel_init=_XAVIER)
        lin2 = nn.Dense(self.d_model, kernel_init=_XAVIER)
        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        norm = nn.LayerNorm()
        if self.pre_norm:
            t2 = norm(tgt)
            t2 = lin2(drop(nn.relu(lin1(t2))))
            return tgt + drop(t2)
        t2 = lin2(drop(nn.relu(lin1(tgt))))
        return norm(tgt + drop(t2))


def _masked_minmax(coords, valid):
    """Per-item min/max over valid rows. coords [B, N, 3], valid [B, N]."""
    big = jnp.float32(1e9)
    c = coords.astype(jnp.float32)
    mins = jnp.min(jnp.where(valid[..., None], c, big), axis=1)
    maxs = jnp.max(jnp.where(valid[..., None], c, -big), axis=1)
    # Degenerate (empty) items: collapse to zeros.
    any_valid = jnp.any(valid, axis=1)[:, None]
    return (
        jnp.where(any_valid, mins, 0.0),
        jnp.where(any_valid, maxs, 0.0),
    )


class Mask3D(nn.Module):
    """The flagship model. Field defaults mirror `mask3d/conf/model/mask3d.yaml`."""

    num_classes: int = 1
    hidden_dim: int = 128
    dim_feedforward: int = 1024
    num_queries: int = 25
    num_heads: int = 8
    num_decoders: int = 3
    dropout: float = 0.0
    pre_norm: bool = False
    use_level_embed: bool = False
    normalize_pos_enc: bool = True
    positional_encoding_type: str = "fourier"
    gauss_scale: float = 1.0
    hlevels: Sequence[int] = (0, 1, 2, 3)
    non_parametric_queries: bool = True
    random_query_both: bool = False
    random_normal: bool = False
    random_queries: bool = False
    use_np_features: bool = False
    sample_sizes: Sequence[int] = (200, 800, 3200, 12800, 51200)
    max_sample_size: bool = False
    shared_decoder: bool = True
    backbone_name: str = "Res16UNet34C"
    backbone_impl: str = "gather"  # gather|gather_pallas|dense|bricked
    brick_dims: Sequence[int] = (16, 16, 8)  # bricked impl brick shape
    brick_capacity: int = 8192  # bricked impl max occupied bricks
    pallas_conv_select: str = "onehot"  # windowed-conv selection mechanism
    pallas_window_mode: str = "per_offset"  # windowed-conv DMA schedule
    in_channels: int = 1
    conv1_kernel_size: int = 5
    compute_dtype: Optional[Any] = None
    # Sequence parallelism: mesh axis to shard the point/grid-x axis over
    # (see mask3d_tpu/parallel/mesh.py). Queries stay replicated.
    sp_axis: Optional[str] = None
    # Activation checkpointing of the backbone (training-memory knob).
    remat_backbone: bool = False
    # Cross-attention key-chunk size for the online-softmax schedule
    # (0 = one-shot softmax). Only kicks in when the memory length is a
    # multiple of the chunk and >= 2 chunks (i.e. the full-level eval
    # path); sampled train memories fall through to one-shot.
    attention_chunk: int = 0
    # Fused Pallas masked cross-attention tile (0 = off). Streams K/V
    # once through VMEM with the softmax state in scratch — no [B,h,Q,S]
    # logits in HBM at all (ops/pallas_attention.py). Takes precedence
    # over attention_chunk where the memory length qualifies.
    attention_pallas_tile: int = 0
    # int8 level-0 stride-1 convs at EVAL only (dense impl; see
    # sparse/dense_ops.py::dense_conv_same_int8). Training keeps
    # compute_dtype — quantization round() has no useful gradient.
    int8_stride1: bool = False
    # Intermediate backbone block outputs materialize ONLY as int8 (the
    # residual consumer dequantizes in-register) — kills the duplicated
    # bf16 junction-epilogue passes; needs int8_stride1 + int8_act_sigma.
    int8_residual: bool = False
    # >0: static int8 activation scales derived from the InstanceNorm
    # affine params (sigma*|gamma|+|beta| bound) instead of dynamic
    # per-conv absmax reduces (see backbone.py::_act_bound).
    int8_act_sigma: float = 0.0
    # Fused Pallas int8 block-chain for >=96-ch stride-1 block stacks
    # (sparse/pallas_chain.py; needs int8_stride1 + int8_act_sigma).
    pallas_chain: bool = False
    fold_small_stages: bool = False
    # Promise that input features are constant ones (the reference's room
    # configs set add_colors: false, `mask3d/conf/data/indoor.yaml` — every
    # dataset here builds np.ones features). The dense stem then reads the
    # occupancy grid instead of re-scattering identical feature rows.
    unit_features: bool = False

    def _pos_enc(self, xyz, mins, maxs, gauss_b):
        if self.positional_encoding_type == "fourier":
            return fourier_embeddings(
                xyz, gauss_b, mins, maxs, normalize=self.normalize_pos_enc
            )
        elif self.positional_encoding_type == "sine":
            return sine_embeddings(
                xyz, self.hidden_dim, mins, maxs,
                normalize=self.normalize_pos_enc,
            )
        raise ValueError(self.positional_encoding_type)

    @nn.compact
    def __call__(self, sb: SparseBatch, feats, raw_coords, is_eval=False,
                 grid_dims=None, aux_masks=True) -> Mask3DOutput:
        """feats: [B, N1, in_channels]; raw_coords: f32[B, N1, 3] (the voxel
        coordinates as floats, the reference's `input_batch.coordinates[:,1:4]`
        used as PE/FPS positions, `mask3d/models/mask3d.py:286-294`).

        `aux_masks=False` (inference-only) skips the 12 auxiliary
        full-resolution mask logits — they exist for the deep-supervision
        loss; `aux_pred_masks` then has L=1 (the final prediction), and
        `pred_masks`/`pred_class` are unchanged."""
        D = self.hidden_dim
        B = feats.shape[0]
        Q = self.num_queries
        n_levels = sb.num_levels  # 5

        from mask3d_tpu.parallel.mesh import maybe_constrain

        backbone_cls = BACKBONES[self.backbone_name]
        if self.remat_backbone:
            # Activation checkpointing: recompute the backbone in the
            # backward pass instead of keeping every dense-grid activation
            # live (the TPU answer to the reference's per-step
            # `torch.cuda.empty_cache()` OOM workaround, `trainer.py:304-308`
            # — trades ~1/3 more FLOPs for O(depth) less HBM at batch 16).
            backbone_cls = nn.remat(backbone_cls, static_argnums=(3, 4))
        backbone = backbone_cls(
            in_channels=self.in_channels,
            conv1_kernel_size=self.conv1_kernel_size,
            compute_dtype=self.compute_dtype,
            impl=self.backbone_impl,
            brick_dims=tuple(self.brick_dims),
            brick_capacity=self.brick_capacity,
            pallas_select=self.pallas_conv_select,
            pallas_window_mode=self.pallas_window_mode,
            sp_axis=self.sp_axis,
            int8_stride1=self.int8_stride1 and is_eval,
            int8_residual=self.int8_residual,
            int8_act_sigma=self.int8_act_sigma,
            pallas_chain=self.pallas_chain,
            fold_small_stages=self.fold_small_stages,
            unit_features=self.unit_features,
            name="backbone",
        )
        bb_out, feature_maps, bb_grid = backbone(
            feats, sb, grid_dims, True
        )
        feature_maps = [
            maybe_constrain(f, self.sp_axis) for f in feature_maps
        ]
        # Phase markers for the measure_runtime contract (reference
        # `mask3d/utils/measure_runtime.py` call sites at
        # `models/mask3d.py:282,302,378,494`): tiny reductions sown into
        # the "intermediates" collection. A prefix-timing runner jits a
        # function returning only one marker — XLA dead-code-eliminates
        # later phases, so successive differences give honest per-phase
        # device times (`train/loop.py::measure_model_phases`). Inert
        # (no-op) unless "intermediates" is mutable.
        self.sow("intermediates", "backbone_part1",
                 jnp.sum(bb_out.astype(jnp.float32)))
        # feature_maps: [s16, s8, s4, s2, s1]; sparse level of fm[i] = 4-i.
        fm_level = [n_levels - 1 - i for i in range(n_levels)]

        # --- Coordinate pyramid (reference mask3d.py:286-299) ---
        # Built TOGETHER with the pooled mask-feature pyramid further below:
        # pooling costs per ROW, not per channel (measured identical time
        # for 3 and 128 columns), so the two pooling chains are fused into
        # one mean-pool over the concatenation and split per level.
        coords_pyr = [jax.lax.stop_gradient(raw_coords.astype(jnp.float32))]

        # --- Mask features head (reference mask3d.py:129-136,303) ---
        mask_head = nn.Dense(D, name="mask_features_head")
        mask_feats = mask_head(bb_out)
        mask_feats = jnp.where(sb.levels[0].valid[..., None], mask_feats, 0)
        mask_feats = maybe_constrain(mask_feats, self.sp_axis)

        # Pooled mask-feature pyramid: average pooling is linear, so
        # pool^k(F @ E^T) == (pool^k F) @ E^T — computing the pooled features
        # ONCE replaces the reference's per-iteration pooling chains of
        # full-resolution mask logits (`mask3d.py:546-547`), exactly.
        mask_feats_pyr = [jax.lax.stop_gradient(mask_feats)]
        if bb_grid is not None:
            # Dense path: pool on the grids (reduce_window) instead of
            # row-space segment sums. The mask-features head is LINEAR, so
            # mean-pool(head(x)) == head(mean-pool(x)): pool the backbone's
            # existing 96-ch grid in its own (bf16 at inference) dtype and
            # apply the head per coarse ROW afterwards — pooling a fused
            # f32 [coords | head(grid)] concat instead was measured ~55 ms
            # SLOWER per forward on v5e (1.8 GB of extra f32 HBM traffic at
            # flagship grids). The whole chain is stop-gradient (PE inputs
            # + attn masks only, matching the row path), so no backward
            # cost.
            from mask3d_tpu.parallel.mesh import sp_min_per_shard
            from mask3d_tpu.sparse import dense_ops

            occ_pyr = (
                sb.occ if len(sb.occ) == n_levels
                else tuple(
                    dense_ops.occupancy(sb.levels[li], grid_dims[li])
                    for li in range(n_levels)
                )
            )
            occ0 = occ_pyr[0].astype(jnp.float32)
            coord_grid = dense_ops.cell_coord_grid(grid_dims[0], B) * occ0
            # bb_grid is already zero at unoccupied cells: every dense op
            # in the backbone re-masks with the occupancy grid.
            grids = [
                jax.lax.stop_gradient(coord_grid),
                jax.lax.stop_gradient(bb_grid),
            ]

            def _constrain_grid(g, li):
                return maybe_constrain(
                    g, self.sp_axis,
                    shard_seq=sp_min_per_shard(
                        int(grid_dims[li][0]), self.sp_axis
                    ),
                )

            for crow, brow in dense_ops.pooled_row_pyramid(
                grids, occ_pyr, sb.levels, grid_dims,
                constrain=_constrain_grid,
            ):
                coords_pyr.append(maybe_constrain(crow, self.sp_axis))
                mf = jax.lax.stop_gradient(
                    mask_head(brow).astype(mask_feats.dtype)
                )
                mask_feats_pyr.append(maybe_constrain(mf, self.sp_axis))
        else:
            fused = jnp.concatenate(
                [coords_pyr[0], mask_feats_pyr[0].astype(jnp.float32)],
                axis=-1,
            )
            for i, pool in enumerate(sb.pools):
                fused = avg_pool(fused, pool, sb.levels[i + 1].capacity)
                coords_pyr.append(fused[..., :3])
                mask_feats_pyr.append(fused[..., 3:].astype(mask_feats.dtype))
        self.sow("intermediates", "backbone_part2",
                 sum(jnp.sum(m.astype(jnp.float32)) for m in mask_feats_pyr))

        gauss_b = self.variable(
            "buffers",
            "gauss_B",
            lambda: make_gauss_b(
                self.make_rng("params"), D, self.gauss_scale
            ),
        ).value

        # Positional encodings per sparse level (reference get_pos_encs).
        # Only levels the decoder attends to need one (fm_level[hlevel]);
        # in particular the full stride-1 PE (the largest by far) is dead
        # unless hlevels includes the finest map. XLA would DCE it anyway —
        # skipping it here keeps the profile markers honest too.
        pe_levels = {fm_level[h] for h in self.hlevels}
        pe_pyr = []
        minmax_pyr = []
        for li in range(n_levels):
            mins, maxs = _masked_minmax(coords_pyr[li], sb.levels[li].valid)
            minmax_pyr.append((mins, maxs))
            pe_pyr.append(
                self._pos_enc(coords_pyr[li], mins, maxs, gauss_b)
                if li in pe_levels else None
            )
        self.sow("intermediates", "pos_enc",
                 sum(jnp.sum(p.astype(jnp.float32))
                     for p in pe_pyr if p is not None))

        # --- Query initialization (reference mask3d.py:306-376) ---
        sampled_coords = None
        if self.non_parametric_queries:
            fps_idx = furthest_point_sample(
                coords_pyr[0], sb.levels[0].valid, Q
            )
            sampled_coords = jnp.take_along_axis(
                coords_pyr[0], fps_idx[..., None], axis=1
            )
            mins, maxs = minmax_pyr[0]
            qp = self._pos_enc(sampled_coords, mins, maxs, gauss_b)
            # GenericMLP query projection (helpers_3detr.py:45-113 with
            # hidden_use_bias=True, output_use_activation=True)
            qp = nn.relu(nn.Dense(D, name="query_proj_hidden")(qp))
            query_pos = nn.relu(nn.Dense(D, name="query_proj_out")(qp))
            if self.use_np_features:
                np_feats = jnp.take_along_axis(
                    bb_out, fps_idx[..., None], axis=1
                )
                queries = nn.Dense(D, name="np_proj_out")(
                    nn.relu(nn.Dense(D, name="np_proj_hidden")(np_feats))
                )
            else:
                queries = jnp.zeros_like(query_pos)
        elif self.random_queries:
            key = self.make_rng("queries")
            query_pos = jax.random.uniform(key, (B, Q, D)) - 0.5
            queries = jnp.zeros_like(query_pos)
        elif self.random_query_both:
            key = self.make_rng("queries")
            if self.random_normal:
                qpf = jax.random.normal(key, (B, Q, 2 * D))
            else:
                qpf = jax.random.uniform(key, (B, Q, 2 * D)) - 0.5
            queries, query_pos = qpf[..., :D], qpf[..., D:]
        else:  # parametric queries
            qf = self.param("query_feat", nn.initializers.normal(1.0), (Q, D))
            qpp = self.param("query_pos", nn.initializers.normal(1.0), (Q, D))
            queries = jnp.tile(qf[None], (B, 1, 1))
            query_pos = jnp.tile(qpp[None], (B, 1, 1))

        self.sow("intermediates", "queries",
                 jnp.sum(queries.astype(jnp.float32))
                 + jnp.sum(query_pos.astype(jnp.float32)))

        if self.use_level_embed:
            level_embed = self.param(
                "level_embed", nn.initializers.normal(1.0),
                (len(self.hlevels), D),
            )

        # --- Shared decoder modules (reference mask3d.py:211-259) ---
        num_shared = 1 if self.shared_decoder else self.num_decoders
        cross, self_att, ffns, squeeze = [], [], [], []
        for d in range(num_shared):
            cross.append([
                CrossAttentionLayer(D, self.num_heads, self.dropout,
                                    self.pre_norm, name=f"cross_{d}_{i}")
                for i in range(len(self.hlevels))
            ])
            self_att.append([
                SelfAttentionLayer(D, self.num_heads, self.dropout,
                                   self.pre_norm, name=f"self_{d}_{i}")
                for i in range(len(self.hlevels))
            ])
            ffns.append([
                FFNLayer(D, self.dim_feedforward, self.dropout,
                         self.pre_norm, name=f"ffn_{d}_{i}")
                for i in range(len(self.hlevels))
            ])
            squeeze.append([
                nn.Dense(D, kernel_init=_XAVIER, name=f"squeeze_{d}_{i}")
                for i in range(len(self.hlevels))
            ])

        decoder_norm = nn.LayerNorm(name="decoder_norm")
        mask_embed_hidden = nn.Dense(D, name="mask_embed_hidden")
        mask_embed_out = nn.Dense(D, name="mask_embed_out")
        class_embed = nn.Dense(self.num_classes + 1, name="class_embed_head")

        def mask_module(qs, num_pooling_steps, ret_attn=True,
                        ret_masks=True):
            """Reference mask3d.py:520-561 (attention masks via the pooled
            mask-feature pyramid — see comment above; exact by linearity).

            `ret_masks=False` skips the full-resolution mask einsum — the
            12 auxiliary [B, N1, Q] mask logits exist only for the deep
            -supervision loss, so pure inference computes just the final
            one (measured ~55 ms/batch of einsum + HBM writes on v5e).
            """
            qn = decoder_norm(qs)
            mask_embed = mask_embed_out(nn.relu(mask_embed_hidden(qn)))
            out_class = class_embed(qn)
            out_masks = None
            if ret_masks:
                out_masks = jnp.einsum(
                    "bnd,bqd->bnq", mask_feats, mask_embed,
                    preferred_element_type=jnp.float32,
                )
                out_masks = maybe_constrain(out_masks, self.sp_axis)
            if not ret_attn:
                return out_class, out_masks, None
            pooled = jnp.einsum(
                "bnd,bqd->bnq",
                mask_feats_pyr[num_pooling_steps],
                jax.lax.stop_gradient(mask_embed),
                preferred_element_type=jnp.float32,
            )
            attn_bool = jax.nn.sigmoid(pooled) < 0.5  # True = blocked
            return out_class, out_masks, attn_bool

        deterministic = is_eval or self.dropout == 0.0

        predictions_class = []
        predictions_masks = []
        src_cache = {}
        for dec in range(self.num_decoders):
            d = 0 if self.shared_decoder else dec
            for li, hlevel in enumerate(self.hlevels):
                lvl = fm_level[hlevel]  # sparse level index of this map
                out_class, out_masks, attn_bool = mask_module(
                    queries, num_pooling_steps=lvl, ret_attn=True,
                    ret_masks=aux_masks,
                )
                level = sb.levels[lvl]
                feats_l = feature_maps[hlevel]

                # Memory sampling (reference mask3d.py:400-441). Static
                # sample size: eval uses the full padded level; train caps at
                # sample_sizes[hlevel].
                cap = level.capacity
                if self.max_sample_size or is_eval:
                    S = cap
                else:
                    S = min(cap, int(self.sample_sizes[hlevel]))
                if S == cap:
                    # Full (padded) level: no gather needed, and with shared
                    # decoder weights the squeezed memory is identical across
                    # decoder rounds — compute it once per level (hoisted;
                    # the reference recomputes it every iteration,
                    # mask3d.py:467).
                    pos_in_sample = jnp.arange(S, dtype=jnp.int32)[None]
                    pad = pos_in_sample >= level.count[:, None]
                    attn_s = attn_bool  # [B, S, Q]
                    pe_s = pe_pyr[lvl]
                    key_src = (d, li)
                    if key_src not in src_cache:
                        src_full = squeeze[d][li](feats_l)
                        if self.use_level_embed:
                            src_full = src_full + level_embed[li]
                        # K/V projections are likewise constant across
                        # decoder rounds — hoist them too.
                        kvp = cross[d][li].project_kv(src_full, pe_s)
                        src_cache[key_src] = (src_full, kvp)
                    src, kvp = src_cache[key_src]
                else:
                    r = jax.random.uniform(
                        self.make_rng("sample"), (B, cap)
                    )
                    r = jnp.where(level.valid, r, 2.0)
                    sample_idx = jnp.argsort(r, axis=-1)[:, :S].astype(
                        jnp.int32
                    )
                    pos_in_sample = jnp.arange(S, dtype=jnp.int32)[None]
                    pad = pos_in_sample >= jnp.minimum(
                        level.count, S
                    )[:, None]
                    kv = jnp.take_along_axis(
                        feats_l, sample_idx[..., None], axis=1
                    )
                    pe_s = jnp.take_along_axis(
                        pe_pyr[lvl], sample_idx[..., None], axis=1
                    )
                    attn_s = jnp.take_along_axis(
                        attn_bool, sample_idx[..., None], axis=1
                    )  # [B, S, Q]
                    src = squeeze[d][li](kv)
                    if self.use_level_embed:
                        src = src + level_embed[li]
                    kvp = None

                # Un-mask queries whose mask blocks every sampled point
                # (reference mask3d.py:456).
                all_blocked = jnp.sum(attn_s, axis=1) == S  # [B, Q]
                attn_s = jnp.where(all_blocked[:, None, :], False, attn_s)
                attn_s = attn_s | pad[..., None]
                mem_mask = jnp.transpose(attn_s, (0, 2, 1))  # [B, Q, S]

                queries = cross[d][li](
                    queries, src, mem_mask, pe_s, query_pos,
                    deterministic=deterministic, kv_proj=kvp,
                    chunk=self.attention_chunk,
                    pallas_tile=self.attention_pallas_tile,
                )
                queries = self_att[d][li](
                    queries, query_pos, deterministic=deterministic
                )
                queries = ffns[d][li](queries, deterministic=deterministic)

                predictions_class.append(out_class)
                if aux_masks:
                    predictions_masks.append(out_masks)
            self.sow("intermediates", f"decoder_{dec}",
                     jnp.sum(queries.astype(jnp.float32)))

        out_class, out_masks, _ = mask_module(queries, 0, ret_attn=False)
        predictions_class.append(out_class)
        predictions_masks.append(out_masks)

        return Mask3DOutput(
            aux_pred_class=jnp.stack(predictions_class),
            aux_pred_masks=jnp.stack(predictions_masks),
            sampled_coords=sampled_coords,
            backbone_feats=bb_out,
        )
