"""Sparse tensor compute ops: gather-matmul convolutions, pooling, norms.

TPU-native equivalents of the MinkowskiEngine ops consumed by the reference
(`mask3d/models/modules/common.py:128-275`): MinkowskiConvolution,
MinkowskiConvolutionTranspose, MinkowskiAvgPooling, MinkowskiInstanceNorm.
All FLOPs live in [B, N, Cin] x [Cin, Cout] batched matmuls (MXU friendly);
gathers and segment sums carry the sparsity structure.

All feature arrays are batched `[B, N, C]` matching the `[B, N]` voxel layout
of `mask3d_tpu.sparse.core`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_rows(feats, idx, ok):
    """Per-item gather of `feats[b, idx[b, r]]`, zeroing rows where not ok.

    feats: [B, N, C]; idx/ok: [B, R]. Returns [B, R, C].
    """
    g = jnp.take_along_axis(feats, idx[..., None], axis=1)
    return jnp.where(ok[..., None], g, 0)


def sparse_conv(feats, weight, nbr_idx, nbr_ok, bias=None, compute_dtype=None):
    """Same-stride sparse convolution.

    out[b, p] = sum_k in[b, nbr(p, k)] @ weight[k]   (missing neighbors zero)

    weight: [K, Cin, Cout]; nbr_idx/nbr_ok: [B, N, K] from
    `core.neighbor_map` with the matching offset enumeration.
    Equivalent of ME MinkowskiConvolution with stride 1 (reference
    `mask3d/models/modules/common.py:128-160`).
    """
    if compute_dtype is not None:
        feats = feats.astype(compute_dtype)
        weight = weight.astype(compute_dtype)

    def step(acc, xs):
        w_k, idx_k, ok_k = xs
        g = gather_rows(feats, idx_k, ok_k)
        return acc + jnp.dot(g, w_k, preferred_element_type=jnp.float32), None

    init = jnp.zeros(feats.shape[:2] + (weight.shape[-1],), jnp.float32)
    out, _ = jax.lax.scan(
        step,
        init,
        (weight, jnp.moveaxis(nbr_idx, -1, 0), jnp.moveaxis(nbr_ok, -1, 0)),
    )
    if bias is not None:
        out = out + bias
    return out.astype(feats.dtype)


def _segment_sum_batched(x, parent, coarse_capacity):
    """Per-item segment sum: x [B, N, C], parent [B, N] (== coarse_capacity
    for dropped rows) -> [B, Ncoarse, C]."""
    b = x.shape[0]
    offs = jnp.arange(b, dtype=jnp.int32)[:, None] * (coarse_capacity + 1)
    flat_parent = (parent + offs).reshape(-1)
    flat = jax.ops.segment_sum(
        x.reshape(-1, x.shape[-1]),
        flat_parent,
        num_segments=b * (coarse_capacity + 1),
    )
    return flat.reshape(b, coarse_capacity + 1, -1)[:, :coarse_capacity]


def sparse_conv_down(feats, weight, pool, coarse_capacity, bias=None,
                     compute_dtype=None):
    """Stride-2 sparse convolution with kernel size 2 (the only strided conv
    shape the reference backbone uses, `mask3d/models/res16unet.py:55-137`).

    Each fine voxel contributes to exactly one coarse output through the
    weight slice selected by its 3-bit child position:
        out[b, i] = sum_{children j of i} in[b, j] @ weight[kidx(j)]

    weight: [8, Cin, Cout]; `pool` is the PoolMap between the levels.
    """
    if compute_dtype is not None:
        feats = feats.astype(compute_dtype)
        weight = weight.astype(compute_dtype)

    def step(acc, xs):
        w_k, k = xs
        sel = (pool.kidx == k)[..., None]
        contrib = jnp.dot(
            jnp.where(sel, feats, 0), w_k, preferred_element_type=jnp.float32
        )
        return acc + contrib, None

    init = jnp.zeros(feats.shape[:2] + (weight.shape[-1],), jnp.float32)
    per_row, _ = jax.lax.scan(step, init, (weight, jnp.arange(8)))
    out = _segment_sum_batched(per_row, pool.parent, coarse_capacity)
    if bias is not None:
        out = out + bias
    return out.astype(feats.dtype)


def sparse_conv_tr(feats_coarse, weight, pool, fine_valid, bias=None,
                   compute_dtype=None):
    """Transposed (generative) stride-2 convolution with kernel size 2.

    Output coordinates are the cached finer level (MinkowskiEngine reuses the
    encoder's coordinate map the same way; consumed by `convtr4p16s2` etc. in
    `mask3d/models/res16unet.py:138-219`). Each fine output has exactly one
    coarse source:
        out[b, j] = in[b, parent(j)] @ weight[kidx(j)]

    weight: [8, Cin, Cout].
    """
    if compute_dtype is not None:
        feats_coarse = feats_coarse.astype(compute_dtype)
        weight = weight.astype(compute_dtype)

    parent = jnp.minimum(pool.parent, feats_coarse.shape[1] - 1)
    gathered = gather_rows(feats_coarse, parent, fine_valid)

    def step(acc, xs):
        w_k, k = xs
        sel = (pool.kidx == k)[..., None]
        contrib = jnp.dot(
            jnp.where(sel, gathered, 0), w_k,
            preferred_element_type=jnp.float32,
        )
        return acc + contrib, None

    init = jnp.zeros(gathered.shape[:2] + (weight.shape[-1],), jnp.float32)
    out, _ = jax.lax.scan(step, init, (weight, jnp.arange(8)))
    if bias is not None:
        out = out + bias
    return out.astype(feats_coarse.dtype)


def avg_pool(x, pool, coarse_capacity):
    """Stride-2 average pooling over existing children.

    Divides by the number of *present* children (not 8), matching
    ME.MinkowskiAvgPooling(kernel_size=2, stride=2) used for the coordinate
    pyramid and attention-mask pooling (`mask3d/models/mask3d.py:209,297,547`).
    x: [B, N_fine, C] -> [B, N_coarse, C].
    """
    s = _segment_sum_batched(x, pool.parent, coarse_capacity)
    denom = jnp.maximum(pool.nchild, 1).astype(s.dtype)[..., None]
    return (s / denom).astype(x.dtype)


def instance_norm(feats, valid, gamma, beta, eps=1e-5):
    """Per-item, per-channel normalization over each item's voxels.

    Equivalent of ME.MinkowskiInstanceNorm — deliberately used instead of
    BatchNorm throughout the reference backbone because the input features
    are all-ones (`mask3d/models/modules/resnet_block.py:9`,
    `mask3d/models/resnet.py:46-47`).
    feats: [B, N, C]; valid: [B, N].
    """
    f32 = jnp.where(valid[..., None], feats.astype(jnp.float32), 0)
    cnt = jnp.maximum(
        jnp.sum(valid.astype(jnp.float32), axis=1), 1.0
    )[:, None, None]
    mean = jnp.sum(f32, axis=1, keepdims=True) / cnt
    sq = jnp.sum(f32 * f32, axis=1, keepdims=True) / cnt
    var = jnp.maximum(sq - mean * mean, 0.0)
    out = (f32 - mean) * jax.lax.rsqrt(var + eps)
    out = out * gamma + beta
    out = jnp.where(valid[..., None], out, 0)
    return out.astype(feats.dtype)


def cat_features(a, b):
    """Channel concatenation of two feature sets on the same coordinate map
    (equivalent of `me.cat`, `mask3d/models/res16unet.py:276,286,296,306`)."""
    return jnp.concatenate([a, b], axis=-1)
