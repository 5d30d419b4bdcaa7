"""k-NN, ball query, grouping and interpolation ops (N2/N3 coverage).

TPU-native equivalents of the remaining pointnet2/pointops2 kernels
(`mask3d/third_party/pointnet2/_ext_src/src/*.cu`: ball_query, group_points,
three_nn/three_interpolate; `mask3d/utils/pointops2/src/**`: knnquery,
grouping). Only FPS is on the reference's main path; these complete the op
inventory and serve fine-grained point models. All are batched dense
distance computations — ideal MXU/VPU work at the sizes involved
(queries x points pairwise distances).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def pairwise_sqdist(a, b):
    """[B, N, 3], [B, M, 3] -> [B, N, M] squared distances (one matmul)."""
    a2 = jnp.sum(a * a, axis=-1)[..., :, None]
    b2 = jnp.sum(b * b, axis=-1)[..., None, :]
    ab = jnp.einsum("bnd,bmd->bnm", a, b, preferred_element_type=jnp.float32)
    return jnp.maximum(a2 + b2 - 2.0 * ab, 0.0)


@functools.partial(jax.jit, static_argnames=("k",))
def knn(query, points, points_valid, k: int):
    """k nearest points for each query. Returns (idx i32[B, Q, k],
    dist f32[B, Q, k]); invalid points are never selected (their distance is
    +inf; callers should mask by `dist < inf` if fewer than k valid points).
    Equivalent of pointops2 `knnquery`."""
    d = pairwise_sqdist(query, points)
    d = jnp.where(points_valid[:, None, :], d, jnp.inf)
    neg_d, idx = jax.lax.top_k(-d, k)
    return idx.astype(jnp.int32), -neg_d


@functools.partial(jax.jit, static_argnames=("k",))
def ball_query(query, points, points_valid, radius: float, k: int):
    """Up to k points within `radius` of each query; slots fill with the
    FIRST found point like the pointnet2 CUDA kernel (`ball_query_gpu.cu`).
    Returns (idx i32[B, Q, k], ok bool[B, Q, k])."""
    d = pairwise_sqdist(query, points)
    inside = (d <= radius * radius) & points_valid[:, None, :]
    # order points by (not inside, index): first k inside points
    n = points.shape[1]
    rank = jnp.where(inside, 0, 1) * (n + 1) + jnp.arange(n)[None, None, :]
    order = jnp.argsort(rank, axis=-1)[..., :k].astype(jnp.int32)
    ok = jnp.take_along_axis(inside, order, axis=-1)
    first = order[..., :1]
    idx = jnp.where(ok, order, first)
    # queries with zero neighbors: all-invalid
    any_ok = ok[..., :1]
    return jnp.where(any_ok, idx, 0), ok & any_ok


def group_points(feats, idx):
    """Gather feature groups: feats [B, N, C], idx [B, Q, k] -> [B, Q, k, C]
    (pointnet2 `group_points_gpu.cu`)."""
    b, q, k = idx.shape
    flat = idx.reshape(b, q * k)
    out = jnp.take_along_axis(feats, flat[..., None], axis=1)
    return out.reshape(b, q, k, feats.shape[-1])


def three_interpolate(unknown, known, known_valid, feats):
    """Inverse-distance-weighted 3-NN feature interpolation
    (pointnet2 `interpolate_gpu.cu` three_nn + three_interpolate).

    unknown [B, U, 3]; known [B, M, 3]; feats [B, M, C] -> [B, U, C].
    """
    idx, d = knn(unknown, known, known_valid, 3)
    w = 1.0 / jnp.maximum(d, 1e-8)
    w = jnp.where(jnp.isfinite(w), w, 0.0)
    w = w / jnp.maximum(w.sum(-1, keepdims=True), 1e-8)
    grouped = group_points(feats, idx)  # [B, U, 3, C]
    return jnp.sum(grouped * w[..., None], axis=2)
