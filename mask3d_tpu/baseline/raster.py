"""Differentiable soft polygon rasterization (N8 replacement).

TPU-native equivalent of RoomFormer's `diff_ras` CUDA rasterizer
(`RoomFormer/diff_ras/rasterize_cuda_kernel.cu`, autograd wrapper
`RoomFormer/diff_ras/polygon.py:22-60`, consumed by MaskRasterizationLoss,
`RoomFormer/models/losses.py:100-160`): a polygon is rendered into a soft
occupancy map via the signed distance to its boundary pushed through a
sigmoid (mask mode) or a boundary ridge via exp(-d^2/tau) (boundary mode).
Pure vectorized JAX — per-pixel point-to-edge distances are elementwise math
that XLA fuses; gradients flow to the vertex coordinates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _point_edge_distance(px, py, poly, edge_valid):
    """Min distance from each pixel to the valid polygon edges.

    px/py: [R, R]; poly: [K, 2]; edge_valid: [K] (edge k = poly[k]->poly[k+1
    mod K]). Returns [R, R].
    """
    p0 = poly
    p1 = jnp.roll(poly, -1, axis=0)
    d = p1 - p0  # [K, 2]
    len2 = jnp.maximum((d * d).sum(-1), 1e-12)
    pix = jnp.stack([px, py], axis=-1)[..., None, :]  # [R, R, 1, 2]
    diff = pix - p0  # [R, R, K, 2]
    t = jnp.clip((diff * d).sum(-1) / len2, 0.0, 1.0)
    proj = p0 + t[..., None] * d
    dist = jnp.linalg.norm(pix - proj, axis=-1)  # [R, R, K]
    dist = jnp.where(edge_valid, dist, jnp.inf)
    return jnp.min(dist, axis=-1)


def _point_in_polygon(px, py, poly, edge_valid):
    """Crossing-number containment over the valid edges. [R, R] bool."""
    x0, y0 = poly[:, 0], poly[:, 1]
    x1 = jnp.roll(x0, -1)
    y1 = jnp.roll(y0, -1)
    straddle = (y0 > py[..., None]) != (y1 > py[..., None])
    dy = jnp.where(y1 - y0 == 0, 1e-12, y1 - y0)
    x_cross = x0 + (py[..., None] - y0) * (x1 - x0) / dy
    hits = straddle & (px[..., None] < x_cross) & edge_valid
    return (hits.sum(-1) % 2) == 1


def soft_polygon(poly, valid, resolution: int, inv_smoothness: float = 0.1,
                 mode: str = "mask"):
    """Render one polygon to a soft [R, R] map.

    poly: [K, 2] vertex coords in PIXEL units of the target resolution;
    valid: bool[K] (padded vertices False — the last valid vertex connects
    back to the first). Modes (reference `diff_ras` modes, `polygon.py`):
    "mask" = sigmoid(signed_dist/inv_smoothness), "boundary" =
    exp(-d^2/inv_smoothness), "hard_mask" = binary containment.
    """
    k = poly.shape[0]
    n_valid = jnp.sum(valid.astype(jnp.int32))
    # Close the polygon at the last valid vertex: map invalid vertices onto
    # vertex 0 so their edges are degenerate, and mark edges to skip.
    idx = jnp.arange(k)
    poly = jnp.where(valid[:, None], poly, poly[0])
    edge_valid = idx < n_valid  # edge i connects v_i -> v_{(i+1) % n}
    # the edge from the last valid vertex wraps to v0 through the collapsed
    # padding vertices (all at v0), so distances stay correct.

    r = resolution
    ys, xs = jnp.meshgrid(
        jnp.arange(r, dtype=jnp.float32) + 0.5,
        jnp.arange(r, dtype=jnp.float32) + 0.5,
        indexing="ij",
    )
    if mode == "hard_mask":
        return _point_in_polygon(xs, ys, poly, edge_valid).astype(jnp.float32)
    dist = _point_edge_distance(xs, ys, poly, edge_valid)
    if mode == "boundary":
        return jnp.exp(-(dist**2) / inv_smoothness)
    inside = _point_in_polygon(xs, ys, poly, edge_valid)
    signed = jnp.where(inside, dist, -dist)
    return jax.nn.sigmoid(signed / inv_smoothness)


def soft_polygon_batch(polys, valids, resolution: int,
                       inv_smoothness: float = 0.1, mode: str = "mask"):
    """polys: [P, K, 2]; valids: [P, K] -> [P, R, R]."""
    return jax.vmap(
        lambda p, v: soft_polygon(p, v, resolution, inv_smoothness, mode)
    )(polys, valids)
