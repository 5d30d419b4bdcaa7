"""Positional encodings of 3D coordinates (Fourier features and sine).

Capability-parity rebuild of `mask3d/models/position_embedding.py:46-179`
(PositionEmbeddingCoordsSine) — pure tensor math, batched over items. The
reference computes these per item in a Python loop
(`mask3d/models/mask3d.py:261-278`); here a single batched call handles all
items with per-item normalization ranges.

Returns `[B, P, D]` (channel-last; the reference permutes to `[B, D, P]`).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def shift_scale_points(xyz, mins, maxs):
    """Normalize per-item coordinates to [0, 1]^3.

    xyz: [B, P, 3]; mins/maxs: [B, 3]. Mirrors
    `mask3d/models/position_embedding.py:13-43` with dst_range [0, 1].
    """
    rng = maxs - mins
    rng = jnp.where(rng == 0, 1.0, rng)
    return (xyz - mins[:, None, :]) / rng[:, None, :]


def fourier_embeddings(xyz, gauss_b, mins=None, maxs=None, normalize=True):
    """Random Fourier features: sin/cos of (2*pi*xyz) @ B.

    gauss_b: [3, D/2] gaussian projection (the reference's `gauss_B` buffer,
    `position_embedding.py:72-74`). Returns [B, P, D].
    """
    x = xyz.astype(jnp.float32)
    if normalize:
        x = shift_scale_points(x, mins, maxs)
    x = x * (2.0 * np.pi)
    proj = jnp.einsum("bpi,id->bpd", x, gauss_b.astype(jnp.float32))
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


def sine_embeddings(xyz, d_pos, mins=None, maxs=None, normalize=True,
                    temperature=10000.0, scale=2.0 * math.pi):
    """Interleaved sin/cos encodings per coordinate axis.

    Mirrors `position_embedding.py:77-125`: `d_pos` split across the three
    axes (remainder given to the leading axes in increments of two).
    """
    x = xyz.astype(jnp.float32)
    if normalize:
        x = shift_scale_points(x, mins, maxs)

    ndim = d_pos // 3
    if ndim % 2 != 0:
        ndim -= 1
    rems = d_pos - ndim * 3

    outs = []
    for d in range(3):
        cdim = ndim
        if rems > 0:
            cdim += 2
            rems -= 2
        dim_t = jnp.arange(cdim, dtype=jnp.float32)
        dim_t = temperature ** (2.0 * jnp.floor(dim_t / 2.0) / cdim)
        pos = (x[..., d] * scale)[..., None] / dim_t  # [B, P, cdim]
        sin = jnp.sin(pos[..., 0::2])
        cos = jnp.cos(pos[..., 1::2])
        inter = jnp.stack([sin, cos], axis=-1).reshape(*pos.shape[:-1], cdim)
        outs.append(inter)
    return jnp.concatenate(outs, axis=-1)


def make_gauss_b(key, d_pos, gauss_scale=1.0, d_in=3):
    """The fixed gaussian projection buffer (`position_embedding.py:72-74`)."""
    return jax.random.normal(key, (d_in, d_pos // 2)) * gauss_scale
