"""Winograd F(2x2x2, 3x3x3) convolution for the dense-grid path.

The four stride-1 96-channel convolutions dominate the flagship forward
(4 x ~13.4 ms at ~54% MXU on v5e — jax.profiler trace 2026-08-18, see
docs/ARCHITECTURE.md). They are MXU-bound, so the only way down is fewer
FLOPs: Winograd F(2,3) in 3D computes each 2x2x2 output tile from a
4x4x4 transformed input tile with 64 pointwise channel contractions —
64/(8*27) = 0.30x the direct-conv MACs.

This module provides the transform math and an XLA reference
(`winograd_conv3_ref`) used as the oracle; the production Pallas kernel
(`sparse/pallas_winograd.py`) keeps the 8x-inflated transformed patches
in VMEM (an XLA formulation materializes them in HBM, which costs more
than it saves).

1D F(2,3) transforms (Lavin & Gray, arXiv:1509.09308):
    B^T = [[1, 0, -1, 0], [0, 1, 1, 0], [0, -1, 1, 0], [0, 1, 0, -1]]
    G   = [[1, 0, 0], [1/2, 1/2, 1/2], [1/2, -1/2, 1/2], [0, 0, 1]]
    A^T = [[1, 1, 1, 0], [0, 1, -1, -1]]

Output tiles of m=2 per axis; input tiles 4 with stride 2 (overlap 2).
Reference conv contract matches `dense_ops.dense_conv_same` with a
[27, Cin, Cout] cube-ravel weight ("SAME" padding, occupancy-masked).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

BT = np.array(
    [[1, 0, -1, 0], [0, 1, 1, 0], [0, -1, 1, 0], [0, 1, 0, -1]],
    np.float32,
)
G = np.array(
    [[1, 0, 0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0, 0, 1]], np.float32
)
AT = np.array([[1, 1, 1, 0], [0, 1, -1, -1]], np.float32)


def transform_weight(weight):
    """[27, Cin, Cout] cube-ravel -> U [4, 4, 4, Cin, Cout] (f32)."""
    k = weight.reshape(3, 3, 3, weight.shape[-2], weight.shape[-1])
    k = k.astype(jnp.float32)
    g = jnp.asarray(G)
    u = jnp.einsum("ai,bj,ck,ijkmn->abcmn", g, g, g, k)
    return u


def winograd_conv3_ref(x, weight, occ):
    """XLA reference of the Winograd conv (oracle for the Pallas kernel).

    x: [B, GX, GY, GZ, Cin] with zeros at unoccupied cells;
    weight: [27, Cin, Cout]; occ: [B, GX, GY, GZ, 1].
    Exact "SAME" semantics of `dense_conv_same` up to fp reassociation.
    Materializes the transformed patches — useful as an oracle, NOT as
    the production path (8x input HBM bloat).
    """
    b, gx, gy, gz, cin = x.shape
    cout = weight.shape[-1]
    # pad to even dims plus a 1-cell halo on each side
    ex, ey, ez = (-gx) % 2, (-gy) % 2, (-gz) % 2
    xp = jnp.pad(x, ((0, 0), (1, 1 + ex), (1, 1 + ey), (1, 1 + ez), (0, 0)))
    nx, ny, nz = (gx + ex) // 2, (gy + ey) // 2, (gz + ez) // 2

    # patches [B, nx, ny, nz, 4, 4, 4, Cin] at stride 2
    idx_x = (2 * jnp.arange(nx))[:, None] + jnp.arange(4)[None]  # [nx, 4]
    idx_y = (2 * jnp.arange(ny))[:, None] + jnp.arange(4)[None]
    idx_z = (2 * jnp.arange(nz))[:, None] + jnp.arange(4)[None]
    p = xp[:, idx_x]                     # [B, nx, 4, GY+, GZ+, C]
    p = p[:, :, :, idx_y]                # [B, nx, 4, ny, 4, GZ+, C]
    p = p[:, :, :, :, :, idx_z]          # [B, nx, 4, ny, 4, nz, 4, C]
    p = p.transpose(0, 1, 3, 5, 2, 4, 6, 7)  # [B,nx,ny,nz,4,4,4,C]

    bt = jnp.asarray(BT)
    v = jnp.einsum(
        "ai,bj,ck,Bxyzijkm->Bxyzabcm", bt, bt, bt, p.astype(jnp.float32)
    )
    u = transform_weight(weight)
    m = jnp.einsum("Bxyzabcm,abcmn->Bxyzabcn", v, u)
    at = jnp.asarray(AT)
    y = jnp.einsum("pa,qb,rc,Bxyzabcn->Bxyzpqrn", at, at, at, m)
    # y: [B, nx, ny, nz, 2, 2, 2, Cout] -> [B, 2nx, 2ny, 2nz, Cout]
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(
        b, 2 * nx, 2 * ny, 2 * nz, cout
    )
    y = y[:, :gx, :gy, :gz]
    return (y * occ).astype(x.dtype)
