"""Pallas TPU kernel: Winograd F(2x2, 3x3) x direct-z dense-grid conv.

The four stride-1 96-channel convolutions dominate the flagship forward
(4 x ~13.4 ms at ~54% MXU on v5e — they are MXU-bound, so the only way
down is fewer FLOPs). Full 3D Winograd F(2^3, 3^3) is 3.37x fewer MACs
but its position/tile disentangling needs sublane-dim splits Mosaic
cannot express; this kernel uses 2D Winograd over (x, y) with the z taps
folded into the contraction dim — 2.25x fewer MACs, and z never leaves
the sublane axis:

  out[x, y, z] = sum_dz Winograd2D(in[.., z+dz-1, :], W[:, :, dz])
               = Winograd2D over channels [in(z-1) | in(z) | in(z+1)]

Per (batch, 8x, 8y) block: DMA a [10, 10, GZ+2, C] halo block; x/y
forward transforms as leading-dim einsums on split tile dims (z rides
along untouched); per position p: m_p = sum_dz V[.., dz:dz+GZ, :] @
U[p, dz] — the z taps are unaligned static sublane slices applied at
matmul time (the remote Mosaic build rejects a lane-concat of shifted
slices; three K=128 matmuls accumulate in f32 instead); inverse
transform as leading-dim einsums (lane dim padded to 128 — the Mosaic
einsum lowering flattens trailing dims, which is only a legal layout
cast at full lane tiles); rank-6 major transpose un-tiles the output.

Mosaic-vocabulary rules this kernel obeys (discovered via the local
chipless AOT harness, tools/aot_compile.py):
  - never split/merge the sublane dim with small inner factors;
  - einsums contract LEADING dims of rank<=5 operands whose lane dim is
    a multiple of 128;
  - static sublane-dim slices at unaligned starts are fine (z shifts).

Verified against `dense_ops.dense_conv_same` (tests/test_winograd.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mask3d_tpu.sparse.winograd import AT, BT, G

TX, TY = 8, 8  # output block extent (grid dims bucket to multiples of 8)


def transform_weight_2d(weight, cpad):
    """[27, Cin, Cout] cube-ravel -> U2 [48 (pos, dz), Cin+cpad, Cout]."""
    k = weight.reshape(3, 3, 3, weight.shape[-2], weight.shape[-1])
    g = jnp.asarray(G, jnp.float32)
    u = jnp.einsum("ai,bj,ijdmn->abdmn", g, g, k.astype(jnp.float32))
    u = u.reshape(48, weight.shape[-2], weight.shape[-1])
    if cpad:
        u = jnp.pad(u, ((0, 0), (0, cpad), (0, 0)))
    return u


def _fwd_axis(v, bt, n):
    """F(2,3) forward transform along axis 0 of v [2n+2, M, S, C] ->
    [4*n, M, S, C] ordered (a, t); a = transform position, t = tile."""
    m, s, c = v.shape[1:]
    lo = v[0: 2 * n].reshape(n, 2, m, s, c)
    hi = v[2: 2 * n + 2].reshape(n, 2, m, s, c)
    d = jnp.concatenate([lo, hi], axis=1)          # [n, 4i, M, S, C]
    d = jnp.transpose(d, (1, 0, 2, 3, 4))          # [4i, n, M, S, C]
    out = jnp.einsum(
        "ai,itMSC->atMSC", bt, d, preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16)                         # [4a, n, M, S, C]
    return out.reshape(4 * n, m, s, c)


def _kernel(gz, zin, cin, x_ref, u_ref, bt_ref, at_ref, o_ref, xin, sem):
    """Grid (B, gx//TX, gy//TY). xin scratch: bf16[TX+2, TY+2, zin, C]."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    nx, ny = TX // 2, TY // 2

    cp = pltpu.make_async_copy(
        x_ref.at[b, pl.ds(i * TX, TX + 2), pl.ds(j * TY, TY + 2), :, :],
        xin,
        sem,
    )
    cp.start()
    cp.wait()

    bt = bt_ref[...]
    at = at_ref[...]

    # x / y forward transforms (z rides along on the sublane dim)
    v = _fwd_axis(xin[...], bt, nx)                # [4nx(ax,tx), 10, zin, C]
    v = jnp.transpose(v, (1, 0, 2, 3))             # [10, 4nx, zin, C]
    v = _fwd_axis(v, bt, ny)                       # [4ny(ay,ty), 4nx, zin, C]

    # positions -> one leading batch axis: [16(ay,ax), ny, nx, zin, C]
    v = v.reshape(4, ny, 4, nx, zin, cin)          # ay ty ax tx z C
    v = jnp.transpose(v, (0, 2, 1, 3, 4, 5))       # ay ax ty tx z C
    v = v.reshape(16, ny, nx, zin, cin)
    cout128 = u_ref.shape[-1]

    # 3 batched matmuls (one per z tap), f32 accumulation across taps:
    # m[p] = sum_dz V[p, .., dz:dz+gz, :] @ U[p, dz]
    acc = None
    for dz in range(3):
        t = jnp.einsum(
            "PyxZC,PCn->PyxZn", v[:, :, :, dz: dz + gz, :], u_ref[:, dz],
            preferred_element_type=jnp.float32,
        )
        acc = t if acc is None else acc + t
    m = acc.astype(jnp.bfloat16)                   # [16(ay,ax), ny,nx,gz,128]

    # inverse transforms (lane dim 128 — legal flatten for the lowering)
    m = m.reshape(4, 4 * ny * nx, gz, cout128)     # ay, (ax ny nx)
    o = jnp.einsum("qa,aMZn->qMZn", at, m,
                   preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    o = o.reshape(2, 4, ny * nx, gz, cout128)      # q, ax, (ny nx)
    o = jnp.transpose(o, (1, 0, 2, 3, 4))
    o = o.reshape(4, 2 * ny * nx, gz, cout128)     # ax, (q ny nx)
    o = jnp.einsum("pa,aMZn->pMZn", at, o,
                   preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    # un-tile: [2p, 2q, ny, nx, gz, n] -> [TX, TY, gz, n]
    o = o.reshape(2, 2, ny, nx, gz, cout128)
    o = jnp.transpose(o, (3, 0, 2, 1, 4, 5))       # nx p ny q gz n
    o_ref[0] = o.reshape(TX, TY, gz, cout128)


def winograd_conv_same(x, weight, occ, bias=None):
    """Drop-in Winograd replacement for `dense_conv_same` (3^3 kernels,
    bf16 compute). x: [B, GX, GY, GZ, Cin] (zeros at unoccupied cells);
    weight: [27, Cin, Cout]; occ: [B, GX, GY, GZ, 1]. Returns bf16.

    Requires GX % 8 == GY % 4 == 0 (host collator grid bucketing).
    """
    b, gx, gy, gz, cin = x.shape
    assert weight.shape[0] == 27, weight.shape
    assert gx % TX == 0 and gy % TY == 0, (gx, gy)
    cout = weight.shape[-1]

    cpad = (-cin) % 128
    npad = (-cout) % 128
    # halo pad x/y/z by 1; pad z tail so the DMA length is a multiple of 8
    zin = gz + 2
    ztail = (-zin) % 8
    xp = jnp.pad(
        x.astype(jnp.bfloat16),
        ((0, 0), (1, 1), (1, 1), (1, 1 + ztail), (0, cpad)),
    )
    zin = zin + ztail

    # [16 pos (ay-major to match the kernel batch), 3 dz, Cin128, Cout]
    u = transform_weight_2d(weight, cpad).reshape(
        4, 4, 3, cin + cpad, cout
    ).transpose(1, 0, 2, 3, 4).reshape(16, 3, cin + cpad, cout)
    if npad:
        u = jnp.pad(u, ((0, 0), (0, 0), (0, 0), (0, npad)))
    u = u.astype(jnp.bfloat16)

    out = pl.pallas_call(
        functools.partial(_kernel, gz, zin, cin + cpad),
        grid=(b, gx // TX, gy // TY),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # xp stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # U2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # BT
            pl.BlockSpec(memory_space=pltpu.VMEM),  # AT
        ],
        out_specs=pl.BlockSpec(
            (1, TX, TY, gz, cout + npad),
            lambda bi, ti, tj: (bi, ti, tj, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, gx, gy, gz, cout + npad), jnp.bfloat16
        ),
        scratch_shapes=[
            pltpu.VMEM((TX + 2, TY + 2, zin, cin + cpad), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=jax.default_backend() != "tpu",
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (gx // TX) * (gy // TY)
            * 16 * (TX // 2) * (TY // 2) * gz
            * 3 * (cin + cpad) * (cout + npad),
            bytes_accessed=b * gx * gy * zin * (cin + cpad) * 2 * 2,
            transcendentals=0,
        ),
    )(xp, u, jnp.asarray(BT, jnp.bfloat16), jnp.asarray(AT, jnp.bfloat16))
    if npad:
        out = out[..., :cout]
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out * occ.astype(out.dtype)
