"""Fused masked cross-attention for the Mask3D query decoder (TPU Pallas).

The decoder's eval-path cross-attention attends Q≈25 queries over FULL
padded levels (S up to 32k keys per item). The one-shot XLA formulation
materializes `[B, h, Q, S]` logits in HBM (hundreds of MB per decoder
iteration); the `lax.scan` online-softmax variant (`models/mask3d.py
_chunked_attention`) avoids the big tensor but still round-trips per-chunk
intermediates. This kernel streams K/V tiles HBM→VMEM once, keeps the
entire softmax state (running max / normalizer / accumulator) in VMEM
scratch, and writes only the `[B, Q, D]` result — HBM traffic is exactly
one read of K, V and the block-mask.

Matches the reference semantics of `mask3d/models/mask3d.py:658-747`
(masked nn.MultiheadAttention): boolean mask True = do not attend; a row
whose keys are ALL blocked degrades to uniform weights (the -1e9 fill
convention, same as the XLA paths — tested against both).

Q is padded to a sublane multiple inside the wrapper; the contraction is
done per head with 2D dots (Mosaic's dot_general is 2D-only).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, m_ref, o_ref,
            mmax, lsum, acc, *, heads: int, scale: float, n_tiles: int):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        mmax[...] = jnp.full_like(mmax, -1e9)
        lsum[...] = jnp.zeros_like(lsum)
        acc[...] = jnp.zeros_like(acc)

    qp = q_ref.shape[1]
    tile = k_ref.shape[1]
    d = q_ref.shape[2]
    hd = d // heads

    # [tile, qp] int8 -> [qp, tile] bool (True = blocked)
    blocked = jnp.transpose(m_ref[0]) != 0

    for h in range(heads):
        qh = q_ref[0, :, h * hd:(h + 1) * hd].astype(jnp.float32)
        kh = k_ref[0, :, h * hd:(h + 1) * hd].astype(jnp.float32)
        vh = v_ref[0, :, h * hd:(h + 1) * hd].astype(jnp.float32)
        logits = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [qp, tile]
        logits = jnp.where(blocked, jnp.float32(-1e9), logits)
        m_prev = mmax[h]
        m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1))
        corr = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new[:, None])  # [qp, tile]
        lsum[h] = lsum[h] * corr + jnp.sum(p, axis=-1)
        pv = jax.lax.dot_general(
            p, vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [qp, hd]
        acc[h] = acc[h] * corr[:, None] + pv
        mmax[h] = m_new

    @pl.when(i == n_tiles - 1)
    def _finalize():
        out = acc[...] / jnp.maximum(lsum[...], 1e-20)[..., None]
        # [heads, qp, hd] -> [qp, heads*hd]
        o_ref[0] = jnp.transpose(out, (1, 0, 2)).reshape(qp, d).astype(
            o_ref.dtype
        )


def _xla_reference(q, k, v, mask, num_heads: int):
    """One-shot XLA formulation with identical semantics (the -1e9 fill,
    f32 accumulation). Used only for the backward pass: the op is
    differentiated through this, so gradients are exact while the Pallas
    kernel accelerates the forward."""
    b, nq, d = q.shape
    hd = d // num_heads

    def split(x):
        return x.reshape(x.shape[0], x.shape[1], num_heads, hd)

    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", split(q).astype(jnp.float32),
        split(k).astype(jnp.float32),
    ) / (hd ** 0.5)
    logits = jnp.where(mask[:, None], jnp.float32(-1e9), logits)
    p = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", p, split(v).astype(jnp.float32))
    return out.reshape(b, nq, d).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def masked_cross_attention(q, k, v, mask, num_heads: int, tile: int = 512,
                           interpret: bool = False):
    """q: [B, Q, D]; k, v: [B, S, D]; mask: [B, Q, S] bool (True=blocked).

    Returns [B, Q, D] in q.dtype — softmax(q k^T / sqrt(hd) + mask) v with
    f32 accumulation, numerically matching the one-shot formulation
    (all-blocked rows degrade to uniform weights).

    Requires S % tile == 0 (level capacities are powers of two).
    Differentiable: the backward is the exact VJP of the one-shot XLA
    formulation (custom_vjp — pallas_call itself has no autodiff rule),
    so the kernel is usable in the training step too.
    """
    b, nq, d = q.shape
    s = k.shape[1]
    assert s % tile == 0, (s, tile)
    assert d % num_heads == 0
    n_tiles = s // tile
    hd = d // num_heads

    qp = -(-nq // 8) * 8  # pad queries to a sublane multiple
    if qp != nq:
        q = jnp.pad(q, ((0, 0), (0, qp - nq), (0, 0)))
    # [B, Q, S] -> [B, S, Qp] int8; padded query rows stay unblocked so
    # their (discarded) outputs remain finite.
    m8 = jnp.transpose(mask, (0, 2, 1)).astype(jnp.int8)
    if qp != nq:
        m8 = jnp.pad(m8, ((0, 0), (0, 0), (0, qp - nq)))

    kernel = functools.partial(
        _kernel, heads=num_heads, scale=1.0 / (hd ** 0.5), n_tiles=n_tiles
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, qp, d), lambda bi, i: (bi, 0, 0)),
            pl.BlockSpec((1, tile, d), lambda bi, i: (bi, i, 0)),
            pl.BlockSpec((1, tile, d), lambda bi, i: (bi, i, 0)),
            pl.BlockSpec((1, tile, qp), lambda bi, i: (bi, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, qp, d), lambda bi, i: (bi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, qp, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((num_heads, qp), jnp.float32),
            pltpu.VMEM((num_heads, qp), jnp.float32),
            pltpu.VMEM((num_heads, qp, hd), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, m8)
    return out[:, :nq]


def _mca_fwd(q, k, v, mask, num_heads, tile, interpret):
    out = masked_cross_attention(q, k, v, mask, num_heads, tile, interpret)
    return out, (q, k, v, mask)


def _mca_bwd(num_heads, tile, interpret, res, g):
    q, k, v, mask = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _xla_reference(q_, k_, v_, mask, num_heads),
        q, k, v,
    )
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


masked_cross_attention.defvjp(_mca_fwd, _mca_bwd)


def pallas_attention_available(d_model: int, num_heads: int,
                               tile: int) -> bool:
    """One-time compile probe for the fused kernel on this backend build.

    Mosaic lowering of this kernel has broken across remote libtpu
    rotations (compiled 2026-08-17, Mosaic 500 on the 2026-08-19 build —
    docs/ARCHITECTURE.md); `model.attention_pallas_tile>0` must downgrade
    to the chunked XLA path instead of crashing. Non-TPU backends always
    return True (the interpret path needs no Mosaic). The probe compiles
    a minimal (B=1, Q=8, S=2*tile) instance at the caller's d/h/tile —
    the parameters Mosaic tiling actually depends on.
    """
    import jax

    if jax.default_backend() != "tpu":
        return True
    from mask3d_tpu.utils import probe

    def _build():
        import numpy as np

        s = 2 * tile
        q = np.zeros((1, 8, d_model), np.float32)
        k = np.zeros((1, s, d_model), np.float32)
        v = np.zeros((1, s, d_model), np.float32)
        m = np.zeros((1, 8, s), bool)
        jax.jit(
            lambda a, b, c, mm: masked_cross_attention(
                a, b, c, mm, num_heads, tile, False
            )
        ).lower(q, k, v, m).compile()

    return probe.compiles(
        f"mca:d={d_model}:h={num_heads}:tile={tile}", _build
    )
