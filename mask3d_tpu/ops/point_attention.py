"""Edge-list point-transformer attention / relative-position-encoding ops.

TPU-native equivalents of the vendored pointops2 CUDA attention kernels
(`mask3d/utils/pointops2/functions/pointops.py`: AttentionStep1 @95,
AttentionStep2 @263, DotProdWithIdx @423, AttentionStep2WithRelPosValue
@801, Aggregation @1122). The reference keeps these for point-transformer
style models; they are off its main path (SURVEY.md N3) but complete the op
inventory, with the same pure-framework-oracle test pattern the reference
uses (`functions/test_attention_op_step*.py`).

Representation: an edge list (COO) of M (query_row, key_row) pairs —
`index0[m]` is the destination/query row, `index1[m]` the source/key row —
over flat point sets `[N, h, c]`. Padding edges are masked with `edge_ok`;
all shapes are static (capacity-padded), so everything jits. Each op is a
gather + einsum (+ `jax.ops.segment_sum` for the reductions) — MXU/VPU
work with no scatter-atomics, unlike the CUDA originals.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def attention_step1(q, k, index0, index1, edge_ok=None):
    """Per-edge multi-head dot product (pointops2 `attention_step1`).

    q, k: [N, h, c]; index0, index1: i32[M] -> attn [M, h] with
    attn[m, h] = sum_c q[index0[m], h, c] * k[index1[m], h, c].
    """
    qe = q[index0]  # [M, h, c]
    ke = k[index1]
    out = jnp.einsum(
        "mhc,mhc->mh", qe, ke, preferred_element_type=jnp.float32
    )
    if edge_ok is not None:
        out = jnp.where(edge_ok[:, None], out, 0.0)
    return out


@functools.partial(jax.jit, static_argnames=("num_points",))
def attention_step2(attn, v, index0, index1, num_points: int, edge_ok=None):
    """Edge-weighted value aggregation (pointops2 `attention_step2`).

    attn: [M, h]; v: [N, h, c] -> out [num_points, h, c] with
    out[n, h, c] = sum_{m : index0[m]==n} attn[m, h] * v[index1[m], h, c].
    """
    ve = v[index1]  # [M, h, c]
    w = attn
    if edge_ok is not None:
        w = jnp.where(edge_ok[:, None], w, 0.0)
    contrib = w[..., None] * ve
    return jax.ops.segment_sum(
        contrib, index0, num_segments=num_points
    )


def rpe_table_lookup(table, rel_idx):
    """Decomposed relative-position table lookup: table [L, h, c, 3],
    rel_idx i32[M, 3] -> rpe [M, h, c] = sum over the 3 axes of
    table[rel_idx[m, a], :, :, a] (pointops2 RPE table convention)."""
    tx = table[rel_idx[:, 0], :, :, 0]
    ty = table[rel_idx[:, 1], :, :, 1]
    tz = table[rel_idx[:, 2], :, :, 2]
    return tx + ty + tz


def dot_prod_with_idx(q, index, table, rel_idx, edge_ok=None):
    """Query x RPE dot product (pointops2 `dot_prod_with_idx`).

    q: [N, h, c]; index: i32[M]; table: [L, h, c, 3]; rel_idx: i32[M, 3]
    -> out [M, h] = sum_c q[index[m], h, c] * rpe[m, h, c].
    """
    qe = q[index]
    rpe = rpe_table_lookup(table, rel_idx)
    out = jnp.einsum(
        "mhc,mhc->mh", qe, rpe, preferred_element_type=jnp.float32
    )
    if edge_ok is not None:
        out = jnp.where(edge_ok[:, None], out, 0.0)
    return out


@functools.partial(jax.jit, static_argnames=("num_points",))
def attention_step2_with_rel_pos_value(
    attn, v, index0, index1, table, rel_idx, num_points: int, edge_ok=None
):
    """Value aggregation with additive RPE on values
    (pointops2 `attention_step2_with_rel_pos_value`):
    out[n, h, c] = sum_{m : index0[m]==n} attn[m, h] *
                   (v[index1[m], h, c] + rpe[m, h, c]).
    """
    ve = v[index1] + rpe_table_lookup(table, rel_idx)
    w = attn
    if edge_ok is not None:
        w = jnp.where(edge_ok[:, None], w, 0.0)
    return jax.ops.segment_sum(
        w[..., None] * ve, index0, num_segments=num_points
    )


def aggregation(feats, position, weight, idx):
    """Point-transformer vector-attention aggregation (pointops2
    `Aggregation` @1122): feats [N, C], position [N, k, C],
    weight [N, k, C'], idx i32[N, k], with C a multiple of C' -> [N, C]:

    out[n, c] = sum_j (feats[idx[n, j], c] + position[n, j, c])
                * weight[n, j, c // (C / C')].
    """
    n, k = idx.shape
    c = feats.shape[-1]
    cp = weight.shape[-1]
    assert c % cp == 0, (c, cp)
    grouped = feats[idx] + position  # [N, k, C]
    w = jnp.repeat(weight, c // cp, axis=-1)  # [N, k, C]
    return jnp.sum(grouped * w, axis=1)
