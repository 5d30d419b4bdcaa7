"""Segment aggregation ops: scatter mean / max / min over segment ids.

TPU-native replacement for the reference's torch-scatter dependency
(SURVEY.md §2.2 N4): the mask module's segment-pooling option
(`mask3d/models/mask3d.py:138-143`, `scatter_type: "mean"` in
`mask3d/conf/model/mask3d.yaml:30`) aggregates point features per
precomputed surface segment. Built on `jax.ops.segment_*` which XLA lowers
to sorted-segment reductions — no atomics, deterministic (unlike CUDA
scatter-add).

Layout: values `[N, C]` (or `[B, N, C]` batched) with integer segment ids
`[N]` (`[B, N]`); `num_segments` is static. Invalid rows can be routed to a
trash segment by passing `segment_ids == num_segments` (they are dropped).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _clip_ids(segment_ids, num_segments):
    """Route out-of-range ids to a trash slot (dropped after reduce)."""
    ids = jnp.asarray(segment_ids, jnp.int32)
    return jnp.where((ids >= 0) & (ids < num_segments), ids, num_segments)


@functools.partial(jax.jit, static_argnames=("num_segments",))
def segment_mean(values, segment_ids, num_segments: int):
    """Mean of `values[i]` over rows with equal `segment_ids[i]`.

    values f32[N, C], segment_ids i32[N] -> f32[num_segments, C].
    Empty segments yield 0 (torch_scatter scatter_mean semantics).
    """
    ids = _clip_ids(segment_ids, num_segments)
    total = jax.ops.segment_sum(values, ids, num_segments + 1)
    count = jax.ops.segment_sum(
        jnp.ones(ids.shape, values.dtype), ids, num_segments + 1
    )
    out = total / jnp.maximum(count, 1.0)[..., None]
    return out[:num_segments]


@functools.partial(jax.jit, static_argnames=("num_segments",))
def segment_max(values, segment_ids, num_segments: int):
    """Max per segment; empty segments yield 0 (torch_scatter semantics)."""
    ids = _clip_ids(segment_ids, num_segments)
    out = jax.ops.segment_max(values, ids, num_segments + 1)
    count = jax.ops.segment_sum(
        jnp.ones(ids.shape, jnp.int32), ids, num_segments + 1
    )
    out = jnp.where(count[..., None] > 0, out, 0.0)
    return out[:num_segments]


@functools.partial(jax.jit, static_argnames=("num_segments",))
def segment_min(values, segment_ids, num_segments: int):
    """Min per segment; empty segments yield 0 (torch_scatter semantics)."""
    ids = _clip_ids(segment_ids, num_segments)
    out = jax.ops.segment_min(values, ids, num_segments + 1)
    count = jax.ops.segment_sum(
        jnp.ones(ids.shape, jnp.int32), ids, num_segments + 1
    )
    out = jnp.where(count[..., None] > 0, out, 0.0)
    return out[:num_segments]


@functools.partial(
    jax.jit, static_argnames=("num_segments", "reduce")
)
def batched_segment_reduce(values, segment_ids, valid,
                           num_segments: int, reduce: str = "mean"):
    """Per-item segment reduction over the framework's padded layout.

    values f32[B, N, C], segment_ids i32[B, N], valid bool[B, N] ->
    f32[B, num_segments, C]. Padding rows are excluded via the trash slot.
    """
    fns = {"mean": segment_mean, "max": segment_max, "min": segment_min}
    fn = fns[reduce]
    ids = jnp.where(valid, segment_ids, num_segments)
    return jax.vmap(lambda v, i: fn(v, i, num_segments))(values, ids)
