"""Furthest-point sampling as a jittable max-min loop.

TPU-native replacement for the pointnet2 CUDA kernel the reference uses for
non-parametric query initialization
(`mask3d/third_party/pointnet2/_ext_src/src/sampling_gpu.cu`, consumed at
`mask3d/models/mask3d.py:309-317`). Semantics match pointnet2's
`furthest_point_sample`: the first centroid is point 0, then iteratively the
point with the largest min-distance to the selected set.

Static output size Q; padded (invalid) points are never selected while any
valid point remains. If an item has fewer than Q valid points, the remaining
slots repeat point 0 (duplicate queries — harmless downstream, the decoder
treats queries independently).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("num_samples",))
def furthest_point_sample(coords, valid, num_samples: int):
    """coords: f32[B, N, 3]; valid: bool[B, N] -> i32[B, Q]."""

    def _item(c, v):
        n = c.shape[0]
        c = c.astype(jnp.float32)
        # Large-but-finite sentinel: invalid points can never be the argmax.
        neg = jnp.float32(-1.0)
        min_dist = jnp.where(v, jnp.float32(1e10), neg)

        def body(i, state):
            min_dist, idxs = state
            far = jnp.where(i == 0, 0, jnp.argmax(min_dist)).astype(jnp.int32)
            idxs = idxs.at[i].set(far)
            d = jnp.sum((c - c[far]) ** 2, axis=-1)
            min_dist = jnp.where(v, jnp.minimum(min_dist, d), neg)
            return min_dist, idxs

        if num_samples <= 128:
            # Static unroll: the batched while-loop's per-iteration overhead
            # dominates the tiny body (measured ~18 ms of a 218 ms flagship
            # forward at Q=25, N=65536 on v5e; unrolled the iterations fuse).
            state = (min_dist, jnp.zeros((num_samples,), jnp.int32))
            for i in range(num_samples):
                state = body(i, state)
            return state[1]

        _, idxs = jax.lax.fori_loop(
            0,
            num_samples,
            body,
            (min_dist, jnp.zeros((num_samples,), jnp.int32)),
        )
        return idxs

    return jax.vmap(_item)(coords, valid)
