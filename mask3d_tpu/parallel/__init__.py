"""Device-mesh construction and sharding strategy.

The reference is single-GPU with latent DDP hooks
(`mask3d/models/criterion.py:244-246`, SURVEY.md §2.3); the TPU-native
scaling path is `jax.sharding` over an ICI mesh: the `[B, ...]` batch axis of
every array in the `DeviceBatch` pytree shards over the `dp` mesh axis,
parameters are replicated, and XLA inserts the gradient `psum` collectives.
"""

from mask3d_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    make_mesh_2d,
    maybe_constrain,
    replicate,
    shard_batch,
)
