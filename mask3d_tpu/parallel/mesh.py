"""Mesh + sharding helpers for data-parallel training.

Because the batch layout is `[B, N]` per-item padded arrays (see
`mask3d_tpu.sparse.core`), data parallelism is plain axis-0 sharding of the
whole `DeviceBatch` pytree over a 1D `dp` mesh — no shard_map or manual
collectives; XLA's SPMD partitioner inserts the gradient all-reduce over ICI.
This replaces the reference's latent torch.distributed/NCCL path
(`mask3d/models/criterion.py:244-246`, never initialized in shipped configs).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devices = jax.devices()
    n = num_devices or len(devices)
    assert n <= len(devices), f"need {n} devices, have {len(devices)}"
    return Mesh(np.array(devices[:n]), (axis,))


def shard_batch(batch, mesh: Mesh, axis: str = "dp"):
    """Shard every array's leading (item) axis over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (parameters, optimizer state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )
