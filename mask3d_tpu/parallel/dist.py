"""Multi-host (multi-process / DCN) data parallelism.

The TPU equivalent of the reference's latent DDP path
(`mask3d/models/criterion.py:244-246` is_dist_avail_and_initialized,
`mask3d/models/misc.py:114-119` — shipped configs never initialize it;
SURVEY.md §5.8 names `jax.distributed.initialize()` + deterministic
per-host input sharding as the TPU translation):

- `maybe_initialize(cfg)` wires `jax.distributed.initialize()` behind
  `trainer.distributed` (no-op default — single-process invocations are
  untouched).
- every host seeds the SAME epoch permutation (the trainer's rng is
  seeded from config), and `local_batch_indices` slices each global
  batch deterministically by process, so the union over hosts is exactly
  the global batch order with no duplication (unit-tested arithmetic —
  multi-process execution needs real multi-host hardware).
- `put_global(batch, mesh)` assembles a GLOBAL dp-sharded array from each
  host's local slice via `jax.make_array_from_process_local_data`.
- checkpoint/metric writes belong to process 0 only (`is_main_process`).

The mesh itself comes from `mesh.make_mesh` — after
`jax.distributed.initialize()`, `jax.devices()` is the global device
list, so dp sharding over it spans hosts and XLA routes the gradient
all-reduce over ICI within a slice and DCN across slices.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax


def maybe_initialize(cfg) -> None:
    """`jax.distributed.initialize()` when `trainer.distributed` is set.

    Single-process runs (the default, and every run on this one-chip dev
    environment) skip it entirely. Coordinator/process identity comes
    from the config when given, else from the standard cluster env vars
    jax auto-detects (TPU pods, SLURM, ...).
    """
    t = cfg.trainer
    if not getattr(t, "distributed", False):
        return
    kwargs = {}
    if getattr(t, "coordinator_address", ""):
        kwargs["coordinator_address"] = t.coordinator_address
    if getattr(t, "num_processes", -1) > 0:
        kwargs["num_processes"] = t.num_processes
    if getattr(t, "process_id", -1) >= 0:
        kwargs["process_id"] = t.process_id
    jax.distributed.initialize(**kwargs)


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    """Checkpoint/metrics writer guard (reference: Lightning rank-0)."""
    return jax.process_index() == 0


def local_batch_indices(global_idxs: Sequence[int], pi: Optional[int] = None,
                        pc: Optional[int] = None) -> np.ndarray:
    """This process's contiguous slice of one GLOBAL batch's indices.

    `len(global_idxs)` must divide evenly by the process count (the
    global batch size is the config's `data.batch_size`; hosts collate
    only their own items). Deterministic in (pi, pc) so every host
    computes the same global->local assignment without communication.
    """
    pi = jax.process_index() if pi is None else pi
    pc = jax.process_count() if pc is None else pc
    g = np.asarray(global_idxs)
    assert len(g) % pc == 0, (
        f"global batch size {len(g)} not divisible by {pc} processes"
    )
    per = len(g) // pc
    return g[pi * per:(pi + 1) * per]


def put_global(local_tree, mesh, axis: str = "dp"):
    """Assemble the global dp-sharded DeviceBatch from each host's local
    slice. Single-process: plain `shard_batch` (identical semantics)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    if jax.process_count() == 1:
        from mask3d_tpu.parallel.mesh import shard_batch

        return shard_batch(local_tree, mesh, axis=axis)
    sharding = NamedSharding(mesh, P(axis))

    def _put(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(
            sharding, x, global_shape
        )

    return jax.tree_util.tree_map(_put, local_tree)
