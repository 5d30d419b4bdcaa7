"""Mesh + sharding helpers for data- and sequence-parallel training.

Because the batch layout is `[B, N]` per-item padded arrays (see
`mask3d_tpu.sparse.core`), data parallelism is plain axis-0 sharding of the
whole `DeviceBatch` pytree over a 1D `dp` mesh — no shard_map or manual
collectives; XLA's SPMD partitioner inserts the gradient all-reduce over ICI.
This replaces the reference's latent torch.distributed/NCCL path
(`mask3d/models/criterion.py:244-246`, never initialized in shipped configs).

Sequence parallelism (`sp`, for scenes too large for one chip's HBM) shards
the POINT axis: row keys are x-major sorted, so sharding rows on axis 1 and
dense grids on their x axis over the same mesh axis keeps row<->grid
scatter/gather device-local x-slabs; convolutions get halo exchanges and
query-attention gets `psum`s from the SPMD partitioner automatically. The
tiny query set (Q=25..100) stays replicated — the scheme SURVEY.md §5.7
anticipates. Enable via `model.sp_axis=sp` under an active 2D mesh
(`jax.sharding.set_mesh(make_mesh_2d(...))`).
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
    """Replicate a pytree (parameters, optimizer state) over the mesh.

    Always returns FRESH buffers: `jax.device_put` may alias its input
    when the placement is already compatible (e.g. scalars), and the
    donating `train_step` would then delete the caller's arrays through
    the alias (jax.jit donate_argnums in train/loop.py).
    """
    sharding = NamedSharding(mesh, P())
    shardings = jax.tree_util.tree_map(lambda _: sharding, tree)
    # One jitted identity over the whole tree: a non-donating jit's
    # outputs never alias its inputs (device_put may hand back the same
    # buffer for already-compatible leaves, e.g. scalars).
    return jax.jit(lambda t: t, out_shardings=shardings)(tree)


def make_mesh_2d(n_dp: int, n_sp: int,
                 dp_axis: str = "dp", sp_axis: str = "sp") -> Mesh:
    """(dp, sp) mesh: batch over `dp`, point/grid-x axis over `sp`."""
    devices = jax.devices()
    need = n_dp * n_sp
    assert need <= len(devices), f"need {need} devices, have {len(devices)}"
    import numpy as _np

    return Mesh(
        _np.array(devices[:need]).reshape(n_dp, n_sp), (dp_axis, sp_axis)
    )


def maybe_constrain(x, sp_axis: Optional[str], axis: int = 1,
                    dp_axis: str = "dp", shard_seq: bool = True):
    """Sharding constraint: batch axis 0 over `dp_axis` (if in the active
    mesh), `axis` over `sp_axis`. No-op when `sp_axis` is None or no active
    mesh carries it — so model code can call this unconditionally.

    `shard_seq=False` keeps the dp constraint but pins `axis` REPLICATED.
    Needed for tiny coarse-pyramid grids: XLA's SPMD partitioner
    miscompiles windowed convs whose per-shard spatial extent is 1 while
    the batch axis is also partitioned (halo exchange returns wrong values;
    reproduced on the CPU backend, jax 0.9) — see `sp_min_per_shard`.
    """
    if sp_axis is None:
        return x
    mesh = jax.sharding.get_abstract_mesh()
    names = getattr(mesh, "axis_names", None) or ()
    if sp_axis not in names:
        return x
    spec = [None] * x.ndim
    if dp_axis in names:
        spec[0] = dp_axis
    if shard_seq:
        spec[axis] = sp_axis
    return jax.lax.with_sharding_constraint(x, P(*spec))


def sp_min_per_shard(grid_x: int, sp_axis: Optional[str]) -> bool:
    """True when a grid with x extent `grid_x` may shard over `sp_axis`:
    per-shard extent must be >= 4 so no 3-window halo or stride-2 exchange
    ever spans a whole shard (XLA's SPMD partitioner returns wrong conv
    values below that when the batch axis is partitioned too — reproduced
    on the CPU backend, jax 0.9; see `maybe_constrain`). Coarse pyramid
    levels below the threshold stay spatially replicated — they are tiny,
    so the lost parallelism is negligible."""
    if sp_axis is None:
        return False
    mesh = jax.sharding.get_abstract_mesh()
    names = getattr(mesh, "axis_names", None) or ()
    if sp_axis not in names:
        return False
    return grid_x // mesh.shape[sp_axis] >= 4
