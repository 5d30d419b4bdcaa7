"""Batch containers: the TPU equivalents of the reference's DataBatch/ItemTargets.

Reference (`mask3d/datasets/utils.py:149-283`) keeps per-item Python lists of
variable-length tensors; here everything is a capacity-padded batched array so
the whole batch is one pytree of static-shape device arrays:

- `Targets`     — per-instance labels/masks, padded to `I` instances per item
                  (reference `ItemTargets`, `utils.py:149-198`)
- `DeviceBatch` — what the jitted step consumes (reference `DataBatch`
                  minus host-only fields, `utils.py:201-283`)
- `HostBatch`   — DeviceBatch + host-side passthroughs (scene names, raw
                  unaugmented coordinates for DBSCAN/export — reference
                  `raw_coordinates` usage at `trainer/trainer.py:442,533`)
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import numpy as np
from flax import struct


class Targets(struct.PyTreeNode):
    """Instance-segmentation targets, padded to I instances per item."""

    labels: jax.Array  # i32[B, I] semantic label id per instance
    masks: jax.Array  # bool[B, I, N] per-instance point masks
    valid: jax.Array  # bool[B, I]
    point_instance_ids: jax.Array  # i32[B, N] (0 = no instance)

    @property
    def num_instances(self):
        return self.valid.sum(axis=-1)

    def with_label_offset(self, offset: int) -> "Targets":
        """Shift labels (reference `get_target_with_subtracted_label_offset`,
        `mask3d/datasets/utils.py:275-283`); padding rows stay untouched."""
        import jax.numpy as jnp

        return self.replace(
            labels=jnp.where(self.valid, self.labels - offset, self.labels)
        )


class DeviceBatch(struct.PyTreeNode):
    """Static-shape model input, ready for `build_sparse_batch`."""

    coords: jax.Array  # i32[B, N, 3] voxel coords, per-item sorted, padded
    counts: jax.Array  # i32[B]
    dims: jax.Array  # i32[B, 3]
    feats: jax.Array  # f32[B, N, F]
    target: Targets
    # Static per-level dense-grid dims (bucketed by the collator: level-0
    # dims multiples of 8, coarser levels the ceil-div halving chain);
    # part of the treedef so shape-dependent jits recompile per bucket.
    grid_dims: tuple = struct.field(pytree_node=False, default=None)

    @property
    def grid_cells(self):
        if self.grid_dims is None:
            return None
        return tuple(int(np.prod(d)) for d in self.grid_dims)

    @property
    def batch_size(self) -> int:
        return self.coords.shape[0]

    @property
    def capacity(self) -> int:
        return self.coords.shape[1]


@dataclasses.dataclass
class HostBatch:
    """DeviceBatch plus host-only metadata (never crosses into jit)."""

    device: DeviceBatch
    scenes: List[str]
    # Original (pre-augmentation) coordinates/features/labels per padded row,
    # used by DBSCAN post-processing and .las export.
    raw_coords: np.ndarray  # f32[B, N, 3]
    raw_feats: np.ndarray  # f32[B, N, F]
    raw_labels: Optional[np.ndarray]  # i32[B, N, 2] (semantic, instance)
