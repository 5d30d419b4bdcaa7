"""Sparse-voxel substrate: the TPU-native replacement for MinkowskiEngine.

Reference consumption sites this substrate replaces (all in /root/reference):
- `mask3d/models/modules/common.py:128-196` (ME conv / conv_tr wrappers)
- `mask3d/datasets/utils.py:126,249-255` (sparse_collate, SparseTensor input)
- `mask3d/models/mask3d.py:286-299,534-553` (coordinate pyramid + avg pooling)

Design (TPU-first, no dynamic shapes inside jit):
- A batch is a stack of per-item capacity-padded voxel sets `[B, N]`, each
  sorted by a linearized (x, y, z) key. All per-level coordinate sets, kernel
  maps and pooling relations are built on device with sort / searchsorted
  (binary search over sorted keys) — no host hash maps.
- Sparse convolution = K gather-matmul-accumulate steps (one per kernel
  offset), which keeps all FLOPs in large batched MXU matmuls.
- Stride-2 convolution / pooling / transposed convolution use the
  parent/child relation of the voxel octree (each fine voxel has exactly one
  parent and a 3-bit kernel index), avoiding any kernel-map search.
"""

from mask3d_tpu.sparse.core import (  # noqa: F401
    INT32_MAX,
    PoolMap,
    SparseLevel,
    build_base_level,
    build_pyramid,
    cube_offsets,
    downsample_level,
    neighbor_map,
    pack_keys,
    unpack_keys,
)
from mask3d_tpu.sparse.ops import (  # noqa: F401
    avg_pool,
    cat_features,
    gather_rows,
    instance_norm,
    sparse_conv,
    sparse_conv_down,
    sparse_conv_tr,
)
from mask3d_tpu.sparse.context import (  # noqa: F401
    SparseBatch,
    build_sparse_batch,
)
