"""SparseBatch: the full on-device sparse structure for one model invocation.

Bundles the stride pyramid, pool maps and neighbor (kernel) maps that the
backbone and decoder consume — the TPU equivalent of MinkowskiEngine's
coordinate manager state that the reference builds implicitly on first use
(`mask3d/models/mask3d.py:286-299`, `mask3d/models/res16unet.py:241-314`).

Everything here is built inside jit from the collated base level; shapes are
static (per-level capacities come from the collator's bucket config).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from flax import struct

from mask3d_tpu.sparse.core import (
    SparseLevel,
    PoolMap,
    build_base_level,
    build_pyramid,
    build_row_table,
    cube_offsets,
    neighbor_map,
    neighbor_map_table,
)


class SparseBatch(struct.PyTreeNode):
    """Sparse voxel pyramid + kernel maps for a batch.

    levels[0] is stride 1 (finest); levels[i] has stride 2**i.
    pools[i] relates levels[i] -> levels[i+1].
    nbr_idx/nbr_ok[i] is the 3x3x3 kernel map of levels[i].
    nbr0_idx/nbr0_ok is the input-conv kernel map of levels[0] (kernel size
    `conv1_kernel_size`, reference `mask3d/conf/model/mask3d.yaml:36`).
    """

    levels: tuple  # tuple[SparseLevel, ...]
    pools: tuple  # tuple[PoolMap, ...]
    nbr_idx: tuple  # tuple[i32[B, N_l, 27], ...]
    nbr_ok: tuple
    nbr0_idx: jax.Array = None  # i32[B, N_0, k0^3]
    nbr0_ok: jax.Array = None
    # Dense occupancy grids per level (f32[B, Gx, Gy, Gz, 1]); populated on
    # the dense path so the backbone reuses them instead of re-scattering.
    occ: tuple = ()

    @property
    def batch_size(self) -> int:
        return self.levels[0].batch_size

    @property
    def num_levels(self) -> int:
        return len(self.levels)


def build_sparse_batch(
    coords,
    count,
    dims,
    level_capacities: Sequence[int],
    conv1_kernel_size: int = 5,
    build_block_maps: bool = True,
    grid_cells: Optional[Sequence[int]] = None,
    grid_dims: Optional[Sequence] = None,
    build_pool_parents: bool = True,
    precomputed_levels: Optional[Sequence] = None,
) -> SparseBatch:
    """Build the full sparse context from collated stride-1 voxels.

    coords: i32[B, N, 3] sorted per item with padding at the end;
    count: i32[B]; dims: i32[B, 3].
    level_capacities: capacities of the coarser levels (len = num_levels-1).
    grid_cells: static per-level dense-grid cell counts (>= Dx*Dy*Dz of
    every item at that level — `DeviceBatch.grid_cells` from the collator).
    When given, kernel maps are built with O(1) dense-table lookups instead
    of binary search (~15-30x faster on TPU).
    """
    if grid_dims is not None and grid_cells is None:
        grid_cells = tuple(int(d[0] * d[1] * d[2]) for d in grid_dims)
    base = build_base_level(coords, count, dims)
    occ_grids = ()
    if grid_dims is not None and precomputed_levels is not None:
        # Coarse levels computed by the HOST collator (the sorted-unique
        # of coords>>1 per level, shipped as u8-delta keys —
        # `data/transfer.py::encode_pyramid_u8`). Skips the device
        # cumsum+scatter compaction passes entirely (~4 ms/forward at
        # flagship shape); coarse occupancy still derives from the cheap
        # maxpool chain. PoolMap carries only the overflow flag — the
        # dense execution path pools on grids and reads nothing else.
        from mask3d_tpu.sparse.dense_ops import (
            level_from_keys,
            maxpool2,
            occupancy,
        )

        levels, pools = [base], []
        occ_list = [occupancy(base, grid_dims[0])]
        for li, (cap, (keys_l, raw_l, dims_l)) in enumerate(
            zip(level_capacities, precomputed_levels)
        ):
            lvl = level_from_keys(
                keys_l, raw_l, dims_l, stride=2 ** (li + 1), capacity=cap
            )
            levels.append(lvl)
            occ_list.append(maxpool2(occ_list[-1]))
            pools.append(
                PoolMap(parent=None, kidx=None, nchild=None,
                        overflow=raw_l > cap)
            )
        occ_grids = tuple(occ_list)
    elif grid_dims is not None:
        from mask3d_tpu.sparse.dense_ops import (
            downsample_level_dense,
            occupancy,
        )

        levels, pools = [base], []
        occ_list = [occupancy(base, grid_dims[0])]
        for li, cap in enumerate(level_capacities):
            coarse, pool, occ_c = downsample_level_dense(
                levels[-1], grid_dims[li], cap, occ_f=occ_list[-1],
                with_parent=build_pool_parents,
            )
            levels.append(coarse)
            pools.append(pool)
            occ_list.append(occ_c)
        occ_grids = tuple(occ_list)
    else:
        levels, pools = build_pyramid(base, level_capacities)
    off3 = cube_offsets(1)

    _tables = {}

    def maps_for(level_idx, offsets):
        lv = levels[level_idx]
        if grid_cells is not None:
            table = _tables.setdefault(
                level_idx, build_row_table(lv, int(grid_cells[level_idx]))
            )
            return neighbor_map_table(lv, table, offsets)
        return neighbor_map(lv, offsets)

    nbr_idx, nbr_ok = [], []
    if build_block_maps:
        for li in range(len(levels)):
            i, o = maps_for(li, off3)
            nbr_idx.append(i)
            nbr_ok.append(o)
    nbr0_idx = nbr0_ok = None
    if conv1_kernel_size is not None:
        assert conv1_kernel_size % 2 == 1
        if conv1_kernel_size == 3 and build_block_maps:
            nbr0_idx, nbr0_ok = nbr_idx[0], nbr_ok[0]
        else:
            off0 = cube_offsets(conv1_kernel_size // 2)
            nbr0_idx, nbr0_ok = maps_for(0, off0)
    return SparseBatch(
        levels=tuple(levels),
        pools=tuple(pools),
        nbr_idx=tuple(nbr_idx),
        nbr_ok=tuple(nbr_ok),
        nbr0_idx=nbr0_idx,
        nbr0_ok=nbr0_ok,
        occ=occ_grids,
    )
