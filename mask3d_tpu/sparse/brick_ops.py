"""Bricked dense execution: the level-0 grid as occupied dense bricks.

Huge scans (`tools/bench_large_scene.py`: 836k pts on a 23.2M-cell grid
at 3.6% occupancy) cannot run `backbone_impl=dense` — one 96-ch bf16
LEVEL-0 activation grid alone is 4.5 GB and the forward keeps several
live (docs/ARCHITECTURE.md "Known limits"). But ONLY level 0 is over
budget: at stride 2 the same scene's grid is 2.9M cells (~0.7 GB at
128 ch), trivially dense. The gather paths that serve this regime top
out ~11x below the dense path per point (the one-hot select's W/Cout
FLOP overhead, ARCHITECTURE.md FLOP ledger).

This module keeps the measured-fastest executor — big batched XLA
`lax.conv` on dense blocks riding the MXU — and makes it fit by
decomposing ONLY the level-0 grid into occupied dense BRICKS:

- The grid is cut into a static lattice of bricks (default 16x16x8 =
  2048 cells, dividing the collator's multiple-of-16/8 grid dims).
  Bricks containing >= 1 voxel get a slot in a packed [NB, bx, by, bz,
  C] tensor (capacity-padded like every batch axis here; slot NB is an
  all-zero sentinel). Real scans cluster on surfaces, so most bricks
  are empty: the hall scene packs 23.2M cells into ~5-8M brick cells.
- Stride-1 convs run per-brick with a 1-voxel HALO gathered from the
  26 neighbor slots (`halo_pad`): 27 static-slice gathers over the
  slot axis, then ONE batched `lax.conv` VALID over [NB, bx+2, ...] —
  the same MXU-bound implicit GEMM as the dense path, ~1.6x padded-cell
  inflation instead of the dense path's 1/occupancy inflation.
- The stride-2 junctions to/from the (dense) level-1 grid are exact
  reshapes: a k=2 s=2 conv never crosses a brick boundary (brick dims
  are even), so conv_down is per-brick VALID + a slot scatter into the
  [Sx*hx, Sy*hy, Sz*hz] dense grid, and conv_tr gathers each slot's
  coarse block and transposes it per brick.

Semantics mirror the dense path op for op (submanifold masking by the
occupancy, two-pass masked InstanceNorm): parity vs `dense_ops` is
oracle-tested in tests/test_brick_ops.py. Reference capability:
MinkowskiEngine's generalized sparse conv on arbitrary-size scenes
(reference mask3d/models/res16unet.py runs any point count); this is
the TPU-first equivalent for the scale the flagship dense path cannot
hold. B=1 (one scene per forward) — the serving shape for scans this
size.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from mask3d_tpu.sparse import dense_ops
from mask3d_tpu.sparse.core import SparseLevel


class BrickSpec(NamedTuple):
    """Static geometry of the level-0 brick decomposition."""

    grid_dims: Tuple[int, int, int]
    brick_dims: Tuple[int, int, int]
    capacity: int  # NB: max occupied bricks (static)

    @property
    def slots(self) -> Tuple[int, int, int]:
        return tuple(-(-g // b) for g, b in zip(self.grid_dims,
                                                self.brick_dims))

    @property
    def n_slots(self) -> int:
        sx, sy, sz = self.slots
        return sx * sy * sz

    @property
    def cells(self) -> int:
        bx, by, bz = self.brick_dims
        return bx * by * bz


def make_brick_spec(grid_dims: Sequence[int], brick_dims=(16, 16, 8),
                    capacity: int = 8192) -> BrickSpec:
    gd = tuple(int(d) for d in grid_dims)
    bd = tuple(int(d) for d in brick_dims)
    assert all(g % b == 0 for g, b in zip(gd, bd)), (
        "brick dims must divide the (bucketed) grid dims", gd, bd)
    assert all(b % 2 == 0 for b in bd), "stride-2 junctions need even bricks"
    return BrickSpec(gd, bd, int(capacity))


class BrickTables(NamedTuple):
    """Device-computed index structure for one scene (static shapes).

    slot_key: [NB] linear brick key per slot, ascending; empty slots
        hold `n_slots` (sorts last, scatter-dropped).
    brick_ok: [NB] bool — slot is a real occupied brick.
    nbr: [NB, 27] slot index of each neighbor brick ((dx,dy,dz) in
        x-major order, matching `PackSpec.offsets`); missing/out-of-grid
        neighbors point at slot NB (the zero sentinel).
    row_flat: [N] flat cell index (slot * cells + cell) per voxel row;
        invalid rows point past the sentinel (scatter mode="drop").
    overflow: [] bool — more occupied bricks than `capacity`.
    """

    slot_key: jnp.ndarray
    brick_ok: jnp.ndarray
    nbr: jnp.ndarray
    row_flat: jnp.ndarray
    overflow: jnp.ndarray


_OFFS = [(dx, dy, dz)
         for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)]


def build_tables(level: SparseLevel, spec: BrickSpec) -> BrickTables:
    """Brick tables from the level-0 rows (one item: B == 1)."""
    assert level.coords.shape[0] == 1, "bricked execution is B=1"
    c = level.coords[0].astype(jnp.int32)  # [N, 3]
    valid = level.valid[0]
    n = c.shape[0]
    bx, by, bz = spec.brick_dims
    sx, sy, sz = spec.slots
    nb = spec.capacity
    ns = spec.n_slots

    bcx, bcy, bcz = c[:, 0] // bx, c[:, 1] // by, c[:, 2] // bz
    bkey = (bcx * sy + bcy) * sz + bcz
    bkey = jnp.where(valid, bkey, ns)  # sentinel sorts last

    sk = jnp.sort(bkey)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), sk[1:] != sk[:-1]]) & (sk < ns)
    slot_of_sorted = jnp.cumsum(first.astype(jnp.int32)) - 1
    n_bricks = jnp.sum(first.astype(jnp.int32))
    overflow = n_bricks > nb
    # slot_key[s] = s-th smallest occupied brick key (ascending by
    # construction of the scatter source)
    slot_key = (
        jnp.full((nb,), ns, jnp.int32)
        .at[jnp.where(first, slot_of_sorted, nb)]
        .set(sk.astype(jnp.int32), mode="drop")
    )
    brick_ok = slot_key < ns

    def find(keys):
        """Slot of each key, or `nb` (sentinel) when absent."""
        pos = jnp.searchsorted(slot_key, keys.astype(jnp.int32))
        pos = jnp.clip(pos, 0, nb - 1)
        hit = slot_key[pos] == keys
        return jnp.where(hit, pos, nb).astype(jnp.int32)

    # per-row (slot, cell)
    row_slot = find(bkey)  # invalid rows: bkey == ns -> miss -> nb
    cell = ((c[:, 0] % bx) * by + c[:, 1] % by) * bz + c[:, 2] % bz
    row_flat = jnp.where(
        valid & (row_slot < nb), row_slot * spec.cells + cell,
        nb * spec.cells + spec.cells,  # past the sentinel brick: dropped
    ).astype(jnp.int32)

    # neighbor table
    kx = slot_key // (sy * sz)
    ky = (slot_key // sz) % sy
    kz = slot_key % sz
    cols = []
    for dx, dy, dz in _OFFS:
        nx, ny, nzc = kx + dx, ky + dy, kz + dz
        inb = ((nx >= 0) & (nx < sx) & (ny >= 0) & (ny < sy)
               & (nzc >= 0) & (nzc < sz) & brick_ok)
        nkey = (nx * sy + ny) * sz + nzc
        cols.append(jnp.where(inb, find(jnp.where(inb, nkey, ns)), nb))
    nbr = jnp.stack(cols, axis=1)
    return BrickTables(slot_key, brick_ok, nbr, row_flat, overflow)


# ------------------------------------------------------------------ data ops


def scatter_rows(feats, tables: BrickTables, spec: BrickSpec):
    """[1, N, C] rows -> bricks [NB+1, bx, by, bz, C] (sentinel zeros)."""
    c = feats.shape[-1]
    nb, cells = spec.capacity, spec.cells
    flat = (
        jnp.zeros(((nb + 1) * cells, c), feats.dtype)
        .at[tables.row_flat]
        .set(feats[0], mode="drop")
    )
    return flat.reshape((nb + 1,) + spec.brick_dims + (c,))


def gather_rows(bricks, tables: BrickTables, spec: BrickSpec, valid):
    """Bricks -> [1, N, C] rows (invalid rows zeroed)."""
    c = bricks.shape[-1]
    flat = bricks.reshape(-1, c)
    idx = jnp.clip(tables.row_flat, 0, flat.shape[0] - 1)
    rows = jnp.take(flat, idx, axis=0)
    return jnp.where(valid[0][:, None], rows, 0)[None]


def occupancy(tables: BrickTables, spec: BrickSpec, valid,
              dtype=jnp.float32):
    ones = jnp.ones(valid.shape + (1,), dtype)
    ones = jnp.where(valid[..., None], ones, 0)
    return scatter_rows(ones, tables, spec)


def halo_pad(bricks, tables: BrickTables, spec: BrickSpec, h: int = 1):
    """[NB+1, bx, by, bz, C] -> [NB, bx+2h, by+2h, bz+2h, C] with each
    brick's halo gathered from its neighbor slots (sentinel -> zeros).

    27 static-slice gathers over the slot axis: the (dx,dy,dz) piece of
    the padded brick is rows [b-h, b) / [0, b) / [0, h) of the neighbor
    in that direction. XLA lowers each to one gather with slice sizes —
    no per-brick loop.
    """
    bx, by, bz = spec.brick_dims
    nb = spec.capacity
    c = bricks.shape[-1]
    out = jnp.zeros((nb, bx + 2 * h, by + 2 * h, bz + 2 * h, c),
                    bricks.dtype)

    def src(d, n):
        return {-1: slice(n - h, n), 0: slice(0, n), 1: slice(0, h)}[d]

    def dst(d, n):
        return {-1: slice(0, h), 0: slice(h, h + n),
                1: slice(h + n, h + 2 * n)}[d]

    for k, (dx, dy, dz) in enumerate(_OFFS):
        piece_src = bricks[:, src(dx, bx), src(dy, by), src(dz, bz), :]
        if dx == dy == dz == 0:
            piece = piece_src[:nb]
        else:
            piece = jnp.take(piece_src, tables.nbr[:, k], axis=0)
        out = out.at[:, dst(dx, bx), dst(dy, by), dst(dz, bz), :].set(piece)
    return out


def _halo_pad_range(bricks, nbr_rows, spec: BrickSpec, h: int,
                    lo: int, size: int):
    """`halo_pad` for slot rows [lo, lo+size): the padded tensor is the
    transient-HBM peak of a brick conv (1.6-2.5x the content cells), so
    `conv_same` builds it per CHUNK; the gather source stays the full
    brick array (neighbors cross chunk boundaries freely)."""
    bx, by, bz = spec.brick_dims
    c = bricks.shape[-1]
    out = jnp.zeros((size, bx + 2 * h, by + 2 * h, bz + 2 * h, c),
                    bricks.dtype)

    def src(d, n):
        return {-1: slice(n - h, n), 0: slice(0, n), 1: slice(0, h)}[d]

    def dst(d, n):
        return {-1: slice(0, h), 0: slice(h, h + n),
                1: slice(h + n, h + 2 * n)}[d]

    for k, (dx, dy, dz) in enumerate(_OFFS):
        piece_src = bricks[:, src(dx, bx), src(dy, by), src(dz, bz), :]
        if dx == dy == dz == 0:
            piece = piece_src[lo: lo + size]
        else:
            piece = jnp.take(piece_src, nbr_rows[:, k], axis=0)
        out = out.at[:, dst(dx, bx), dst(dy, by), dst(dz, bz), :].set(piece)
    return out


# ------------------------------------------------------------------ conv ops


def conv_same(bricks, weight, occ_bricks, tables, spec, bias=None,
              compute_dtype=None, chunk: int = 2048):
    """Same-stride submanifold conv on bricks (mirrors
    `dense_ops.dense_conv_same`). weight [k^3, Cin, Cout].

    `chunk`: slot rows per halo-pad + conv step — bounds the transient
    halo-padded tensor (the peak-HBM term: 1.6x content at h=1) without
    changing results; 0 = single pass."""
    k = round(weight.shape[0] ** (1.0 / 3.0))
    assert k**3 == weight.shape[0], weight.shape
    h = (k - 1) // 2
    w = weight.reshape(k, k, k, weight.shape[1], weight.shape[2])
    if compute_dtype is not None:
        bricks = bricks.astype(compute_dtype)
        w = w.astype(compute_dtype)
    nb = spec.capacity
    if chunk <= 0 or chunk >= nb:
        spans = [(0, nb)]
    else:
        spans = [(lo, min(chunk, nb - lo)) for lo in range(0, nb, chunk)]
    outs = []
    for lo, size in spans:
        x = _halo_pad_range(bricks, tables.nbr[lo: lo + size], spec, h,
                            lo, size)
        o = dense_ops._conv(x, w, (1, 1, 1), "VALID", out_dtype=x.dtype)
        if bias is not None:
            o = o + bias.astype(o.dtype)
        outs.append(o * occ_bricks[lo: lo + size].astype(o.dtype))
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    return _with_sentinel(out, spec)


def _with_sentinel(interior, spec: BrickSpec):
    """[NB, ...] -> [NB+1, ...] with the zero sentinel slot appended."""
    pad = [(0, 1)] + [(0, 0)] * (interior.ndim - 1)
    return jnp.pad(interior, pad)


def conv_down(bricks, weight, occ_coarse, tables, spec: BrickSpec,
              coarse_dims, compute_dtype=None):
    """k=2 s=2 conv: bricks -> DENSE coarse grid [1, X/2, Y/2, Z/2, Cout]
    (mirrors `dense_ops.dense_conv_down`; the 2x2x2 window never crosses
    a brick boundary because brick dims are even)."""
    assert weight.shape[0] == 8, weight.shape
    w = weight.reshape(2, 2, 2, weight.shape[1], weight.shape[2])
    x = bricks[: spec.capacity]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    out = dense_ops._conv(x, w, (2, 2, 2), "VALID", out_dtype=x.dtype)
    dense = slots_to_dense(out, tables, spec)
    dense = dense[:, : coarse_dims[0], : coarse_dims[1], : coarse_dims[2]]
    return dense * occ_coarse.astype(dense.dtype)


def slots_to_dense(half_bricks, tables: BrickTables, spec: BrickSpec):
    """[NB, hx, hy, hz, C] per-brick blocks -> [1, Sx*hx, Sy*hy, Sz*hz, C]
    dense grid (empty slots zero)."""
    hx, hy, hz = half_bricks.shape[1:4]
    c = half_bricks.shape[-1]
    sx, sy, sz = spec.slots
    ns = spec.n_slots
    grid = (
        jnp.zeros((ns + 1, hx, hy, hz, c), half_bricks.dtype)
        .at[tables.slot_key]
        .set(half_bricks, mode="drop")
    )[:ns]
    grid = grid.reshape(sx, sy, sz, hx, hy, hz, c)
    grid = grid.transpose(0, 3, 1, 4, 2, 5, 6)
    return grid.reshape(1, sx * hx, sy * hy, sz * hz, c)


def dense_to_slots(dense, tables: BrickTables, spec: BrickSpec,
                   hx: int, hy: int, hz: int):
    """[1, X', Y', Z', C] dense -> per-slot blocks [NB, hx, hy, hz, C]
    (X' etc. zero-padded up to Sx*hx)."""
    sx, sy, sz = spec.slots
    c = dense.shape[-1]
    pads = [(0, sx * hx - dense.shape[1]), (0, sy * hy - dense.shape[2]),
            (0, sz * hz - dense.shape[3])]
    g = jnp.pad(dense[0], pads + [(0, 0)])
    g = g.reshape(sx, hx, sy, hy, sz, hz, c).transpose(0, 2, 4, 1, 3, 5, 6)
    g = g.reshape(sx * sy * sz, hx, hy, hz, c)
    g = jnp.pad(g, [(0, 1)] + [(0, 0)] * 4)  # zero block for empty slots
    key = jnp.where(tables.brick_ok, tables.slot_key, spec.n_slots)
    return jnp.take(g, key, axis=0)


def conv_tr(dense, weight, occ_bricks, tables, spec: BrickSpec,
            compute_dtype=None):
    """k=2 s=2 TRANSPOSED conv: dense coarse grid -> bricks (mirrors
    `dense_ops.dense_conv_tr`)."""
    assert weight.shape[0] == 8, weight.shape
    bx, by, bz = spec.brick_dims
    w = weight.reshape(2, 2, 2, weight.shape[1], weight.shape[2])
    # lax.conv_transpose applies the kernel spatially mirrored relative
    # to the out[2i+d] = in[i] @ w[d] contract (same flip as
    # dense_ops.dense_conv_tr).
    w = w[::-1, ::-1, ::-1]
    blk = dense_to_slots(dense, tables, spec, bx // 2, by // 2, bz // 2)
    if compute_dtype is not None:
        blk = blk.astype(compute_dtype)
        w = w.astype(compute_dtype)
    out = jax.lax.conv_transpose(
        blk, w, strides=(2, 2, 2), padding="VALID",
        dimension_numbers=dense_ops._DN,
        preferred_element_type=blk.dtype,
    )
    occ = occ_bricks[: spec.capacity].astype(out.dtype)
    return _with_sentinel(out * occ, spec)


def instance_norm(bricks, occ_bricks, gamma, beta, eps: float = 1e-5):
    """InstanceNorm over ALL bricks of the (single) item — same math and
    same fused-affine form as `dense_ops.dense_instance_norm` at B=1
    (PRECONDITION: unoccupied cells are exactly 0, so the stats need no
    mask and empty cells stay 0 through `x*k + occ*t`)."""
    x32 = bricks.astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(occ_bricks.astype(jnp.float32)), 1.0)
    mean = jnp.sum(x32, axis=(0, 1, 2, 3)) / cnt
    sq = jnp.sum(x32 * x32, axis=(0, 1, 2, 3)) / cnt
    var = jnp.maximum(sq - mean * mean, 0.0)
    rs = jax.lax.rsqrt(var + eps)
    k = (rs * gamma).astype(bricks.dtype)
    t = (beta - mean * rs * gamma).astype(bricks.dtype)
    return bricks * k + occ_bricks.astype(bricks.dtype) * t
