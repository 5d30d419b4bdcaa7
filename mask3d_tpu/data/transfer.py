"""Host->device transfer codec for sorted voxel keys.

The collator's per-item sorted linearized keys are near-incompressible as
raw i32 (4 B/voxel) but their first differences are tiny (median ~6 cells
on Structured3D scenes), so the batch ships as ONE uint8 buffer:

  [B*N u8 deltas][EC escape records (item, pos, value) i32][B i32 counts]
  [B*3 i32 dims]

Deltas >= 255 (including each item's absolute first key) are marked with
the 255 sentinel and carried exactly in the escape table. The device
decodes with one scatter + one cumsum — O(B*N) VPU work. ~4x fewer
host->device bytes than packed i32 keys; on the remote-tunnel TPU used for
benching this cuts the per-batch input transfer from ~60 ms to ~15 ms
(transfers are bandwidth-bound and serialize with compute there).

The reference ships full coordinates (16+ B/point) through its DataLoader
(`mask3d/datasets/utils.py:126`); this codec is the TPU pipeline's
equivalent of pinned-memory prefetch frugality.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


def encode_keys_u8(keys, counts, dims, escape_capacity: int = 4096):
    """keys i32[B, N] (sorted ascending per item over the first counts[b]
    rows; padding rows arbitrary), counts i32[B], dims i32[B, 3] ->
    uint8[B*N + escape_capacity*12 + B*16].

    Raises ValueError if the scene needs more than `escape_capacity`
    escape records (callers re-encode with a larger table).
    """
    keys = np.asarray(keys, np.int64)
    counts = np.asarray(counts, np.int32)
    dims = np.asarray(dims, np.int32)
    b, n = keys.shape

    d = np.zeros((b, n), np.int64)
    d[:, 0] = keys[:, 0]
    d[:, 1:] = np.diff(keys, axis=1)
    rows = np.arange(n)[None, :]
    d[rows >= counts[:, None]] = 0
    if (d < 0).any():
        raise ValueError("keys not sorted ascending within counts")

    esc = d >= 255
    ei, ep = np.nonzero(esc)
    if len(ei) > escape_capacity:
        raise ValueError(
            f"{len(ei)} escapes exceed capacity {escape_capacity}"
        )
    records = np.zeros((escape_capacity, 3), np.int32)
    records[: len(ei), 0] = ei
    records[: len(ei), 1] = ep
    records[: len(ei), 2] = d[ei, ep]
    records[len(ei):, 1] = n  # out-of-range pos: dropped by the scatter

    deltas = np.minimum(d, 255).astype(np.uint8)
    tail = np.concatenate([counts[:, None], dims], axis=1).astype(np.int32)
    return np.concatenate(
        [
            deltas.reshape(-1),
            records.view(np.uint8).reshape(-1),
            tail.view(np.uint8).reshape(-1),
        ]
    )


def encode_batch_u8(coords, counts, dims, escape_capacity: int = 4096):
    """pack_keys + `encode_keys_u8` from batch voxel coords in one step.

    coords i32[B, N, 3] sorted by linearized key within the first counts[b]
    rows (the collator's order). Uses the fused C++ pass when available
    (~10x faster on a 1-core host; byte-identical output, differential test
    in tests/test_data_io.py), else the numpy path.
    """
    from mask3d_tpu.native import pack_encode_u8_native

    out = pack_encode_u8_native(coords, counts, dims, escape_capacity)
    if out is not None:
        return out
    from mask3d_tpu.sparse.core import pack_keys

    keys = pack_keys(
        np.asarray(coords), np.asarray(dims)[:, None, :]
    ).astype(np.int32)
    return encode_keys_u8(keys, counts, dims, escape_capacity)


def coarse_pyramid_host(coords, counts, dims, level_capacities):
    """Host-side stride-2 pyramid keys (the collator's half of the device
    pyramid build).

    Mirrors `dense_ops.downsample_level_dense` level semantics exactly:
    per item, level l+1 = sorted unique of (coords_l >> 1) packed in the
    per-item dims_{l+1} = ((dims_l - 1) >> 1) + 1. Rows beyond the level
    capacity are truncated in the SHIPPED key list only (the device flags
    overflow from the raw count); the next level still derives from the
    FULL cell set, because the device chain pools the untruncated
    occupancy grids.

    Returns [(keys u8-encodable i32[B, cap_l], raw_counts i32[B],
    dims i32[B, 3])] per coarse level. The device then skips the
    cumsum+scatter compaction passes (~4 ms/forward at flagship shape).
    """
    coords = np.asarray(coords)
    counts = np.asarray(counts, np.int64)
    dims = np.asarray(dims, np.int64)
    b = coords.shape[0]
    per_item = [coords[i, : counts[i]].astype(np.int64) for i in range(b)]
    d = dims
    out = []
    for cap in level_capacities:
        d = ((d - 1) >> 1) + 1
        keys = np.zeros((b, cap), np.int32)
        raw = np.zeros((b,), np.int32)
        nxt = []
        for i in range(b):
            c = per_item[i] >> 1
            k = np.unique(
                (c[:, 0] * d[i, 1] + c[:, 1]) * d[i, 2] + c[:, 2]
            )
            raw[i] = len(k)
            ks = k[:cap]
            keys[i, : len(ks)] = ks.astype(np.int32)
            if len(ks):
                keys[i, len(ks):] = np.int32(ks[-1])  # zero deltas in pad
            # next level derives from the FULL cell set (see docstring)
            z = k % d[i, 2]
            r = k // d[i, 2]
            nxt.append(np.stack([r // d[i, 1], r % d[i, 1], z], axis=-1))
        per_item = nxt
        out.append((keys, raw, d.astype(np.int32)))
    return out


def encode_pyramid_u8(coords, counts, dims, level_capacities,
                      escape_capacity: int = 4096,
                      coarse_escape_capacity: int = 1024):
    """ONE uint8 buffer carrying the base level (`encode_batch_u8`) plus
    every coarse level's keys/raw-counts/dims (`encode_keys_u8` each,
    concatenated at static offsets — `decode_pyramid_u8` inverts)."""
    from mask3d_tpu.native import coarse_pyramid_encode_u8_native

    base = encode_batch_u8(coords, counts, dims, escape_capacity)
    coarse = coarse_pyramid_encode_u8_native(
        coords, counts, dims, level_capacities, coarse_escape_capacity
    )
    if coarse is not None:
        # C++ fused path (~10x faster on the 1-core bench host, where the
        # per-item np.unique loop was measured as 20-40 ms/batch of feeder
        # starvation); byte-identical (differential test in
        # tests/test_data_io.py).
        return np.concatenate([base, coarse])
    bufs = [base]
    for keys, raw, d in coarse_pyramid_host(coords, counts, dims,
                                            level_capacities):
        bufs.append(encode_keys_u8(keys, raw, d, coarse_escape_capacity))
    return np.concatenate(bufs)


def pyramid_buf_sizes(batch, n_cap, level_capacities,
                      escape_capacity: int = 4096,
                      coarse_escape_capacity: int = 1024):
    sizes = [batch * n_cap + escape_capacity * 12 + batch * 16]
    sizes += [
        batch * cap + coarse_escape_capacity * 12 + batch * 16
        for cap in level_capacities
    ]
    return sizes


def decode_pyramid_u8(buf, batch: int, n_cap: int, level_capacities,
                      escape_capacity: int = 4096,
                      coarse_escape_capacity: int = 1024):
    """Inverse of `encode_pyramid_u8` on device: -> ((keys, counts, dims)
    for the base level, [(keys, raw_counts, dims)] per coarse level)."""
    sizes = pyramid_buf_sizes(batch, n_cap, level_capacities,
                              escape_capacity, coarse_escape_capacity)
    off = 0
    base = decode_keys_u8(buf[:sizes[0]], batch, n_cap, escape_capacity)
    off = sizes[0]
    coarse = []
    for cap, size in zip(level_capacities, sizes[1:]):
        coarse.append(
            decode_keys_u8(buf[off: off + size], batch, int(cap),
                           coarse_escape_capacity)
        )
        off += size
    return base, coarse


def _bitcast_i32(u8_flat, shape):
    return jax.lax.bitcast_convert_type(
        u8_flat.reshape(shape + (4,)), jnp.int32
    )


@functools.partial(
    jax.jit, static_argnames=("batch", "n", "escape_capacity")
)
def decode_keys_u8(buf, batch: int, n: int, escape_capacity: int = 4096):
    """Inverse of `encode_keys_u8` on device: -> (keys i32[B, N],
    counts i32[B], dims i32[B, 3]). Padding rows hold each item's last real
    key (harmless: consumers mask rows >= counts)."""
    off = batch * n
    d = buf[:off].reshape(batch, n).astype(jnp.int32)
    rec = _bitcast_i32(buf[off: off + escape_capacity * 12],
                       (escape_capacity, 3))
    off += escape_capacity * 12
    tail = _bitcast_i32(buf[off: off + batch * 16], (batch, 4))
    d = d.at[rec[:, 0], rec[:, 1]].set(rec[:, 2], mode="drop")
    keys = jnp.cumsum(d, axis=1)
    return keys, tail[:, 0], tail[:, 1:4]
