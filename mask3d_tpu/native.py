"""Native host library loader: builds and binds cpp/ via ctypes.

The compute path is JAX/XLA on TPU; the host runtime around it (voxelizing
collation, offline downsampling) has a native C++ fast path — the
counterpart of the reference's native host components (MinkowskiEngine's
C++ coordinate manager, `mask3d/datasets/utils.py:126`). Falls back to the
numpy implementations transparently when no compiler is available.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO_ROOT, "cpp", "voxelizer.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, ".native_cache")
_SO_PATH = os.path.join(_BUILD_DIR, "libmask3d_host.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    if os.path.exists(_SO_PATH) and (
        os.path.getmtime(_SO_PATH) >= os.path.getmtime(_SRC)
    ):
        return _SO_PATH
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _SO_PATH,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO_PATH
    except Exception as e:
        logger.warning(f"native build failed ({e}); using numpy fallback")
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.voxelize_f32.restype = ctypes.c_int
        lib.voxelize_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.downsample_f64.restype = ctypes.c_int
        lib.downsample_f64.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_double,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.pack_encode_u8.restype = ctypes.c_int
        lib.pack_encode_u8.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.coarse_pyramid_encode_u8.restype = ctypes.c_int
        lib.coarse_pyramid_encode_u8.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
        return _lib


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def voxelize_native(coordinates: np.ndarray):
    """C++ fast path of `collate.voxelize_item`; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    c = np.ascontiguousarray(coordinates, np.float32)
    n = len(c)
    out_coords = np.empty((n, 3), np.int32)
    keep = np.empty(n, np.int32)
    dims = np.empty(3, np.int32)
    m = lib.voxelize_f32(
        _ptr(c, ctypes.c_float), n,
        _ptr(out_coords, ctypes.c_int32), _ptr(keep, ctypes.c_int32),
        _ptr(dims, ctypes.c_int32),
    )
    return out_coords[:m], keep[:m], dims


def pack_encode_u8_native(coords: np.ndarray, counts: np.ndarray,
                          dims: np.ndarray, escape_capacity: int = 4096):
    """C++ fused pack_keys + `transfer.encode_keys_u8`; None if unavailable.

    coords i32[B, N, 3] sorted by key within counts; returns the uint8
    transfer buffer (byte-identical to the numpy path) or raises ValueError
    on escape-table overflow / unsorted keys, mirroring encode_keys_u8.
    """
    lib = get_lib()
    if lib is None or not hasattr(lib, "pack_encode_u8"):
        return None
    c = np.ascontiguousarray(coords, np.int32)
    cnt = np.ascontiguousarray(counts, np.int32)
    dm = np.ascontiguousarray(dims, np.int32)
    b, n = c.shape[0], c.shape[1]
    out = np.empty(b * n + escape_capacity * 12 + b * 16, np.uint8)
    rc = lib.pack_encode_u8(
        _ptr(c, ctypes.c_int32), _ptr(cnt, ctypes.c_int32),
        _ptr(dm, ctypes.c_int32), b, n, escape_capacity,
        _ptr(out, ctypes.c_uint8),
    )
    if rc == -1:
        raise ValueError(f"escapes exceed capacity {escape_capacity}")
    if rc == -2:
        raise ValueError("keys not sorted ascending within counts")
    return out


def coarse_pyramid_encode_u8_native(coords: np.ndarray, counts: np.ndarray,
                                    dims: np.ndarray, level_capacities,
                                    escape_capacity: int = 1024):
    """C++ fused coarse-pyramid build + per-level u8-delta encode
    (`transfer.coarse_pyramid_host` + `encode_keys_u8` per level,
    byte-identical concatenation); None if unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "coarse_pyramid_encode_u8"):
        return None
    c = np.ascontiguousarray(coords, np.int32)
    cnt = np.ascontiguousarray(counts, np.int32)
    dm = np.ascontiguousarray(dims, np.int32)
    caps = np.ascontiguousarray(level_capacities, np.int64)
    b, n = c.shape[0], c.shape[1]
    total = int(
        sum(b * int(cap) + escape_capacity * 12 + b * 16 for cap in caps)
    )
    out = np.empty(total, np.uint8)
    rc = lib.coarse_pyramid_encode_u8(
        _ptr(c, ctypes.c_int32), _ptr(cnt, ctypes.c_int32),
        _ptr(dm, ctypes.c_int32), b, n, _ptr(caps, ctypes.c_int64),
        len(caps), escape_capacity, _ptr(out, ctypes.c_uint8),
    )
    if rc == -1:
        raise ValueError(f"escapes exceed capacity {escape_capacity}")
    return out


def downsample_native(coords: np.ndarray, voxel_size: float):
    """C++ fast path of `preprocess.downsample` quantize+unique."""
    lib = get_lib()
    if lib is None:
        return None
    c = np.ascontiguousarray(coords, np.float64)
    n = len(c)
    out_vox = np.empty((n, 3), np.int32)
    keep = np.empty(n, np.int32)
    m = lib.downsample_f64(
        _ptr(c, ctypes.c_double), n, voxel_size,
        _ptr(out_vox, ctypes.c_int32), _ptr(keep, ctypes.c_int32),
    )
    return out_vox[:m], keep[:m]
