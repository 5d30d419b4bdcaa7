"""One-time compile probes for optional Pallas fast paths.

The remote TPU fleet rotates libtpu builds, and a Pallas kernel that
compiled on one build can fail Mosaic lowering on the next (observed
2026-08-19: the fused masked-cross-attention kernel compiled on the
2026-08-17 libtpu and 500s on the current one — docs/ARCHITECTURE.md).
Config flags that select such kernels (`model.attention_pallas_tile`,
`model.pallas_conv_select="gather"`) must therefore never hard-crash:
each call site probes ONCE per process with a tiny representative shape
and silently (well, loudly-once) downgrades to its XLA-path equivalent
when the probe fails.

The probe runs at Python trace time (kernels are selected while tracing
the enclosing jit, so an ordinary cached Python function works); it costs
one tiny device compile on first use.
"""

from __future__ import annotations

import logging
from typing import Callable

_log = logging.getLogger("mask3d_tpu")
_CACHE: dict = {}


def compiles(key: str, build: Callable[[], None]) -> bool:
    """True if `build()` (which should jit-compile a tiny instance of the
    kernel) runs without raising. Result is cached per process under
    `key`; failure logs a one-time downgrade warning."""
    if key in _CACHE:
        return _CACHE[key]
    try:
        build()
        _CACHE[key] = True
    except Exception as e:  # Mosaic failures surface as RuntimeError/
        # XlaRuntimeError (remote helper: "HTTP 500"); any raise means the
        # kernel is unusable on this backend build.
        _log.warning(
            "pallas probe %r failed to compile on this backend; falling "
            "back to the XLA path (%s: %.200s)",
            key, type(e).__name__, e,
        )
        _CACHE[key] = False
    return _CACHE[key]


def reset_cache() -> None:
    """Testing hook."""
    _CACHE.clear()
