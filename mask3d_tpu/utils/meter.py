"""Global split-timer: named wall-clock segments per item.

Rebuild of `mask3d/utils/measure_runtime.py` (M16): call
`notify_start_item()` at the start of a step, `add_timing(name)` after each
phase (records the time since the previous mark), `notify_end_item()` at the
end; `log_final_statistics()` prints mean/median/min/max/count per segment.

JAX-specific: device work is asynchronous, so callers must
`jax.block_until_ready` the relevant arrays before `add_timing` for the
segment to mean anything (the reference has the same implicit requirement
with CUDA streams).
"""

from __future__ import annotations

import logging
import time
from typing import Dict, List

logger = logging.getLogger(__name__)

_timings: Dict[str, List[float]] = {}
_last_mark: float | None = None
_enabled = True


def reset():
    global _timings, _last_mark
    _timings = {}
    _last_mark = None


def set_enabled(flag: bool):
    global _enabled
    _enabled = flag


def notify_start_item():
    global _last_mark
    _last_mark = time.perf_counter()


def add_timing(name: str):
    global _last_mark
    if not _enabled or _last_mark is None:
        return
    now = time.perf_counter()
    _timings.setdefault(name, []).append(now - _last_mark)
    _last_mark = now


def notify_end_item():
    global _last_mark
    _last_mark = None


def record(name: str, seconds: float):
    """Record an externally measured duration under `name` (used by the
    prefix-difference model-phase timer, which cannot use the running
    mark because phases are measured by re-running jitted prefixes)."""
    if _enabled:
        _timings.setdefault(name, []).append(seconds)


def get_statistics() -> Dict[str, dict]:
    import numpy as np

    stats = {}
    for name, vals in _timings.items():
        arr = np.asarray(vals)
        stats[name] = {
            "mean": float(arr.mean()),
            "median": float(np.median(arr)),
            "min": float(arr.min()),
            "max": float(arr.max()),
            "count": len(vals),
        }
    return stats


def log_final_statistics():
    stats = get_statistics()
    if not stats:
        return
    width = max(len(k) for k in stats)
    logger.info("runtime statistics (seconds):")
    for name, s in stats.items():
        logger.info(
            f"  {name:<{width}}  mean={s['mean']:.4f}  "
            f"median={s['median']:.4f}  min={s['min']:.4f}  "
            f"max={s['max']:.4f}  n={s['count']}"
        )
