"""Checkpoint save/restore with tolerant key matching.

Rebuild of the reference checkpoint subsystem (SURVEY.md §5.4):
- `last-epoch` checkpoint every train epoch (reference RegularCheckpointing,
  `mask3d/trainer/trainer.py:28-31`)
- best-metric checkpoints for val_mean_ap_50 / val_mean_ap (reference
  `conf/callbacks/callbacks_instance_segmentation.yaml`)
- auto-resume from `last-epoch` (reference `main_instance_segmentation.py:18-28`)
- tolerant restore: missing keys keep the fresh init, shape mismatches keep
  the model's shape, excess keys are dropped — with warnings
  (`mask3d/utils/utils.py:64-93`), enabling fine-tune workflows like
  num_queries 25 -> 100 (`experiment6_finetune_s3dis_train.sh`)

Format: flax msgpack of the TrainState pytree + a small JSON sidecar for
step/epoch/metric metadata.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
from flax import serialization, traverse_util

logger = logging.getLogger(__name__)


def _flat(tree) -> Dict[Tuple[str, ...], Any]:
    return traverse_util.flatten_dict(
        serialization.to_state_dict(tree), keep_empty_nodes=False
    )


def save_checkpoint(path: str, state, epoch: int = 0,
                    metadata: Optional[dict] = None):
    # Atomic: write to a temp file then os.replace, so a SIGKILL landing
    # mid-save (bench.py preemption after its SIGTERM grace) can never
    # truncate the sole resume checkpoint. Worst case the previous save
    # survives intact and resume replays one more epoch.
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    state = jax.device_get(state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(state))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    meta = {"epoch": epoch, **(metadata or {})}
    meta_tmp = path + ".meta.json.tmp"
    with open(meta_tmp, "w") as f:
        json.dump(meta, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(meta_tmp, path + ".meta.json")


def load_checkpoint(path: str, target):
    """Strict restore into a template pytree (same treedef/shapes)."""
    with open(path, "rb") as f:
        state = serialization.from_bytes(target, f.read())
    meta = {}
    meta_path = path + ".meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta


def load_params_tolerant(path: str, target_params):
    """Restore parameters with missing/shape-mismatch/excess tolerance.

    Mirrors `load_checkpoint_with_missing_or_exsessive_keys`
    (`mask3d/utils/utils.py:64-93`). The checkpoint may hold a full
    TrainState or a bare params dict; only params (+buffers when present)
    are matched.
    """
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    source = raw.get("params", raw)

    flat_target = _flat(target_params)
    flat_source = traverse_util.flatten_dict(source, keep_empty_nodes=False)

    out = {}
    for key, cur in flat_target.items():
        if key not in flat_source:
            logger.warning(f"{'/'.join(key)} not in checkpoint; keeping init")
            out[key] = cur
        elif np.shape(flat_source[key]) != np.shape(cur):
            logger.warning(
                f"incorrect shape {'/'.join(key)}: "
                f"{np.shape(flat_source[key])} vs {np.shape(cur)}; keeping init"
            )
            out[key] = cur
        else:
            out[key] = np.asarray(flat_source[key])
    for key in flat_source:
        if key not in flat_target:
            logger.warning(f"excessive key dropped: {'/'.join(key)}")

    restored = traverse_util.unflatten_dict(out)
    return serialization.from_state_dict(target_params, restored)


def load_backbone_tolerant(path: str, target_params):
    """Backbone-only restore (`mask3d/utils/utils.py:30-61`): match keys
    under the `backbone` subtree; everything else keeps the fresh init."""
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    source = raw.get("params", raw)
    src_backbone = source.get("backbone", source)

    tgt_dict = serialization.to_state_dict(target_params)
    if "backbone" not in tgt_dict:
        logger.warning("target has no backbone subtree; nothing restored")
        return target_params
    merged_backbone = load_params_tolerant_from_dict(
        src_backbone, tgt_dict["backbone"]
    )
    tgt_dict["backbone"] = merged_backbone
    return serialization.from_state_dict(target_params, tgt_dict)


def load_params_tolerant_from_dict(source: dict, target_dict: dict):
    flat_target = traverse_util.flatten_dict(
        target_dict, keep_empty_nodes=False
    )
    flat_source = traverse_util.flatten_dict(source, keep_empty_nodes=False)
    out = {}
    for key, cur in flat_target.items():
        if key not in flat_source or (
            np.shape(flat_source[key]) != np.shape(cur)
        ):
            logger.warning(f"{'/'.join(key)}: keeping init")
            out[key] = cur
        else:
            out[key] = np.asarray(flat_source[key])
    return traverse_util.unflatten_dict(out)


class CheckpointManager:
    """last-epoch + best-metric checkpoint policy (reference callbacks)."""

    def __init__(self, directory: str,
                 best_metrics=("val_mean_ap_50", "val_mean_ap")):
        self.directory = directory
        self.best_metrics = best_metrics
        self.best_values = {m: -np.inf for m in best_metrics}
        os.makedirs(directory, exist_ok=True)

    @property
    def last_path(self) -> str:
        return os.path.join(self.directory, "last-epoch.ckpt")

    def save_last(self, state, epoch: int, metrics: Optional[dict] = None):
        save_checkpoint(self.last_path, state, epoch, metrics)

    def maybe_save_best(self, state, epoch: int, metrics: dict):
        for m in self.best_metrics:
            v = metrics.get(m)
            if v is not None and np.isfinite(v) and v > self.best_values[m]:
                self.best_values[m] = float(v)
                path = os.path.join(
                    self.directory, f"best_{m}.ckpt"
                )
                save_checkpoint(path, state, epoch, {m: float(v)})
                logger.info(f"new best {m}={v:.4f} at epoch {epoch}")

    def resume_path(self) -> Optional[str]:
        return self.last_path if os.path.exists(self.last_path) else None
