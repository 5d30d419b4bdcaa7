"""Differential validation of the RoomFormer polygon Hungarian matcher.

Imports the REFERENCE `RoomFormer/models/matcher.py` (torch + scipy +
util.poly_ops, all real) and fuzzes random polygon batches through it and
our batched on-device matcher (`mask3d_tpu/baseline/criterion2d.py`),
asserting identical assignments (continuous random costs make ties
measure-zero).
"""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

from mask3d_tpu.baseline.criterion2d import RoomFormerCriterion

REF_DIR = "/root/reference/RoomFormer"


@pytest.fixture(scope="module")
def ref_matcher():
    torch = pytest.importorskip("torch")  # noqa: F841
    import types

    saved = {k: sys.modules.get(k)
             for k in ("models", "models.matcher", "util", "util.poly_ops")}
    for k in saved:
        sys.modules.pop(k, None)
    # Synthetic packages with real __path__: lets models.matcher load from
    # the reference tree WITHOUT executing models/__init__.py (which pulls
    # torchvision via models.misc).
    pkg_models = types.ModuleType("models")
    pkg_models.__path__ = [f"{REF_DIR}/models"]
    pkg_util = types.ModuleType("util")
    pkg_util.__path__ = [f"{REF_DIR}/util"]
    sys.modules["models"] = pkg_models
    sys.modules["util"] = pkg_util
    sys.path.insert(0, REF_DIR)
    try:
        import importlib

        mod = importlib.import_module("models.matcher")
        yield mod.HungarianMatcher(cost_class=2.0, cost_coords=5.0)
    finally:
        sys.path.remove(REF_DIR)
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def test_roomformer_matcher_differential(ref_matcher):
    import torch

    rng = np.random.default_rng(20260823)
    P, QP = 6, 8  # polys per item, corners per poly
    crit = RoomFormerCriterion(cost_class=2.0, cost_coords=5.0,
                               lsap_method="device")
    for trial in range(30):
        bs = int(rng.integers(1, 4))
        logits = rng.normal(0, 2, size=(bs, P, QP)).astype(np.float32)
        coords = rng.random((bs, P, QP, 2)).astype(np.float32)

        tgt_list = []
        pt_cap = 5
        t_coords = np.zeros((bs, pt_cap, 2 * QP), np.float32)
        t_labels = np.zeros((bs, pt_cap, QP), np.float32)
        t_lens = np.zeros((bs, pt_cap), np.int32)
        t_valid = np.zeros((bs, pt_cap), bool)
        for b in range(bs):
            n_polys = int(rng.integers(1, pt_cap + 1))
            labels, cs, lens = [], [], []
            for pi in range(n_polys):
                k = int(rng.integers(3, QP + 1))
                flat = np.zeros(2 * QP, np.float32)
                flat[: 2 * k] = rng.random(2 * k).astype(np.float32)
                lab = np.zeros(QP, np.float32)
                lab[:k] = 1.0
                cs.append(flat)
                labels.append(lab)
                lens.append(2 * k)
                t_coords[b, pi] = flat
                t_labels[b, pi] = lab
                t_lens[b, pi] = 2 * k
                t_valid[b, pi] = True
            tgt_list.append(
                {
                    "labels": torch.as_tensor(np.stack(labels)),
                    "coords": torch.as_tensor(np.stack(cs)),
                    "lengths": torch.as_tensor(
                        np.asarray(lens, np.int64)
                    ),
                }
            )

        ref_idx = ref_matcher(
            {
                "pred_logits": torch.as_tensor(logits),
                "pred_coords": torch.as_tensor(coords),
            },
            tgt_list,
        )

        col4row, matched = crit.match(
            jnp.asarray(logits),
            jnp.asarray(coords),
            {
                "labels": jnp.asarray(t_labels),
                "coords": jnp.asarray(t_coords),
                "lengths": jnp.asarray(t_lens),
                "poly_valid": jnp.asarray(t_valid),
            },
        )
        col4row = np.asarray(col4row)
        matched = np.asarray(matched)

        for b, (ri, rj) in enumerate(ref_idx):
            ours_pairs = {
                (int(i), int(col4row[b, i]))
                for i in range(P)
                if matched[b, i]
            }
            ref_pairs = {(int(i), int(j)) for i, j in zip(ri, rj)}
            assert ours_pairs == ref_pairs, (
                f"trial {trial} item {b}: {sorted(ours_pairs)} vs "
                f"{sorted(ref_pairs)}"
            )
