"""Differential validation of the loss stack (matcher + set criterion).

Imports the REFERENCE `models/matcher.py` + `models/criterion.py`
(`/root/reference/mask3d/`) — real torch code, with only their
import-time-but-unused-at-runtime dependencies stubbed (detectron2's
point_rend samplers are dead code at the shipped `num_points: -1`,
`conf/matcher/hungarian_matcher.yaml:5`) — and fuzzes random ragged
batches through both loss stacks asserting equality of every reported
loss component and the weighted total.

This pins, by measurement rather than construction:
- the Hungarian matching costs (BCE/dice/class, `matcher.py:94-178`),
- weighted CE with eos_coef + torch's weight-sum normalization,
- per-item mask/dice losses with the reference's num_masks shadowing
  (`criterion.py:188`: the normalizer is the ITEM's gt count, summed
  over items — not the batch-global mean),
- the deep-supervision per-mask-module loss dict and the
  weight_dict-weighted total (`trainer.py:154-169,234-238`),
- padding invariance of our batched [B, N] / [B, I] layout vs the
  reference's ragged per-item tensors.
"""

import logging
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from mask3d_tpu.data.batch import Targets
from mask3d_tpu.models.mask3d import Mask3DOutput
from mask3d_tpu.train.criterion import SetCriterion

from tests.test_evaluator_differential import _stub  # noqa: F401

REF = "/root/reference/mask3d"


@pytest.fixture(scope="module")
def ref_loss_mods():
    torch = pytest.importorskip("torch")

    class _ItemTargets:
        def __init__(self, labels, masks):
            self.instances_labels = labels
            self.instances_masks = masks

    class _SingleModelPredictions:
        def __init__(self, pred_class, pred_mask):
            self.pred_class = pred_class
            self.pred_mask = pred_mask

    class _ModelOutput:
        """Duck of the reference ModelOutput (models/mask3d.py:28-70):
        only the attributes the matcher/criterion read at runtime."""

        def __init__(self, pred_class, pred_mask, aux_class, aux_mask):
            self.pred_class = pred_class
            self.pred_mask = pred_mask
            self.pred_class_all_decoders = aux_class
            self.pred_mask_all_decoders = aux_mask

        def get_device(self):
            return self.pred_class.device

        def get_single_predictions(self):
            return _SingleModelPredictions(self.pred_class, self.pred_mask)

    def _unused(*a, **k):  # point_rend samplers: dead at num_points=-1
        raise AssertionError("point sampling must not run at num_points=-1")

    stubs = {
        "loguru": _stub("loguru", logger=logging.getLogger("loguru")),
        "detectron2": _stub("detectron2"),
        "detectron2.utils": _stub("detectron2.utils"),
        "detectron2.utils.comm": _stub(
            "detectron2.utils.comm", get_world_size=lambda: 1
        ),
        "detectron2.projects": _stub("detectron2.projects"),
        "detectron2.projects.point_rend": _stub(
            "detectron2.projects.point_rend"
        ),
        "detectron2.projects.point_rend.point_features": _stub(
            "detectron2.projects.point_rend.point_features",
            get_uncertain_point_coords_with_randomness=_unused,
            point_sample=_unused,
        ),
        "datasets": _stub("datasets"),
        "datasets.utils": _stub("datasets.utils", ItemTargets=_ItemTargets),
        # `models` must be a PACKAGE (with __path__) so the real
        # matcher/criterion submodules load from the reference tree while
        # the already-present sys.modules stubs win for mask3d/misc.
        "models": _stub("models", __path__=[f"{REF}/models"]),
        "models.mask3d": _stub(
            "models.mask3d",
            ModelOutput=_ModelOutput,
            SingleModelPredictions=_SingleModelPredictions,
        ),
        "models.misc": _stub(
            "models.misc",
            is_dist_avail_and_initialized=lambda: False,
            nested_tensor_from_tensor_list=_unused,
        ),
    }
    saved = {k: sys.modules.get(k) for k in stubs}
    for k in ("models.matcher", "models.criterion"):
        saved.setdefault(k, sys.modules.get(k))
        sys.modules.pop(k, None)
    sys.modules.update(stubs)
    sys.path.insert(0, REF)
    try:
        import importlib

        matcher_mod = importlib.import_module("models.matcher")
        criterion_mod = importlib.import_module("models.criterion")
        yield types.SimpleNamespace(
            matcher=matcher_mod,
            criterion=criterion_mod,
            ModelOutput=_ModelOutput,
            ItemTargets=_ItemTargets,
        )
    finally:
        sys.path.remove(REF)
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


Q, C1, L = 10, 2, 4  # queries, num_classes+1, mask modules


def _weight_dict():
    # trainer.get_loss_weights (trainer.py:154-169), no ignore_mask_idx
    w = {"loss_ce": 2.0, "loss_mask": 5.0, "loss_dice": 2.0}
    for d in range(L - 1):
        w.update({f"{k}_mask_module_{d}": v for k, v in w.copy().items()
                  if "_mask_module_" not in k})
    return w


def _ref_losses(mods, items):
    import torch

    matcher = mods.matcher.HungarianMatcher(
        cost_class=2.0, cost_mask=5.0, cost_dice=2.0, num_points=-1
    )
    crit = mods.criterion.SetCriterion(
        num_classes=1,
        matcher=matcher,
        weight_dict=_weight_dict(),
        eos_coef=0.1,
        loss_names=["labels", "masks"],
        num_points=-1,
        oversample_ratio=3.0,
        importance_sample_ratio=0.75,
        class_weights=-1,
    )
    # aux outputs in emission order; the FINAL prediction is separate and
    # the aux list's last entry equals it (the reference criterion skips
    # pred_*_all_decoders[-1], criterion.py:255-257).
    aux_class = [torch.as_tensor(np.stack([it["cls"][li] for it in items]))
                 for li in range(L)]
    aux_mask = [[torch.as_tensor(it["msk"][li]) for it in items]
                for li in range(L)]
    mo = mods.ModelOutput(
        pred_class=aux_class[-1],
        pred_mask=aux_mask[-1],
        aux_class=aux_class,
        aux_mask=aux_mask,
    )
    targets = [
        mods.ItemTargets(
            labels=torch.as_tensor(it["gt_labels"]),
            masks=torch.as_tensor(it["gt_masks"]),
        )
        for it in items
    ]
    losses = crit.forward(mo, targets)
    raw = {k: float(v) for k, v in losses.items()}
    wd = _weight_dict()
    total = sum(raw[k] * wd[k] for k in raw if k in wd)
    return raw, total


def _our_losses(items, n_cap, i_cap):
    bs = len(items)
    aux_c = np.zeros((L, bs, Q, C1), np.float32)
    aux_m = np.zeros((L, bs, n_cap, Q), np.float32)
    labels = np.zeros((bs, i_cap), np.int32)
    masks = np.zeros((bs, i_cap, n_cap), bool)
    valid = np.zeros((bs, i_cap), bool)
    point_valid = np.zeros((bs, n_cap), bool)
    for b, it in enumerate(items):
        n, i = it["msk"].shape[1], it["gt_masks"].shape[0]
        aux_c[:, b] = it["cls"]
        aux_m[:, b, :n] = it["msk"]
        # padded mask logits get an arbitrary junk value: they must not
        # contribute (point_valid masks them everywhere)
        aux_m[:, b, n:] = 37.0
        labels[b, :i] = it["gt_labels"]
        masks[b, :i, :n] = it["gt_masks"]
        valid[b, :i] = True
        point_valid[b, :n] = True
    crit = SetCriterion(
        num_classes=1, cost_class=2.0, cost_mask=5.0, cost_dice=2.0,
        eos_coef=0.1, lsap_method="device",
    )
    out = Mask3DOutput(
        aux_pred_class=jnp.asarray(aux_c),
        aux_pred_masks=jnp.asarray(aux_m),
        sampled_coords=None,
        backbone_feats=None,
    )
    tgt = Targets(
        labels=jnp.asarray(labels),
        masks=jnp.asarray(masks),
        valid=jnp.asarray(valid),
        point_instance_ids=jnp.zeros((bs, n_cap), jnp.int32),
    )
    losses = crit(out, tgt, jnp.asarray(point_valid))
    return {k: float(v) for k, v in losses.items()}


def _fuzz_items(rng, bs):
    items = []
    for _ in range(bs):
        n = int(rng.integers(30, 200))
        # >= 1 gt instance per item, each non-empty: the reference's
        # per-item num_masks normalizer (criterion.py:188) divides by the
        # item's gt count, so a zero-gt item makes the REFERENCE loss NaN
        # (0/0; its own per-step non-NaN assert would fire). The datasets
        # guarantee >= 1 room per scene; test_criterion_differential_empty_gt
        # pins the divergent zero-gt behavior explicitly.
        n_gt = int(rng.integers(1, 6))
        gt_masks = np.zeros((n_gt, n), bool)
        for g in range(n_gt):
            gt_masks[g] = rng.random(n) < rng.uniform(0.05, 0.5)
            gt_masks[g, int(rng.integers(n))] = True
        items.append(
            dict(
                cls=rng.normal(0, 2, size=(L, Q, C1)).astype(np.float32),
                msk=rng.normal(0, 3, size=(L, n, Q)).astype(np.float32),
                gt_masks=gt_masks,
                gt_labels=np.zeros(n_gt, np.int64),  # class idx 0 = room
            )
        )
    return items


def test_criterion_differential_fuzz(ref_loss_mods):
    rng = np.random.default_rng(20260819)
    for trial in range(25):
        bs = int(rng.integers(1, 4))
        items = _fuzz_items(rng, bs)
        ref, ref_total = _ref_losses(ref_loss_mods, items)
        ours = _our_losses(items, n_cap=256, i_cap=8)
        for k, v in ref.items():
            assert k in ours, (k, sorted(ours))
            np.testing.assert_allclose(
                ours[k], v, rtol=3e-5, atol=3e-6,
                err_msg=f"{k} trial {trial}",
            )
        np.testing.assert_allclose(
            ours["loss"], ref_total, rtol=3e-5, atol=3e-6,
            err_msg=f"total trial {trial}",
        )


def test_criterion_differential_empty_gt(ref_loss_mods):
    """A batch item with zero gt instances: DELIBERATE departure.

    The reference divides the item's summed mask/dice losses by its
    per-item gt count (criterion.py:188 `num_masks = target_mask.shape[0]`
    shadowing), so a [0, N]-shaped gt produces 0/0 = NaN and its own
    per-step non-NaN assert would kill training. The datasets guarantee
    >= 1 room per scene, so the path is unreachable there; we return a
    zero contribution instead (docs/PARITY.md). This test pins BOTH
    behaviors so the divergence stays deliberate.
    """
    rng = np.random.default_rng(3)
    items = _fuzz_items(rng, 2)
    items[0]["gt_masks"] = np.zeros((0, items[0]["msk"].shape[1]), bool)
    items[0]["gt_labels"] = np.zeros(0, np.int64)
    ref, _ = _ref_losses(ref_loss_mods, items)
    ours = _our_losses(items, n_cap=256, i_cap=8)
    assert np.isnan(ref["loss_mask"]) and np.isnan(ref["loss_dice"])
    assert np.isfinite(ours["loss_mask"]) and np.isfinite(ours["loss_dice"])
    assert np.isfinite(ours["loss"])
    # CE is a batch-level mean and stays well-defined in both.
    np.testing.assert_allclose(ours["loss_ce"], ref["loss_ce"],
                               rtol=3e-5, atol=3e-6)
