"""Differential validation of the eval post-processing pipeline.

Drives the REFERENCE `eval_instance_segmentation_step`
(`/root/reference/mask3d/trainer/trainer.py:416-564`) — the actual
reference code, imported with its torch/lightning/ME dependencies stubbed
and a duck-typed `self` — against our host-side pipeline
(`mask3d_tpu/train/postprocess.py` + `mask3d_tpu/evalm`), fuzzing random
batches end-to-end from raw (pred_class logits, pred_mask logits, coords)
through DBSCAN, scoring, sorting, instance filtering and the evaluator,
asserting exact metric equality.

This is the post-processing counterpart of
tests/test_evaluator_differential.py (VERDICT round-1 item 3) and pins the
reference's quirky-but-load-bearing behaviors:

- the softmax'd class probabilities (ignore class dropped, [Q, 1] for
  room detection) are assigned back into the [Q, 2] logits slot, which
  BROADCASTS the room probability into both columns (`trainer.py:434`);
  `get_mask_and_scores` then topk's over the flattened [Q, 2] duplicated
  scores, emitting the top ceil(Q/2) queries TWICE each;
- the DBSCAN filter multiplies the mask by each cluster's indicator
  SEQUENTIALLY (`trainer.py:86-92`), so a mask whose points form two or
  more clusters is zeroed entirely, and a mask with no cluster at all
  (all noise) is kept unchanged.
"""

import functools
import logging
import sys
import types

import numpy as np
import pytest

from mask3d_tpu.evalm import Mask3DEvaluator
from mask3d_tpu.train.postprocess import postprocess_item

from tests.test_evaluator_differential import (  # noqa: F401 (fixtures)
    SCALAR_KEYS,
    _assert_metrics_equal,
    _stub,
    _torch_targets,
)

REF = "/root/reference/mask3d"


class _SerialPool:
    """Stand-in for multiprocessing.Pool: same math, no processes."""

    def __init__(self, processes=None):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False

    def imap(self, fn, it):
        return map(fn, it)


@pytest.fixture(scope="module")
def ref_trainer_mod():
    torch = pytest.importorskip("torch")

    class _Stru3D:
        DATASET_CLASSES = {1: "is_room"}

    class _LightningModule:
        pass

    class _Callback:
        pass

    class _ItemTargets:
        pass

    class _DataBatch:
        pass

    class _ModelOutput:
        pass

    class _SinglePointRuntimeError(RuntimeError):
        pass

    stubs = {
        "plyfile": _stub("plyfile", PlyData=object, PlyElement=object),
        "laspy": _stub("laspy"),
        "loguru": _stub("loguru", logger=logging.getLogger("loguru")),
        "hydra": _stub("hydra"),
        "MinkowskiEngine": _stub("MinkowskiEngine", SparseTensor=object),
        "pytorch_lightning": _stub(
            "pytorch_lightning",
            LightningModule=_LightningModule,
            Callback=_Callback,
            Trainer=object,
        ),
        "datasets": _stub("datasets"),
        "datasets.semseg_structured3d": _stub(
            "datasets.semseg_structured3d",
            Structured3DSegmentationDataset=_Stru3D,
        ),
        "datasets.utils": _stub(
            "datasets.utils", ItemTargets=_ItemTargets, DataBatch=_DataBatch
        ),
        "models": _stub("models"),
        "models.mask3d": _stub(
            "models.mask3d",
            ModelOutput=_ModelOutput,
            SinglePointRuntimeError=_SinglePointRuntimeError,
        ),
        # NOTE: the real `utils` package is imported from the reference
        # (the evaluator needs utils.utils.get_pointwise_from_maskwise_*);
        # measure_runtime is patched on the trainer module after import.
    }
    saved = {k: sys.modules.get(k) for k in stubs}
    # benchmark.evaluate_semantic_instance must also resolve; drop any
    # cached copy so it re-imports under the stubs above.
    for k in ("benchmark", "benchmark.evaluate_semantic_instance",
              "trainer", "trainer.trainer", "utils", "utils.utils",
              "utils.measure_runtime"):
        saved.setdefault(k, sys.modules.get(k))
        sys.modules.pop(k, None)
    sys.modules.update(stubs)
    sys.path.insert(0, REF)
    try:
        import importlib

        mod = importlib.import_module("trainer.trainer")
        # The eval step spawns a process pool per batch for DBSCAN; the
        # math is what's under test, not the pool.
        mod.multiprocessing = types.SimpleNamespace(
            set_start_method=lambda *a, **k: None, Pool=_SerialPool
        )
        # measure_runtime asserts a notify_start_item() protocol the eval
        # loop normally drives; timings are not under test here.
        mod.measure_runtime = types.SimpleNamespace(
            add_timing=lambda *a, **k: None
        )
        yield mod
    finally:
        sys.path.remove(REF)
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


GENERAL = dict(
    use_dbscan=True,
    dbscan_eps=2.5,
    dbscan_min_points=3,
    topk_per_image=-1,
    filter_out_instances=True,
    scores_threshold=0.8,
    iou_threshold=1.0,
    export_las=False,
    export=False,
    export_freq=10**9,
)


def _duck_self(mod, evaluator):
    import torch

    cls = mod.InstanceSegmentation
    duck = types.SimpleNamespace(
        config=types.SimpleNamespace(
            general=types.SimpleNamespace(**GENERAL)
        ),
        device=torch.device("cpu"),
        current_epoch=0,
        model=types.SimpleNamespace(num_classes=1),
        evaluator=evaluator,
    )

    def remap(output):
        # Structured3DSegmentationDataset.change_semantic_label_idxs_to_ids
        # (semseg_structured3d.py:260-268) over DATASET_CLASSES {1: room}.
        out = output.clone()
        out[output == 0] = 1
        return out

    duck.validation_dataset = types.SimpleNamespace(
        change_semantic_label_idxs_to_ids=remap
    )
    duck.get_mask_and_scores = functools.partial(
        cls.get_mask_and_scores, duck
    )
    duck.sort_predictions_by_score = functools.partial(
        cls.sort_predictions_by_score, duck
    )
    return duck


def _chain(obj):
    obj.detach = lambda: obj
    obj.to = lambda dev: obj
    return obj


def _fuzz_batch(rng, bi, bs, q=9):
    """Raw model-output-shaped batch: logits + clustered coordinates."""
    items = []
    for ii in range(bs):
        n = int(rng.integers(50, 260))
        # clustered coords so DBSCAN(eps=2.5) forms 1-3 clusters per mask
        n_blobs = int(rng.integers(1, 5))
        centers = rng.uniform(0, 60, size=(n_blobs, 3))
        which = rng.integers(0, n_blobs, size=n)
        coords = centers[which] + rng.normal(0, 0.9, size=(n, 3))
        pred_class = rng.normal(0, 2.0, size=(q, 2)).astype(np.float32)
        pred_mask = rng.normal(-1.0, 2.5, size=(n, q)).astype(np.float32)
        # bias some masks toward whole blobs (realistic instance shape)
        for j in range(q):
            if rng.random() < 0.7:
                blob = int(rng.integers(0, n_blobs))
                pred_mask[which == blob, j] += rng.uniform(1.5, 4.0)
        # ground truth: each blob is a room instance
        gt_masks = np.stack([which == b for b in range(n_blobs)])
        keep = gt_masks.sum(1) > 0
        gt_masks = gt_masks[keep]
        items.append(
            dict(
                scene=f"scene_{bi}_{ii}",
                coords=coords.astype(np.float32),
                pred_class=pred_class,
                pred_mask=pred_mask,
                gt_masks=gt_masks,
                gt_labels=np.ones(gt_masks.shape[0], np.int64),
            )
        )
    return items


def _ref_metrics(mod, items, prefix="val"):
    import torch

    ref_ev_cls = sys.modules[
        "benchmark.evaluate_semantic_instance"
    ].Mask3DEvaluator
    duck = _duck_self(mod, ref_ev_cls(False, False))
    targets = _torch_targets(
        [{"labels": it["gt_labels"], "masks": it["gt_masks"]}
         for it in items]
    )
    input_batch = _chain(
        types.SimpleNamespace(
            raw_coordinates=[
                torch.as_tensor(it["coords"]) for it in items
            ],
            scenes=[it["scene"] for it in items],
            target=targets,
        )
    )
    model_output = _chain(
        types.SimpleNamespace(
            pred_class=torch.as_tensor(
                np.stack([it["pred_class"] for it in items])
            ),
            pred_mask=[torch.as_tensor(it["pred_mask"]) for it in items],
        )
    )
    return mod.InstanceSegmentation.eval_instance_segmentation_step(
        duck, input_batch, model_output, prefix,
        duck.validation_dataset,
    )


def _our_metrics(items, prefix="val"):
    preds = [
        postprocess_item(
            it["pred_class"],
            it["pred_mask"],
            it["coords"],
            it["scene"],
            use_dbscan=GENERAL["use_dbscan"],
            dbscan_eps=GENERAL["dbscan_eps"],
            dbscan_min_points=GENERAL["dbscan_min_points"],
            filter_out_instances=GENERAL["filter_out_instances"],
            scores_threshold=GENERAL["scores_threshold"],
            iou_threshold=GENERAL["iou_threshold"],
            topk_per_image=GENERAL["topk_per_image"],
        )
        for it in items
    ]
    targets = [
        {"labels": it["gt_labels"], "masks": it["gt_masks"]}
        for it in items
    ]
    return Mask3DEvaluator().evaluate(preds, targets, prefix)


def test_postprocess_differential_fuzz(ref_trainer_mod):
    rng = np.random.default_rng(20260818)
    for bi in range(40):
        bs = int(rng.integers(1, 4))
        items = _fuzz_batch(rng, bi, bs)
        ref = _ref_metrics(ref_trainer_mod, items)
        ours = _our_metrics(items)
        _assert_metrics_equal(ours, ref, "val", f"batch {bi}")


def test_postprocess_differential_no_dbscan_no_filter(ref_trainer_mod):
    rng = np.random.default_rng(7)
    overrides = dict(use_dbscan=False, filter_out_instances=False)
    saved = {k: GENERAL[k] for k in overrides}
    GENERAL.update(overrides)
    try:
        for bi in range(15):
            items = _fuzz_batch(rng, 100 + bi, int(rng.integers(1, 3)))
            ref = _ref_metrics(ref_trainer_mod, items)
            ours = _our_metrics(items)
            _assert_metrics_equal(ours, ref, "val", f"plain batch {bi}")
    finally:
        GENERAL.update(saved)


def test_postprocess_differential_topk(ref_trainer_mod):
    """topk_per_image cutting mid-duplicate-pair (odd k): torch.topk and
    our stable argsort break the tie differently, but the picked entries
    are indistinguishable (same mask, score, remapped label) so metrics
    must still match exactly."""
    rng = np.random.default_rng(99)
    overrides = dict(use_dbscan=False, topk_per_image=7)
    saved = {k: GENERAL[k] for k in overrides}
    GENERAL.update(overrides)
    try:
        for bi in range(10):
            items = _fuzz_batch(rng, 200 + bi, int(rng.integers(1, 3)))
            ref = _ref_metrics(ref_trainer_mod, items)
            ours = _our_metrics(items)
            _assert_metrics_equal(ours, ref, "val", f"topk batch {bi}")
    finally:
        GENERAL.update(saved)
