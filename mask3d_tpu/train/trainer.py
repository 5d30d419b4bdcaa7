"""Training/evaluation orchestration: the reference LightningModule + Trainer
rebuilt as one explicit loop.

Reference: `mask3d/trainer/trainer.py:101-606` (InstanceSegmentation) +
`main_instance_segmentation.py:31-98` (trainer construction, auto-resume).

Structure per epoch (reference semantics):
- train epoch: jitted train_step per batch; losses logged with epoch means
- val epoch every `check_val_every_n_epoch`: jitted eval forward, host-side
  post-processing (softmax/dbscan/topk/filter) + evaluator metrics
- `last-epoch.ckpt` every epoch, best-metric checkpoints on val mAP50/mAP
  (reference RegularCheckpointing + ModelCheckpoint callbacks)

Host/device pipelining: batches are collated in a background thread and
transferred while the device runs the previous step (the reference uses 32
DataLoader workers, `conf/data/indoor.yaml:20`).
"""

from __future__ import annotations

import logging
import os
import queue
import threading
import time
from collections import deque
from typing import Dict, Iterable, List, Optional

import numpy as np

import jax

from mask3d_tpu.config import Config, flatten_dict, to_dict
from mask3d_tpu.data.batch import HostBatch
from mask3d_tpu.data.collate import VoxelizeCollate
from mask3d_tpu.data.datasets import DATASETS
from mask3d_tpu.evalm import Mask3DEvaluator
from mask3d_tpu.train import checkpoint as ckpt
from mask3d_tpu.train.logging_utils import MetricLogger
from mask3d_tpu.train.loop import (
    init_state,
    make_eval_step,
    make_train_step,
)
from mask3d_tpu.train.postprocess import postprocess_item
from mask3d_tpu.train.export import (
    export_las_prediction_and_gt,
    export_prediction_generic,
)
from mask3d_tpu.utils import meter

logger = logging.getLogger(__name__)


def _prefetch(iterable: Iterable, depth: int = 2):
    """Background-thread prefetcher (the DataLoader-workers equivalent)."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _DONE = object()

    def worker():
        try:
            for x in iterable:
                q.put(x)
        finally:
            q.put(_DONE)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        x = q.get()
        if x is _DONE:
            break
        yield x


class InstanceSegmentationTrainer:
    def __init__(self, cfg: Config, datasets: Optional[dict] = None):
        self.cfg = cfg
        if cfg.trainer.debug_nans:
            jax.config.update("jax_debug_nans", True)
        # Multi-host: this process's identity for input sharding and the
        # process-0 writer guard (checkpoints, metrics, config snapshot).
        # No-op (True) at process_count()==1.
        from mask3d_tpu.parallel import dist as _dist

        self.is_main = _dist.is_main_process()
        self.run_dir = os.path.join(
            cfg.general.save_dir,
            cfg.general.experiment_name,
            cfg.general.experiment_id or time.strftime("%Y-%m-%d_%H-%M-%S"),
        )
        if self.is_main:
            os.makedirs(self.run_dir, exist_ok=True)
            # Persist the composed config so runs reproduce from their
            # artifacts alone (reference: Hydra snapshot under
            # saved/<exp>/<id>/hydra/, main_instance_segmentation.py:76-84).
            from mask3d_tpu.config import to_yaml

            to_yaml(cfg, os.path.join(self.run_dir, "config.yaml"))

        # --- datasets (reference prepare_data, trainer.py:578-582) ---
        if datasets is not None:
            self.datasets = datasets
        else:
            ds_cls = DATASETS[cfg.data.dataset]
            common = dict(
                data_root=cfg.data.data_root,
                rasterization_factor=cfg.data.rasterization_factor,
                valid_scenes_file_path=cfg.data.valid_scenes_file_path,
                prediction_label_offset=cfg.data.prediction_label_offset,
                filter_out_classes=cfg.data.filter_out_classes,
                filter_out_instance_ids=cfg.data.filter_out_instance_ids,
            )
            if cfg.data.dataset != "structured3d":
                common.pop("valid_scenes_file_path")
            self.datasets = {
                "train": ds_cls(
                    mode=cfg.data.train_dataset_mode,
                    volume_augmentations=cfg.data.volume_augmentations,
                    data_fraction=cfg.data.data_fraction,
                    **common,
                ),
                "validation": ds_cls(
                    mode=cfg.data.validation_dataset_mode, **common
                ),
                "test": ds_cls(mode=cfg.data.test_dataset_mode, **common),
            }

        self.collate = VoxelizeCollate(
            filter_out_classes=cfg.data.filter_out_classes,
            filter_out_instance_ids=cfg.data.filter_out_instance_ids,
            prediction_label_offset=cfg.data.prediction_label_offset,
            point_bucket_multiple=cfg.data.point_bucket_multiple,
            instance_bucket_multiple=cfg.data.instance_bucket_multiple,
            num_queries=cfg.model.num_queries,
            min_grid_dims=cfg.data.min_grid_dims,
            grid_dims_cap=cfg.data.grid_dims_cap,
        )

        # --- model/opt state on an example batch ---
        example_items = [self.datasets["train"][0]]
        example = self.collate(example_items).device
        self.state, self.model, self.criterion, self.tx = init_state(
            cfg, example
        )
        self.train_step = make_train_step(
            cfg, self.model, self.criterion, self.tx
        )
        self.eval_step = make_eval_step(cfg, self.model, self.criterion)

        # data-parallel mesh (after jax.distributed.initialize this spans
        # all hosts: jax.devices() is the global list)
        self.mesh = None
        if cfg.trainer.num_data_parallel > 1:
            from mask3d_tpu.parallel import make_mesh, replicate

            self.mesh = make_mesh(cfg.trainer.num_data_parallel)
            self.state = replicate(self.state, self.mesh)

        self.evaluator = Mask3DEvaluator(
            debug_best_worst_scenes=cfg.general.debug_best_worst_scenes,
            debug_mean_average_precision=cfg.general.debug_mean_average_precision,
        )
        self.ckpt_mgr = ckpt.CheckpointManager(self.run_dir)
        self.metrics = MetricLogger(
            self.run_dir, hyperparams=flatten_dict(to_dict(cfg)),
            write_files=self.is_main,
        )
        self.epoch = 0
        self._rng = np.random.default_rng(cfg.general.seed)

        # --- checkpoint surgery (reference main:55-60) ---
        if cfg.general.checkpoint:
            self.state = self.state.replace(
                params=ckpt.load_params_tolerant(
                    cfg.general.checkpoint, self.state.params
                )
            )
        elif cfg.general.backbone_checkpoint:
            self.state = self.state.replace(
                params=ckpt.load_backbone_tolerant(
                    cfg.general.backbone_checkpoint, self.state.params
                )
            )

    # ------------------------------------------------------------------ #

    def _batches(self, split: str, batch_size: int, shuffle: bool):
        """Epoch batches. Multi-host: every process draws the SAME global
        permutation (the rng is config-seeded identically everywhere) and
        collates only its own contiguous slice of each global batch
        (parallel/dist.py::local_batch_indices — the union over hosts is
        exactly the global order, no duplication; arithmetic unit-tested
        in tests/test_distributed.py)."""
        from mask3d_tpu.parallel import dist

        ds = self.datasets[split]
        order = np.arange(len(ds))
        if shuffle:
            self._rng.shuffle(order)
        pc = dist.process_count()
        for rep in range(self.cfg.general.reps_per_epoch if shuffle else 1):
            for s in range(0, len(order), batch_size):
                idxs = order[s:s + batch_size]
                if pc > 1 and shuffle and len(idxs) % pc == 0:
                    idxs = dist.local_batch_indices(idxs)
                yield self.collate([ds[int(i)] for i in idxs])

    def _to_device(self, host: HostBatch):
        if self.mesh is not None:
            from mask3d_tpu.parallel import dist

            return dist.put_global(host.device, self.mesh)
        return jax.device_put(host.device)

    # ------------------------------------------------------------------ #

    def _postprocess_batch(self, host, pred_class, pred_masks,
                           measure: bool = False):
        """Host post-processing fan-out + target extraction for one batch:
        returns (pred_dicts, target_dicts) ready for the evaluator."""
        cfg = self.cfg
        counts = np.asarray(host.device.counts)
        n_items = len(host.scenes)

        def _post(b, measure=False):
            n = counts[b]
            return postprocess_item(
                pred_class[b],
                pred_masks[b, :n],
                host.raw_coords[b, :n],
                host.scenes[b],
                use_dbscan=cfg.general.use_dbscan,
                dbscan_eps=cfg.general.dbscan_eps,
                dbscan_min_points=cfg.general.dbscan_min_points,
                filter_out_instances=cfg.general.filter_out_instances,
                scores_threshold=cfg.general.scores_threshold,
                iou_threshold=cfg.general.iou_threshold,
                topk_per_image=cfg.general.topk_per_image,
                measure=measure,
            )

        # Per-item post-processing in a thread pool (the reference uses
        # a spawn multiprocessing pool for DBSCAN, trainer.py:447-455;
        # sklearn's DBSCAN releases the GIL in its C core). Sequential
        # (batch-size-1) runs record the reference's per-stage eval
        # segments (the reference also measures at test_batch_size=1).
        if n_items > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(n_items, 8)) as ex:
                preds = list(ex.map(_post, range(n_items)))
        else:
            preds = [_post(0, measure=measure)]
        targets = []
        for b in range(n_items):
            n = counts[b]
            tv = np.asarray(host.device.target.valid[b])
            targets.append(
                {
                    "labels": np.asarray(host.device.target.labels[b])[tv],
                    "masks": np.asarray(
                        host.device.target.masks[b]
                    )[tv][:, :n],
                }
            )
        return preds, targets

    def _check_step(self, step: int, losses, scenes, counts) -> None:
        """Per-step guards, evaluated at a small lag so the scalar fetch
        does not stall the dispatch pipeline.

        - Non-finite loss: dump the offending batch's composition and
          raise (reference asserts non-NaN on EVERY training step,
          `trainer.py:204` get_loss_sum; dump protocol `trainer.py:224-232`).
        - Capacity overflow: the jitted step already skipped the optimizer
          update (`train/loop.py`); log the composition so the operator can
          widen `data.level_cap_ratios` / bucket sizes.
        """
        loss_val = float(losses["loss"])
        if int(losses.get("batch_overflow", 0)) > 0:
            logger.warning(
                "level-capacity overflow at step %d — optimizer update "
                "skipped (reference SinglePointRuntimeError protocol): "
                "scenes=%s point_counts=%s; widen data.level_cap_ratios "
                "or the point bucket.",
                step, list(scenes), counts.tolist(),
            )
        if not np.isfinite(loss_val):
            logger.error(
                "non-finite train loss at step %d: scenes=%s "
                "point_counts=%s",
                step, list(scenes), counts.tolist(),
            )
            raise FloatingPointError(
                f"non-finite train loss at step {step} "
                f"(scenes={list(scenes)})"
            )

    def train_epoch(self) -> Dict[str, float]:
        cfg = self.cfg
        prof_dir = os.path.join(self.run_dir, "profile")
        # (step, losses, scenes, counts) awaiting the lagged guard check.
        pending: deque = deque()
        check_lag = 2
        for host in _prefetch(
            self._batches("train", cfg.data.batch_size, shuffle=True)
        ):
            step_now = int(self.state.step)
            if cfg.trainer.profile_steps and step_now == cfg.trainer.profile_start:
                jax.profiler.start_trace(prof_dir)
            meter.notify_start_item()
            batch = self._to_device(host)
            meter.add_timing("data_preparation")
            self.state, losses, preds = self.train_step(self.state, batch)
            if (
                cfg.trainer.profile_steps
                and step_now
                == cfg.trainer.profile_start + cfg.trainer.profile_steps
            ):
                jax.block_until_ready(losses["loss"])
                jax.profiler.stop_trace()
                logger.info(f"profiler trace written to {prof_dir}")
            step = step_now + 1
            pending.append(
                (step, losses, host.scenes, np.asarray(host.device.counts))
            )
            while len(pending) > check_lag:
                self._check_step(*pending.popleft())
            if cfg.trainer.train_split_metrics and preds is not None:
                # Evaluator metrics on the train forward's predictions,
                # every step (reference trainer.py:289 — the eval step runs
                # in all splits, aggregated per epoch via log_dict).
                pd, tg = self._postprocess_batch(
                    host, np.asarray(preds[0]), np.asarray(preds[1])
                )
                m = self.evaluator.evaluate(pd, tg, "train")
                m.pop("train_classes", None)
                self.metrics.log_step(
                    {k: float(v) for k, v in m.items()}, step
                )
            if step % cfg.trainer.log_every_n_steps == 0:
                host_losses = {
                    f"train_{k}": float(v) for k, v in losses.items()
                }
                meter.add_timing("model_forward_complete")
                meter.add_timing("logging_prep")
                self.metrics.log_step(host_losses, step)
                meter.add_timing("logging")
            meter.notify_end_item()
        while pending:
            self._check_step(*pending.popleft())
        return self.metrics.log_epoch(self.epoch, int(self.state.step))

    def eval_epoch(self, split: str, export: bool = False
                   ) -> Dict[str, float]:
        cfg = self.cfg
        # Reference log prefixes: train/val/test (`trainer.py:251-261`).
        prefix = {"validation": "val"}.get(split, split)
        self.evaluator.notify_new_epoch()
        bs = (
            cfg.data.test_batch_size
            if cfg.data.test_batch_size > 0
            else cfg.data.batch_size
        )
        all_metrics: List[dict] = []
        loss_acc: Dict[str, list] = {}
        for host in _prefetch(self._batches(split, bs, shuffle=False)):
            meter.notify_start_item()
            batch = self._to_device(host)
            meter.add_timing("data_preparation")
            pred_class, pred_masks, losses = self.eval_step(self.state, batch)
            pred_class = np.asarray(pred_class)
            pred_masks = np.asarray(pred_masks)
            meter.add_timing("model_forward_complete")
            for k, v in losses.items():
                loss_acc.setdefault(f"{prefix}_{k}", []).append(float(v))
            meter.add_timing("loss_calculation")
            if loss_acc.get(f"{prefix}_batch_overflow", [0.0])[-1] > 0:
                # Dense-path predictions built on clamped pyramid levels
                # are silently degraded (coarse occupancy marks cells whose
                # rows were dropped): make it loud.
                logger.warning(
                    "level-capacity overflow in %s batch (scenes=%s): "
                    "metrics for this batch are unreliable; widen "
                    "data.level_cap_ratios.",
                    split, list(host.scenes),
                )

            counts = np.asarray(host.device.counts)
            preds, targets = self._postprocess_batch(
                host, pred_class, pred_masks, measure=True
            )
            meter.add_timing("eval_postprocess")
            m = self.evaluator.evaluate(preds, targets, prefix)
            m.pop(f"{prefix}_classes", None)
            all_metrics.append(m)
            meter.add_timing("eval_metrics_calc")

            if export and (cfg.general.export_las or cfg.general.export):
                base = os.path.join(
                    self.run_dir, f"epoch_{self.epoch}", f"{split}_preds"
                )
                os.makedirs(base, exist_ok=True)
                for b in range(len(host.scenes)):
                    n = counts[b]
                    if cfg.general.export_las:
                        export_las_prediction_and_gt(
                            host.raw_coords[b, :n],
                            host.raw_feats[b, :n],
                            targets[b]["labels"],
                            targets[b]["masks"],
                            preds[b]["pred_masks"],
                            preds[b]["pred_classes"],
                            preds[b]["pred_scores"],
                            os.path.join(base, f"{host.scenes[b]}.las"),
                        )
                    if cfg.general.export:
                        export_prediction_generic(
                            base,
                            host.scenes[b],
                            preds[b]["pred_masks"],
                            preds[b]["pred_scores"],
                            preds[b]["pred_classes"],
                            cfg.general.generic_export_score_threshold,
                        )
                meter.add_timing("eval_export")
            meter.notify_end_item()

        epoch_means = {
            k: float(np.mean(v)) for k, v in loss_acc.items()
        }
        metric_keys = all_metrics[0].keys() if all_metrics else []
        for k in metric_keys:
            vals = [m[k] for m in all_metrics if np.isfinite(m[k])]
            epoch_means[k] = float(np.mean(vals)) if vals else float("nan")
        return epoch_means

    # ------------------------------------------------------------------ #

    def fit(self):
        cfg = self.cfg
        resume = self.ckpt_mgr.resume_path()
        if resume:
            logger.info(f"auto-resuming from {resume}")
            self.state, meta = ckpt.load_checkpoint(resume, self.state)
            self.epoch = int(meta.get("epoch", 0)) + 1

        # With save_last_every_n_epochs>1 an interrupted run would lose up
        # to N-1 epochs of optimizer/RNG progress (ADVICE r3): catch
        # SIGTERM/KeyboardInterrupt and write last-epoch.ckpt before
        # exiting, so auto-resume replays at most the interrupted epoch.
        import signal

        def _sigterm(_signum, _frame):
            raise KeyboardInterrupt

        try:
            prev_handler = signal.signal(signal.SIGTERM, _sigterm)
        except ValueError:  # not the main thread (tests)
            prev_handler = None
        try:
            self._fit_loop()
        except KeyboardInterrupt:
            if self.is_main and self.epoch > 0:
                logger.warning(
                    "interrupted — saving last-epoch.ckpt at epoch %d",
                    self.epoch - 1,
                )
                self.ckpt_mgr.save_last(self.state, self.epoch - 1, {})
            raise
        finally:
            if prev_handler is not None:
                signal.signal(signal.SIGTERM, prev_handler)

    def _fit_loop(self):
        cfg = self.cfg
        while self.epoch < cfg.trainer.max_epochs:
            t0 = time.time()
            train_metrics = self.train_epoch()
            val_metrics = {}
            if (self.epoch + 1) % cfg.trainer.check_val_every_n_epoch == 0:
                val_metrics = self.eval_epoch(
                    "validation",
                    export=cfg.general.export_las
                    and (self.epoch + 1) % cfg.general.export_freq == 0,
                )
                self.metrics.log_epoch(
                    self.epoch, int(self.state.step), extra=val_metrics
                )
            if self.is_main and (
                (self.epoch + 1) % cfg.trainer.save_last_every_n_epochs == 0
                or self.epoch + 1 == cfg.trainer.max_epochs
            ):
                self.ckpt_mgr.save_last(self.state, self.epoch, val_metrics)
            if self.is_main:
                self.ckpt_mgr.maybe_save_best(
                    self.state, self.epoch, val_metrics
                )
            logger.info(
                f"epoch {self.epoch}: "
                f"train_loss={train_metrics.get('train_loss', float('nan')):.4f} "
                f"val_mAP50={val_metrics.get('val_mean_ap_50', float('nan')):.4f} "
                f"({time.time() - t0:.1f}s)"
            )
            self.epoch += 1
        self.metrics.close()

    def test(self) -> Dict[str, float]:
        meter.reset()
        if self.cfg.trainer.measure_model_phases:
            # model_forward_* sub-phase segments (prefix-difference timing,
            # see train/loop.py::measure_model_phases) on one test batch.
            from mask3d_tpu.train.loop import measure_model_phases

            bs = (
                self.cfg.data.test_batch_size
                if self.cfg.data.test_batch_size > 0
                else self.cfg.data.batch_size
            )
            host = next(iter(self._batches("test", bs, shuffle=False)))
            measure_model_phases(
                self.cfg, self.model, self.state, self._to_device(host)
            )
        metrics = self.eval_epoch("test", export=True)
        meter.log_final_statistics()
        if self.cfg.general.debug_best_worst_scenes:
            hi, lo = self.evaluator.get_highest_lowest_metric_scenes(
                "mean_ap", 10
            )
            logger.info("Best scenes:")
            for name, m in hi:
                logger.info(f"   ({name}): {m}")
            logger.info("Worst scenes:")
            for name, m in lo:
                logger.info(f"   ({name}): {m}")
        if self.cfg.general.debug_mean_average_precision:
            logger.info(
                "mAP components: "
                f"{self.evaluator.get_mean_average_precision_components()}"
            )
        return metrics
