"""RoomFormer training/evaluation engine (R1/R2).

Rebuild of `RoomFormer/main.py:20-116` (train entry), `eval.py:19-100` and
`engine.py:35-459`: epoch loops over density-map batches, polygon extraction
from corner logits, floorplan metrics, and the Mask3D-metric bridge for the
apples-to-apples comparison (`engine.py:381-385`).

CLI:
    python -m mask3d_tpu.baseline.engine train --data_root ... [opts]
    python -m mask3d_tpu.baseline.engine eval  --data_root ... --checkpoint ...
"""

from __future__ import annotations

import logging
import os
import time
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

from mask3d_tpu.baseline.criterion2d import RoomFormerCriterion
from mask3d_tpu.baseline.density_dataset import (
    FloorplanDataset,
    collate_floorplan,
)
from mask3d_tpu.baseline.floorplan_eval import FloorplanEvaluator
from mask3d_tpu.baseline.poly_ops import extract_room_polygons
from mask3d_tpu.baseline.roomformer import RoomFormer
from mask3d_tpu.train import checkpoint as ckpt

logger = logging.getLogger(__name__)


class FloorplanTrainer:
    def __init__(
        self,
        data_root: str,
        save_dir: str = "saved/roomformer",
        lr: float = 2e-4,
        batch_size: int = 8,
        num_polys: int = 20,
        num_queries: int = 800,
        d_model: int = 256,
        enc_layers: int = 6,
        dec_layers: int = 6,
        max_epochs: int = 300,
        seed: int = 1,
        use_raster_loss: bool = True,
        datasets: Optional[dict] = None,
        valid_scenes_file_path: Optional[str] = None,
    ):
        self.save_dir = save_dir
        os.makedirs(save_dir, exist_ok=True)
        self.batch_size = batch_size
        self.num_polys = num_polys
        self.max_epochs = max_epochs
        qp = num_queries // num_polys
        # valid_scenes_file_path filters eval scenes like the reference's
        # `--valid_scenes_file_path` (RoomFormer/eval.py:92-97).
        self.datasets = datasets or {
            mode: FloorplanDataset(
                data_root, mode, num_queries_per_poly=qp,
                max_polys=num_polys,
                valid_scenes_file_path=valid_scenes_file_path,
            )
            for mode in ("train", "validation", "test")
        }
        self.model = RoomFormer(
            d_model=d_model, enc_layers=enc_layers, dec_layers=dec_layers,
            num_polys=num_polys, num_queries=num_queries,
        )
        self.criterion = RoomFormerCriterion(use_raster=use_raster_loss)
        self.tx = optax.adamw(lr, weight_decay=1e-4)
        example = collate_floorplan([self.datasets["train"][0]], num_polys)
        self.params = jax.jit(self.model.init)(
            jax.random.PRNGKey(seed), jnp.asarray(example["density"])
        )
        self.opt_state = self.tx.init(self.params)
        self._rng = np.random.default_rng(seed)
        self.ckpt_mgr = ckpt.CheckpointManager(
            save_dir, best_metrics=("room_f1",)
        )
        self.epoch = 0

        model, criterion, tx = self.model, self.criterion, self.tx

        @jax.jit
        def train_step(params, opt_state, density, targets):
            def loss_fn(p):
                out = model.apply(p, density)
                losses = criterion(out, targets)
                return losses["loss"], losses

            grads, losses = jax.grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, losses

        @jax.jit
        def infer(params, density):
            out = model.apply(params, density)
            return jax.nn.sigmoid(out.pred_logits), out.pred_coords

        self._train_step = train_step
        self._infer = infer

    def _batches(self, split, shuffle):
        ds = self.datasets[split]
        order = np.arange(len(ds))
        if shuffle:
            self._rng.shuffle(order)
        for s in range(0, len(order), self.batch_size):
            items = [ds[int(i)] for i in order[s:s + self.batch_size]]
            yield collate_floorplan(items, self.num_polys)

    def fit(self):
        for self.epoch in range(self.epoch, self.max_epochs):
            t0 = time.time()
            losses = {}
            for batch in self._batches("train", shuffle=True):
                targets = {
                    k: jnp.asarray(v) for k, v in batch["targets"].items()
                }
                self.params, self.opt_state, losses = self._train_step(
                    self.params, self.opt_state,
                    jnp.asarray(batch["density"]), targets,
                )
            metrics = self.evaluate("validation")
            self.ckpt_mgr.save_last(
                (self.params, self.opt_state), self.epoch, metrics
            )
            self.ckpt_mgr.maybe_save_best(
                (self.params, self.opt_state), self.epoch, metrics
            )
            logger.info(
                f"epoch {self.epoch}: loss={float(losses.get('loss', np.nan)):.3f} "
                f"room_f1={metrics['room_f1']:.3f} ({time.time()-t0:.0f}s)"
            )

    def evaluate(self, split: str = "test",
                 mask3d_bridge: bool = False,
                 export_las_dir: Optional[str] = None) -> dict:
        """Floorplan metrics; optionally also score with the Mask3D
        evaluator via the polygon->mask bridge (reference engine.py:381-385).

        `export_las_dir` writes one gt+prediction `.las` per scene like the
        reference's `--export_las` path (RoomFormer/engine.py:391-404 ->
        export_gt_and_prediction_las); requires `mask3d_bridge`.
        """
        ev = FloorplanEvaluator()
        bridge_metrics = []
        if export_las_dir and not mask3d_bridge:
            raise ValueError("export_las_dir requires mask3d_bridge=True")
        for batch in self._batches(split, shuffle=False):
            probs, coords = self._infer(
                self.params, jnp.asarray(batch["density"])
            )
            probs = np.asarray(probs)
            coords = np.asarray(coords)
            for i, scene in enumerate(batch["scenes"]):
                polys = extract_room_polygons(probs[i], coords[i])
                ev.evaluate_scene(polys, batch["gt_polys"][i])
                if mask3d_bridge:
                    from mask3d_tpu.baseline.roomformer_bridge import (
                        evaluate_roomformer_scene,
                    )
                    from mask3d_tpu.evalm import Mask3DEvaluator

                    ds = self.datasets[split].ds3d
                    idx = ds.data.index(scene)
                    item = ds[idx]
                    bridge_metrics.append(
                        evaluate_roomformer_scene(
                            item, polys, Mask3DEvaluator(), "test"
                        )
                    )
                    if export_las_dir:
                        self._export_scene_las(item, polys, export_las_dir)
        out = ev.summarize()
        return self._finalize_metrics(out, bridge_metrics)

    def _export_scene_las(self, item: dict, polys, las_dir: str):
        """One gt+prediction `.las` per scene, reference
        RoomFormer/engine.py:391-404 (export_gt_and_prediction_las)."""
        from mask3d_tpu.baseline.roomformer_bridge import (
            polygons_to_mask3d_prediction,
        )
        from mask3d_tpu.data.collate import build_item_target
        from mask3d_tpu.train.export import export_las_prediction_and_gt

        os.makedirs(las_dir, exist_ok=True)
        labels = np.asarray(item["labels"])
        t_labels, t_masks, _ = build_item_target(
            labels, filter_out_classes=(0, 17, 18, 19, 21),
            filter_out_instance_ids=(-1, 0),
        )
        pred = polygons_to_mask3d_prediction(
            np.asarray(item["coordinates"]), polys, item["scene"]
        )
        masks_gt = (
            np.stack(t_masks) if t_masks
            else np.zeros((0, len(labels)), bool)
        )
        export_las_prediction_and_gt(
            np.asarray(item["coordinates"]),
            np.asarray(item["features"]),
            np.asarray(t_labels, np.int32),
            masks_gt,
            pred["pred_masks"],
            pred["pred_classes"],
            pred["pred_scores"],
            os.path.join(las_dir, f"test_{item['scene']}.las"),
        )

    @staticmethod
    def _finalize_metrics(out: dict, bridge_metrics: list) -> dict:
        if bridge_metrics:
            for k in bridge_metrics[0]:
                if k.endswith("classes"):
                    continue
                vals = [m[k] for m in bridge_metrics if np.isfinite(m[k])]
                out[f"bridge_{k}"] = float(np.mean(vals)) if vals else np.nan
        return out


def main(argv=None):
    import argparse

    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser(description="RoomFormer-TPU engine")
    ap.add_argument("command", choices=["train", "eval"])
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--save_dir", default="saved/roomformer")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--max_epochs", type=int, default=300)
    ap.add_argument("--mask3d_bridge", action="store_true")
    # reference RoomFormer/eval.py:92-97
    ap.add_argument("--valid_scenes_file_path", default=None,
                    help="structured3d valid-scenes filter file")
    ap.add_argument("--export_las", action="store_true",
                    help="write one gt+prediction .las per eval scene "
                         "(implies --mask3d_bridge)")
    ap.add_argument("--las_dir", default="las_export")
    args = ap.parse_args(argv)
    tr = FloorplanTrainer(
        args.data_root, save_dir=args.save_dir,
        batch_size=args.batch_size, max_epochs=args.max_epochs,
        valid_scenes_file_path=args.valid_scenes_file_path,
    )
    if args.checkpoint:
        (tr.params, tr.opt_state), _ = ckpt.load_checkpoint(
            args.checkpoint, (tr.params, tr.opt_state)
        )
    if args.command == "train":
        tr.fit()
    else:
        metrics = tr.evaluate(
            "test",
            mask3d_bridge=args.mask3d_bridge or args.export_las,
            export_las_dir=args.las_dir if args.export_las else None,
        )
        for k, v in sorted(metrics.items()):
            print(f"{k}: {v:.4f}")


if __name__ == "__main__":
    main()
