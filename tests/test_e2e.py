"""End-to-end slice (SURVEY.md §7.2): synthetic scene -> collate -> model ->
loss -> optimizer -> eval -> postprocess -> evaluator metrics.

This mirrors the reference acceptance path: the experiment scripts +
mAP evaluation are its only end-to-end test (SURVEY.md §4.4); here a tiny
model must overfit a fixed batch and produce sane metrics.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mask3d_tpu.config import Config, apply_overrides
from mask3d_tpu.data import VoxelizeCollate, make_synthetic_scene
from mask3d_tpu.evalm import Mask3DEvaluator
from mask3d_tpu.train.loop import (
    init_state,
    make_eval_step,
    make_train_step,
)
from mask3d_tpu.train.postprocess import postprocess_item


def small_config() -> Config:
    cfg = Config()
    apply_overrides(
        cfg,
        [
            "model.hidden_dim=32",
            "model.dim_feedforward=64",
            "model.num_queries=8",
            "model.num_heads=4",
            "model.num_decoders=2",
            "model.backbone=Res16UNet14A",
            "model.conv1_kernel_size=3",
            "model.sample_sizes=[32,64,128,256,512]",
            "data.point_bucket_multiple=512",
            "optimizer.lr=0.002",
            "scheduler.gamma=1.0",
        ],
    )
    return cfg


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(3)
    items = [
        make_synthetic_scene(rng, num_rooms_x=2, num_rooms_y=1,
                             room_size=12, height=6, jitter=0.0, dropout=0.5)
        for _ in range(2)
    ]
    collate = VoxelizeCollate(point_bucket_multiple=512)
    return collate(items)


def test_overfit_and_eval(batch):
    cfg = small_config()
    state, model, criterion, tx = init_state(cfg, batch.device)
    train_step = make_train_step(cfg, model, criterion, tx)

    state, first, _ = train_step(state, batch.device)
    first_loss = float(first["loss"])
    losses = None
    for _ in range(60):
        state, losses, _ = train_step(state, batch.device)
    final_loss = float(losses["loss"])
    assert np.isfinite(final_loss)
    assert final_loss < 0.6 * first_loss, (first_loss, final_loss)

    # Loss dict has the reference's key layout (13->9 aux modules here).
    L = cfg.model.num_decoders * len(cfg.model.hlevels)
    for i in range(L):
        assert f"loss_ce_mask_module_{i}" in losses
    assert "loss_ce" in losses and "loss_mask" in losses

    # ---- eval + postprocess + metrics ----
    eval_step = make_eval_step(cfg, model, criterion)
    pred_class, pred_masks, eval_losses = eval_step(state, batch.device)
    pred_class = np.asarray(pred_class)
    pred_masks = np.asarray(pred_masks)
    counts = np.asarray(batch.device.counts)

    evaluator = Mask3DEvaluator()
    preds, targets = [], []
    for b in range(2):
        n = counts[b]
        preds.append(
            postprocess_item(
                pred_class[b],
                pred_masks[b, :n],
                np.asarray(batch.device.coords[b, :n], np.float32),
                batch.scenes[b],
                use_dbscan=False,
                scores_threshold=0.1,
            )
        )
        tv = np.asarray(batch.device.target.valid[b])
        targets.append(
            {
                "labels": np.asarray(batch.device.target.labels[b])[tv],
                "masks": np.asarray(batch.device.target.masks[b])[tv][:, :n],
            }
        )
    metrics = evaluator.evaluate(preds, targets, "val")
    assert np.isfinite(metrics["val_mean_ap"])
    assert 0.0 <= metrics["val_mean_recall_50"] <= 1.0
    # Overfit on 2 rooms/scene: the model should detect at least some rooms.
    assert metrics["val_mean_ap_25"] > 0.0


def test_train_step_data_parallel(batch):
    """Same batch sharded over 2 devices must produce (nearly) the same loss."""
    from mask3d_tpu.parallel import make_mesh, replicate, shard_batch

    cfg = small_config()
    state, model, criterion, tx = init_state(cfg, batch.device)
    train_step = make_train_step(cfg, model, criterion, tx)

    # replicate BEFORE the single-device step (train_step donates its
    # input state; replicate guarantees owned buffers)
    mesh = make_mesh(2)
    sharded = shard_batch(batch.device, mesh)
    rep_state = replicate(state, mesh)

    _, ref_losses, _p = train_step(state, batch.device)
    _, dp_losses, _p = train_step(rep_state, sharded)
    np.testing.assert_allclose(
        float(dp_losses["loss"]), float(ref_losses["loss"]), rtol=1e-4
    )


def _eval_metrics_for_variants(batch, variants):
    """Train a small model, then eval it under each config-override dict
    in `variants` and return {name: evaluator metrics} (the acceptance
    oracle for numeric-format fast paths)."""
    cfg = small_config()
    state, model, criterion, tx = init_state(cfg, batch.device)
    train_step = make_train_step(cfg, model, criterion, tx)
    for _ in range(50):
        state, _l, _p = train_step(state, batch.device)

    counts = np.asarray(batch.device.counts)
    results = {}
    for name, overrides in variants.items():
        cfg2 = small_config()
        for k, v in overrides.items():
            setattr(cfg2.model, k, v)
        _, model2, criterion2, _ = init_state(cfg2, batch.device)
        eval_step = make_eval_step(cfg2, model2, criterion2)
        pred_class, pred_masks, _ = eval_step(state, batch.device)
        pred_class = np.asarray(pred_class)
        pred_masks = np.asarray(pred_masks)
        preds, targets = [], []
        for b in range(2):
            n = counts[b]
            preds.append(
                postprocess_item(
                    pred_class[b], pred_masks[b, :n],
                    np.asarray(batch.device.coords[b, :n], np.float32),
                    batch.scenes[b], use_dbscan=False, scores_threshold=0.1,
                )
            )
            tv = np.asarray(batch.device.target.valid[b])
            targets.append({
                "labels": np.asarray(batch.device.target.labels[b])[tv],
                "masks": np.asarray(batch.device.target.masks[b])[tv][:, :n],
            })
        results[name] = Mask3DEvaluator().evaluate(preds, targets, "val")
    return results


def test_int8_eval_metrics_match_fp32(batch):
    """`model.int8_stride1` (int8 level-0 stride-1 convs, the flagship
    bench fast path) must not move the evaluator metrics — the acceptance
    gate demanded by VERDICT r2 item 2."""
    results = _eval_metrics_for_variants(batch, {
        "fp32": {},
        "int8": {"int8_stride1": True, "compute_dtype": "bfloat16"},
    })
    for key in ("val_mean_ap", "val_mean_ap_50", "val_mean_ap_25"):
        assert abs(results["fp32"][key] - results["int8"][key]) < 0.15, (
            key, results["fp32"][key], results["int8"][key]
        )


def test_unit_features_forward_identical(batch):
    """`model.unit_features` replaces the dense stem's feature scatter with
    the occupancy grid — exact when features are constant ones (they are:
    the collator builds np.ones features, reference indoor.yaml
    add_colors: false). Forward outputs must match bit-for-bit."""
    outs = {}
    for name, uf in (("scatter", False), ("occ", True)):
        cfg = small_config()
        cfg.model.unit_features = uf
        state, model, criterion, _ = init_state(cfg, batch.device)
        eval_step = make_eval_step(cfg, model, criterion)
        pred_class, pred_masks, _ = eval_step(state, batch.device)
        outs[name] = (np.asarray(pred_class), np.asarray(pred_masks))
    np.testing.assert_array_equal(outs["scatter"][0], outs["occ"][0])
    np.testing.assert_array_equal(outs["scatter"][1], outs["occ"][1])


def test_bf16_eval_metrics_match_fp32(batch):
    """The bench runs inference with `model.compute_dtype=bfloat16` on
    fp32-trained weights; the evaluator (acceptance oracle) must agree with
    the fp32 eval within noise."""
    cfg = small_config()
    state, model, criterion, tx = init_state(cfg, batch.device)
    train_step = make_train_step(cfg, model, criterion, tx)
    for _ in range(50):
        state, _l, _p = train_step(state, batch.device)

    counts = np.asarray(batch.device.counts)
    results = {}
    for dt in ("fp32", "bfloat16"):
        cfg2 = small_config()
        cfg2.model.compute_dtype = None if dt == "fp32" else "bfloat16"
        _, model2, criterion2, _ = init_state(cfg2, batch.device)
        eval_step = make_eval_step(cfg2, model2, criterion2)
        pred_class, pred_masks, _ = eval_step(state, batch.device)
        pred_class = np.asarray(pred_class)
        pred_masks = np.asarray(pred_masks)
        preds, targets = [], []
        for b in range(2):
            n = counts[b]
            preds.append(
                postprocess_item(
                    pred_class[b], pred_masks[b, :n],
                    np.asarray(batch.device.coords[b, :n], np.float32),
                    batch.scenes[b], use_dbscan=False, scores_threshold=0.1,
                )
            )
            tv = np.asarray(batch.device.target.valid[b])
            targets.append({
                "labels": np.asarray(batch.device.target.labels[b])[tv],
                "masks": np.asarray(batch.device.target.masks[b])[tv][:, :n],
            })
        results[dt] = Mask3DEvaluator().evaluate(preds, targets, "val")

    for key in ("val_mean_ap", "val_mean_ap_50", "val_mean_ap_25"):
        assert abs(results["fp32"][key] - results["bfloat16"][key]) < 0.15, (
            key, results["fp32"][key], results["bfloat16"][key]
        )
    assert results["bfloat16"]["val_mean_ap_25"] > 0.0


def test_collate_min_grid_dims_pins_shape():
    """`min_grid_dims` floors the level-0 grid so mixed-size batches share
    one jit shape; outputs are unchanged (grids only pad further)."""
    from mask3d_tpu.data import VoxelizeCollate, make_synthetic_scene

    rng = np.random.default_rng(5)
    small = [make_synthetic_scene(rng, num_rooms_x=1, num_rooms_y=1,
                                  room_size=8, height=5, jitter=0.0,
                                  dropout=0.3) for _ in range(2)]
    big = [make_synthetic_scene(rng, num_rooms_x=2, num_rooms_y=2,
                                room_size=12, height=6, jitter=0.0,
                                dropout=0.3) for _ in range(2)]
    floor = (40, 40, 16)
    coll = VoxelizeCollate(point_bucket_multiple=512, min_grid_dims=floor)
    b_small, b_big = coll(small), coll(big)
    assert b_small.device.grid_dims[0] == floor
    assert b_big.device.grid_dims[0] == floor

    # numerics identical to the unfloored collation of the same items
    cfg = small_config()
    state, model, criterion, tx = init_state(cfg, b_big.device)
    eval_step = make_eval_step(cfg, model, criterion)
    pc1, pm1, _ = eval_step(state, b_big.device)
    b_ref = VoxelizeCollate(point_bucket_multiple=512)(big)
    state2, model2, criterion2, _ = init_state(cfg, b_ref.device, seed=0)
    # same params: re-init deterministic? use the same state params by
    # re-running eval with state on the ref batch shapes
    eval_step2 = make_eval_step(cfg, model2, criterion2)
    pc2, pm2, _ = eval_step2(state, b_ref.device)
    np.testing.assert_allclose(np.asarray(pc1), np.asarray(pc2),
                               rtol=2e-4, atol=2e-4)
