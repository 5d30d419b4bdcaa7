"""Trainer orchestration tests: fit/resume/test/checkpoints on a tiny
disk-backed Structured3D-format dataset (the full reference train() path,
`mask3d/main_instance_segmentation.py:67-84`)."""

import os

import numpy as np
import pytest

from mask3d_tpu.config import Config, apply_overrides
from mask3d_tpu.data.ply import write_ply


def write_scene(root, scene, rng, n=600):
    d = os.path.join(root, scene)
    os.makedirs(d, exist_ok=True)
    # two-room synthetic layout in reference record schema
    half = n // 2
    x = np.concatenate(
        [rng.integers(0, 20, half), rng.integers(22, 42, n - half)]
    )
    y = rng.integers(0, 20, n)
    z = rng.integers(0, 8, n)
    room = np.concatenate(
        [np.ones(half, np.int32), np.full(n - half, 2, np.int32)]
    )
    arrays = {
        "x": x.astype(np.int32),
        "y": y.astype(np.int32),
        "z": z.astype(np.int32),
        "type": rng.integers(1, 17, n).astype(np.int32),
        "room_id": room,
    }
    write_ply(os.path.join(d, "point_cloud_rasterized_150.ply"), arrays)


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("stru3d"))
    rng = np.random.default_rng(0)
    for scene in ["scene_00001", "scene_00002", "scene_03000", "scene_03250"]:
        write_scene(root, scene, rng)
    return root


def small_cfg(data_root, save_dir) -> Config:
    cfg = Config()
    apply_overrides(
        cfg,
        [
            "model.hidden_dim=32",
            "model.dim_feedforward=64",
            "model.num_queries=6",
            "model.num_heads=4",
            "model.num_decoders=1",
            "model.backbone=Res16UNet14A",
            "model.conv1_kernel_size=3",
            "model.sample_sizes=[32,64,128,256,512]",
            "data.point_bucket_multiple=1024",
            "data.batch_size=2",
            "data.volume_augmentations=none",
            "general.use_dbscan=false",
            "general.export_las=false",
            "general.scores_threshold=0.0",
            "trainer.max_epochs=2",
            "trainer.log_every_n_steps=1",
            f"data.data_root={data_root}",
            f"general.save_dir={save_dir}",
            "general.experiment_id=run1",
        ],
    )
    return cfg


def test_fit_resume_and_test(data_root, tmp_path):
    from mask3d_tpu.train.trainer import InstanceSegmentationTrainer

    save_dir = str(tmp_path / "saved")
    cfg = small_cfg(data_root, save_dir)
    trainer = InstanceSegmentationTrainer(cfg)
    assert len(trainer.datasets["train"]) == 2
    trainer.fit()

    run_dir = trainer.run_dir
    assert os.path.exists(os.path.join(run_dir, "last-epoch.ckpt"))
    assert os.path.exists(os.path.join(run_dir, "metrics.csv"))
    csv = open(os.path.join(run_dir, "metrics.csv")).read()
    assert "train_loss" in csv and "val_mean_ap_50" in csv

    # Config snapshot: the run reproduces from its artifacts alone
    # (reference Hydra snapshot, main_instance_segmentation.py:76-84).
    from mask3d_tpu.config import from_yaml, to_dict

    snap = from_yaml(os.path.join(run_dir, "config.yaml"))
    assert to_dict(snap) == to_dict(cfg)

    # Auto-resume: a fresh trainer continues at epoch 2 (reference
    # get_checkpoint_path semantics, main_instance_segmentation.py:18-28).
    cfg2 = small_cfg(data_root, save_dir)
    cfg2.trainer.max_epochs = 3
    trainer2 = InstanceSegmentationTrainer(cfg2)
    trainer2.fit()
    assert trainer2.epoch == 3

    # test() produces the full metric suite
    metrics = trainer2.test()
    for key in (
        "test_mean_ap", "test_mean_ap_50", "test_mean_ap_25",
        "test_mean_precision_50", "test_mean_recall_50", "test_mean_f1_50",
        "test_mean_match_IoU", "test_successfully_detected_rooms",
        "test_loss",
    ):
        assert key in metrics, key


def test_tolerant_checkpoint_restore(data_root, tmp_path):
    """Fine-tune workflow: restore a ckpt into a model with different
    num_queries (reference experiment6, utils.py:64-93 semantics)."""
    from mask3d_tpu.train import checkpoint as ckpt
    from mask3d_tpu.train.trainer import InstanceSegmentationTrainer

    save_dir = str(tmp_path / "saved_a")
    cfg = small_cfg(data_root, save_dir)
    cfg.trainer.max_epochs = 0
    trainer = InstanceSegmentationTrainer(cfg)
    path = os.path.join(trainer.run_dir, "ckpt_for_finetune.ckpt")
    ckpt.save_checkpoint(path, trainer.state, epoch=0)

    cfg2 = small_cfg(data_root, str(tmp_path / "saved_b"))
    cfg2.model.num_queries = 12  # changed head shapes stay at init
    cfg2.general.checkpoint = path
    trainer2 = InstanceSegmentationTrainer(cfg2)

    # Backbone weights must be restored exactly.
    import jax

    a = jax.tree_util.tree_leaves(trainer.state.params["backbone"])
    b = jax.tree_util.tree_leaves(trainer2.state.params["backbone"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_remat_backbone_matches_no_remat(data_root, tmp_path):
    """`model.remat_backbone=true` (activation checkpointing) changes memory,
    not math: one train step yields the same loss and updated params."""
    import jax
    import numpy as np

    from mask3d_tpu.data import VoxelizeCollate, make_synthetic_scene
    from mask3d_tpu.train.loop import init_state, make_train_step

    rng = np.random.default_rng(0)
    items = [
        make_synthetic_scene(rng, num_rooms_x=2, num_rooms_y=1, room_size=10,
                             height=5, jitter=0.0, dropout=0.5)
        for _ in range(2)
    ]
    batch = VoxelizeCollate(point_bucket_multiple=512)(items).device

    losses = {}
    params = {}
    for remat in (False, True):
        cfg = small_cfg(data_root, str(tmp_path / f"saved_remat_{remat}"))
        cfg.data.point_bucket_multiple = 512
        cfg.model.remat_backbone = remat
        state, model, criterion, tx = init_state(cfg, batch)
        step = make_train_step(cfg, model, criterion, tx)
        new_state, out, _ = step(state, batch)
        losses[remat] = float(out["loss"])
        params[remat] = new_state.params

    assert np.isfinite(losses[True])
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(params[True]),
        jax.tree_util.tree_leaves(params[False]),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_nonfinite_loss_guard(data_root, tmp_path):
    """A non-finite train loss surfaces as FloatingPointError with the batch
    composition logged (reference failure protocol, `trainer.py:184-189,
    224-232`: dump scenes/shapes then re-raise)."""
    import jax.numpy as jnp

    from mask3d_tpu.train.trainer import InstanceSegmentationTrainer

    cfg = small_cfg(data_root, str(tmp_path / "saved_nan"))
    trainer = InstanceSegmentationTrainer(cfg)

    real_step = trainer.train_step

    def poisoned_step(state, batch):
        new_state, losses, preds = real_step(state, batch)
        losses = dict(losses, loss=losses["loss"] * jnp.nan)
        return new_state, losses, preds

    trainer.train_step = poisoned_step
    with pytest.raises(FloatingPointError, match="non-finite train loss"):
        trainer.train_epoch()


def test_training_determinism(data_root, tmp_path):
    """Fixed seed => bit-identical losses and parameters across two runs
    (the reference pins `seed_everything(1)` + `trainer.deterministic: true`,
    `main_instance_segmentation.py:35`, `conf/trainer/trainer.yaml:1`)."""
    import jax

    from mask3d_tpu.data.collate import VoxelizeCollate
    from mask3d_tpu.data.datasets import DATASETS
    from mask3d_tpu.train.loop import init_state, make_train_step

    cfg = small_cfg(data_root, str(tmp_path / "saved_det"))
    ds = DATASETS["structured3d"](
        mode="train", data_root=data_root, rasterization_factor=150,
        volume_augmentations="none",
    )
    collate = VoxelizeCollate(
        point_bucket_multiple=cfg.data.point_bucket_multiple,
        num_queries=cfg.model.num_queries,
    )
    batch = jax.device_put(collate([ds[0], ds[1]]).device)

    results = []
    for _run in range(2):
        state, model, criterion, tx = init_state(cfg, batch)
        step = make_train_step(cfg, model, criterion, tx)
        losses = []
        for _ in range(2):
            state, out, _ = step(state, batch)
            losses.append(float(out["loss"]))
        results.append((losses, jax.tree_util.tree_leaves(state.params)))

    assert results[0][0] == results[1][0], "losses diverged across runs"
    for a, b in zip(results[0][1], results[1][1]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_grad_accumulation_matches_full_batch(data_root, tmp_path):
    """grad_accum_steps=2 on a batch of two IDENTICAL items produces the
    same losses and parameter update as the unaccumulated step (per-chunk
    num_masks normalization == reference DDP semantics,
    `models/criterion.py:244-246`)."""
    import jax

    from mask3d_tpu.data.collate import VoxelizeCollate
    from mask3d_tpu.data.datasets import DATASETS
    from mask3d_tpu.train.loop import init_state, make_train_step

    ds = DATASETS["structured3d"](
        mode="train", data_root=data_root, rasterization_factor=150,
        volume_augmentations="none",
    )
    collate = VoxelizeCollate(point_bucket_multiple=1024, num_queries=6)
    item = ds[0]
    batch = jax.device_put(collate([item, item]).device)

    params = {}
    losses = {}
    for accum in (1, 2):
        cfg = small_cfg(data_root, str(tmp_path / f"saved_ga{accum}"))
        # Large sample sizes => full-level memory (no sampling rng), so the
        # accumulated and full-batch paths see identical randomness.
        cfg.model.sample_sizes = [1024] * 5
        cfg.trainer.grad_accum_steps = accum
        state, model, criterion, tx = init_state(cfg, batch)
        step = make_train_step(cfg, model, criterion, tx)
        new_state, out, _ = step(state, batch)
        losses[accum] = float(out["loss"])
        params[accum] = jax.tree_util.tree_leaves(new_state.params)

    assert np.isfinite(losses[1])
    np.testing.assert_allclose(losses[1], losses[2], rtol=1e-5)
    # Tolerances cover fp32 summation-order noise amplified through the
    # AdamW second-moment normalizer on near-zero-gradient elements
    # (observed: 1 element in ~6e5 at |diff| ~1e-4). A real accumulation
    # arithmetic error (e.g. a factor-K mis-scale) would shift whole
    # tensors, which these bounds still catch.
    for a, b in zip(params[1], params[2]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=2e-4
        )


def test_capacity_overflow_skips_update(data_root, tmp_path):
    """A batch whose pyramid levels overflow their capacities must NOT
    corrupt training: the jitted step reports `batch_overflow` and leaves
    params/opt_state untouched (the reference skips the batch via
    SinglePointRuntimeError, `models/mask3d.py:23-26`,
    `trainer/trainer.py:276-279`)."""
    import jax

    from mask3d_tpu.data.collate import VoxelizeCollate
    from mask3d_tpu.data.datasets import DATASETS
    from mask3d_tpu.train.loop import init_state, make_train_step

    ds = DATASETS["structured3d"](
        mode="train", data_root=data_root, rasterization_factor=150,
        volume_augmentations="none",
    )
    collate = VoxelizeCollate(point_bucket_multiple=1024, num_queries=6)
    batch = jax.device_put(collate([ds[0], ds[1]]).device)

    # control: ordinary capacities -> no overflow, params move
    cfg = small_cfg(data_root, str(tmp_path / "saved_ovf_ctl"))
    state, model, criterion, tx = init_state(cfg, batch)
    step = make_train_step(cfg, model, criterion, tx)
    # the step DONATES its input state (in-place param/opt updates on
    # device) — snapshot the old params to host before stepping
    p0 = [np.asarray(a) for a in jax.tree_util.tree_leaves(state.params)]
    step0 = int(state.step)
    new_state, losses, _ = step(state, batch)
    assert int(losses["batch_overflow"]) == 0
    p1 = jax.tree_util.tree_leaves(new_state.params)
    assert any(
        not np.array_equal(a, np.asarray(b))
        for a, b in zip(p0, p1)
    ), "control step did not update params"

    # overflow: starve the coarse levels -> flag set, update skipped
    cfg2 = small_cfg(data_root, str(tmp_path / "saved_ovf"))
    cfg2.data.level_cap_ratios = (0.01, 0.008, 0.008, 0.008)
    state2, model2, criterion2, tx2 = init_state(cfg2, batch)
    step2 = make_train_step(cfg2, model2, criterion2, tx2)
    q0 = [np.asarray(a) for a in jax.tree_util.tree_leaves(state2.params)]
    s2_step = int(state2.step)
    new2, losses2, _ = step2(state2, batch)
    assert int(losses2["batch_overflow"]) > 0
    for a, b in zip(q0, jax.tree_util.tree_leaves(new2.params)):
        np.testing.assert_array_equal(a, np.asarray(b))
    assert int(new2.step) == s2_step + 1


def test_measure_runtime_segment_contract(data_root, tmp_path):
    """test() with measure_model_phases produces the reference's
    measure_runtime segment names (SURVEY §6: `mask3d/utils/
    measure_runtime.py` + call sites `trainer.py:271-295,425-559`,
    `models/mask3d.py:282,302,378,494,504`)."""
    from mask3d_tpu.train.trainer import InstanceSegmentationTrainer
    from mask3d_tpu.utils import meter

    cfg = small_cfg(data_root, str(tmp_path / "saved_meter"))
    cfg.trainer.measure_model_phases = True
    cfg.data.test_batch_size = 1
    cfg.general.use_dbscan = True
    cfg.general.filter_out_instances = True
    trainer = InstanceSegmentationTrainer(cfg)
    trainer.test()
    stats = meter.get_statistics()
    expected = {
        "data_preparation",
        "sparse_context_build",
        "model_forward_backbone_part1",
        "model_forward_backbone_part2",
        "model_forward_pos_enc",
        "model_forward_queries",
        "model_forward_final_mask_module",
        "model_forward_complete",
        "loss_calculation",
        "eval_prep",
        "eval_dbscan",
        "eval_get_mask_and_scores",
        "eval_sort_predictions_by_score",
        "eval_filter_out_instances",
        "eval_postprocess",
        "eval_metrics_calc",
    } | {
        f"model_forward_decoder_{d}" for d in range(cfg.model.num_decoders)
    }
    missing = expected - set(stats)
    assert not missing, f"missing measure_runtime segments: {sorted(missing)}"
    for name in expected:
        assert stats[name]["count"] >= 1
        assert stats[name]["mean"] >= 0.0


def test_metric_logger_preserves_history_across_resume(tmp_path):
    """The CSV is rewritten whole each epoch (fieldnames can grow); a
    resumed process must seed from the existing file so auto-resume keeps
    the metric history (the reference CSVLogger keeps history via version
    dirs, mask3d/README.md:19)."""
    import csv

    from mask3d_tpu.train.logging_utils import MetricLogger

    d = str(tmp_path)
    m = MetricLogger(d, use_tensorboard=False)
    m.log_step({"train_loss": 2.0}, 1)
    m.log_epoch(0, 3)
    m.log_epoch(1, 6, extra={"val_mean_ap_50": 0.5})
    m.close()

    m2 = MetricLogger(d, use_tensorboard=False)  # simulated resume
    m2.log_step({"train_loss": 1.0}, 9)
    m2.log_epoch(2, 9)
    m2.close()
    with open(tmp_path / "metrics.csv", newline="") as f:
        rows = list(csv.DictReader(f))
    assert [r["epoch"] for r in rows] == ["0", "1", "2"]
    assert rows[1]["val_mean_ap_50"] == "0.5"
    assert rows[2]["train_loss"] == "1.0"
