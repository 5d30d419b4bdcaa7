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


# ---------------------------------------------------------------------------
# Numeric-format parity gates (bf16 / int8 fast paths vs fp32).
#
# These AUTHORIZE the bench's flagship overrides (bench.py), so they are held
# to the BASELINE bar: >= 16 distinct scenes, evaluator-mAP tolerance <= 0.01
# absolute, plus a logits-level error bound per fast path (VERDICT r3 item 2
# replaced the old 2-scene 0.15-tolerance gates).
# ---------------------------------------------------------------------------

N_PARITY_SCENES = 16
_PARITY_BS = 2  # scenes per batch (8 batches of 2)


def parity_config() -> Config:
    """small_config with a MULTI-block-per-stage backbone (18A: LAYERS all
    2, planes 96 at stages 7/8 like the flagship 34C) so the gates also
    exercise the int8_residual QGrid junctions — 14A's single-block stages
    have no intermediate block outputs and would leave that fast path
    untested at the mAP level."""
    cfg = small_config()
    apply_overrides(cfg, ["model.backbone=Res16UNet18A"])
    return cfg


@pytest.fixture(scope="module")
def parity16():
    """16 distinct scenes in ONE shared bucket shape + a model trained on
    all of them (confident predictions make the mAP comparison sharp: a
    barely-converged model has borderline masks whose matches flip under
    any numeric perturbation, which would test noise, not the fast path).
    Returns (state, batches)."""
    rng = np.random.default_rng(11)
    scenes = [
        make_synthetic_scene(rng, num_rooms_x=2, num_rooms_y=1,
                             room_size=12, height=6, jitter=0.0, dropout=0.5)
        for _ in range(N_PARITY_SCENES)
    ]
    # Two-pass collation: discover the max point capacity and grid dims,
    # then re-collate every batch into that single bucket (one executable
    # per variant; shape-identical logits across variants).
    probe = VoxelizeCollate(point_bucket_multiple=64)
    probed = [probe(scenes[i:i + _PARITY_BS])
              for i in range(0, N_PARITY_SCENES, _PARITY_BS)]
    cap = max(int(b.device.coords.shape[1]) for b in probed)
    dims0 = tuple(max(b.device.grid_dims[0][a] for b in probed)
                  for a in range(3))
    coll = VoxelizeCollate(point_bucket_multiple=cap, min_grid_dims=dims0)
    batches = [coll(scenes[i:i + _PARITY_BS])
               for i in range(0, N_PARITY_SCENES, _PARITY_BS)]
    assert len({b.device.coords.shape for b in batches}) == 1
    assert len({b.device.grid_dims for b in batches}) == 1

    cfg = parity_config()
    state, model, criterion, tx = init_state(cfg, batches[0].device)
    train_step = make_train_step(cfg, model, criterion, tx)
    for _epoch in range(14):
        for b in batches:
            state, losses, _p = train_step(state, b.device)
    assert np.isfinite(float(losses["loss"]))
    return state, batches


def _variant_eval(state, batches, overrides):
    """Eval the trained state under a model-config override dict; returns
    (evaluator metrics over all 16 scenes, raw pred_masks logits)."""
    cfg2 = parity_config()
    for k, v in overrides.items():
        setattr(cfg2.model, k, v)
    _, model2, criterion2, _ = init_state(cfg2, batches[0].device)
    eval_step = make_eval_step(cfg2, model2, criterion2)
    preds, targets, logits = [], [], []
    for batch in batches:
        pred_class, pred_masks, _ = eval_step(state, batch.device)
        pred_class = np.asarray(pred_class)
        pred_masks = np.asarray(pred_masks)
        logits.append(pred_masks.astype(np.float32))
        counts = np.asarray(batch.device.counts)
        for b in range(_PARITY_BS):
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
    metrics = Mask3DEvaluator().evaluate(preds, targets, "val")
    return metrics, np.concatenate(logits, axis=0)


_MAP_KEYS = ("val_mean_ap", "val_mean_ap_50", "val_mean_ap_25")
MAP_TOL = 0.01  # BASELINE.md bar: mAP@50 within 0.005; gate at 0.01 abs


def _assert_parity(ref, got, name, logit_tol):
    """mAP within MAP_TOL on all three IoU regimes + a logits-level bound
    (max |delta| over every (scene, point, query) mask logit, normalized
    by the fp32 logits' std) + finiteness.

    The logit bounds are calibrated per variant on THIS 18A fixture at
    ~1.5x the measured max (2026-08-19 run: bf16 0.164, int8-dynamic
    0.493, int8-sigma10 0.651, int8-residual 0.817; mAP deltas all
    <= 0.0011). Max-|delta|/std is a catastrophic-breakage tripwire
    (wraparound/NaN/garbage lands at 10-100x); the accuracy claim itself
    is carried by the MAP_TOL gate over 16 scenes."""
    ref_m, ref_l = ref
    got_m, got_l = got
    for key in _MAP_KEYS:
        assert abs(ref_m[key] - got_m[key]) <= MAP_TOL, (
            name, key, ref_m[key], got_m[key]
        )
    assert np.isfinite(got_l).all(), name
    scale = max(float(np.std(ref_l)), 1e-6)
    rel = float(np.abs(got_l - ref_l).max()) / scale
    assert rel <= logit_tol, (name, rel, scale)


def test_int8_eval_metrics_match_fp32(parity16):
    """`model.int8_stride1` (int8 stride-1/1x1 convs at >=96 ch, the
    flagship bench fast path) — both the dynamic-absmax scheme and the
    static IN-derived activation scales (`int8_act_sigma`) — must hold the
    evaluator metrics to <= 0.01 mAP over 16 scenes and keep mask logits
    within a few percent of the fp32 logit scale."""
    state, batches = parity16
    ref = _variant_eval(state, batches, {})
    # sigma=10 itself was picked in tools/calib_int8_logits.py (clipping
    # tail gone by sigma 8-10, quantization-step error grows slowly
    # after); the logit_tol values here are the 18A-fixture calibration
    # documented in _assert_parity.
    int8 = _variant_eval(state, batches, {
        "int8_stride1": True, "compute_dtype": "bfloat16"})
    _assert_parity(ref, int8, "int8-dynamic", logit_tol=0.75)
    int8s = _variant_eval(state, batches, {
        "int8_stride1": True, "compute_dtype": "bfloat16",
        "int8_act_sigma": 10.0})
    _assert_parity(ref, int8s, "int8-static10", logit_tol=1.0)
    # int8_residual: intermediate block outputs live as int8-only QGrids
    # (the bench's full flagship fast-path stack).
    int8r = _variant_eval(state, batches, {
        "int8_stride1": True, "compute_dtype": "bfloat16",
        "int8_act_sigma": 10.0, "int8_residual": True})
    _assert_parity(ref, int8r, "int8-residual", logit_tol=1.25)


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


def test_unit_features_guard_rejects_real_features(batch):
    """`model.unit_features` is a promise, not a hint: real (non-ones)
    feature values must fail loudly instead of being silently replaced by
    the occupancy grid (ADVICE r3)."""
    cfg = small_config()
    cfg.model.unit_features = True
    bad = batch.device.replace(feats=np.asarray(batch.device.feats) * 2.0)
    with pytest.raises(AssertionError, match="unit_features"):
        init_state(cfg, bad)


def test_bf16_eval_metrics_match_fp32(parity16):
    """The bench runs inference with `model.compute_dtype=bfloat16` on
    fp32-trained weights; the evaluator (acceptance oracle) must agree
    with the fp32 eval to <= 0.01 mAP over 16 scenes."""
    state, batches = parity16
    ref = _variant_eval(state, batches, {})
    bf16 = _variant_eval(state, batches, {"compute_dtype": "bfloat16"})
    _assert_parity(ref, bf16, "bf16", logit_tol=0.25)
    assert bf16[0]["val_mean_ap_25"] > 0.0


def test_collate_grid_dims_cap_crops_oversized():
    """`grid_dims_cap` pins the level-0 grid as floor AND ceiling: an
    oversized (e.g. z-rotation-augmented) item is center-cropped to fit
    instead of minting a new executable shape, fitting items pass through
    bit-identically, and targets stay consistent with the cropped rows
    (VERDICT r4 item 3 — one train executable for augmented runs)."""
    from mask3d_tpu.data import VoxelizeCollate, make_synthetic_scene
    from mask3d_tpu.data.collate import voxelize_item

    rng = np.random.default_rng(7)
    small = make_synthetic_scene(rng, num_rooms_x=1, num_rooms_y=1,
                                 room_size=8, height=5, jitter=0.0,
                                 dropout=0.3)
    big = make_synthetic_scene(rng, num_rooms_x=3, num_rooms_y=2,
                               room_size=12, height=6, jitter=0.0,
                               dropout=0.3)
    cap = (24, 24, 8)
    coll = VoxelizeCollate(point_bucket_multiple=512, grid_dims_cap=cap)
    hb = coll([small, big])
    dev = hb.device
    # pinned shape regardless of item sizes
    assert dev.grid_dims[0] == cap
    assert np.all(np.asarray(dev.dims) <= np.asarray(cap))

    # the oversized item really was cropped (fewer voxels than uncapped)
    full_coords, _, full_dims = voxelize_item(np.asarray(big["coordinates"]))
    assert np.any(np.asarray(full_dims) > np.asarray(cap))
    n_big = int(dev.counts[1])
    assert 0 < n_big < len(full_coords)

    for i in range(2):
        n = int(dev.counts[i])
        c = np.asarray(dev.coords[i][:n])
        # coords in-window and still sorted lexicographically (the
        # linearized-key invariant build_sparse_batch relies on)
        assert c.min() >= 0 and np.all(c < np.asarray(cap))
        keys = (c[:, 0].astype(np.int64) * cap[1] + c[:, 1]) * cap[2] + c[:, 2]
        assert np.all(np.diff(keys) > 0)
        # target masks only cover real rows
        tm = np.asarray(dev.target.masks[i])
        assert not tm[:, n:].any()

    # the fitting item is bit-identical to its uncapped collation
    ref = VoxelizeCollate(point_bucket_multiple=512)([small]).device
    n0 = int(ref.counts[0])
    assert int(dev.counts[0]) == n0
    np.testing.assert_array_equal(
        np.asarray(dev.coords[0][:n0]), np.asarray(ref.coords[0][:n0])
    )

    # one more batch of only-small items: the pin holds (no shape churn)
    hb2 = coll([small])
    assert hb2.device.grid_dims[0] == cap


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
