"""Train/eval steps and state: the jitted core of the training stack.

Rebuild of the reference Lightning module's step logic
(`mask3d/trainer/trainer.py:263-302` any_split_step): one jitted function
builds the sparse context, runs the model, matches and computes all losses,
and applies the optimizer update — no host round-trips inside a step (the
reference syncs to CPU for 13 x batch_size LSAPs per step).

Optimizer/scheduler mirror the shipped configs: AdamW lr 1e-4
(`conf/optimizer/adamw.yaml`) with per-step exponential decay gamma=0.99999
(`conf/scheduler/exponentiallr.yaml:3`).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import struct

from mask3d_tpu.config import Config
from mask3d_tpu.data.batch import DeviceBatch
from mask3d_tpu.models.mask3d import Mask3D, Mask3DOutput
from mask3d_tpu.sparse.context import build_sparse_batch
from mask3d_tpu.train.criterion import SetCriterion


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    buffers: Any
    opt_state: Any
    rng: jax.Array


def make_model(cfg: Config) -> Mask3D:
    dt = None
    if cfg.model.compute_dtype == "bfloat16":
        dt = jnp.bfloat16
    return Mask3D(
        num_classes=cfg.general.num_targets,
        hidden_dim=cfg.model.hidden_dim,
        dim_feedforward=cfg.model.dim_feedforward,
        num_queries=cfg.model.num_queries,
        num_heads=cfg.model.num_heads,
        num_decoders=cfg.model.num_decoders,
        dropout=cfg.model.dropout,
        pre_norm=cfg.model.pre_norm,
        use_level_embed=cfg.model.use_level_embed,
        normalize_pos_enc=cfg.model.normalize_pos_enc,
        positional_encoding_type=cfg.model.positional_encoding_type,
        gauss_scale=cfg.model.gauss_scale,
        hlevels=tuple(cfg.model.hlevels),
        non_parametric_queries=cfg.model.non_parametric_queries,
        random_query_both=cfg.model.random_query_both,
        random_normal=cfg.model.random_normal,
        random_queries=cfg.model.random_queries,
        use_np_features=cfg.model.use_np_features,
        sample_sizes=tuple(cfg.model.sample_sizes),
        max_sample_size=cfg.model.max_sample_size,
        shared_decoder=cfg.model.shared_decoder,
        backbone_name=cfg.model.backbone,
        backbone_impl=cfg.model.backbone_impl,
        brick_dims=tuple(cfg.model.brick_dims),
        brick_capacity=cfg.model.brick_capacity,
        pallas_conv_select=cfg.model.pallas_conv_select,
        pallas_window_mode=cfg.model.pallas_window_mode,
        in_channels=cfg.data.in_channels,
        conv1_kernel_size=cfg.model.conv1_kernel_size,
        compute_dtype=dt,
        sp_axis=cfg.model.sp_axis,
        remat_backbone=cfg.model.remat_backbone,
        attention_chunk=cfg.model.attention_chunk,
        attention_pallas_tile=cfg.model.attention_pallas_tile,
        int8_stride1=cfg.model.int8_stride1,
        int8_residual=cfg.model.int8_residual,
        int8_act_sigma=cfg.model.int8_act_sigma,
        pallas_chain=cfg.model.pallas_chain,
        fold_small_stages=cfg.model.fold_small_stages,
        unit_features=cfg.model.unit_features,
    )


def make_criterion(cfg: Config) -> SetCriterion:
    cw = cfg.loss.class_weights
    return SetCriterion(
        num_classes=cfg.general.num_targets,
        cost_class=cfg.matcher.cost_class,
        cost_mask=cfg.matcher.cost_mask,
        cost_dice=cfg.matcher.cost_dice,
        eos_coef=cfg.loss.eos_coef,
        class_weights=None if cw == -1 else cw,
        ignore_mask_idx=cfg.general.ignore_mask_idx,
        lsap_method=cfg.matcher.lsap_method,
    )


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    if cfg.scheduler.name == "exponentiallr":
        schedule = optax.exponential_decay(
            init_value=cfg.optimizer.lr,
            transition_steps=1,
            decay_rate=cfg.scheduler.gamma,
        )
    elif cfg.scheduler.name == "onecyclelr":
        steps = max(cfg.scheduler.steps_per_epoch, 1) * cfg.trainer.max_epochs
        schedule = optax.cosine_onecycle_schedule(
            transition_steps=steps,
            peak_value=cfg.scheduler.max_lr or cfg.optimizer.lr,
        )
    elif cfg.scheduler.name in ("steplr", "lambdalr"):
        # Both reference groups wrap torch StepLR (lambdalr.yaml despite
        # its filename: `mask3d/conf/scheduler/lambdalr.yaml` — StepLR at
        # step_size 99999, interval=epoch, i.e. constant for any practical
        # run; steplr.yaml identically). step_size counts SCHEDULER ticks:
        # epochs here (interval=epoch), so the per-step schedule needs
        # steps_per_epoch to convert (constant when unset, matching the
        # shipped 99999 configs).
        spe = max(cfg.scheduler.steps_per_epoch, 1)
        boundary = cfg.scheduler.step_size * spe
        schedule = optax.exponential_decay(
            init_value=cfg.optimizer.lr,
            transition_steps=boundary,
            decay_rate=cfg.scheduler.gamma,
            staircase=True,
        )
    else:  # unknown name: constant lr
        schedule = cfg.optimizer.lr
    if cfg.optimizer.name == "adamw":
        tx = optax.adamw(schedule, weight_decay=cfg.optimizer.weight_decay)
    else:
        tx = optax.adam(schedule)
    if cfg.general.freeze_backbone:
        # reference: backbone under torch.no_grad (`trainer.py:110-113`)
        def label_fn(params):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: "frozen"
                if any(getattr(p, "key", None) == "backbone" for p in path)
                else "train",
                params,
            )

        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, label_fn
        )
    return tx


def _sb_kwargs(cfg: Config, batch_grid_dims):
    """build_sparse_batch kwargs per impl: the dense path needs no kernel
    maps (saving their construction cost), the gather path needs them."""
    if cfg.model.backbone_impl == "dense":
        return dict(
            grid_dims=batch_grid_dims,
            build_block_maps=False,
            conv1_kernel_size=None,
            # The dense path pools on grids (models/mask3d.py pooled
            # pyramid) and never reads PoolMap.parent/kidx — skip their
            # per-row gathers (~8 ms/forward on v5e).
            build_pool_parents=False,
        )
    if cfg.model.backbone_impl == "bricked":
        # Brick convs need no kernel maps, but the model's pooled
        # pyramid runs in ROW space (bb_grid is None), which reads
        # PoolMap.parent — keep the parents.
        return dict(
            grid_dims=batch_grid_dims,
            build_block_maps=False,
            conv1_kernel_size=None,
        )
    return dict(
        grid_dims=batch_grid_dims,
        conv1_kernel_size=cfg.model.conv1_kernel_size,
    )


def level_capacities(cfg: Config, n_points: int):
    return [
        max(8, int(n_points * r)) for r in cfg.data.level_cap_ratios
    ]


def init_state(cfg: Config, example: DeviceBatch, seed: Optional[int] = None
               ) -> Tuple[TrainState, Mask3D, SetCriterion, Any]:
    if cfg.model.unit_features:
        # unit_features promises the input features are constant ones (the
        # dense stem then reads the occupancy grid instead of scattering
        # rows — backbone.py). A non-constant feature column (e.g. an
        # intensity scalar) would be SILENTLY discarded; fail loudly here
        # instead (cheap host-side check on the example batch).
        f = np.asarray(example.feats)
        valid = (
            np.arange(f.shape[1])[None, :]
            < np.asarray(example.counts)[:, None]
        )
        assert cfg.data.in_channels == 1 and np.all(f[valid] == 1.0), (
            "model.unit_features=true but the example batch carries "
            "non-constant features — the dense stem would discard them; "
            "unset unit_features for real feature channels."
        )
    model = make_model(cfg)
    criterion = make_criterion(cfg)
    tx = make_optimizer(cfg)
    key = jax.random.PRNGKey(cfg.general.seed if seed is None else seed)
    k_param, k_sample, k_state = jax.random.split(key, 3)

    # Jit the whole init: eager op-by-op dispatch is pathological on remote
    # TPU backends (every op is a round trip through the device tunnel).
    @jax.jit
    def _init(k_param, k_sample, coords, counts, dims, feats):
        sb = build_sparse_batch(
            coords, counts, dims,
            level_capacities(cfg, coords.shape[1]),
            **_sb_kwargs(cfg, example.grid_dims),
        )
        return model.init(
            {"params": k_param, "sample": k_sample, "queries": k_sample},
            sb, feats, coords.astype(jnp.float32), False,
            grid_dims=example.grid_dims,
        )

    variables = _init(
        k_param, k_sample, example.coords, example.counts, example.dims,
        example.feats,
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        buffers=variables.get("buffers", {}),
        opt_state=tx.init(variables["params"]),
        rng=k_state,
    )
    return state, model, criterion, tx


def _batch_overflow(sb) -> jax.Array:
    """i32 scalar: 1 if any pyramid level of any item overflowed its
    capacity (voxels silently dropped)."""
    ovf = jnp.zeros((), bool)
    for p in sb.pools:
        ovf = ovf | p.overflow.any()
    return ovf.astype(jnp.int32)


def make_train_step(cfg: Config, model: Mask3D, criterion: SetCriterion,
                    tx) -> Any:
    caps = None  # derived per batch capacity (static under jit)

    accum = max(1, int(cfg.trainer.grad_accum_steps))
    return_preds = bool(cfg.trainer.train_split_metrics)

    def _grads_for(state, batch, k_sample, k_queries, ce_scale=1.0):
        sb = build_sparse_batch(
            batch.coords, batch.counts, batch.dims,
            level_capacities(cfg, batch.coords.shape[1]),
            **_sb_kwargs(cfg, batch.grid_dims),
        )
        raw = batch.coords.astype(jnp.float32)
        targets = batch.target.with_label_offset(
            cfg.data.prediction_label_offset
        )

        def loss_fn(params):
            out: Mask3DOutput = model.apply(
                {"params": params, "buffers": state.buffers},
                sb, batch.feats, raw, False,
                grid_dims=batch.grid_dims,
                rngs={"sample": k_sample, "queries": k_queries},
            )
            losses = criterion(
                out, targets, sb.levels[0].valid, ce_scale=ce_scale
            )
            # Final predictions ride out of the step for train-split
            # evaluator metrics (reference `trainer.py:289`: the eval step
            # runs on the train forward's output in all splits).
            preds = None
            if return_preds:
                preds = (
                    jax.lax.stop_gradient(out.pred_class),
                    jax.lax.stop_gradient(out.pred_masks),
                )
            return losses["loss"], (losses, preds)

        grads, (losses, preds) = jax.grad(loss_fn, has_aux=True)(state.params)
        # Level-capacity overflow: a pyramid level dropped voxels (its
        # capacity was exceeded), so this micro-batch's gradient is built
        # on a corrupted structure. Surfaced so train_step can skip the
        # update — the TPU equivalent of the reference's
        # SinglePointRuntimeError batch-skip (`mask3d/models/mask3d.py:23-26`
        # -> `trainer/trainer.py:276-279`).
        losses = dict(losses)
        losses["batch_overflow"] = _batch_overflow(sb)
        return grads, losses, preds

    # Donating `state` lets XLA update params/opt-state in place: peak HBM
    # drops by one full copy of (params + adam moments) ≈ 3x param bytes,
    # which is what bounds the trainable batch/grid size on one chip.
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: DeviceBatch
                   ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        rng, k_sample, k_queries = jax.random.split(state.rng, 3)

        if accum == 1:
            grads, losses, preds = _grads_for(
                state, batch, k_sample, k_queries
            )
        else:
            # Gradient accumulation: scan K micro-batches of B/K items —
            # activation memory scales with B/K. Micro gradients are
            # SUMMED: the reference's mask/dice losses are batch sums
            # (per-item num_masks normalizer, `criterion.py:188,207-208`),
            # so summed micro gradients reproduce the full-batch gradient
            # exactly; the CE term is a batch mean, so each micro batch
            # contributes it at weight 1/K via `ce_scale` (exact when the
            # micro batches have equal CE weight sums, else the standard
            # accumulation approximation).
            b = batch.coords.shape[0]
            assert b % accum == 0, (b, accum)

            def split(x):
                return x.reshape((accum, b // accum) + x.shape[1:])

            micro_batches = jax.tree_util.tree_map(split, batch)
            ks = jax.random.split(k_sample, accum)
            kq = jax.random.split(k_queries, accum)

            def micro(carry, xs):
                mb, k_s, k_q = xs
                g, l, p = _grads_for(
                    state, mb, k_s, k_q, ce_scale=1.0 / accum
                )
                g_acc, l_acc = carry
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
                l_acc = jax.tree_util.tree_map(jnp.add, l_acc, l)
                return (g_acc, l_acc), p

            zero_g = jax.tree_util.tree_map(
                jnp.zeros_like, state.params
            )
            ex_mb = jax.tree_util.tree_map(
                lambda x: x[0], micro_batches
            )
            zero_l = jax.tree_util.tree_map(
                jnp.zeros_like,
                jax.eval_shape(
                    lambda: _grads_for(state, ex_mb, ks[0], kq[0])[1]
                ),
            )
            (grads, losses), preds = jax.lax.scan(
                micro, (zero_g, zero_l), (micro_batches, ks, kq)
            )
            if return_preds:
                # un-scan: [K, B/K, ...] -> [B, ...]
                preds = jax.tree_util.tree_map(
                    lambda x: x.reshape((b,) + x.shape[2:]), preds
                )
            # Reported dict: CE entries are batch means (divide the summed
            # chunk means by K); mask/dice entries and the total are sums.
            losses = {
                k: (v / accum if "_ce" in k else v)
                for k, v in losses.items()
            }

        updates, opt_state = tx.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        # Skip the update on capacity overflow (reference batch-skip
        # protocol): params/opt_state keep their old values; step/rng
        # advance so the data order is unaffected.
        skip = losses["batch_overflow"] > 0

        def keep_old(new, old):
            return jax.tree_util.tree_map(
                lambda n, o: jnp.where(skip, o, n), new, old
            )

        new_state = state.replace(
            step=state.step + 1,
            params=keep_old(params, state.params),
            opt_state=keep_old(opt_state, state.opt_state),
            rng=rng,
        )
        return new_state, losses, preds

    return train_step


def measure_model_phases(cfg: Config, model: Mask3D, state: TrainState,
                         batch: DeviceBatch, reps: int = 3) -> Dict[str, float]:
    """Per-phase forward timings for the measure_runtime contract.

    The reference times model sub-phases with host clocks between
    sequential CUDA calls (`mask3d/utils/measure_runtime.py:76-100`, call
    sites `models/mask3d.py:282,302,378,494,504`). Here one XLA executable
    runs the whole forward, so phase boundaries are measured by PREFIX
    differences: for each sown phase marker (see `models/mask3d.py`), jit a
    function that returns only that marker — XLA dead-code-eliminates all
    later phases — fence it with `jax.device_get`, and report successive
    differences. Results are recorded into `utils.meter` under the
    reference's `model_forward_*` segment names.
    """
    import time

    from mask3d_tpu.utils import meter

    caps = level_capacities(cfg, batch.coords.shape[1])
    kw = _sb_kwargs(cfg, batch.grid_dims)
    phase_names = ["backbone_part1", "backbone_part2", "pos_enc", "queries"]
    phase_names += [f"decoder_{d}" for d in range(model.num_decoders)]

    def prefix_fn(phase):
        @jax.jit
        def f(params, buffers, coords, counts, dims, feats):
            sb = build_sparse_batch(coords, counts, dims, caps, **kw)
            raw = coords.astype(jnp.float32)
            if phase == "sparse_context_build":
                return sum(jnp.sum(lv.key) for lv in sb.levels)
            out, inter = model.apply(
                {"params": params, "buffers": buffers},
                sb, feats, raw, True, grid_dims=batch.grid_dims,
                mutable=["intermediates"],
            )
            if phase == "final_mask_module":
                return (jnp.sum(out.pred_class)
                        + jnp.sum(out.pred_masks.astype(jnp.float32)))
            return inter["intermediates"][phase][0]
        return f

    args = (state.params, state.buffers, batch.coords, batch.counts,
            batch.dims, batch.feats)
    cum = {}
    for phase in (["sparse_context_build"] + phase_names
                  + ["final_mask_module"]):
        f = prefix_fn(phase)
        jax.device_get(f(*args))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(reps):
            r = f(*args)
        jax.device_get(r)
        cum[phase] = (time.perf_counter() - t0) / reps

    segs = {}
    prev = "sparse_context_build"
    meter.record("sparse_context_build", cum[prev])
    for phase in phase_names + ["final_mask_module"]:
        segs[f"model_forward_{phase}"] = max(0.0, cum[phase] - cum[prev])
        meter.record(f"model_forward_{phase}", segs[f"model_forward_{phase}"])
        prev = phase
    return segs


def make_eval_step(cfg: Config, model: Mask3D, criterion: SetCriterion
                   ) -> Any:
    @jax.jit
    def eval_step(state: TrainState, batch: DeviceBatch):
        sb = build_sparse_batch(
            batch.coords, batch.counts, batch.dims,
            level_capacities(cfg, batch.coords.shape[1]),
            **_sb_kwargs(cfg, batch.grid_dims),
        )
        raw = batch.coords.astype(jnp.float32)
        out: Mask3DOutput = model.apply(
            {"params": state.params, "buffers": state.buffers},
            sb, batch.feats, raw, True,
            grid_dims=batch.grid_dims,
        )
        targets = batch.target.with_label_offset(
            cfg.data.prediction_label_offset
        )
        losses = criterion(out, targets, sb.levels[0].valid)
        losses = dict(losses)
        losses["batch_overflow"] = _batch_overflow(sb)
        return out.pred_class, out.pred_masks, losses

    return eval_step
