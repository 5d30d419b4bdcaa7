"""Sequence-parallel (point-axis) sharding tests on the virtual CPU mesh.

The SP scheme (SURVEY.md §5.7's TPU mapping): dense grids shard their x
axis and row tensors their point axis over the `sp` mesh axis; queries stay
replicated; XLA's SPMD partitioner inserts conv halo exchanges and
attention `psum`s. These tests check (a) a dp x sp sharded eval forward is
numerically close to the unsharded one, and (b) a full training step runs
under the 2D mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mask3d_tpu.config import Config, apply_overrides
from mask3d_tpu.data import VoxelizeCollate, make_synthetic_scene
from mask3d_tpu.parallel import make_mesh_2d, replicate, shard_batch
from mask3d_tpu.sparse import build_sparse_batch
from mask3d_tpu.train.loop import (
    _sb_kwargs,
    init_state,
    level_capacities,
    make_train_step,
)


def _cfg(sp_axis=None):
    cfg = Config()
    apply_overrides(
        cfg,
        [
            "model.hidden_dim=32",
            "model.dim_feedforward=64",
            "model.num_queries=5",
            "model.num_decoders=1",
            "model.backbone=Res16UNet14A",
            "model.conv1_kernel_size=3",
            "model.sample_sizes=[16,32,64,128,256]",
            "data.point_bucket_multiple=256",
        ],
    )
    cfg.model.sp_axis = sp_axis
    return cfg


def _batch(n_items):
    rng = np.random.default_rng(3)
    items = [
        make_synthetic_scene(
            rng, num_rooms_x=2, num_rooms_y=1, room_size=10, height=6,
            jitter=0.0, dropout=0.4,
        )
        for _ in range(n_items)
    ]
    return VoxelizeCollate(point_bucket_multiple=256)(items)


def _eval_fn(cfg, model, batch):
    caps = level_capacities(cfg, batch.coords.shape[1])
    kw = _sb_kwargs(cfg, batch.grid_dims)

    @jax.jit
    def fwd(params, buffers, coords, counts, dims, feats):
        sb = build_sparse_batch(coords, counts, dims, caps, **kw)
        out = model.apply(
            {"params": params, "buffers": buffers},
            sb, feats, coords.astype(jnp.float32), True,
            grid_dims=batch.grid_dims,
        )
        return out.pred_class, out.pred_masks

    return fwd


def test_dp_sp_eval_matches_unsharded():
    host = _batch(2)
    batch = host.device
    cfg0 = _cfg(None)
    state, model0, _, _ = init_state(cfg0, batch)
    fwd0 = _eval_fn(cfg0, model0, batch)
    ref_class, ref_masks = jax.device_get(
        fwd0(state.params, state.buffers, batch.coords, batch.counts,
             batch.dims, batch.feats)
    )

    cfg1 = _cfg("sp")
    from mask3d_tpu.train.loop import make_model

    model1 = make_model(cfg1)
    mesh = make_mesh_2d(2, 2)
    with jax.sharding.set_mesh(mesh):
        sharded = jax.tree_util.tree_map(
            lambda x: jax.device_put(
                x, NamedSharding(mesh, P("dp"))
            ),
            batch,
        )
        params = replicate(state.params, mesh)
        buffers = replicate(state.buffers, mesh)
        fwd1 = _eval_fn(cfg1, model1, batch)
        got_class, got_masks = jax.device_get(
            fwd1(params, buffers, sharded.coords, sharded.counts,
                 sharded.dims, sharded.feats)
        )

    # Tolerance note: instance norm over near-empty coarse levels has
    # rsqrt(var+eps) conditioning that amplifies cross-device reduction
    # reorder noise; semantic exactness is asserted separately below with
    # the norm stubbed out.
    np.testing.assert_allclose(got_class, ref_class, rtol=5e-2, atol=5e-2)
    np.testing.assert_allclose(got_masks, ref_masks, rtol=5e-2, atol=2e-1)


def test_dp_sp_backbone_exact_with_identity_norm(monkeypatch):
    """Semantic exactness of the sharded backbone: with the (ill-conditioned
    on tiny levels) instance norm stubbed to a masking identity, sharded and
    unsharded forwards must agree to float-noise level."""
    from mask3d_tpu.sparse import dense_ops
    from mask3d_tpu.train.loop import make_model

    monkeypatch.setattr(
        dense_ops, "dense_instance_norm",
        lambda x, occ, g, b, eps=1e-5: x * occ,
    )
    # The fused stem embeds its own norm — unfuse it so the stub above
    # covers the whole backbone (same decomposition it is oracle-tested
    # against in tests/test_dense_ops.py).
    monkeypatch.setattr(
        dense_ops, "dense_stem_fused",
        lambda x, w, occ, g, b, bias=None, compute_dtype=None, eps=1e-5:
            jnp.maximum(dense_ops.dense_instance_norm(
                dense_ops.dense_conv_same_zfold(
                    x, w, occ, bias=bias, compute_dtype=compute_dtype
                ), occ, g, b, eps), 0),
    )

    host = _batch(2)
    batch = host.device
    cfg0 = _cfg(None)
    state, model0, _, _ = init_state(cfg0, batch)

    def bb_fn(cfg, model):
        caps = level_capacities(cfg, batch.coords.shape[1])
        kw = _sb_kwargs(cfg, batch.grid_dims)

        @jax.jit
        def fwd(params, buffers, coords, counts, dims, feats):
            sb = build_sparse_batch(coords, counts, dims, caps, **kw)
            out = model.apply(
                {"params": params, "buffers": buffers},
                sb, feats, coords.astype(jnp.float32), True,
                grid_dims=batch.grid_dims,
            )
            return out.backbone_feats

        return fwd

    args = (batch.coords, batch.counts, batch.dims, batch.feats)
    ref = jax.device_get(
        bb_fn(cfg0, model0)(state.params, state.buffers, *args)
    )

    model1 = make_model(_cfg("sp"))
    mesh = make_mesh_2d(2, 2)
    with jax.sharding.set_mesh(mesh):
        sharded = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P("dp"))),
            batch,
        )
        params = replicate(state.params, mesh)
        buffers = replicate(state.buffers, mesh)
        got = jax.device_get(
            bb_fn(_cfg("sp"), model1)(
                params, buffers, sharded.coords, sharded.counts,
                sharded.dims, sharded.feats,
            )
        )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_dp_sp_train_step_runs():
    host = _batch(4)
    batch = host.device
    cfg = _cfg("sp")
    state, model, criterion, tx = init_state(cfg, batch)
    train_step = make_train_step(cfg, model, criterion, tx)

    mesh = make_mesh_2d(4, 2)
    with jax.sharding.set_mesh(mesh):
        sharded = shard_batch(batch, mesh)
        rep_state = replicate(state, mesh)
        new_state, losses, _ = train_step(rep_state, sharded)
        loss = float(losses["loss"])
    assert np.isfinite(loss)
    assert int(new_state.step) == 1


def test_dp_sp_eval_tight_with_f64_norm_stats(monkeypatch):
    """Certify the 5e-2 tolerance of `test_dp_sp_eval_matches_unsharded`:
    with instance-norm STATISTICS computed in float64 (everything else
    unchanged, f32 in/out), the sharded and unsharded BACKBONE outputs
    agree to 2e-3 — so the f32 backbone gap is rsqrt(var+eps)
    conditioning amplifying the cross-shard stat-reduction reorder, not a
    partitioner semantic difference. (The norm-free path is bit-level
    exact: test_dp_sp_backbone_exact_with_identity_norm. The decoder
    keeps its own benign f32 reorder noise — attention/pooling psums —
    measured ~1e-2 on pred_class, inside the 5e-2 blanket bound.)"""
    from mask3d_tpu.sparse import dense_ops
    from mask3d_tpu.train.loop import make_model

    def f64_stats_norm(x, occ, gamma, beta, eps=1e-5):
        axes = (1, 2, 3)
        x64 = x.astype(jnp.float64)
        cnt = jnp.maximum(jnp.sum(occ.astype(jnp.float64), axis=axes), 1.0)
        cnt = cnt[:, None, None, None, :]
        mean = jnp.sum(x64, axis=axes, keepdims=True) / cnt
        sq = jnp.sum(x64 * x64, axis=axes, keepdims=True) / cnt
        var = jnp.maximum(sq - mean * mean, 0.0)
        rs = jax.lax.rsqrt(var + eps)
        k = (rs * gamma).astype(x.dtype)
        t = (beta - mean * rs * gamma).astype(x.dtype)
        return x * k + occ.astype(x.dtype) * t

    # init OUTSIDE the x64 context (params stay f32) and BEFORE the
    # monkeypatch (init's norm calls don't matter and would warn about
    # truncated f64 outside the context).
    host = _batch(2)
    batch = host.device
    cfg0 = _cfg(None)
    state, model0, _, _ = init_state(cfg0, batch)
    monkeypatch.setattr(dense_ops, "dense_instance_norm", f64_stats_norm)
    # Unfuse the stem so its norm stats also run through f64_stats_norm
    # (the fused form keeps f32 folded-layout stats).
    monkeypatch.setattr(
        dense_ops, "dense_stem_fused",
        lambda x, w, occ, g, b, bias=None, compute_dtype=None, eps=1e-5:
            jnp.maximum(f64_stats_norm(
                dense_ops.dense_conv_same_zfold(
                    x, w, occ, bias=bias, compute_dtype=compute_dtype
                ), occ, g, b, eps), 0),
    )

    def bb_fn(cfg, model):
        caps = level_capacities(cfg, batch.coords.shape[1])
        kw = _sb_kwargs(cfg, batch.grid_dims)

        @jax.jit
        def fwd(params, buffers, coords, counts, dims, feats):
            sb = build_sparse_batch(coords, counts, dims, caps, **kw)
            out = model.apply(
                {"params": params, "buffers": buffers},
                sb, feats, coords.astype(jnp.float32), True,
                grid_dims=batch.grid_dims,
            )
            return out.backbone_feats

        return fwd

    args = (batch.coords, batch.counts, batch.dims, batch.feats)
    with jax.enable_x64(True):
        ref = jax.device_get(
            bb_fn(cfg0, model0)(state.params, state.buffers, *args)
        )

        model1 = make_model(_cfg("sp"))
        mesh = make_mesh_2d(2, 2)
        with jax.sharding.set_mesh(mesh):
            sharded = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, NamedSharding(mesh, P("dp"))),
                batch,
            )
            params = replicate(state.params, mesh)
            buffers = replicate(state.buffers, mesh)
            got = jax.device_get(
                bb_fn(_cfg("sp"), model1)(
                    params, buffers, sharded.coords, sharded.counts,
                    sharded.dims, sharded.feats,
                )
            )

    # Measured max |diff| 9.7e-4 (vs the 2e-1 f32 blanket bound): the
    # few-ulp f64->f32 stat rounding seeds cascade through 8 norm+relu
    # layers. 100x tighter than f32 certifies the mechanism.
    np.testing.assert_allclose(got, ref, atol=2e-3)
