"""Oracle tests for the fused int8 block-chain kernels (pallas_chain).

Interpret-mode on the CPU mesh. The entry kernel must be BIT-identical
to `dense_ops.dense_conv_same_int8` (same quantize/fold/requant math,
integer conv accumulation); the full fused stage must match the unfused
XLA int8 path (`dense_conv_same_int8` + `dense_instance_norm` +
`quantize_static` composition, i.e. `Res16UNetBase._block` semantics)
within quantize-step tolerance (the fused prologue applies the
InstanceNorm affine in f32 where the XLA path rounds k/t to bf16, so
individual cells may flip one quantize boundary).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mask3d_tpu.sparse import dense_ops
from mask3d_tpu.sparse import pallas_chain as pc


def make_grid(rng, b=2, dims=(12, 10, 8), c=32, occ_p=0.3):
    occ = (rng.random((b,) + dims + (1,)) < occ_p).astype(np.float32)
    x = rng.standard_normal((b,) + dims + (c,)).astype(np.float32)
    x = (x * occ).astype(jnp.bfloat16)
    return jnp.asarray(x), jnp.asarray(occ)


def make_blocks(rng, cin, planes, n, with_down=None):
    blocks = []
    for i in range(n):
        ci = cin if i == 0 else planes
        blk = {
            "w1": jnp.asarray(
                rng.standard_normal((27, ci, planes)).astype(np.float32)
                * 0.1),
            "g1": jnp.asarray(1.0 + 0.1 * rng.standard_normal(planes)
                              .astype(np.float32)),
            "b1": jnp.asarray(0.1 * rng.standard_normal(planes)
                              .astype(np.float32)),
            "w2": jnp.asarray(
                rng.standard_normal((27, planes, planes)).astype(np.float32)
                * 0.1),
            "g2": jnp.asarray(1.0 + 0.1 * rng.standard_normal(planes)
                              .astype(np.float32)),
            "b2": jnp.asarray(0.1 * rng.standard_normal(planes)
                              .astype(np.float32)),
        }
        if i == 0 and (with_down if with_down is not None
                       else cin != planes):
            blk["wd"] = jnp.asarray(
                rng.standard_normal((1, ci, planes)).astype(np.float32)
                * 0.1)
            blk["gd"] = jnp.asarray(1.0 + 0.1 * rng.standard_normal(planes)
                                    .astype(np.float32))
            blk["bd"] = jnp.asarray(0.1 * rng.standard_normal(planes)
                                    .astype(np.float32))
        blocks.append(blk)
    return blocks


SPEC_KW = dict(tile=256, sub=64)


def test_pack_roundtrip():
    rng = np.random.default_rng(0)
    x, _ = make_grid(rng, c=17)
    spec = pc.make_pack_spec(x.shape[1:4], quantum=SPEC_KW["tile"])
    buf = pc.pack_grid(x, spec)
    back = pc.unpack_grid(buf, spec, 17)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def oracle_block(x, bound_in, occ, blk, sigma):
    """The unfused XLA int8 path of `Res16UNetBase._block` (dense ctx)."""
    def sig(g, b):
        return sigma * jnp.abs(g) + jnp.abs(b)

    out = dense_ops.dense_conv_same_int8(
        x, blk["w1"], occ, out_dtype=jnp.bfloat16, act_bound=bound_in)
    out = jax.nn.relu(dense_ops.dense_instance_norm(
        out, occ, blk["g1"], blk["b1"]))
    b1 = sig(blk["g1"], blk["b1"])
    out = dense_ops.dense_conv_same_int8(
        out, blk["w2"], occ, out_dtype=jnp.bfloat16, act_bound=b1)
    out = dense_ops.dense_instance_norm(out, occ, blk["g2"], blk["b2"])
    bout = sig(blk["g2"], blk["b2"])
    if "wd" in blk:
        res = dense_ops.dense_conv_same_int8(
            x, blk["wd"], occ, out_dtype=jnp.bfloat16, act_bound=bound_in)
        res = dense_ops.dense_instance_norm(res, occ, blk["gd"], blk["bd"])
        bres = sig(blk["gd"], blk["bd"])
    else:
        res, bres = x, bound_in
    y = jax.nn.relu(out.astype(jnp.float32) + res.astype(jnp.float32))
    return y.astype(jnp.bfloat16), bout + bres


def test_entry_kernel_bitexact_vs_xla_int8():
    """Entry kernel == dense_conv_same_int8 (3^3 + the 1x1 downsample),
    bit for bit: same quantize, same integer conv, same requant."""
    rng = np.random.default_rng(1)
    cin, planes = 24, 48
    x, occ = make_grid(rng, c=cin)
    bound = jnp.asarray(np.abs(rng.standard_normal(cin)).astype(np.float32)
                        + 0.5)
    blocks = make_blocks(rng, cin, planes, 1)
    spec = pc.make_pack_spec(x.shape[1:4], quantum=SPEC_KW["tile"])

    xq, sx = pc.quantize_pack(x, bound, occ, spec)
    occ_pack = pc.pack_grid(
        jnp.broadcast_to(occ, x.shape[:4] + (pc.LANES,)).astype(jnp.int8),
        spec)
    wq1, sw1 = pc.prep_weights_int8(
        blocks[0]["w1"], sx, cin, planes, None, None)
    wdq, swd = pc.prep_weights_int8(
        blocks[0]["wd"], sx, cin, planes, None, None)
    consts = pc._consts(x.shape[0], sw=sw1, swd=swd)
    raw1, res_raw, stats = pc.chain_conv(
        xq, wq1, consts, spec, "entry", occ_packed=occ_pack, wdq=wdq,
        cout=planes, interpret=True, **SPEC_KW)

    ref1 = dense_ops.dense_conv_same_int8(
        x, blocks[0]["w1"], occ, out_dtype=jnp.bfloat16, act_bound=bound)
    refd = dense_ops.dense_conv_same_int8(
        x, blocks[0]["wd"], occ, out_dtype=jnp.bfloat16, act_bound=bound)

    got1 = pc.unpack_grid(raw1, spec, planes)
    gotd = pc.unpack_grid(res_raw, spec, planes)
    np.testing.assert_array_equal(
        np.asarray(got1, np.float32), np.asarray(ref1, np.float32))
    np.testing.assert_array_equal(
        np.asarray(gotd, np.float32), np.asarray(refd, np.float32))

    # occupancy rides lane `planes` of the raw output
    occ_lane = pc.unpack_grid(raw1, spec, planes + 1)[..., planes:]
    np.testing.assert_array_equal(
        np.asarray(occ_lane, np.float32), np.asarray(occ))

    # stats = masked sum / sumsq of the bf16 output
    r32 = np.asarray(ref1, np.float32)
    np.testing.assert_allclose(
        np.asarray(stats[:, 0, :planes]),
        r32.sum(axis=(1, 2, 3)), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(stats[:, 1, :planes]),
        (r32 * r32).sum(axis=(1, 2, 3)), rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("cin,planes,n,kdepth",
                         [(24, 48, 2, 1), (48, 48, 2, 1), (24, 48, 1, 1),
                          (48, 48, 3, 1), (48, 48, 2, 2)])
def test_fused_stage_matches_xla_path(cin, planes, n, kdepth):
    """Full fused stage vs the unfused dense int8 block composition,
    within quantize-step tolerance (f32 vs bf16 affine constants)."""
    rng = np.random.default_rng(2 + n)
    x, occ = make_grid(rng, c=cin)
    # a VALID static bound on |x| (in the model, bounds are sigma-derived
    # from the producing norm and bound the activations by construction;
    # an under-sized bound makes the junction's y-quantize saturate where
    # the unquantized oracle doesn't — that clip is the shipped
    # int8_residual semantics, not an error, but it would fail this
    # comparison against the unquantized-residual oracle)
    bound = jnp.asarray(
        np.abs(np.asarray(x, np.float32)).max(axis=(0, 1, 2, 3)) * 1.05
        + 1e-3)
    sigma = 8.0
    blocks = make_blocks(rng, cin, planes, n)

    y, y_bound = pc.fused_basic_stage(
        x, bound, occ, blocks, x.shape[1:4], sigma,
        interpret=True, kdepth=kdepth, **SPEC_KW)

    ref = x
    rb = bound
    for blk in blocks:
        ref, rb = oracle_block(ref, rb, occ, blk, sigma)

    assert y.shape == ref.shape
    np.testing.assert_allclose(np.asarray(y_bound), np.asarray(rb),
                               rtol=1e-5)
    got = np.asarray(y, np.float32)
    want = np.asarray(ref, np.float32)
    # per-channel quantize step of the junction inputs bounds the flip
    # error; the bf16 k/t rounding of the oracle adds ~1% relative
    step = np.asarray(rb) / 127.0
    diff = np.abs(got - want)
    tol = 3.0 * step[None, None, None, None, :] + 0.02 * np.abs(want) + 0.02
    frac_bad = float((diff > tol).mean())
    assert frac_bad == 0.0, (
        f"{frac_bad:.2%} cells beyond quantize tolerance; "
        f"max diff {diff.max():.4f}")
    # and the bulk must agree tightly
    assert float(np.median(diff[np.asarray(occ[..., 0]) > 0])) < \
        float(np.median(step)), "systematic offset vs oracle"


def test_fused_stage_empty_item():
    """An all-empty item (occ = 0 everywhere) stays exactly zero."""
    rng = np.random.default_rng(9)
    x, occ = make_grid(rng, b=2, c=24)
    x = x.at[1].set(0)
    occ = occ.at[1].set(0)
    bound = jnp.ones((24,), jnp.float32)
    blocks = make_blocks(rng, 24, 48, 2)
    y, _ = pc.fused_basic_stage(
        x, bound, occ, blocks, x.shape[1:4], 8.0, interpret=True,
        **SPEC_KW)
    assert float(jnp.abs(y[1]).max()) == 0.0
    assert np.isfinite(np.asarray(y, np.float32)).all()


def test_backbone_routing_matches_unfused(monkeypatch):
    """End-to-end model integration: with `model.pallas_chain` the
    >=96-ch stride-1 stages route through the fused chain (MIN_ROWS
    forced to 0 so the small test grids qualify) and the eval forward
    matches the unfused int8 path within quantize tolerance. Also
    certifies param-name identity (same state drives both paths)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_e2e import small_config
    from mask3d_tpu.data import VoxelizeCollate, make_synthetic_scene
    from mask3d_tpu.train.loop import init_state, make_eval_step

    monkeypatch.setattr(pc, "MIN_ROWS", 0)

    rng = np.random.default_rng(11)
    items = [
        make_synthetic_scene(rng, num_rooms_x=2, num_rooms_y=1,
                             room_size=12, height=6, jitter=0.0,
                             dropout=0.5)
        for _ in range(2)
    ]
    batch = VoxelizeCollate(point_bucket_multiple=512)(items).device

    cfg = small_config()
    # 18A: stage 8 has TWO blocks -> the junction kernel is exercised
    from mask3d_tpu.config import apply_overrides
    apply_overrides(cfg, [
        "model.backbone=Res16UNet18A",
        "model.backbone_impl=dense",
        "model.int8_stride1=true",
        "model.int8_act_sigma=10",
        # int8 junction outputs: the unfused comparison path quantizes
        # intermediate block outputs exactly like the fused junction
        # kernel does, so the remaining delta is only the f32-vs-bf16
        # affine constants + stats accumulation order
        "model.int8_residual=true",
    ])
    state, model, criterion, _ = init_state(cfg, batch)
    ev = make_eval_step(cfg, model, criterion)
    pc_ref, pm_ref, _ = ev(state, batch)

    cfg2 = small_config()
    apply_overrides(cfg2, [
        "model.backbone=Res16UNet18A",
        "model.backbone_impl=dense",
        "model.int8_stride1=true",
        "model.int8_act_sigma=10",
        "model.int8_residual=true",
        "model.pallas_chain=true",
    ])
    _, model2, criterion2, _ = init_state(cfg2, batch)
    ev2 = make_eval_step(cfg2, model2, criterion2)
    pc_got, pm_got, _ = ev2(state, batch)  # SAME params: names identical

    a, b = np.asarray(pc_ref, np.float32), np.asarray(pc_got, np.float32)
    m1, m2 = np.asarray(pm_ref, np.float32), np.asarray(pm_got, np.float32)
    assert np.isfinite(b).all() and np.isfinite(m2).all()
    # int8 quantize-boundary flips in the fused stage perturb logits a
    # little; class/mask predictions must stay strongly correlated
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    mcorr = np.corrcoef(m1.ravel(), m2.ravel())[0, 1]
    assert corr > 0.999 and mcorr > 0.995, (corr, mcorr)
    np.testing.assert_allclose(
        np.argmax(a, -1), np.argmax(b, -1))
