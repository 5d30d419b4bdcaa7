"""RoomFormer-TPU tests: ops vs oracles, model smoke, criterion, eval."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mask3d_tpu.baseline.deform_attn import bilinear_sample, ms_deform_attn_core
from mask3d_tpu.baseline.poly_ops import (
    all_cyclic_orders,
    extract_room_polygons,
    is_clockwise,
    pad_polygons,
    resort_corners,
)
from mask3d_tpu.baseline.raster import soft_polygon
from mask3d_tpu.baseline.criterion2d import RoomFormerCriterion, cyclic_min_l1
from mask3d_tpu.baseline.floorplan_eval import FloorplanEvaluator
from mask3d_tpu.baseline.roomformer import RoomFormer


def test_bilinear_sample_oracle(rng):
    h, w, c = 8, 10, 3
    val = rng.normal(size=(h, w, c)).astype(np.float32)
    # at a pixel center the sample equals the pixel value
    loc = np.array([[(3 + 0.5) / w, (5 + 0.5) / h]], np.float32)
    out = np.asarray(bilinear_sample(jnp.asarray(val), jnp.asarray(loc)))
    np.testing.assert_allclose(out[0], val[5, 3], rtol=1e-5)
    # midway between two pixel centers = mean
    loc = np.array([[(4.0) / w, (5 + 0.5) / h]], np.float32)
    out = np.asarray(bilinear_sample(jnp.asarray(val), jnp.asarray(loc)))
    np.testing.assert_allclose(out[0], 0.5 * (val[5, 3] + val[5, 4]),
                               rtol=1e-5)
    # far outside -> zeros
    loc = np.array([[2.0, 2.0]], np.float32)
    out = np.asarray(bilinear_sample(jnp.asarray(val), jnp.asarray(loc)))
    np.testing.assert_allclose(out[0], 0.0)


def test_ms_deform_attn_vs_naive(rng):
    """Numerical parity with a naive per-sample oracle (the reference's own
    verification pattern, RoomFormer/models/ops/test.py:32-41)."""
    b, nh, hd = 2, 2, 4
    shapes = [(6, 8), (3, 4)]
    total = sum(h * w for h, w in shapes)
    q, p = 5, 3
    value = rng.normal(size=(b, total, nh, hd)).astype(np.float32)
    locs = rng.uniform(0.1, 0.9, (b, q, nh, len(shapes), p, 2)).astype(
        np.float32
    )
    w_att = rng.random((b, q, nh, len(shapes), p)).astype(np.float32)
    w_att /= w_att.sum(axis=(-2, -1), keepdims=True)

    out = np.asarray(
        ms_deform_attn_core(
            jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w_att)
        )
    )

    # naive oracle
    exp = np.zeros((b, q, nh * hd))
    for bi in range(b):
        off = 0
        acc = np.zeros((q, nh, hd))
        for li, (h, w) in enumerate(shapes):
            grid = value[bi, off:off + h * w].reshape(h, w, nh, hd)
            off += h * w
            for qi in range(q):
                for hi in range(nh):
                    for pi in range(p):
                        x, y = locs[bi, qi, hi, li, pi]
                        fx, fy = x * w - 0.5, y * h - 0.5
                        x0, y0 = int(np.floor(fx)), int(np.floor(fy))
                        dx, dy = fx - x0, fy - y0
                        v = 0
                        for (yy, xx, wt) in [
                            (y0, x0, (1 - dx) * (1 - dy)),
                            (y0, x0 + 1, dx * (1 - dy)),
                            (y0 + 1, x0, (1 - dx) * dy),
                            (y0 + 1, x0 + 1, dx * dy),
                        ]:
                            if 0 <= yy < h and 0 <= xx < w:
                                v = v + grid[yy, xx, hi] * wt
                        acc[qi, hi] += v * w_att[bi, qi, hi, li, pi]
        exp[bi] = acc.reshape(q, nh * hd)
    np.testing.assert_allclose(out, exp, rtol=1e-4, atol=1e-5)


def test_soft_polygon_modes():
    square = jnp.asarray([[8.0, 8.0], [24.0, 8.0], [24.0, 24.0], [8.0, 24.0]])
    valid = jnp.ones(4, bool)
    hard = np.asarray(soft_polygon(square, valid, 32, mode="hard_mask"))
    assert hard[16, 16] == 1.0 and hard[2, 2] == 0.0
    assert hard.sum() == pytest.approx(16 * 16, abs=40)
    soft = np.asarray(soft_polygon(square, valid, 32, 0.5, mode="mask"))
    assert soft[16, 16] > 0.95 and soft[2, 2] < 0.05
    bnd = np.asarray(soft_polygon(square, valid, 32, 2.0, mode="boundary"))
    assert bnd[16, 8] > 0.8 and bnd[16, 16] < 0.05  # ridge on the edge


def test_soft_polygon_padding_invariance():
    """Padded vertices must not change the rendered mask."""
    tri = np.array([[4.0, 4.0], [28.0, 6.0], [14.0, 26.0]])
    p1 = jnp.asarray(tri)
    v1 = jnp.ones(3, bool)
    p2 = jnp.asarray(np.concatenate([tri, np.full((2, 2), 99.0)]))
    v2 = jnp.asarray([True, True, True, False, False])
    m1 = np.asarray(soft_polygon(p1, v1, 32, mode="hard_mask"))
    m2 = np.asarray(soft_polygon(p2, v2, 32, mode="hard_mask"))
    np.testing.assert_array_equal(m1, m2)


def test_soft_polygon_differentiable():
    def area(poly):
        m = soft_polygon(poly.reshape(4, 2), jnp.ones(4, bool), 16, 0.5)
        return m.sum()

    g = jax.grad(area)(
        jnp.asarray([2.0, 2.0, 12.0, 2.0, 12.0, 12.0, 2.0, 12.0])
    )
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_poly_ops(rng):
    sq = np.array([3, 1, 3, 5, 7, 5, 7, 1], np.float64)  # some square
    rs = resort_corners(sq.copy()).reshape(-1, 2)
    assert (rs[0] == [3, 1]).all()  # closest to origin first
    orders = all_cyclic_orders(sq)
    assert orders.shape == (4, 8)
    assert (orders[0] == sq).all()

    probs = np.array([[0.9, 0.9, 0.9, 0.9, 0.2],
                      [0.9, 0.9, 0.2, 0.2, 0.2]])
    coords = rng.uniform(0.2, 0.8, (2, 5, 2))
    polys = extract_room_polygons(probs, coords, min_area=1.0)
    assert len(polys) == 1 and len(polys[0]) == 4  # second has <4 corners


def test_cyclic_min_l1_matches_bruteforce(rng):
    qp = 6
    src = rng.random((3, qp * 2)).astype(np.float32)
    tgt = np.zeros(qp * 2, np.float32)
    n = 4
    tgt[: 2 * n] = rng.random(2 * n)
    got = np.asarray(
        cyclic_min_l1(jnp.asarray(src), jnp.asarray(tgt), 2 * n)
    )
    for i in range(3):
        best = np.inf
        for r in range(n):
            rolled = np.roll(tgt[: 2 * n], 2 * r)
            best = min(best, np.abs(src[i, : 2 * n] - rolled).sum())
        np.testing.assert_allclose(got[i], best, rtol=1e-5)


@pytest.fixture(scope="module")
def tiny_model():
    model = RoomFormer(
        d_model=32, n_heads=4, n_levels=4, n_points=2, enc_layers=1,
        dec_layers=2, num_polys=3, num_queries=12,
        backbone_channels=(8, 16, 32),
    )
    density = jnp.zeros((1, 64, 64, 1))
    params = model.init(jax.random.PRNGKey(0), density)
    return model, params


def test_roomformer_forward(tiny_model):
    model, params = tiny_model
    density = jnp.ones((2, 64, 64, 1)) * 0.5
    out = model.apply(params, density)
    assert out.aux_logits.shape == (2, 2, 3, 4)
    assert out.aux_coords.shape == (2, 2, 3, 4, 2)
    c = np.asarray(out.pred_coords)
    assert ((c >= 0) & (c <= 1)).all()
    assert np.isfinite(np.asarray(out.pred_logits)).all()


def test_roomformer_criterion_and_overfit(tiny_model):
    model, params = tiny_model
    rng = np.random.default_rng(0)
    density = jnp.asarray(rng.random((1, 64, 64, 1)), jnp.float32)
    # one gt square polygon in normalized coords
    targets = {
        "coords": np.zeros((1, 3, 8), np.float32),
        "labels": np.zeros((1, 3, 4), np.float32),
        "lengths": np.zeros((1, 3), np.int32),
        "poly_valid": np.zeros((1, 3), bool),
    }
    targets["coords"][0, 0] = [0.2, 0.2, 0.8, 0.2, 0.8, 0.8, 0.2, 0.8]
    targets["labels"][0, 0] = 1
    targets["lengths"][0, 0] = 8
    targets["poly_valid"][0, 0] = True
    targets = {k: jnp.asarray(v) for k, v in targets.items()}

    crit = RoomFormerCriterion(raster_res=16)
    import optax

    tx = optax.adam(2e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            out = model.apply(p, density)
            losses = crit(out, targets)
            return losses["loss"], losses

        grads, losses = jax.grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, losses

    params2, opt_state, first = step(params, opt_state)
    for _ in range(40):
        params2, opt_state, losses = step(params2, opt_state)
    assert float(losses["loss"]) < float(first["loss"])
    assert np.isfinite(float(losses["loss"]))
    for key in ("loss_ce", "loss_coords", "loss_raster", "loss_ce_0"):
        assert key in losses


def test_floorplan_evaluator():
    sq = np.array([[50, 50], [150, 50], [150, 150], [50, 150]])
    ev = FloorplanEvaluator()
    ev.evaluate_scene([sq], [sq])
    m = ev.summarize()
    assert m["room_prec"] == 1.0 and m["room_rec"] == 1.0
    assert m["corner_prec"] == 1.0 and m["angle_prec"] == 1.0

    ev.reset()
    shifted = sq + np.array([6, 0])  # corners off by 6px (<10), same angles
    ev.evaluate_scene([shifted], [sq])
    m = ev.summarize()
    assert m["room_rec"] == 1.0  # IoU still > 0.5
    assert m["corner_rec"] == 1.0
    ev.reset()
    ev.evaluate_scene([sq + 200], [sq])  # no overlap
    m = ev.summarize()
    assert m["room_rec"] == 0.0 and m["corner_rec"] == 0.0


class SyntheticFloorplans:
    """In-memory FloorplanDataset substitute: rectangle rooms."""

    def __init__(self, n=3, qp=4, seed=0):
        from mask3d_tpu.baseline.poly_ops import pad_polygons

        rng = np.random.default_rng(seed)
        self.items = []
        for i in range(n):
            polys = [
                np.array([[40, 40], [120, 40], [120, 120], [40, 120]]),
                np.array([[140, 60], [220, 60], [220, 180], [140, 180]]),
            ]
            density = np.zeros((256, 256, 1), np.float32)
            for p in polys:
                # walls as density
                density[p[:, 1].min():p[:, 1].max(), p[0, 0], 0] = 1
                density[p[:, 1].min():p[:, 1].max(), p[1, 0], 0] = 1
                density[p[0, 1], p[:, 0].min():p[:, 0].max(), 0] = 1
                density[p[2, 1], p[:, 0].min():p[:, 0].max(), 0] = 1
            self.items.append({
                "density": density,
                "targets": pad_polygons(polys, qp),
                "gt_polys": polys,
                "scene": f"synt_{i}",
            })

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def test_floorplan_engine_end_to_end(tmp_path):
    from mask3d_tpu.baseline.engine import FloorplanTrainer

    ds = SyntheticFloorplans(n=2, qp=4)
    trainer = FloorplanTrainer(
        data_root="unused", save_dir=str(tmp_path), batch_size=2,
        num_polys=3, num_queries=12, d_model=32, enc_layers=1, dec_layers=2,
        max_epochs=2, use_raster_loss=False,
        datasets={"train": ds, "validation": ds, "test": ds},
    )
    trainer.fit()
    metrics = trainer.evaluate("test")
    for k in ("room_prec", "room_rec", "corner_prec", "angle_rec"):
        assert k in metrics
    assert os.path.exists(os.path.join(str(tmp_path), "last-epoch.ckpt"))


import os  # noqa: E402


def test_floorplan_overlap_penalty_and_scenecad():
    """Reference room metric: a matched prediction that overlaps another
    prediction (after erosion) does not count
    (`scenecad_eval/Evaluator.py:132-161`); SceneCADEvaluator uses the 3x3
    kernel protocol."""
    from mask3d_tpu.baseline import SceneCADEvaluator

    sq = np.array([[50, 50], [150, 50], [150, 150], [50, 150]])
    other = np.array([[60, 60], [160, 60], [160, 160], [60, 160]])
    ev = FloorplanEvaluator()
    ev.evaluate_scene([sq, other], [sq])
    m = ev.summarize()
    assert m["room_rec"] == 0.0  # matched but overlapping -> not TP

    # Disjoint rooms keep their TPs in the scenecad protocol.
    far = sq + 120
    ev2 = SceneCADEvaluator()
    assert ev2.erosion_kernel == 3
    ev2.evaluate_scene([sq, far], [sq, far])
    m2 = ev2.summarize()
    assert m2["room_prec"] == 1.0 and m2["room_rec"] == 1.0
