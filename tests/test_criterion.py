"""Criterion parity tests vs an unpadded numpy/scipy oracle.

The oracle re-states the reference formulas directly
(`mask3d/models/matcher.py:17-59,94-178`, `mask3d/models/criterion.py:27-213`)
on unpadded per-item arrays; the batched padded implementation must agree.
"""

import numpy as np
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment as scipy_lsa

from mask3d_tpu.data.batch import Targets
from mask3d_tpu.models.mask3d import Mask3DOutput
from mask3d_tpu.train.criterion import SetCriterion


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def oracle_costs(pred_class, mask_logits, labels, masks, w):
    """Reference matcher cost for one item (unpadded)."""
    e = np.exp(pred_class - pred_class.max(-1, keepdims=True))
    prob = e / e.sum(-1, keepdims=True)
    cost_class = -prob[:, labels]  # [Q, I]
    x = mask_logits.T  # [Q, N]
    t = masks.astype(np.float64)  # [I, N]
    pos = np.log1p(np.exp(-x))
    neg = np.log1p(np.exp(x))
    n = x.shape[1]
    cost_mask = (pos @ t.T + neg @ (1 - t).T) / n
    p = sigmoid(x)
    num = 2 * (p @ t.T)
    den = p.sum(-1)[:, None] + t.sum(-1)[None, :]
    cost_dice = 1 - (num + 1) / (den + 1)
    return w["mask"] * cost_mask + w["class"] * cost_class + w["dice"] * cost_dice


def oracle_level_losses(pred_class_b, mask_logits_b, labels_b, masks_b,
                        counts, num_classes, eos, w):
    """Reference loss for one level across the batch (unpadded items)."""
    B, Q = pred_class_b.shape[:2]
    ce_num, ce_den = 0.0, 0.0
    loss_mask, loss_dice = 0.0, 0.0
    weight = np.ones(num_classes + 1)
    weight[-1] = eos
    for b in range(B):
        n = counts[b]
        labels = labels_b[b]
        masks = masks_b[b][:, :n]
        C = oracle_costs(
            pred_class_b[b], mask_logits_b[b][:n], labels, masks, w
        )
        rr, cc = scipy_lsa(C)
        tgt_cls = np.full(Q, num_classes)
        tgt_cls[rr] = labels[cc]
        logits = pred_class_b[b]
        e = np.exp(logits - logits.max(-1, keepdims=True))
        logp = np.log(e / e.sum(-1, keepdims=True))
        for q in range(Q):
            ce_num += -logp[q, tgt_cls[q]] * weight[tgt_cls[q]]
            ce_den += weight[tgt_cls[q]]
        # mask losses over matched pairs, / num gt of the item
        n_gt = len(labels)
        for q, i in zip(rr, cc):
            x = mask_logits_b[b][:n, q]
            t = masks[i].astype(np.float64)
            bce = (np.log1p(np.exp(-np.abs(x))) + np.maximum(-x * (2 * t - 1), 0))
            # numerically-stable BCE-with-logits: softplus(x) - x*t
            bce = np.log1p(np.exp(-np.abs(x))) + np.maximum(x, 0) - x * t
            loss_mask += bce.mean() / n_gt
            p = sigmoid(x)
            dice = 1 - (2 * (p * t).sum() + 1) / (p.sum() + t.sum() + 1)
            loss_dice += dice / n_gt
    return ce_num / ce_den, loss_mask, loss_dice


def make_problem(rng, B=3, Q=6, N=40, I_cap=8, C=1):
    counts = rng.integers(N // 2, N, B)
    n_inst = rng.integers(1, I_cap - 1, B)
    pred_class = rng.normal(size=(2, B, Q, C + 1)).astype(np.float32)
    pred_masks = rng.normal(size=(2, B, N, Q)).astype(np.float32) * 2
    point_valid = np.zeros((B, N), bool)
    labels = np.zeros((B, I_cap), np.int32)
    masks = np.zeros((B, I_cap, N), bool)
    valid = np.zeros((B, I_cap), bool)
    for b in range(B):
        point_valid[b, : counts[b]] = True
        pred_masks[:, b, counts[b]:] = 77.0  # garbage in padding: must be ignored
        for i in range(n_inst[b]):
            m = rng.random(counts[b]) < 0.3
            m[rng.integers(0, counts[b])] = True  # non-empty
            masks[b, i, : counts[b]] = m
            labels[b, i] = rng.integers(0, C)
            valid[b, i] = True
    targets = Targets(
        labels=jnp.asarray(labels),
        masks=jnp.asarray(masks),
        valid=jnp.asarray(valid),
        point_instance_ids=jnp.zeros((B, N), jnp.int32),
    )
    return pred_class, pred_masks, point_valid, targets, counts, n_inst, labels, masks


def test_criterion_matches_oracle(rng):
    pred_class, pred_masks, point_valid, targets, counts, n_inst, labels, masks = \
        make_problem(rng)
    crit = SetCriterion(num_classes=1)
    out = Mask3DOutput(
        aux_pred_class=jnp.asarray(pred_class),
        aux_pred_masks=jnp.asarray(pred_masks),
        sampled_coords=None,
        backbone_feats=None,
    )
    losses = crit(out, targets, jnp.asarray(point_valid))

    w = {"class": 2.0, "mask": 5.0, "dice": 2.0}
    for lvl, names in (
        (0, ("loss_ce_mask_module_0", "loss_mask_mask_module_0",
             "loss_dice_mask_module_0")),
        (1, ("loss_ce", "loss_mask", "loss_dice")),
    ):
        labels_list = [labels[b][: n_inst[b]] for b in range(len(counts))]
        masks_list = [masks[b][: n_inst[b]] for b in range(len(counts))]
        ce, lm, ld = oracle_level_losses(
            pred_class[lvl].astype(np.float64),
            pred_masks[lvl].astype(np.float64),
            labels_list, masks_list, counts, 1, 0.1, w,
        )
        np.testing.assert_allclose(float(losses[names[0]]), ce, rtol=2e-4)
        np.testing.assert_allclose(float(losses[names[1]]), lm, rtol=2e-4)
        np.testing.assert_allclose(float(losses[names[2]]), ld, rtol=2e-4)

    # total = weighted sum across levels
    exp_total = 0.0
    for lvl in range(2):
        labels_list = [labels[b][: n_inst[b]] for b in range(len(counts))]
        masks_list = [masks[b][: n_inst[b]] for b in range(len(counts))]
        ce, lm, ld = oracle_level_losses(
            pred_class[lvl].astype(np.float64),
            pred_masks[lvl].astype(np.float64),
            labels_list, masks_list, counts, 1, 0.1, w,
        )
        exp_total += 2.0 * ce + 5.0 * lm + 2.0 * ld
    np.testing.assert_allclose(float(losses["loss"]), exp_total, rtol=2e-4)


def test_criterion_empty_targets(rng):
    """Items with zero instances must give zero mask loss, CE all-ignore."""
    B, Q, N, I = 2, 4, 20, 8
    pred_class = rng.normal(size=(1, B, Q, 2)).astype(np.float32)
    pred_masks = rng.normal(size=(1, B, N, Q)).astype(np.float32)
    point_valid = np.ones((B, N), bool)
    targets = Targets(
        labels=jnp.zeros((B, I), jnp.int32),
        masks=jnp.zeros((B, I, N), bool),
        valid=jnp.zeros((B, I), bool),
        point_instance_ids=jnp.zeros((B, N), jnp.int32),
    )
    crit = SetCriterion(num_classes=1)
    out = Mask3DOutput(
        aux_pred_class=jnp.asarray(pred_class),
        aux_pred_masks=jnp.asarray(pred_masks),
        sampled_coords=None,
        backbone_feats=None,
    )
    losses = crit(out, targets, jnp.asarray(point_valid))
    assert float(losses["loss_mask"]) == 0.0
    assert float(losses["loss_dice"]) == 0.0
    assert np.isfinite(float(losses["loss"]))


def test_criterion_jits_and_differentiates(rng):
    import jax

    pred_class, pred_masks, point_valid, targets, *_ = make_problem(rng)
    crit = SetCriterion(num_classes=1)

    @jax.jit
    def total(pc, pm):
        out = Mask3DOutput(
            aux_pred_class=pc, aux_pred_masks=pm,
            sampled_coords=None, backbone_feats=None,
        )
        return crit(out, targets, jnp.asarray(point_valid))["loss"]

    g = jax.grad(total, argnums=(0, 1))(
        jnp.asarray(pred_class), jnp.asarray(pred_masks)
    )
    for gi in g:
        arr = np.asarray(gi)
        assert np.isfinite(arr).all()
        assert np.abs(arr).sum() > 0
    # padded-point mask gradients must be exactly zero
    gm = np.asarray(g[1])
    pv = point_valid
    assert np.abs(gm[:, ~pv]).max() == 0
