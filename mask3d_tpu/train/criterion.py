"""Hungarian matching + set criterion (CE / sigmoid-BCE / dice), batched.

Rebuild of the reference loss stack:
- matcher costs: `mask3d/models/matcher.py:17-59,94-178`
  (C = cost_mask*BCE + cost_class*(-prob) + cost_dice*dice; defaults 5/2/2
  from `mask3d/conf/matcher/hungarian_matcher.yaml:2-5`)
- losses: `mask3d/models/criterion.py:27-72,140-213`
  (weighted CE with eos_coef down-weighting of the ignore class; per-item
  mask BCE + dice over matched pairs normalized by the item's instance
  count — note the reference shadows the global `num_masks` with the
  per-item count at `criterion.py:188`, which we reproduce)
- deep supervision: one (matcher + losses) evaluation per mask-module output
  (`criterion.py:253-272`), here a `lax.scan` over the stacked L outputs so
  matching for all levels stays on device in one jitted region (the
  reference pays 13 x batch_size host LSAP syncs per step,
  `matcher.py:168-170`).

Everything is masked for padding: invalid points contribute nothing, invalid
(padded) instances get a large constant matching cost and are dropped from
the losses.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from mask3d_tpu.data.batch import Targets
from mask3d_tpu.models.mask3d import Mask3DOutput
from mask3d_tpu.ops.lsap import linear_sum_assignment

_INVALID_COST = 1e4  # column-constant cost for padded instances (fp32-safe)


def batch_sigmoid_ce_cost(logits, tgt, point_valid):
    """Pairwise mean-BCE cost [Q, I] (reference `matcher.py:38-56`).

    logits: [N, Q]; tgt: bool[I, N]; point_valid: bool[N]. The mean is over
    the item's true point count (the reference's `hw`).
    """
    x = logits.astype(jnp.float32)
    # BCE(x, 1) = softplus(-x); BCE(x, 0) = softplus(x)
    pos = jax.nn.softplus(-x)
    neg = jax.nn.softplus(x)
    pv = point_valid.astype(jnp.float32)[:, None]
    pos, neg = pos * pv, neg * pv
    t = tgt.astype(jnp.float32)
    ce = jnp.einsum("nq,in->qi", pos, t) + jnp.einsum(
        "nq,in->qi", neg * pv, (1.0 - t) * point_valid[None, :]
    )
    n = jnp.maximum(jnp.sum(pv), 1.0)
    return ce / n


def batch_dice_cost(logits, tgt, point_valid):
    """Pairwise dice cost [Q, I] (reference `matcher.py:17-32`)."""
    p = jax.nn.sigmoid(logits.astype(jnp.float32))
    p = p * point_valid.astype(jnp.float32)[:, None]
    t = tgt.astype(jnp.float32) * point_valid.astype(jnp.float32)[None, :]
    num = 2.0 * jnp.einsum("nq,in->qi", p, t)
    den = jnp.sum(p, axis=0)[:, None] + jnp.sum(t, axis=-1)[None, :]
    return 1.0 - (num + 1.0) / (den + 1.0)


class SetCriterion:
    """Functional (jit-friendly) matcher + criterion."""

    def __init__(
        self,
        num_classes: int = 1,
        cost_class: float = 2.0,
        cost_mask: float = 5.0,
        cost_dice: float = 2.0,
        eos_coef: float = 0.1,
        class_weights: Optional[Sequence[float]] = None,
        ignore_mask_idx: Sequence[int] = (),
        lsap_method: str = "device",
    ):
        self.num_classes = num_classes
        self.cost_class = cost_class
        self.cost_mask = cost_mask
        self.cost_dice = cost_dice
        self.eos_coef = eos_coef
        self.ignore_mask_idx = tuple(ignore_mask_idx)
        self.lsap_method = lsap_method
        import numpy as np

        w = np.ones(num_classes + 1, np.float32)
        w[-1] = eos_coef
        if class_weights is not None and class_weights != -1:
            assert len(class_weights) == num_classes
            w[:-1] = class_weights
        self.empty_weight = w

    # ---- matching ----

    def match(self, pred_class, pred_masks, targets: Targets, point_valid):
        """One level. pred_class [B,Q,C+1]; pred_masks [B,N,Q].

        Returns (col4row i32[B, Q], matched bool[B, Q]): the target instance
        assigned to each query, dropped where it points at padding.
        """
        prob = jax.nn.softmax(pred_class.astype(jnp.float32), axis=-1)
        safe_labels = jnp.clip(targets.labels, 0, self.num_classes)
        # cost_class[b, q, i] = -prob[b, q, label_i]
        cost_class = -jnp.take_along_axis(
            prob, safe_labels[:, None, :], axis=-1
        )

        def _item(logits, tgt, pv):
            return (
                batch_sigmoid_ce_cost(logits, tgt, pv),
                batch_dice_cost(logits, tgt, pv),
            )

        cost_mask, cost_dice = jax.vmap(_item)(
            pred_masks, targets.masks, point_valid
        )
        cost = (
            self.cost_mask * cost_mask
            + self.cost_class * cost_class
            + self.cost_dice * cost_dice
        )
        cost = jnp.where(
            targets.valid[:, None, :], cost, jnp.float32(_INVALID_COST)
        )
        col4row = linear_sum_assignment(cost, method=self.lsap_method)
        n_inst = targets.valid.shape[-1]
        in_range = col4row < n_inst
        safe_col = jnp.where(in_range, col4row, 0)
        matched = in_range & jnp.take_along_axis(
            targets.valid, safe_col, axis=-1
        )
        return safe_col, matched

    # ---- losses ----

    def loss_labels(self, pred_class, targets: Targets, col4row, matched):
        """Weighted CE (reference `criterion.py:140-166`)."""
        logits = pred_class.astype(jnp.float32)
        tgt_cls = jnp.where(
            matched,
            jnp.take_along_axis(targets.labels, col4row, axis=-1),
            self.num_classes,
        )
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, tgt_cls[..., None], axis=-1)[..., 0]
        w = jnp.asarray(self.empty_weight)[tgt_cls]
        # torch F.cross_entropy(weight=w) normalizes by the weight sum
        return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-8)

    def loss_masks(self, pred_masks, targets: Targets, col4row, matched,
                   point_valid):
        """Per-item matched BCE + dice (reference `criterion.py:168-213`)."""
        # Invert the assignment: query index serving each target instance
        # (columns are assigned at most once, so a plain scatter suffices;
        # unmatched queries write to the dropped extra column).
        b, q = col4row.shape
        n_inst = targets.labels.shape[-1]
        rows = jnp.broadcast_to(jnp.arange(q, dtype=jnp.int32)[None], (b, q))
        write_col = jnp.where(matched, col4row, n_inst)
        b_idx = jnp.arange(b, dtype=jnp.int32)[:, None]
        inv = (
            jnp.zeros((b, n_inst + 1), jnp.int32)
            .at[b_idx, write_col]
            .set(rows)[:, :n_inst]
        )
        has = (
            jnp.zeros((b, n_inst + 1), bool)
            .at[b_idx, write_col]
            .set(True)[:, :n_inst]
        )

        # Gather each matched query's mask logits: [B, I, N]
        pm = jnp.swapaxes(pred_masks.astype(jnp.float32), 1, 2)  # [B, Q, N]
        pred_m = jnp.take_along_axis(pm, inv[..., None], axis=1)
        tgt_m = targets.masks.astype(jnp.float32)

        pair_ok = (has & targets.valid).astype(jnp.float32)  # [B, I]
        pv = point_valid.astype(jnp.float32)[:, None, :]  # [B, 1, N]
        npts = jnp.maximum(jnp.sum(pv, axis=-1), 1.0)  # [B, 1]

        bce = jax.nn.softplus(pred_m) - pred_m * tgt_m  # elementwise BCE
        bce = jnp.sum(bce * pv, axis=-1) / npts  # [B, I] mean over points

        p = jax.nn.sigmoid(pred_m) * pv
        t = tgt_m * pv
        num = 2.0 * jnp.sum(p * t, axis=-1)
        den = jnp.sum(p, axis=-1) + jnp.sum(t, axis=-1)
        dice = 1.0 - (num + 1.0) / (den + 1.0)  # [B, I]

        # Reference `criterion.py:188`: normalizer is the item's gt count.
        n_gt = jnp.maximum(jnp.sum(targets.valid, axis=-1), 1)[..., None]
        loss_mask = jnp.sum(bce * pair_ok / n_gt)
        loss_dice = jnp.sum(dice * pair_ok / n_gt)
        return loss_mask, loss_dice

    def level_losses(self, pred_class, pred_masks, targets, point_valid):
        col4row, matched = self.match(
            pred_class, pred_masks, targets, point_valid
        )
        ce = self.loss_labels(pred_class, targets, col4row, matched)
        lm, ld = self.loss_masks(
            pred_masks, targets, col4row, matched, point_valid
        )
        return ce, lm, ld

    def __call__(self, output: Mask3DOutput, targets: Targets, point_valid,
                 ce_scale: float = 1.0) -> Dict[str, jax.Array]:
        """All-level losses. Returns the reference's loss dict shape:
        loss_ce/loss_mask/loss_dice for the final output,
        *_mask_module_{i} for the aux outputs, plus weighted total "loss"
        (weights == matcher costs, `trainer.py:154-169`).

        `ce_scale` multiplies the CE terms in the TOTAL only (the reported
        per-level entries stay raw). Gradient accumulation uses it: mask/
        dice are batch SUMS (the reference shadows its global `num_masks`
        with the per-item count and sums items, `criterion.py:188,207-208`)
        so micro-batch gradients add exactly, while CE is a batch MEAN
        (`criterion.py:160-164`) so each micro-batch contributes 1/K of it.
        """
        L = output.aux_pred_class.shape[0]

        def level(carry, xs):
            pc, pm = xs
            ce, lm, ld = self.level_losses(pc, pm, targets, point_valid)
            return carry, jnp.stack([ce, lm, ld])

        _, per_level = jax.lax.scan(
            level, None, (output.aux_pred_class, output.aux_pred_masks)
        )  # [L, 3]

        losses: Dict[str, jax.Array] = {
            "loss_ce": per_level[-1, 0],
            "loss_mask": per_level[-1, 1],
            "loss_dice": per_level[-1, 2],
        }
        w = jnp.asarray(
            [self.cost_class * ce_scale, self.cost_mask, self.cost_dice],
            jnp.float32,
        )
        level_w = jnp.ones((L,), jnp.float32)
        for i in self.ignore_mask_idx:
            level_w = level_w.at[i].set(0.0)
        total = jnp.sum(per_level * w[None, :] * level_w[:, None])
        for i in range(L - 1):
            losses[f"loss_ce_mask_module_{i}"] = per_level[i, 0]
            losses[f"loss_mask_mask_module_{i}"] = per_level[i, 1]
            losses[f"loss_dice_mask_module_{i}"] = per_level[i, 2]
        losses["loss"] = total
        return losses
