"""RoomFormer matcher + criterion, batched on device.

Rebuild of the reference polygon-level matching and losses
(`RoomFormer/models/matcher.py:13-107`, `RoomFormer/models/roomformer.py:187-330`,
`RoomFormer/models/losses.py:13-160`):

- matching cost = 5 * cyclic-order-min L1 over the target's valid corner
  coords + 2 * L1 between corner-validity probabilities and labels
  (`set_cost_coords`/`set_cost_class` defaults, `main.py:86-88`)
- loss_ce: BCE over ALL corner logits with matched labels scattered in
- loss_coords: cyclic-min L1 over matched polys / total valid coord count
- loss_raster: dice between the soft-rasterized predicted polygon and the
  hard-rasterized target at 64x64 (`losses.py:100-160`)
- aux decoder layers reuse the FINAL layer's assignment (`roomformer.py:323`)

Everything is padded/batched: targets come as [B, Pt, ...] with a poly
validity mask, and the Hungarian assignment runs on device.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from mask3d_tpu.baseline.raster import soft_polygon_batch
from mask3d_tpu.ops.lsap import linear_sum_assignment

_INVALID = 1e4


def cyclic_min_l1(src_flat, tgt_flat, length):
    """Min-over-cyclic-orders L1 (reference `get_all_order_corners` +
    cdist(p=1).min, `matcher.py:90-96`).

    src_flat: [P, 2Qp]; tgt_flat: [2Qp]; length: scalar (2 * n_corners).
    Returns [P].
    """
    two_qp = tgt_flat.shape[0]
    qp = two_qp // 2
    # Cyclic rolls WITHIN the valid window (the reference rolls the
    # truncated corner list, matcher.py:94): rolled_i[j] = tgt[(j-2i) % len].
    j = jnp.arange(two_qp)
    i2 = 2 * jnp.arange(qp)[:, None]
    safe_len = jnp.maximum(length, 1)
    src_idx = jnp.mod(j[None, :] - i2, safe_len)
    rolls = tgt_flat[src_idx]  # [Qp, 2Qp]
    posmask = (jnp.arange(two_qp) < length).astype(src_flat.dtype)
    diff = jnp.abs(src_flat[:, None, :] - rolls[None]) * posmask
    sums = diff.sum(-1)  # [P, Qp]
    rollmask = jnp.arange(qp) < (length // 2)
    return jnp.min(jnp.where(rollmask[None], sums, jnp.inf), axis=-1)


class RoomFormerCriterion:
    def __init__(self, cost_class=2.0, cost_coords=5.0, cls_coef=2.0,
                 coords_coef=5.0, raster_coef=1.0, room_cls_coef=0.2,
                 raster_res=64, use_raster=True, lsap_method="device"):
        self.cost_class = cost_class
        self.cost_coords = cost_coords
        self.cls_coef = cls_coef
        self.coords_coef = coords_coef
        self.raster_coef = raster_coef
        self.room_cls_coef = room_cls_coef
        self.raster_res = raster_res
        self.use_raster = use_raster
        self.lsap_method = lsap_method

    def match(self, logits, coords, targets):
        """logits [B,P,Qp]; coords [B,P,Qp,2]; targets dict with
        coords [B,Pt,2Qp], labels [B,Pt,Qp], lengths [B,Pt],
        poly_valid [B,Pt]. Returns (col4row [B,P], matched [B,P])."""
        b, p, qp = logits.shape
        prob = jax.nn.sigmoid(logits)  # [B, P, Qp]
        # class cost: L1 distance between prob rows and label rows
        cost_class = jnp.abs(
            prob[:, :, None, :] - targets["labels"][:, None, :, :]
        ).sum(-1)  # [B, P, Pt]

        src_flat = coords.reshape(b, p, qp * 2)

        def per_item(src, tgts, lens):
            return jax.vmap(
                lambda t, l: cyclic_min_l1(src, t, l), in_axes=(0, 0),
                out_axes=1,
            )(tgts, lens)  # [P, Pt]

        cost_coords = jax.vmap(per_item)(
            src_flat, targets["coords"], targets["lengths"]
        )
        cost = self.cost_coords * cost_coords + self.cost_class * cost_class
        cost = jnp.where(
            targets["poly_valid"][:, None, :], cost, jnp.float32(_INVALID)
        )
        col4row = linear_sum_assignment(cost, method=self.lsap_method)
        pt = targets["poly_valid"].shape[-1]
        in_range = col4row < pt
        safe = jnp.where(in_range, col4row, 0)
        matched = in_range & jnp.take_along_axis(
            targets["poly_valid"], safe, axis=-1
        )
        return safe, matched

    def level_losses(self, logits, coords, targets, col4row, matched):
        b, p, qp = logits.shape
        # --- loss_ce: scatter matched labels, BCE over everything ---
        tgt_labels = jnp.take_along_axis(
            targets["labels"], col4row[..., None], axis=1
        )  # [B, P, Qp]
        tgt_labels = jnp.where(matched[..., None], tgt_labels, 0.0)
        bce = jax.nn.softplus(logits) - logits * tgt_labels
        loss_ce = bce.mean()

        # --- loss_coords: cyclic-min L1 over matched pairs ---
        src_flat = coords.reshape(b, p, qp * 2)
        tgt_coords = jnp.take_along_axis(
            targets["coords"], col4row[..., None], axis=1
        )  # [B, P, 2Qp]
        tgt_lens = jnp.take_along_axis(targets["lengths"], col4row, axis=1)

        def pair_l1(src, tgt, ln):
            return cyclic_min_l1(src[None], tgt, ln)[0]

        per_pair = jax.vmap(jax.vmap(pair_l1))(
            src_flat, tgt_coords, tgt_lens
        )  # [B, P]
        m = matched.astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(tgt_lens * m), 1.0)
        loss_coords = jnp.sum(jnp.where(matched, per_pair, 0.0)) / denom

        losses = {"loss_ce": loss_ce, "loss_coords": loss_coords}

        # --- loss_raster: dice of soft pred vs hard target masks ---
        if self.use_raster:
            res = self.raster_res
            vert_valid = (
                jnp.arange(qp)[None, None, :] < (tgt_lens // 2)[..., None]
            )
            pred_polys = coords.reshape(b * p, qp, 2) * res
            tgt_polys = tgt_coords.reshape(b * p, qp, 2) * res
            vv = vert_valid.reshape(b * p, qp)
            pred_masks = soft_polygon_batch(
                pred_polys, vv, res, inv_smoothness=0.1, mode="mask"
            )
            tgt_masks = soft_polygon_batch(
                tgt_polys, vv, res, mode="hard_mask"
            )
            pm = pred_masks.reshape(b * p, -1)
            tm = tgt_masks.reshape(b * p, -1)
            num = 2.0 * (pm * tm).sum(-1) + 1.0
            den = pm.sum(-1) + tm.sum(-1) + 1.0
            dice = 1.0 - num / den  # [B*P]
            mflat = matched.reshape(-1).astype(jnp.float32)
            losses["loss_raster"] = jnp.sum(dice * mflat) / jnp.maximum(
                mflat.sum(), 1.0
            )
        return losses

    def __call__(self, output, targets, room_labels=None
                 ) -> Dict[str, jax.Array]:
        """output: RoomFormerOutput; targets: padded dict (see match)."""
        col4row, matched = self.match(
            output.pred_logits, output.pred_coords, targets
        )
        losses = dict(self.level_losses(
            output.pred_logits, output.pred_coords, targets, col4row, matched
        ))
        total = (
            self.cls_coef * losses["loss_ce"]
            + self.coords_coef * losses["loss_coords"]
            + self.raster_coef * losses.get("loss_raster", 0.0)
        )
        n_aux = output.aux_logits.shape[0] - 1
        for i in range(n_aux):
            aux = self.level_losses(
                output.aux_logits[i], output.aux_coords[i], targets,
                col4row, matched,
            )
            for k, v in aux.items():
                losses[f"{k}_{i}"] = v
            total = total + (
                self.cls_coef * aux["loss_ce"]
                + self.coords_coef * aux["loss_coords"]
                + self.raster_coef * aux.get("loss_raster", 0.0)
            )
        if output.room_logits is not None and room_labels is not None:
            logp = jax.nn.log_softmax(output.room_logits, axis=-1)
            tgt = jnp.take_along_axis(
                room_labels["labels"], col4row, axis=1
            )
            tgt = jnp.where(matched, tgt, output.room_logits.shape[-1] - 1)
            nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)
            losses["loss_ce_room"] = nll.mean()
            total = total + self.room_cls_coef * losses["loss_ce_room"]
        losses["loss"] = total
        return losses
