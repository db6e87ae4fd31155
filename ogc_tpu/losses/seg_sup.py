"""Supervised mask loss: Hungarian-matched binary CE (or focal) + Dice.

Parity with reference losses/seg_loss_sup.py, with the per-batch scipy host
call (:131-145) replaced by the in-graph LAP solver.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ogc_tpu.utils.lap import linear_sum_assignment

Array = jax.Array
_EPS = 1e-7


def _bce(pred: Array, target: Array) -> Array:
    p = jnp.clip(pred, _EPS, 1.0 - _EPS)
    return -(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))


def ce_loss(pred: Array, target: Array, valid: Optional[Array] = None) -> Array:
    """(B, N, K) binary cross-entropy, valid-masked mean
    (seg_loss_sup.py:8-24)."""
    loss = _bce(pred, target)
    if valid is not None:
        loss = loss * valid[..., None]
    return jnp.mean(loss)


def ce_match_cost(pred: Array, target: Array,
                  valid: Optional[Array] = None) -> Array:
    """Pairwise (B, K, K) CE cost grid (seg_loss_sup.py:26-38).

    :param pred, target: (B, N, K)."""
    loss = _bce(pred[:, :, :, None], target[:, :, None, :])  # (B, N, K, K)
    if valid is not None:
        loss = loss * valid[:, :, None, None]
    return jnp.mean(loss, axis=1)


def focal_loss(pred: Array, target: Array, valid: Optional[Array] = None,
               alpha: float = 0.25, gamma: float = 2.0) -> Array:
    """(B, N, K) focal loss (seg_loss_sup.py:41-66)."""
    ce = _bce(pred, target)
    p_t = target * pred + (1 - target) * (1 - pred)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        loss = (alpha * target + (1 - alpha) * (1 - target)) * loss
    if valid is not None:
        loss = loss * valid[..., None]
    return jnp.mean(loss)


def focal_match_cost(pred: Array, target: Array,
                     valid: Optional[Array] = None,
                     alpha: float = 0.25, gamma: float = 2.0) -> Array:
    p = pred[:, :, :, None]
    t = target[:, :, None, :]
    ce = _bce(p, t)
    p_t = t * p + (1 - t) * (1 - p)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        loss = (alpha * t + (1 - alpha) * (1 - t)) * loss
    if valid is not None:
        loss = loss * valid[:, :, None, None]
    return jnp.mean(loss, axis=1)


def dice_loss(pred: Array, target: Array, valid: Optional[Array] = None) -> Array:
    """(B, N, K) Dice loss (seg_loss_sup.py:90-110)."""
    if valid is not None:
        v = valid[..., None]
        num = jnp.sum(2 * pred * target * v, axis=1)
        den = jnp.sum(pred * v, axis=1) + jnp.sum(target * v, axis=1)
    else:
        num = 2 * jnp.sum(pred * target, axis=1)
        den = jnp.sum(pred, axis=1) + jnp.sum(target, axis=1)
    return jnp.mean(1 - (num + 1) / (den + 1))


def dice_match_cost(pred: Array, target: Array,
                    valid: Optional[Array] = None) -> Array:
    p = pred[:, :, :, None]
    t = target[:, :, None, :]
    if valid is not None:
        v = valid[:, :, None, None]
        num = jnp.sum(2 * p * t * v, axis=1)
        den = jnp.sum(p * v, axis=1) + jnp.sum(t * v, axis=1)
    else:
        num = jnp.sum(2 * p * t, axis=1)
        den = jnp.sum(p, axis=1) + jnp.sum(t, axis=1)
    return 1 - (num + 1) / (den + 1)


@dataclasses.dataclass(frozen=True)
class SupLossConfig:
    weights: Tuple[float, float] = (2.0, 0.1)  # (ce, dice)
    use_focal: bool = False
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0


def supervised_mask_loss(
    mask: Array, gt_mask: Array, valid: Optional[Array] = None,
    cfg: SupLossConfig = SupLossConfig(),
) -> Tuple[Array, Dict[str, Array]]:
    """Hungarian-matched CE+Dice (SupervisedMaskLoss,
    seg_loss_sup.py:148-182).

    :param mask: (B, N, K) prediction; :param gt_mask: (B, N, K) one-hot GT.
    """
    w_ce, w_dice = cfg.weights
    pred_d = jax.lax.stop_gradient(mask)

    if cfg.use_focal:
        cost_ce = focal_match_cost(
            pred_d, gt_mask, valid, cfg.focal_alpha, cfg.focal_gamma
        )
    else:
        cost_ce = ce_match_cost(pred_d, gt_mask, valid)
    cost = w_ce * cost_ce + w_dice * dice_match_cost(pred_d, gt_mask, valid)

    col_ind = linear_sum_assignment(cost, False)  # (B, K)
    perm = jax.nn.one_hot(col_ind, mask.shape[-1], dtype=mask.dtype)
    gt_mask = jax.lax.stop_gradient(
        jnp.einsum("bij,bnj->bni", perm, gt_mask)
    )

    if cfg.use_focal:
        l_ce = focal_loss(mask, gt_mask, valid, cfg.focal_alpha, cfg.focal_gamma)
    else:
        l_ce = ce_loss(mask, gt_mask, valid)
    l_dice = dice_loss(mask, gt_mask, valid)
    loss = w_ce * l_ce + w_dice * l_dice
    return loss, {"cross_entropy": l_ce, "dice": l_dice, "sum": loss}
