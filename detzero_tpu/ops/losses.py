"""Detection losses as pure jnp functions.

Re-derives the reference's loss_utils.py: CenterNet focal heatmap loss
(FocalLossCenterNet:181 / neg_loss_cornernet:143), gathered L1 regression
(RegLossCenterNet:220), weighted smooth-L1, and the heading-flip corner loss
(get_corner_loss_lidar:117). All take explicit masks — padded entries carry
zero weight, so the same code runs under any static budget.
"""

from __future__ import annotations

import jax.numpy as jnp

from detzero_tpu.ops.box_ops import boxes_to_corners_3d


def focal_loss_centernet(pred_hm, gt_hm, eps: float = 1e-4):
    """CornerNet-style focal loss. pred_hm already sigmoid-ed. Normalized by
    number of positives (gt==1 cells)."""
    pred = jnp.clip(pred_hm, eps, 1.0 - eps)
    pos = (gt_hm >= 1.0).astype(jnp.float32)
    neg_w = jnp.power(1.0 - gt_hm, 4.0)
    pos_loss = jnp.log(pred) * jnp.power(1.0 - pred, 2.0) * pos
    neg_loss = jnp.log(1.0 - pred) * jnp.power(pred, 2.0) * neg_w * (1.0 - pos)
    num_pos = pos.sum()
    loss = -(pos_loss.sum() + neg_loss.sum())
    return jnp.where(num_pos > 0, loss / jnp.maximum(num_pos, 1.0),
                     -neg_loss.sum())


def gather_feat(feat_hw_c, inds):
    """feat (H*W, C), inds (M,) -> (M, C)."""
    return feat_hw_c[inds]


def reg_loss_centernet(pred_map, inds, target, mask, code_weights=None):
    """L1 at gathered target cells (RegLossCenterNet semantics).

    pred_map: (H, W, C) raw regression map; inds: (M,) flat cell indices;
    target: (M, C); mask: (M,) bool. Returns per-channel summed loss / num_pos.
    """
    h, w, c = pred_map.shape
    pred = pred_map.reshape(h * w, c)[inds]  # (M, C)
    diff = jnp.abs(pred - target) * mask[:, None].astype(pred.dtype)
    if code_weights is not None:
        diff = diff * jnp.asarray(code_weights, pred.dtype)[None, :]
    num = jnp.maximum(mask.sum().astype(pred.dtype), 1.0)
    return diff.sum() / num


def weighted_smooth_l1(pred, target, weights=None, beta: float = 1.0 / 9.0):
    """Reference WeightedSmoothL1Loss (loss_utils.py:10)."""
    diff = pred - target
    n = jnp.abs(diff)
    loss = jnp.where(n < beta, 0.5 * n * n / beta, n - 0.5 * beta)
    if weights is not None:
        loss = loss * weights[..., None] if loss.ndim == weights.ndim + 1 else loss * weights
    return loss


def corner_loss_lidar(pred_boxes, gt_boxes, mask=None):
    """Min-over-heading-flip corner smooth-L1 (loss_utils.py:117). Boxes (N,7)."""
    pred_c = boxes_to_corners_3d(pred_boxes)  # (N, 8, 3)
    gt_c = boxes_to_corners_3d(gt_boxes)
    gt_flip = gt_boxes.at[:, 6].add(jnp.pi)
    gt_cf = boxes_to_corners_3d(gt_flip)
    d1 = jnp.linalg.norm(pred_c - gt_c, axis=-1)
    d2 = jnp.linalg.norm(pred_c - gt_cf, axis=-1)
    dist = jnp.minimum(d1, d2)
    # huber with delta 1
    loss = jnp.where(dist < 1.0, 0.5 * dist * dist, dist - 0.5).mean(axis=1)
    if mask is not None:
        loss = loss * mask.astype(loss.dtype)
        return loss.sum() / jnp.maximum(mask.sum().astype(loss.dtype), 1.0)
    return loss.mean()


def sigmoid_focal_cls_loss(pred_logits, target, weights, gamma: float = 2.0,
                           alpha: float = 0.25):
    """SigmoidFocalClassificationLoss for anchor/RoI heads."""
    p = jnp.clip(1.0 / (1.0 + jnp.exp(-pred_logits)), 1e-6, 1 - 1e-6)
    alpha_w = target * alpha + (1 - target) * (1 - alpha)
    pt = target * (1.0 - p) + (1.0 - target) * p
    bce = -(target * jnp.log(p) + (1 - target) * jnp.log(1 - p))
    loss = alpha_w * jnp.power(pt, gamma) * bce
    return loss * weights[..., None] if loss.ndim == weights.ndim + 1 else loss * weights
