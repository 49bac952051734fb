"""CRM — Confidence Refining Model.

Re-designs the reference ConfidencePointnet (confidence_pointnet.py:9):
two-level PointNet over a padded track — per-box 256-point max-pool, then a
track-level max-pool across valid boxes, concatenated back per box and fed to
sigmoid `score` and `iou` heads; the final confidence is sqrt(score * iou)
(confidence_pointnet.py:110-111). Targets: pos/neg by per-class IoU bands
with the in-between ignored (target_assign.py:55-69).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from detzero_tpu.core.registry import REFINE_MODULES
from detzero_tpu.models.refining.modules import PointNetEncoder
from detzero_tpu.models.refining.target_assign import confidence_labels


@REFINE_MODULES.register("ConfidencePointNet")
class ConfidencePointNet(nn.Module):
    d_model: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, box_pts, pad_mask):
        """box_pts (T, Np, F); pad_mask (T,). Returns dict(score_logit (T,),
        iou_logit (T,))."""
        box_feat, _ = PointNetEncoder((64, 128, self.d_model), dtype=self.dtype,
                                      name="box_enc")(box_pts)  # (T, D)
        masked = jnp.where(pad_mask[:, None], box_feat, -jnp.inf)
        track_feat = masked.max(axis=0)
        track_feat = jnp.where(jnp.isfinite(track_feat), track_feat, 0.0)
        h = jnp.concatenate(
            [box_feat, jnp.broadcast_to(track_feat, box_feat.shape)], axis=-1
        )
        for i, f in enumerate((256, 128)):
            h = nn.Dense(f, dtype=self.dtype, name=f"head{i}")(h)
            h = nn.relu(h)
        return {
            "score_logit": nn.Dense(1, dtype=jnp.float32, name="score")(h)[:, 0],
            "iou_logit": nn.Dense(1, dtype=jnp.float32, name="iou")(h)[:, 0],
        }


def crm_loss(pred, gt_ious, pad_mask, iou_lo=0.35, iou_hi=0.7):
    """BCE on both heads with the ignore band masked
    (confidence_pointnet get_loss:115-150)."""
    labels, w = confidence_labels(gt_ious, iou_lo, iou_hi)
    w = w * pad_mask.astype(jnp.float32)
    denom = jnp.maximum(w.sum(), 1.0)

    def bce(logit, target):
        return (optax_sigmoid_ce(logit, target) * w).sum() / denom

    score_loss = bce(pred["score_logit"], labels)
    # the iou head regresses the (clipped) IoU itself as a soft target
    iou_t = jnp.clip(gt_ious, 0.0, 1.0)
    m = pad_mask.astype(jnp.float32) * (gt_ious >= 0.0)
    iou_loss = (optax_sigmoid_ce(pred["iou_logit"], iou_t) * m).sum() / \
        jnp.maximum(m.sum(), 1.0)
    return score_loss + iou_loss, {"crm_score": score_loss, "crm_iou": iou_loss}


def optax_sigmoid_ce(logits, labels):
    """Numerically-stable sigmoid cross entropy."""
    return jnp.maximum(logits, 0.0) - logits * labels + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))


def crm_decode(pred):
    """Final confidence: sqrt(score * iou)."""
    s = jax.nn.sigmoid(pred["score_logit"])
    i = jax.nn.sigmoid(pred["iou_logit"])
    return jnp.sqrt(jnp.clip(s * i, 1e-8, 1.0))
