"""Refining target encode/decode.

Re-derives the reference TargetAssigner semantics:
  * GRM (geometry): size targets are residuals to the NEAREST of K per-class
    size anchors, plus anchor classification (target_assign.py:19-30);
  * PRM (position): center residual + 12-bin heading classification with
    in-bin residual (target_assign.py:32-53);
  * CRM (confidence): pos/neg labels from per-box IoU with an ignore band
    (target_assign.py:55-69).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# default per-class size anchors (l, w, h) — Waymo-scale clusters
DEFAULT_SIZE_ANCHORS = {
    "Vehicle": [[4.7, 2.1, 1.7], [8.5, 2.8, 3.2], [12.0, 2.9, 3.6]],
    "Pedestrian": [[0.9, 0.85, 1.7], [1.1, 1.0, 1.9], [0.7, 0.7, 1.5]],
    "Cyclist": [[1.8, 0.85, 1.7], [2.2, 1.0, 1.9], [1.5, 0.7, 1.6]],
}


def encode_size(gt_size, anchors):
    """gt_size (..., 3), anchors (K, 3) -> (anchor_cls (...,), residual (..., K, 3)).
    Residual is log(gt/anchor) for every anchor; loss gathers the target one."""
    a = jnp.asarray(anchors)
    res = jnp.log(jnp.maximum(gt_size[..., None, :], 1e-4) / a)
    d = jnp.abs(gt_size[..., None, :] - a).sum(-1)
    cls = jnp.argmin(d, axis=-1)
    return cls, res


def decode_size(anchor_logits, residuals, anchors):
    """anchor_logits (..., K), residuals (..., K, 3) -> size (..., 3) via the
    argmax anchor (reference decodes with predicted anchor + its residual)."""
    a = jnp.asarray(anchors)
    k = jnp.argmax(anchor_logits, axis=-1)
    res = jnp.take_along_axis(residuals, k[..., None, None].repeat(3, -1), axis=-2)[..., 0, :]
    base = a[k]
    return base * jnp.exp(jnp.clip(res, -2.0, 2.0))


NUM_HEADING_BINS = 12


def encode_heading(heading):
    """heading (...,) -> (bin (...,), in-bin residual (...,)) over 12 bins."""
    period = 2 * np.pi / NUM_HEADING_BINS
    shifted = jnp.mod(heading + np.pi, 2 * np.pi)  # [0, 2pi)
    b = jnp.clip((shifted / period).astype(jnp.int32), 0, NUM_HEADING_BINS - 1)
    residual = shifted - (b.astype(jnp.float32) + 0.5) * period
    return b, residual


def decode_heading(bin_logits, residuals):
    """bin_logits (..., 12), residuals (..., 12) -> heading (...,)."""
    period = 2 * np.pi / NUM_HEADING_BINS
    b = jnp.argmax(bin_logits, axis=-1)
    res = jnp.take_along_axis(residuals, b[..., None], axis=-1)[..., 0]
    return (b.astype(jnp.float32) + 0.5) * period + res - np.pi


def confidence_labels(ious, lo: float, hi: float):
    """per-box IoU -> (labels in {0,1}, weight mask). IoUs inside (lo, hi)
    are the ignore band (weight 0); padding uses iou < 0."""
    pos = ious >= hi
    neg = (ious <= lo) & (ious >= 0.0)
    weights = (pos | neg).astype(jnp.float32)
    return pos.astype(jnp.float32), weights
