"""Rotated NMS as a fixed-shape on-device program.

Replaces the reference's bitmask CUDA NMS (iou3d_nms_kernel.cu:386 nms_kernel)
and its python wrappers (model_nms_utils.py). The greedy suppression over
score-sorted candidates becomes a lax.fori_loop over a precomputed KxK rotated
IoU matrix with a running suppression mask — identical keep-set semantics,
static output size (post_max boxes + validity mask), so it jits into the
detection graph with no host sync.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from detzero_tpu.ops.iou3d import boxes_iou_bev, boxes_iou_normal
from detzero_tpu.ops.box_ops import boxes3d_to_bev


def _fused_nms_available():
    # DETZERO_FORCE_PALLAS=0 forces the XLA path (cpu-lowerable graphs for
    # bench._flops_cpu); see ops/iou3d._use_pallas
    import os
    if os.environ.get("DETZERO_FORCE_PALLAS") == "0":
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _greedy_suppress(iou, valid, thresh):
    """iou (K,K) over score-sorted boxes; valid (K,) input mask.
    Returns keep mask (K,)."""
    k = iou.shape[0]
    idx = jnp.arange(k)

    def body(i, suppressed):
        keep_i = valid[i] & ~suppressed[i]
        sup_new = keep_i & (iou[i] > thresh) & (idx > i)
        return suppressed | sup_new

    suppressed = jax.lax.fori_loop(0, k, body, jnp.zeros(k, bool))
    return valid & ~suppressed


def nms_bev(boxes, scores, thresh: float, pre_max: int = 512, post_max: int = 128,
            valid_mask=None, rotated: bool = True):
    """Class-agnostic rotated NMS (model_nms_utils.py:6 class_agnostic_nms).

    Args:
        boxes: (N, 7) [x,y,z,dx,dy,dz,heading]
        scores: (N,) — padded/invalid entries should carry -inf or use valid_mask
    Returns:
        (indices (post_max,) into the input, keep_mask (post_max,) bool)
    """
    n = boxes.shape[0]
    if valid_mask is None:
        valid_mask = jnp.ones(n, bool)
    k = min(pre_max, n)
    masked_scores = jnp.where(valid_mask, scores, -jnp.inf)
    top_scores, order = jax.lax.top_k(masked_scores, k)
    top_boxes = boxes[order]
    valid = jnp.isfinite(top_scores)
    bev = boxes3d_to_bev(top_boxes)
    if rotated and _fused_nms_available():
        # gridded Pallas IoU matrix (one 128x128 tile program — compiles in
        # seconds) + XLA greedy walk. The old fully-fused VMEM kernel
        # (pallas_iou.nms_keep_mask) produced identical keeps but its
        # k//128-squared unrolled clip macros cost ~33 MINUTES of Mosaic
        # compile at k=1024 inside every model executable (measured r3,
        # tools/bisect_perf.py) for ~2 ms of runtime win — a bad trade.
        from detzero_tpu.ops import pallas_iou
        iou = pallas_iou.boxes_iou_bev(bev, bev)
        keep = _greedy_suppress(iou, valid, thresh)
    else:
        iou = (boxes_iou_bev(bev, bev) if rotated
               else boxes_iou_normal(top_boxes, top_boxes))
        keep = _greedy_suppress(iou, valid, thresh)
    # stable-compact kept entries to the front (they are already score-sorted)
    priority = jnp.where(keep, jnp.arange(k), k)
    compact = jnp.argsort(priority)
    out_idx = order[compact].astype(jnp.int32)
    if k < post_max:  # fewer candidates than the output budget: pad
        out_idx = jnp.pad(out_idx, (0, post_max - k))
    out_idx = out_idx[:post_max]
    out_mask = jnp.arange(post_max) < jnp.minimum(keep.sum(), post_max)
    return out_idx, out_mask


def multi_class_nms(boxes, scores, labels, num_classes: int, thresh, pre_max=512,
                    post_max=128, valid_mask=None):
    """Per-class NMS loop (model_nms_utils.py:28 multi_classes_nms) expressed as
    one call per class with class-masked scores; thresh may be per-class."""
    outs = []
    for c in range(num_classes):
        t = thresh[c] if hasattr(thresh, "__len__") else thresh
        vm = labels == c
        if valid_mask is not None:
            vm = vm & valid_mask
        outs.append(nms_bev(boxes, scores, t, pre_max, post_max, valid_mask=vm))
    return outs
