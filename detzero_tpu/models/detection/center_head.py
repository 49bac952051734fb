"""Center-based dense detection head.

Re-designs the reference CenterHead (center_head.py:51): multi-head class
grouping, per-task SeparateHead conv stacks (hm bias -2.19), gaussian-heatmap
targets (vectorized on device, ops/gaussian.py), focal + gathered-L1 + IoU
prediction losses, and a static-shape decode (top-K + class-agnostic NMS,
iou^2 score rectification per centernet_utils.py:141-143).

All loss/decode paths are free functions over pred dicts, so they jit into
the train/eval step with no module state.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from detzero_tpu.models.layers import ConvBNReLU
from detzero_tpu.ops import gaussian
from detzero_tpu.ops.iou3d import boxes_iou3d_pairwise
from detzero_tpu.ops.losses import focal_loss_centernet, reg_loss_centernet
from detzero_tpu.ops.nms import nms_bev

HEAD_ORDER = ("center", "center_z", "dim", "rot", "vel")
HEAD_DIMS = {"center": 2, "center_z": 1, "dim": 3, "rot": 2, "vel": 2}


class SeparateHead(nn.Module):
    """Per-task conv stacks (reference SeparateHead, center_head.py:14)."""

    heads: dict  # name -> out_channels
    num_conv: int = 2
    mid_channels: int = 64
    hm_bias: float = -2.19
    use_running_average: bool = False
    axis_names: Sequence[str] = ()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = {}
        for name, ch in self.heads.items():
            h = x
            for i in range(self.num_conv - 1):
                h = ConvBNReLU(
                    self.mid_channels, 3, 1,
                    use_running_average=self.use_running_average,
                    axis_names=self.axis_names, dtype=self.dtype,
                    name=f"{name}_conv{i}",
                )(h)
            bias_init = (
                nn.initializers.constant(self.hm_bias)
                if name == "hm" else nn.initializers.zeros
            )
            out[name] = nn.Conv(
                ch, (3, 3), padding="SAME", bias_init=bias_init,
                dtype=self.dtype, name=f"{name}_out",
            )(h).astype(jnp.float32)
        return out


class CenterHead(nn.Module):
    """Multi-group center head.

    class_ids_each_head: static tuple of tuples — global class ids per head
    (reference CLASS_NAMES_EACH_HEAD, center_head.py:71-79).
    """

    class_ids_each_head: Sequence[Sequence[int]]
    shared_channels: int = 64
    num_conv: int = 2
    with_velocity: bool = True
    with_iou: bool = True
    use_running_average: bool = False
    axis_names: Sequence[str] = ()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, spatial_features_2d):
        x = ConvBNReLU(
            self.shared_channels, 3, 1,
            use_running_average=self.use_running_average,
            axis_names=self.axis_names, dtype=self.dtype, name="shared_conv",
        )(spatial_features_2d)
        preds = []
        for hi, cls_ids in enumerate(self.class_ids_each_head):
            heads = {"hm": len(cls_ids)}
            for name in HEAD_ORDER:
                if name == "vel" and not self.with_velocity:
                    continue
                heads[name] = HEAD_DIMS[name]
            if self.with_iou:
                heads["iou"] = 1
            preds.append(
                SeparateHead(
                    heads=heads, num_conv=self.num_conv,
                    mid_channels=self.shared_channels,
                    use_running_average=self.use_running_average,
                    axis_names=self.axis_names, dtype=self.dtype,
                    name=f"head{hi}",
                )(x)
            )
        return preds


def assign_targets(gt_boxes, gt_classes, gt_valid, class_ids_each_head, hw,
                   feature_map_stride, voxel_size, pc_range, max_objs,
                   gaussian_overlap=0.1, min_radius=2, with_velocity=True):
    """Per-head target dicts. gt_classes are global ids; each head remaps its
    classes to local indices and masks out the rest."""
    targets = []
    for cls_ids in class_ids_each_head:
        cls_ids_arr = jnp.asarray(cls_ids)
        local = jnp.argmax(gt_classes[:, None] == cls_ids_arr[None, :], axis=1)
        in_head = (gt_classes[:, None] == cls_ids_arr[None, :]).any(axis=1)
        targets.append(
            gaussian.assign_center_targets(
                gt_boxes, local.astype(jnp.int32), gt_valid & in_head,
                len(cls_ids), hw, feature_map_stride, voxel_size, pc_range,
                max_objs, min_radius=min_radius,
                gaussian_overlap=gaussian_overlap, with_velocity=with_velocity,
            )
        )
    return targets


def _decode_at_inds(pred, inds, hw, feature_map_stride, voxel_size, pc_range):
    """Decode boxes at given flat cell indices -> (M, 7[+2])."""
    h, w = hw
    xs = (inds % w).astype(jnp.float32)
    ys = (inds // w).astype(jnp.float32)

    def flat(name):
        return pred[name].reshape(h * w, -1)[inds]

    center = flat("center")
    cx = (xs + center[:, 0]) * feature_map_stride * voxel_size[0] + pc_range[0]
    cy = (ys + center[:, 1]) * feature_map_stride * voxel_size[1] + pc_range[1]
    cz = flat("center_z")[:, 0]
    dim = jnp.exp(jnp.clip(flat("dim"), -5.0, 5.0))
    rot = flat("rot")
    heading = jnp.arctan2(rot[:, 0], rot[:, 1])
    cols = [cx[:, None], cy[:, None], cz[:, None], dim, heading[:, None]]
    if "vel" in pred:
        cols.append(flat("vel"))
    return jnp.concatenate(cols, axis=1)


def center_head_loss(preds, targets, hw, feature_map_stride, voxel_size,
                     pc_range, code_weights=None, hm_weight=1.0,
                     loc_weight=2.0, iou_weight=1.0):
    """Total loss over all heads (reference CenterHead.get_loss,
    center_head.py:266): focal(hm) + L1(reg at inds) + L1(iou pred vs true
    3D IoU of decoded boxes, center_head.py:163-200)."""
    total, aux = 0.0, {}
    for hi, (pred, tgt) in enumerate(zip(preds, targets)):
        hm_pred = jax.nn.sigmoid(pred["hm"])  # (H, W, C)
        hm_loss = focal_loss_centernet(
            jnp.transpose(hm_pred, (2, 0, 1)), tgt["heatmap"]
        )
        reg_names = [n for n in HEAD_ORDER if n in pred]
        reg_map = jnp.concatenate([pred[n] for n in reg_names], axis=-1)
        n_code = reg_map.shape[-1]
        cw = code_weights if code_weights is not None else [1.0] * n_code
        loc_loss = reg_loss_centernet(
            reg_map, tgt["inds"], tgt["anno_box"][:, :n_code], tgt["mask"],
            code_weights=cw[:n_code],
        )
        head_loss = hm_weight * hm_loss + loc_weight * loc_loss
        if "iou" in pred:
            boxes = _decode_at_inds(pred, tgt["inds"], hw, feature_map_stride,
                                    voxel_size, pc_range)
            anno = tgt["anno_box"]
            xs = (tgt["inds"] % hw[1]).astype(jnp.float32)
            ys = (tgt["inds"] // hw[1]).astype(jnp.float32)
            gx = (xs + anno[:, 0]) * feature_map_stride * voxel_size[0] + pc_range[0]
            gy = (ys + anno[:, 1]) * feature_map_stride * voxel_size[1] + pc_range[1]
            gt_boxes = jnp.stack(
                [gx, gy, anno[:, 2], jnp.exp(anno[:, 3]), jnp.exp(anno[:, 4]),
                 jnp.exp(anno[:, 5]), jnp.arctan2(anno[:, 6], anno[:, 7])], axis=1
            )
            iou_tgt = boxes_iou3d_pairwise(
                jax.lax.stop_gradient(boxes[:, :7]), gt_boxes
            )
            iou_tgt = iou_tgt * 2.0 - 1.0  # reference maps IoU to [-1, 1]
            iou_pred = pred["iou"].reshape(-1, 1)[tgt["inds"], 0]
            m = tgt["mask"].astype(jnp.float32)
            iou_loss = (jnp.abs(iou_pred - iou_tgt) * m).sum() / jnp.maximum(m.sum(), 1.0)
            head_loss = head_loss + iou_weight * iou_loss
            aux[f"head{hi}/iou_loss"] = iou_loss
        aux[f"head{hi}/hm_loss"] = hm_loss
        aux[f"head{hi}/loc_loss"] = loc_loss
        total = total + head_loss
    return total, aux


def decode_predictions(preds, class_ids_each_head, hw, feature_map_stride,
                       voxel_size, pc_range, top_k=500, score_thresh=0.1,
                       nms_thresh=0.7, nms_pre=1024, nms_post=256,
                       iou_rectify_alpha=2.0):
    """Static-shape decode across all heads -> padded final detections.

    Returns dict(boxes (P,9), scores (P,), labels (P,), mask (P,)) with
    P = nms_post. Scores are iou^2-rectified before NMS (reference _topk,
    centernet_utils.py:141-143).
    """
    all_boxes, all_scores, all_labels = [], [], []
    for pred, cls_ids in zip(preds, class_ids_each_head):
        h, w = hw
        hm = jax.nn.sigmoid(pred["hm"]).reshape(h * w, -1)  # (HW, C)
        if "iou" in pred:
            iou = jnp.clip((pred["iou"].reshape(h * w) + 1.0) * 0.5, 0.0, 1.0)
            hm = hm * jnp.power(iou[:, None], iou_rectify_alpha)
        flat = hm.reshape(-1)  # (HW*C,)
        k = min(top_k, flat.shape[0])
        scores, flat_idx = jax.lax.top_k(flat, k)
        n_cls = hm.shape[1]
        cell = flat_idx // n_cls
        local_cls = flat_idx % n_cls
        boxes = _decode_at_inds(pred, cell, hw, feature_map_stride, voxel_size,
                                pc_range)
        labels = jnp.asarray(cls_ids)[local_cls]
        all_boxes.append(boxes)
        all_scores.append(scores)
        all_labels.append(labels)
    boxes = jnp.concatenate(all_boxes, axis=0)
    scores = jnp.concatenate(all_scores, axis=0)
    labels = jnp.concatenate(all_labels, axis=0)
    valid = scores > score_thresh
    keep_idx, keep_mask = nms_bev(
        boxes[:, :7], scores, nms_thresh, pre_max=min(nms_pre, boxes.shape[0]),
        post_max=nms_post, valid_mask=valid,
    )
    return {
        "boxes": boxes[keep_idx],
        "scores": scores[keep_idx],
        "labels": labels[keep_idx],
        "mask": keep_mask,
    }
