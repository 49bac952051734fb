"""CenterNet gaussian-heatmap target assignment, fully vectorized on device.

The reference draws one gaussian per GT box in a python loop on CPU
(center_head.py:111-161 assign_target_of_single_head; centernet_utils.py:49
draw_gaussian_to_heatmap) — SURVEY §3.1 flags it as a throughput hazard. Here
the whole assignment is one masked max-reduction over (num_gt, H, W): each GT
contributes exp(-(dx^2+dy^2)/(2 sigma^2)) inside its radius window and the
heatmap is the elementwise max — identical values to the reference's
window-wise `torch.max` composition, with no host round-trip.
"""

from __future__ import annotations

import jax.numpy as jnp


def gaussian_radius(det_size_hw, min_overlap: float = 0.5):
    """CornerNet radius rule (centernet_utils.py:11-46). det_size_hw: (..., 2)
    box extent in feature cells (height, width)."""
    height, width = det_size_hw[..., 0], det_size_hw[..., 1]

    a1 = 1.0
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    sq1 = jnp.sqrt(jnp.maximum(b1 ** 2 - 4 * a1 * c1, 0.0))
    r1 = (b1 + sq1) / 2

    a2 = 4.0
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    sq2 = jnp.sqrt(jnp.maximum(b2 ** 2 - 4 * a2 * c2, 0.0))
    r2 = (b2 + sq2) / 2

    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    sq3 = jnp.sqrt(jnp.maximum(b3 ** 2 - 4 * a3 * c3, 0.0))
    r3 = (b3 + sq3) / 2
    return jnp.minimum(jnp.minimum(r1, r2), r3)


def draw_gaussians(centers, radii, class_ids, valid, num_classes: int,
                   hw: tuple[int, int]):
    """Render all GT gaussians into a (num_classes, H, W) heatmap.

    Args:
        centers: (M, 2) float feature-map coords (x, y).
        radii:   (M,) int/float radius per GT (already max(2, int(r))).
        class_ids: (M,) int32 in [0, num_classes).
        valid:   (M,) bool.
    """
    h, w = hw
    cx = centers[:, 0][:, None, None]
    cy = centers[:, 1][:, None, None]
    # integer center like the reference (draws at int coords)
    icx = jnp.floor(centers[:, 0]).astype(jnp.int32)[:, None, None]
    icy = jnp.floor(centers[:, 1]).astype(jnp.int32)[:, None, None]
    xs = jnp.arange(w, dtype=jnp.int32)[None, None, :]
    ys = jnp.arange(h, dtype=jnp.int32)[None, :, None]
    dx = (xs - icx).astype(jnp.float32)
    dy = (ys - icy).astype(jnp.float32)
    r = radii[:, None, None].astype(jnp.float32)
    sigma = (2 * r + 1) / 6.0
    g = jnp.exp(-(dx * dx + dy * dy) / (2 * sigma * sigma))
    window = (jnp.abs(xs - icx) <= r) & (jnp.abs(ys - icy) <= r)
    # reference zeroes sub-eps values via masked window; also gate validity
    g = jnp.where(window & valid[:, None, None] & (g >= jnp.finfo(jnp.float32).eps),
                  g, 0.0)
    # max over GTs per class: one-hot class select then segment max
    heat = jnp.zeros((num_classes, h, w), jnp.float32)
    cls = jnp.where(valid, class_ids, 0)
    onehot = jnp.eye(num_classes, dtype=bool)[cls]  # (M, C)
    contrib = jnp.where(onehot[:, :, None, None], g[:, None, :, :], 0.0)
    heat = contrib.max(axis=0)
    del cx, cy
    return heat


def assign_center_targets(gt_boxes, gt_classes, gt_valid, num_classes: int,
                          hw: tuple[int, int], feature_map_stride: int,
                          voxel_size, pc_range, max_objs: int,
                          min_radius: int = 2, gaussian_overlap: float = 0.1,
                          with_velocity: bool = True):
    """Full single-head target assignment (center_head.py:111-161).

    gt_boxes: (M, 7[+2 vel]) in lidar frame; gt_classes: (M,) local class index
    within this head; gt_valid: (M,) bool. Returns dict(heatmap, anno_box,
    inds, mask) — anno_box layout matches the reference:
    [dx_off, dy_off, z, log dx, log dy, log dz, sin(rot), cos(rot), vx, vy].
    """
    h, w = hw
    vx, vy = float(voxel_size[0]), float(voxel_size[1])
    x0, y0 = float(pc_range[0]), float(pc_range[1])

    m = gt_boxes.shape[0]
    coord_x = (gt_boxes[:, 0] - x0) / vx / feature_map_stride
    coord_y = (gt_boxes[:, 1] - y0) / vy / feature_map_stride
    coord_x = jnp.clip(coord_x, 0.0, w - 1.001)
    coord_y = jnp.clip(coord_y, 0.0, h - 1.001)
    centers = jnp.stack([coord_x, coord_y], axis=1)
    cx_int = centers[:, 0].astype(jnp.int32)
    cy_int = centers[:, 1].astype(jnp.int32)

    dx_f = gt_boxes[:, 3] / vx / feature_map_stride
    dy_f = gt_boxes[:, 4] / vy / feature_map_stride
    ok = gt_valid & (dx_f > 0) & (dy_f > 0)
    radius = gaussian_radius(jnp.stack([dy_f, dx_f], -1), gaussian_overlap)
    radius = jnp.maximum(radius.astype(jnp.int32), min_radius)

    heatmap = draw_gaussians(centers, radius, gt_classes, ok, num_classes, hw)

    inds = jnp.where(ok, cy_int * w + cx_int, 0)
    code = [
        centers[:, 0] - cx_int.astype(jnp.float32),
        centers[:, 1] - cy_int.astype(jnp.float32),
        gt_boxes[:, 2],
        jnp.log(jnp.maximum(gt_boxes[:, 3], 1e-6)),
        jnp.log(jnp.maximum(gt_boxes[:, 4], 1e-6)),
        jnp.log(jnp.maximum(gt_boxes[:, 5], 1e-6)),
        jnp.sin(gt_boxes[:, 6]),
        jnp.cos(gt_boxes[:, 6]),
    ]
    if with_velocity and gt_boxes.shape[1] >= 9:
        code += [gt_boxes[:, 7], gt_boxes[:, 8]]
    anno = jnp.stack(code, axis=1)
    anno = jnp.where(ok[:, None], anno, 0.0)

    def pad_to(x, n):
        if x.shape[0] >= n:
            return x[:n]
        pad = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad)

    return {
        "heatmap": heatmap,
        "anno_box": pad_to(anno, max_objs),
        "inds": pad_to(inds, max_objs).astype(jnp.int32),
        "mask": pad_to(ok, max_objs),
    }
