"""JAX box geometry (device-side).

Re-designs utils/detzero_utils/box_utils.py + common_utils.py rotation helpers
as pure jnp programs: static shapes, batched, vmap/jit friendly. These feed the
center head decode, NMS, target assignment, TTA inversion, and WBF.
"""

from __future__ import annotations

import jax.numpy as jnp

CORNER_TEMPLATE_BEV = jnp.array(
    [[0.5, 0.5], [-0.5, 0.5], [-0.5, -0.5], [0.5, -0.5]], dtype=jnp.float32
)


def limit_period(val, offset: float = 0.5, period: float = jnp.pi):
    """Wrap to [-offset*period, (1-offset)*period) (common_utils.py:169)."""
    return val - jnp.floor(val / period + offset) * period


def rotation_matrix_2d(angle):
    """(...,) -> (..., 2, 2) rotation about +z."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )


def rotate_points_along_z(points, angle):
    """points (..., N, 3+), angle (...,) -> rotated points, extra feature
    channels untouched (common_utils.py:220). Elementwise (VPU) rather than a
    2x2 einsum: tiny contractions would otherwise hit the MXU at bf16
    precision."""
    c = jnp.cos(angle)[..., None]
    s = jnp.sin(angle)[..., None]
    x, y = points[..., 0], points[..., 1]
    xy = jnp.stack([x * c - y * s, x * s + y * c], axis=-1)
    return jnp.concatenate([xy, points[..., 2:]], axis=-1)


def boxes_to_corners_bev(boxes):
    """(N, 5+) [x, y, dx, dy, heading, ...] -> (N, 4, 2) ccw corners."""
    centers = boxes[:, :2]
    dims = boxes[:, 2:4]
    corners = CORNER_TEMPLATE_BEV[None] * dims[:, None, :]  # (N, 4, 2)
    c = jnp.cos(boxes[:, 4])[:, None]
    s = jnp.sin(boxes[:, 4])[:, None]
    x, y = corners[..., 0], corners[..., 1]
    corners = jnp.stack([x * c - y * s, x * s + y * c], axis=-1)
    return corners + centers[:, None, :]


def boxes_to_corners_3d(boxes):
    """(N, 7) -> (N, 8, 3). Corner order matches box_utils.py:28-53:
    bottom 4 then top 4, z measured from box center."""
    template = jnp.array(
        [
            [1, 1, -1], [1, -1, -1], [-1, -1, -1], [-1, 1, -1],
            [1, 1, 1], [1, -1, 1], [-1, -1, 1], [-1, 1, 1],
        ],
        dtype=jnp.float32,
    ) / 2.0
    corners = template[None] * boxes[:, None, 3:6]
    corners = rotate_points_along_z(corners, boxes[:, 6])
    return corners + boxes[:, None, :3]


def boxes3d_to_bev(boxes3d):
    """(N, 7) -> (N, 5) [x, y, dx, dy, heading]."""
    return boxes3d[:, jnp.array([0, 1, 3, 4, 6])]


def enlarge_box3d(boxes3d, extra_width=(0.0, 0.0, 0.0)):
    """(N,7+) grown by extra (dx,dy,dz) (box_utils.py:165)."""
    extra = jnp.asarray(extra_width, dtype=boxes3d.dtype)
    return boxes3d.at[:, 3:6].add(extra)


def scale_box3d(boxes3d, factor: float):
    return boxes3d.at[:, 3:6].multiply(factor)


def points_in_boxes(points, boxes):
    """(N, 3+), (M, 7) -> (N, M) bool. Canonical transform + bounds test;
    replaces roiaware_pool3d points_in_boxes_gpu — pure elementwise, no kernel
    needed (SURVEY §7)."""
    shifted = points[:, None, :3] - boxes[None, :, :3]  # (N, M, 3)
    c, s = jnp.cos(-boxes[:, 6]), jnp.sin(-boxes[:, 6])
    lx = shifted[..., 0] * c[None, :] - shifted[..., 1] * s[None, :]
    ly = shifted[..., 0] * s[None, :] + shifted[..., 1] * c[None, :]
    lz = shifted[..., 2]
    return (
        (jnp.abs(lx) <= boxes[None, :, 3] / 2 + 1e-6)
        & (jnp.abs(ly) <= boxes[None, :, 4] / 2 + 1e-6)
        & (jnp.abs(lz) <= boxes[None, :, 5] / 2 + 1e-6)
    )


def mask_boxes_outside_range(boxes, limit_range, min_num_corners: int = 1):
    """(N, 7+) -> (N,) bool: keep boxes with >= min_num_corners BEV corners in
    range (box_utils.py:56)."""
    corners = boxes_to_corners_bev(boxes3d_to_bev(boxes))  # (N, 4, 2)
    lr = jnp.asarray(limit_range)
    inside = (
        (corners[..., 0] >= lr[0]) & (corners[..., 0] <= lr[3])
        & (corners[..., 1] >= lr[1]) & (corners[..., 1] <= lr[4])
    )
    return inside.sum(axis=1) >= min_num_corners


def transform_boxes3d(boxes, pose):
    """(N, 7+[vx,vy]) lidar-frame -> global frame via 4x4 pose
    (box_utils.py:144: rotates heading by yaw of pose, transforms centers,
    rotates velocity channels when present)."""
    centers = boxes[:, :3] @ pose[:3, :3].T + pose[:3, 3]
    yaw = jnp.arctan2(pose[1, 0], pose[0, 0])
    heading = boxes[:, 6] + yaw
    out = [centers, boxes[:, 3:6], heading[:, None]]
    if boxes.shape[1] > 7:
        vel = boxes[:, 7:9] @ pose[:2, :2].T
        out.append(vel)
        if boxes.shape[1] > 9:
            out.append(boxes[:, 9:])
    return jnp.concatenate(out, axis=-1)


def inverse_pose(pose):
    """Invert a rigid 4x4 transform."""
    r = pose[:3, :3]
    t = pose[:3, 3]
    inv = jnp.eye(4, dtype=pose.dtype)
    inv = inv.at[:3, :3].set(r.T)
    inv = inv.at[:3, 3].set(-r.T @ t)
    return inv


def bilinear_sample_bev(bev_hwc, xy, voxel_size, pc_range,
                        feature_map_stride: int):
    """Bilinearly sample BEV features at metric (x, y) locations
    (centernet_utils.py:233 bilinear_interpolate_torch — used by the
    reference's two-stage keypoint feature sampling, center_head.py:457).

    bev_hwc (H, W, C); xy (N, 2) lidar coords -> (N, C).
    """
    h, w, c = bev_hwc.shape
    fx = (xy[:, 0] - pc_range[0]) / (voxel_size[0] * feature_map_stride) - 0.5
    fy = (xy[:, 1] - pc_range[1]) / (voxel_size[1] * feature_map_stride) - 0.5
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, h - 2)
    tx = jnp.clip(fx - x0, 0.0, 1.0)[:, None]
    ty = jnp.clip(fy - y0, 0.0, 1.0)[:, None]
    f00 = bev_hwc[y0, x0]
    f01 = bev_hwc[y0, x0 + 1]
    f10 = bev_hwc[y0 + 1, x0]
    f11 = bev_hwc[y0 + 1, x0 + 1]
    return ((1 - ty) * ((1 - tx) * f00 + tx * f01)
            + ty * ((1 - tx) * f10 + tx * f11))


def box_keypoints_bev(boxes):
    """5 BEV keypoints per box: center + 4 side midpoints (reference
    get_box_center, center_head.py:408). (N, 7) -> (N, 5, 2)."""
    c, s = jnp.cos(boxes[:, 6]), jnp.sin(boxes[:, 6])
    hx = boxes[:, 3] / 2
    hy = boxes[:, 4] / 2
    offs = jnp.stack([
        jnp.zeros_like(hx), jnp.zeros_like(hx),  # center
        hx, jnp.zeros_like(hx), -hx, jnp.zeros_like(hx),
        jnp.zeros_like(hy), hy, jnp.zeros_like(hy), -hy,
    ], axis=1).reshape(-1, 5, 2)
    x = offs[..., 0] * c[:, None] - offs[..., 1] * s[:, None] + boxes[:, None, 0]
    y = offs[..., 0] * s[:, None] + offs[..., 1] * c[:, None] + boxes[:, None, 1]
    return jnp.stack([x, y], axis=-1)


def get_voxel_centers(voxel_coords, downsample_times, voxel_size, point_cloud_range):
    """(N, 3) zyx int coords -> (N, 3) xyz centers (common_utils.py:253)."""
    coords = voxel_coords[:, ::-1].astype(jnp.float32)  # zyx -> xyz
    vs = jnp.asarray(voxel_size) * downsample_times
    pc_min = jnp.asarray(point_cloud_range[:3])
    return (coords + 0.5) * vs + pc_min
