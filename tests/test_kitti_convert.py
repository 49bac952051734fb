import numpy as np
import pytest

from detzero_tpu.utils import kitti_convert as kc


def _rand_lidar_boxes(n, rng):
    return np.concatenate([
        rng.uniform(-30, 30, (n, 2)), rng.uniform(-1, 1, (n, 1)),
        rng.uniform(1, 5, (n, 3)), rng.uniform(-np.pi, np.pi, (n, 1))],
        axis=1)


def test_lidar_camera_roundtrip():
    rng = np.random.RandomState(0)
    boxes = _rand_lidar_boxes(16, rng)
    calib = kc.SimpleCalib()
    cam = kc.boxes3d_lidar_to_kitti_camera(boxes, calib)
    back = kc.boxes3d_kitti_camera_to_lidar(cam, calib)
    np.testing.assert_allclose(back[:, :6], boxes[:, :6], atol=1e-9)
    # headings equal modulo 2pi
    d = (back[:, 6] - boxes[:, 6]) % (2 * np.pi)
    d = np.minimum(d, 2 * np.pi - d)
    np.testing.assert_allclose(d, 0, atol=1e-9)


def test_fakelidar_roundtrip_and_bottom_center():
    rng = np.random.RandomState(1)
    boxes = _rand_lidar_boxes(8, rng)
    fake = kc.boxes3d_kitti_lidar_to_fakelidar(boxes)
    # z becomes bottom, sizes swap to (w, l, h)
    np.testing.assert_allclose(fake[:, 2], boxes[:, 2] - boxes[:, 5] / 2)
    np.testing.assert_allclose(fake[:, 3], boxes[:, 4])
    np.testing.assert_allclose(fake[:, 4], boxes[:, 3])
    back = kc.boxes3d_kitti_fakelidar_to_lidar(fake)
    np.testing.assert_allclose(back[:, :6], boxes[:, :6], atol=1e-9)
    d = (back[:, 6] - boxes[:, 6]) % (2 * np.pi)
    d = np.minimum(d, 2 * np.pi - d)
    np.testing.assert_allclose(d, 0, atol=1e-9)


def test_camera_corners_match_lidar_corners():
    """Camera-frame corners, mapped back to lidar, must coincide with the
    lidar corner set of the same physical box."""
    from detzero_tpu.ops.box_ops import boxes_to_corners_3d

    rng = np.random.RandomState(2)
    boxes = _rand_lidar_boxes(4, rng)
    calib = kc.SimpleCalib()
    cam = kc.boxes3d_lidar_to_kitti_camera(boxes, calib)
    cam_corners = kc.boxes3d_to_corners3d_kitti_camera(cam)  # (N, 8, 3)
    lidar_from_cam = calib.rect_to_lidar(
        cam_corners.reshape(-1, 3)).reshape(-1, 8, 3)
    lidar_corners = np.asarray(boxes_to_corners_3d(boxes))
    for i in range(len(boxes)):
        a = np.sort(lidar_from_cam[i], axis=0)
        b = np.sort(lidar_corners[i], axis=0)
        np.testing.assert_allclose(a, b, atol=1e-4)


def test_imageboxes_projection_and_clip():
    calib = kc.SimpleCalib(P2=np.array([[700., 0., 600., 0.],
                                        [0., 700., 200., 0.],
                                        [0., 0., 1., 0.]]))
    # box 10 m ahead of the lidar (camera z forward after permutation)
    boxes = np.array([[10.0, 0.0, 0.0, 4.0, 2.0, 1.6, 0.0]])
    img = kc.boxes3d_lidar_to_imageboxes(boxes, calib,
                                         image_shape=(400, 1200))
    x1, y1, x2, y2 = img[0]
    assert 0 <= x1 < x2 <= 1199
    assert 0 <= y1 < y2 <= 399
    # center of the image box should be near the principal point
    assert abs((x1 + x2) / 2 - 600) < 120
    assert abs((y1 + y2) / 2 - 200) < 120


def test_nearest_bev_iou_matches_exact_for_axis_aligned():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from detzero_tpu.ops import iou3d
    from detzero_tpu.ops import box_np

    rng = np.random.RandomState(3)
    a = _rand_lidar_boxes(12, rng)
    b = _rand_lidar_boxes(10, rng)
    # snap headings to multiples of pi/2: nearest-bev approx becomes exact
    for arr in (a, b):
        arr[:, 6] = np.round(arr[:, 6] / (np.pi / 2)) * (np.pi / 2)
    approx = np.asarray(iou3d.boxes3d_nearest_bev_iou(a, b))
    exact = box_np.boxes_iou_bev(a, b)
    np.testing.assert_allclose(approx, exact, atol=1e-4)


def test_nearest_bev_iou_self_diagonal_one():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from detzero_tpu.ops import iou3d

    rng = np.random.RandomState(4)
    a = _rand_lidar_boxes(6, rng)
    m = np.asarray(iou3d.boxes3d_nearest_bev_iou(a, a))
    np.testing.assert_allclose(np.diag(m), 1.0, atol=1e-5)
