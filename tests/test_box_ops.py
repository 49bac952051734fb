import numpy as np

from detzero_tpu.ops import box_np


def test_corners_bev_matches_numpy(rng):
    from detzero_tpu.ops import box_ops

    boxes = np.concatenate(
        [
            rng.uniform(-10, 10, (8, 2)),
            rng.uniform(1, 5, (8, 2)),
            rng.uniform(-np.pi, np.pi, (8, 1)),
        ],
        axis=1,
    ).astype(np.float32)
    got = np.asarray(box_ops.boxes_to_corners_bev(boxes))
    want = box_np.boxes_to_corners_bev(boxes)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_limit_period():
    from detzero_tpu.ops import box_ops

    vals = np.array([0.0, np.pi, -np.pi, 3 * np.pi, 0.1])
    got = np.asarray(box_ops.limit_period(vals, 0.5, 2 * np.pi))
    # half-open [-pi, pi) up to float32 rounding at the exact boundary
    assert np.all(got >= -np.pi - 1e-5) and np.all(got < np.pi + 1e-5)
    np.testing.assert_allclose(np.cos(got), np.cos(vals), atol=1e-6)
    np.testing.assert_allclose(np.sin(got), np.sin(vals), atol=1e-6)


def test_points_in_boxes_matches_numpy(rng):
    from detzero_tpu.ops import box_ops

    points = rng.uniform(-5, 5, (200, 3)).astype(np.float32)
    boxes = np.array(
        [[0, 0, 0, 4, 2, 2, 0.5], [2, 2, 0.5, 3, 3, 1, -1.0]], np.float32
    )
    got = np.asarray(box_ops.points_in_boxes(points, boxes))
    for j in range(2):
        want = box_np.points_in_rotated_box(points, boxes[j])
        assert (got[:, j] == want).mean() > 0.99  # allow boundary eps differences
    assert got.any(), "no points landed inside boxes"


def test_transform_boxes3d_roundtrip(rng):
    from detzero_tpu.ops import box_ops

    boxes = np.concatenate(
        [
            rng.uniform(-10, 10, (5, 3)),
            rng.uniform(1, 4, (5, 3)),
            rng.uniform(-np.pi, np.pi, (5, 1)),
            rng.uniform(-3, 3, (5, 2)),  # velocity
        ],
        axis=1,
    ).astype(np.float32)
    yaw = 0.7
    c, s = np.cos(yaw), np.sin(yaw)
    pose = np.eye(4, dtype=np.float32)
    pose[:2, :2] = [[c, -s], [s, c]]
    pose[:3, 3] = [10, -5, 1]
    fwd = box_ops.transform_boxes3d(boxes, pose)
    back = box_ops.transform_boxes3d(fwd, box_ops.inverse_pose(pose))
    back = np.asarray(back)
    np.testing.assert_allclose(back[:, :6], boxes[:, :6], atol=1e-4)
    np.testing.assert_allclose(np.cos(back[:, 6]), np.cos(boxes[:, 6]), atol=1e-4)
    np.testing.assert_allclose(back[:, 7:9], boxes[:, 7:9], atol=1e-4)


def test_mask_boxes_outside_range():
    from detzero_tpu.ops import box_ops

    boxes = np.array(
        [[0, 0, 0, 2, 2, 2, 0.0], [100, 100, 0, 2, 2, 2, 0.0]], np.float32
    )
    m = np.asarray(box_ops.mask_boxes_outside_range(boxes, [-75.2, -75.2, -2, 75.2, 75.2, 4]))
    assert m.tolist() == [True, False]


def test_get_voxel_centers():
    from detzero_tpu.ops import box_ops

    coords = np.array([[0, 0, 0], [1, 2, 3]], np.int32)  # zyx
    centers = np.asarray(
        box_ops.get_voxel_centers(coords, 2, [0.1, 0.1, 0.15], [-75.2, -75.2, -2.0, 75.2, 75.2, 4.0])
    )
    np.testing.assert_allclose(centers[0], [-75.1, -75.1, -1.85], atol=1e-5)
    np.testing.assert_allclose(centers[1], [-75.2 + 0.2 * 3.5, -75.2 + 0.2 * 2.5, -2 + 0.3 * 1.5], atol=1e-5)


def test_vectorized_np_overlap_matches_oracle(rng):
    from detzero_tpu.ops import box_np

    b = np.zeros((24, 5))
    b[:, :2] = rng.uniform(-8, 8, (24, 2))
    b[:, 2:4] = rng.uniform(1, 5, (24, 2))
    b[:, 4] = rng.uniform(-3, 3, 24)
    got = box_np.boxes_overlap_bev_vec(b, b)
    want = box_np.boxes_overlap_bev(b, b)
    np.testing.assert_allclose(got, want, atol=1e-6)
