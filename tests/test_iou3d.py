"""JAX rotated IoU / GIoU / NMS vs the NumPy polygon-clipping oracle."""

import numpy as np
import pytest

from detzero_tpu.ops import box_np


def random_boxes3d(rng, n, span=20.0):
    b = np.zeros((n, 7), np.float32)
    b[:, 0:2] = rng.uniform(-span, span, (n, 2))
    b[:, 2] = rng.uniform(-1, 2, n)
    b[:, 3:5] = rng.uniform(0.5, 6.0, (n, 2))
    b[:, 5] = rng.uniform(0.5, 3.0, n)
    b[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return b


def clustered_boxes3d(rng, n):
    """Boxes clustered so overlaps actually occur."""
    b = random_boxes3d(rng, n, span=4.0)
    return b


def test_overlap_matches_oracle(rng):
    from detzero_tpu.ops import iou3d

    a = clustered_boxes3d(rng, 24)
    b = clustered_boxes3d(rng, 16)
    got = np.asarray(iou3d.boxes_overlap_bev(box_np.boxes3d_to_bev(a), box_np.boxes3d_to_bev(b)))
    want = box_np.boxes_overlap_bev(box_np.boxes3d_to_bev(a), box_np.boxes3d_to_bev(b))
    np.testing.assert_allclose(got, want, atol=2e-3)
    assert (want > 0.1).sum() > 5, "test data produced no real overlaps"


def test_identical_boxes_full_overlap(rng):
    from detzero_tpu.ops import iou3d

    a = clustered_boxes3d(rng, 8)
    iou = np.asarray(iou3d.boxes_iou3d(a, a))
    np.testing.assert_allclose(np.diag(iou), 1.0, atol=1e-3)


def test_iou3d_matches_oracle(rng):
    from detzero_tpu.ops import iou3d

    a = clustered_boxes3d(rng, 16)
    b = clustered_boxes3d(rng, 16)
    got = np.asarray(iou3d.boxes_iou3d(a, b))
    want = box_np.boxes_iou3d(a, b)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_axis_aligned_analytic():
    from detzero_tpu.ops import iou3d

    # two unit squares offset by 0.5 in x: intersection 0.5, union 1.5
    a = np.array([[0, 0, 0, 1, 1, 1, 0]], np.float32)
    b = np.array([[0.5, 0, 0, 1, 1, 1, 0]], np.float32)
    iou = float(iou3d.boxes_iou3d(a, b)[0, 0])
    assert abs(iou - 0.5 / 1.5) < 1e-4


def test_rotated_analytic():
    from detzero_tpu.ops import iou3d

    # 45-degree rotated square on identical square: overlap = octagon
    a = np.array([[0, 0, 0, 2, 2, 1, 0]], np.float32)
    b = np.array([[0, 0, 0, 2, 2, 1, np.pi / 4]], np.float32)
    ov = float(iou3d.boxes_overlap_bev(a[:, [0, 1, 3, 4, 6]], b[:, [0, 1, 3, 4, 6]])[0, 0])
    want = box_np.rotated_overlap_bev(a[0, [0, 1, 3, 4, 6]], b[0, [0, 1, 3, 4, 6]])
    np.testing.assert_allclose(ov, want, atol=1e-3)
    # octagon area = 8*(sqrt(2)-1) for square side 2
    np.testing.assert_allclose(ov, 8 * (np.sqrt(2) - 1), atol=1e-3)


def test_giou3d_matches_oracle(rng):
    from detzero_tpu.ops import iou3d

    a = clustered_boxes3d(rng, 10)
    b = clustered_boxes3d(rng, 10)
    got = np.asarray(iou3d.boxes_giou3d(a, b))
    want = box_np.boxes_giou3d(a, b)
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_disjoint_boxes_zero():
    from detzero_tpu.ops import iou3d

    a = np.array([[0, 0, 0, 1, 1, 1, 0.3]], np.float32)
    b = np.array([[10, 10, 0, 1, 1, 1, 1.0]], np.float32)
    assert float(iou3d.boxes_iou3d(a, b)[0, 0]) == 0.0


def test_nms_matches_greedy_oracle(rng):
    from detzero_tpu.ops import nms

    boxes = clustered_boxes3d(rng, 40)
    scores = rng.uniform(0, 1, 40).astype(np.float32)
    thresh = 0.1
    idx, mask = nms.nms_bev(boxes, scores, thresh, pre_max=40, post_max=40)
    got = set(np.asarray(idx)[np.asarray(mask)].tolist())

    # oracle greedy NMS
    order = np.argsort(-scores)
    bev = box_np.boxes3d_to_bev(boxes)
    iou = box_np.boxes_iou_bev(bev[order], bev[order])
    keep, suppressed = [], np.zeros(len(order), bool)
    for i in range(len(order)):
        if suppressed[i]:
            continue
        keep.append(order[i])
        suppressed |= iou[i] > thresh
        suppressed[i] = False
    assert got == set(keep)


def test_nms_respects_valid_mask(rng):
    from detzero_tpu.ops import nms

    boxes = clustered_boxes3d(rng, 20)
    scores = rng.uniform(0, 1, 20).astype(np.float32)
    vm = np.zeros(20, bool)
    vm[:5] = True
    idx, mask = nms.nms_bev(boxes, scores, 0.7, pre_max=20, post_max=20, valid_mask=vm)
    kept = np.asarray(idx)[np.asarray(mask)]
    assert set(kept).issubset(set(range(5)))
