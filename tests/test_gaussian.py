import numpy as np

from detzero_tpu.ops import gaussian


HW = (32, 32)
VS = (0.5, 0.5, 0.5)
PCR = (-16.0, -16.0, -2.0, 16.0, 16.0, 2.0)


def test_gaussian_radius_reasonable():
    r = np.asarray(gaussian.gaussian_radius(np.array([[10.0, 10.0]]), 0.1))
    assert 0 < r[0] < 10


def test_heatmap_peak_at_center():
    boxes = np.array([[0.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.3]], np.float32)
    out = gaussian.assign_center_targets(
        boxes, np.zeros(1, np.int32), np.ones(1, bool), num_classes=2, hw=HW,
        feature_map_stride=2, voxel_size=VS, pc_range=PCR, max_objs=8,
        with_velocity=False,
    )
    heat = np.asarray(out["heatmap"])
    assert heat.shape == (2, 32, 32)
    # center: (0 - -16)/0.5/2 = 16
    assert heat[0, 16, 16] == 1.0
    assert heat[1].max() == 0.0
    inds = np.asarray(out["inds"])
    assert inds[0] == 16 * 32 + 16
    mask = np.asarray(out["mask"])
    assert mask[0] and not mask[1:].any()


def test_anno_box_encoding():
    boxes = np.array([[1.1, -2.3, 0.5, 4.0, 2.0, 1.5, 0.3, 1.0, -0.5]], np.float32)
    out = gaussian.assign_center_targets(
        boxes, np.zeros(1, np.int32), np.ones(1, bool), num_classes=1, hw=HW,
        feature_map_stride=2, voxel_size=VS, pc_range=PCR, max_objs=4,
    )
    anno = np.asarray(out["anno_box"])[0]
    cx = (1.1 + 16) / 0.5 / 2
    cy = (-2.3 + 16) / 0.5 / 2
    np.testing.assert_allclose(anno[0], cx - int(cx), atol=1e-5)
    np.testing.assert_allclose(anno[1], cy - int(cy), atol=1e-5)
    np.testing.assert_allclose(anno[2], 0.5, atol=1e-6)
    np.testing.assert_allclose(anno[3:6], np.log([4.0, 2.0, 1.5]), atol=1e-5)
    np.testing.assert_allclose(anno[6], np.sin(0.3), atol=1e-6)
    np.testing.assert_allclose(anno[7], np.cos(0.3), atol=1e-6)
    np.testing.assert_allclose(anno[8:10], [1.0, -0.5], atol=1e-6)


def test_two_overlapping_gaussians_take_max():
    boxes = np.array(
        [
            [0.0, 0.0, 0.0, 6.0, 6.0, 1.5, 0.0],
            [1.0, 0.0, 0.0, 6.0, 6.0, 1.5, 0.0],
        ],
        np.float32,
    )
    out = gaussian.assign_center_targets(
        boxes, np.zeros(2, np.int32), np.ones(2, bool), num_classes=1, hw=HW,
        feature_map_stride=2, voxel_size=VS, pc_range=PCR, max_objs=4,
        with_velocity=False,
    )
    heat = np.asarray(out["heatmap"])[0]
    assert heat[16, 16] == 1.0 and heat[16, 17] == 1.0  # both centers peak
    single = gaussian.assign_center_targets(
        boxes[:1], np.zeros(1, np.int32), np.ones(1, bool), num_classes=1, hw=HW,
        feature_map_stride=2, voxel_size=VS, pc_range=PCR, max_objs=4,
        with_velocity=False,
    )
    sh = np.asarray(single["heatmap"])[0]
    assert (heat >= sh - 1e-7).all()  # max composition dominates single draw


def test_invalid_gt_ignored():
    boxes = np.zeros((3, 7), np.float32)
    boxes[0] = [0, 0, 0, 4, 2, 1.5, 0]
    out = gaussian.assign_center_targets(
        boxes, np.zeros(3, np.int32), np.array([True, False, False]), num_classes=1,
        hw=HW, feature_map_stride=2, voxel_size=VS, pc_range=PCR, max_objs=4,
        with_velocity=False,
    )
    assert np.asarray(out["mask"]).sum() == 1
