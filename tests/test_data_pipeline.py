"""Data pipeline: sweeps, processor, augmentor, gt-sampling, TTA, WBF."""

import numpy as np
import pytest

from detzero_tpu.core.config import Config
from detzero_tpu.data import tta as tta_mod
from detzero_tpu.data.augmentor import DataAugmentor
from detzero_tpu.data.database_sampler import DataBaseSampler
from detzero_tpu.data.dataset import DatasetTemplate, get_sweep_idxs, merge_sweeps
from detzero_tpu.data.processor import DataProcessor
from detzero_tpu.ops import box_np, wbf


def test_get_sweep_idxs():
    assert get_sweep_idxs(10, [-4, 0], 100) == [6, 7, 8, 9]
    assert get_sweep_idxs(2, [-4, 0], 100) == [0, 1]
    assert get_sweep_idxs(0, [-4, 0], 100) == []


def test_merge_sweeps_pose_chain_and_time():
    # current pose at origin; sweep pose translated +1 in x
    cur = np.array([[5.0, 0, 0, 0.5, 1.0, -1]], np.float32)  # x y z i e nlz
    pose_c = np.eye(4, dtype=np.float32)
    pose_s = np.eye(4, dtype=np.float32)
    pose_s[0, 3] = 1.0
    swp = np.array([[5.0, 0, 0, 0.5, 1.0, -1], [9, 9, 9, 0.1, 0.2, 3]],
                   np.float32)  # 2nd point is in an NLZ (flag != -1)
    out = merge_sweeps(cur, pose_c, [swp], [pose_s], [-0.1])
    assert out.shape == (2, 6)  # nlz column dropped, time appended
    np.testing.assert_allclose(out[0, :3], [5, 0, 0], atol=1e-5)
    np.testing.assert_allclose(out[1, :3], [6, 0, 0], atol=1e-5)  # shifted +1
    np.testing.assert_allclose(out[:, 3], np.tanh(0.5), atol=1e-6)
    assert out[0, -1] == 0.0 and out[1, -1] == np.float32(-0.1)


def test_processor_budget_and_mask():
    proc = DataProcessor(
        [{"NAME": "mask_points_and_boxes_outside_range"},
         {"NAME": "shuffle_points"}],
        point_cloud_range=[-10, -10, -2, 10, 10, 2], training=True,
        num_point_budget=64,
    )
    pts = np.random.RandomState(0).uniform(-20, 20, (300, 5)).astype(np.float32)
    out = proc({"points": pts})
    assert out["points"].shape == (64, 5)
    n_valid = out["points_valid"].sum()
    assert 0 < n_valid <= 64
    assert (np.abs(out["points"][out["points_valid"]][:, :2]) <= 10).all()
    assert (out["points"][~out["points_valid"]] == 0).all()


def test_augmentor_records_invertible_transform():
    np.random.seed(1)
    aug = DataAugmentor(
        [{"NAME": "random_world_flip", "ALONG_AXIS_LIST": ["x", "y"]},
         {"NAME": "random_world_rotation", "WORLD_ROT_ANGLE": [-0.7, 0.7]},
         {"NAME": "random_world_scaling", "WORLD_SCALE_RANGE": [0.9, 1.1]}],
        ["Vehicle"],
    )
    pts = np.random.randn(100, 5).astype(np.float32)
    orig = pts.copy()
    boxes = np.array([[1, 2, 0, 4, 2, 1.5, 0.3]], np.float32)
    data = aug({"points": pts.copy(), "gt_boxes": boxes.copy(),
                "gt_names": np.array(["Vehicle"])})
    # points map back through the recorded inverse matrix
    rec = data["points"][:, :3] @ data["aug_matrix_inv"].T
    np.testing.assert_allclose(rec, orig[:, :3], atol=1e-4)


def test_gt_sampling_pastes_and_rejects_collisions():
    cfg = {"SAMPLE_GROUPS": ["Vehicle:3"], "MIN_POINTS": 1}
    sampler = DataBaseSampler(cfg, ["Vehicle"])
    db = {"Vehicle": [
        {"box": [1.0, 2.0, 0, 4, 2, 1.5, 0.0],   # collides with existing GT
         "points": np.random.randn(20, 5).astype(np.float32)},
        {"box": [15.0, 15.0, 0, 4, 2, 1.5, 0.2],
         "points": np.random.randn(20, 5).astype(np.float32)},
        {"box": [-15.0, -15.0, 0, 4, 2, 1.5, 0.4],
         "points": np.random.randn(20, 5).astype(np.float32)},
    ]}
    sampler.set_database(db)
    sampler.rng = np.random.RandomState(0)
    pts = np.random.RandomState(2).uniform(-20, 20, (500, 5)).astype(np.float32)
    data = sampler({
        "points": pts,
        "gt_boxes": np.array([[1, 2, 0, 4, 2, 1.5, 0.0]], np.float32),
        "gt_names": np.array(["Vehicle"], object),
    })
    # the colliding candidate is rejected; two others pasted
    assert len(data["gt_boxes"]) == 3
    centers = data["gt_boxes"][1:, :2]
    assert {tuple(np.round(c)) for c in centers} == {(15.0, 15.0), (-15.0, -15.0)}
    # scene points inside pasted boxes are removed, object points added
    for b in data["gt_boxes"][1:]:
        inside = box_np.points_in_rotated_box(data["points"], b)
        assert inside.sum() <= 20  # only the pasted object's own points


def _forward_boxes(boxes, name):
    """Apply a TTA transform to boxes (what a detector sees in the augmented
    frame) — mirror of invert_boxes."""
    b = np.array(boxes, float)
    if name.startswith("flip"):
        ax = name.split("_")[1]
        if "x" in ax:
            b[:, 1] = -b[:, 1]
            b[:, 6] = -b[:, 6]
            if b.shape[1] > 8:
                b[:, 8] = -b[:, 8]
        if "y" in ax:
            b[:, 0] = -b[:, 0]
            b[:, 6] = np.pi - b[:, 6]
            if b.shape[1] > 7:
                b[:, 7] = -b[:, 7]
        return b
    if name.startswith("rot"):
        a = float(name.split("_")[1])
        c, s = np.cos(a), np.sin(a)
        rot = np.array([[c, -s], [s, c]])
        b[:, :2] = b[:, :2] @ rot.T
        b[:, 6] += a
        if b.shape[1] > 8:
            b[:, 7:9] = b[:, 7:9] @ rot.T
        return b
    if name.startswith("scale"):
        s = float(name.split("_")[1])
        b[:, :6] *= s
        if b.shape[1] > 8:
            b[:, 7:9] *= s
        return b
    raise KeyError(name)


def test_tta_roundtrip_boxes():
    boxes = np.array([[3, -2, 0.5, 4, 2, 1.5, 0.7, 1.0, -0.5]], np.float32)
    for name in ["flip_x", "flip_y", "flip_xy", "rot_0.78539816", "scale_0.95"]:
        inv = tta_mod.invert_boxes(_forward_boxes(boxes, name), name)
        np.testing.assert_allclose(inv[0, :6], boxes[0, :6], atol=1e-5)
        np.testing.assert_allclose(np.cos(inv[0, 6]), np.cos(boxes[0, 6]), atol=1e-5)
        np.testing.assert_allclose(np.sin(inv[0, 6]), np.sin(boxes[0, 6]), atol=1e-5)
        np.testing.assert_allclose(inv[0, 7:9], boxes[0, 7:9], atol=1e-5)
        # points and boxes agree: a point at the box center maps identically
        pts5 = np.concatenate([boxes[:, :3], np.zeros((1, 2))], 1)
        moved = tta_mod._apply(pts5, name)
        np.testing.assert_allclose(moved[0, :2], _forward_boxes(boxes, name)[0, :2],
                                   atol=1e-5)


def test_tta_fanout_count():
    t = tta_mod.TestTimeAugmentor()
    outs = t({"points": np.zeros((10, 5), np.float32)})
    assert len(outs) == 15  # original + 14
    assert outs[0]["tta_name"] == "original"


def test_wbf_fuses_duplicates():
    boxes = np.array([
        [0, 0, 0, 4, 2, 1.5, 0.0],
        [0.05, 0, 0, 4, 2, 1.5, 0.02],
        [0.1, 0.05, 0, 4.1, 2, 1.5, 0.0],
        [20, 20, 0, 4, 2, 1.5, 0.5],
    ])
    scores = np.array([0.9, 0.8, 0.7, 0.6])
    fb, fs, clusters, _ = wbf.weighted_boxes_fusion_3d(boxes, scores, 0.7)
    assert len(fb) == 2
    np.testing.assert_allclose(fb[0][:2], [0.044, 0.0146], atol=0.02)
    assert fb[0][6] == 0.0  # heading from best member
    np.testing.assert_allclose(fs[0], scores[:3].mean(), atol=1e-6)


def test_wbf_online_per_class():
    names = np.array(["Vehicle", "Vehicle", "Pedestrian"], object)
    boxes = np.array([
        [0, 0, 0, 4, 2, 1.5, 0.0],
        [0.05, 0, 0, 4, 2, 1.5, 0.0],
        [0.0, 0, 0, 0.8, 0.8, 1.7, 0.0],  # ped overlapping veh: no cross-fuse
    ])
    scores = np.array([0.9, 0.8, 0.7])
    n, b, s = wbf.wbf_online(names, boxes, scores)
    assert sorted(n.tolist()) == ["Pedestrian", "Vehicle"]


def test_dataset_template_end_to_end_collate():
    cfg = Config({
        "POINT_CLOUD_RANGE": [-10, -10, -2, 10, 10, 2],
        "NUM_POINT_BUDGET": 128,
        "MAX_OBJS": 8,
        "DATA_PROCESSOR": [
            {"NAME": "mask_points_and_boxes_outside_range"},
            {"NAME": "shuffle_points"},
        ],
        "DATA_AUGMENTOR": {"AUG_CONFIG_LIST": [
            {"NAME": "random_world_flip", "ALONG_AXIS_LIST": ["x"]},
        ]},
    })
    ds = DatasetTemplate(cfg, ["Vehicle"], training=True)
    rng = np.random.RandomState(0)

    def make_sample():
        return {
            "points": rng.uniform(-9, 9, (200, 6)).astype(np.float32),
            "gt_boxes": np.array([[1, 1, 0, 4, 2, 1.5, 0.2]], np.float32),
            "gt_names": np.array(["Vehicle"], object),
            "frame_id": 0,
        }

    batch = ds.collate_batch([ds.prepare_data(make_sample()),
                              ds.prepare_data(make_sample())])
    assert batch["points"].shape == (2, 128, 6)
    assert batch["gt_boxes"].shape == (2, 8, 7)
    assert batch["gt_valid"].sum() == 2
