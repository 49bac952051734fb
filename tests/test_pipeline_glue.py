"""Daemon glue + evaluator + refining feature extraction."""

import numpy as np
import pytest

from detzero_tpu.data import refine_features as rf
from detzero_tpu.pipeline import daemon, evaluator


def _track_result():
    boxes = np.array([[5 + i, 0, 0, 4, 2, 1.5, 0.0] for i in range(6)], np.float32)
    return {
        "tracks": {
            0: {"boxes_global": boxes, "score": np.full(6, 0.9, np.float32),
                "sample_idx": np.arange(6), "hit": np.ones(6, bool),
                "state": "dynamic", "label": 0},
        },
        "drop": [{"boxes": np.zeros((0, 7)), "scores": np.zeros(0)}] * 6,
    }


def _frame_points():
    rng = np.random.RandomState(0)
    frames = []
    for f in range(6):
        inside = rng.uniform(-0.5, 0.5, (50, 3)) * [3.6, 1.8, 1.3] + [5 + f, 0, 0]
        bg = rng.uniform(-30, 30, (200, 3))
        pts = np.concatenate([inside, bg]).astype(np.float32)
        inten = rng.rand(len(pts), 1).astype(np.float32)
        frames.append(np.concatenate([pts, inten], axis=1))
    return frames


def test_prepare_object_data_crops_points():
    tr = _track_result()
    frames = _frame_points()
    poses = [np.eye(4, dtype=np.float32)] * 6
    recs = daemon.prepare_object_data(tr, frames, poses)
    assert set(recs) == {0}
    rec = recs[0]
    assert len(rec["pts"]) == 6
    for f, p in enumerate(rec["pts"]):
        assert len(p) >= 40, f"frame {f}: only {len(p)} points cropped"
        # cropped points inside the enlarged box
        assert (np.abs(p[:, 0] - (5 + f)) <= 2.3).all()


def test_gt_match_and_iou_gt():
    tr = _track_result()
    frames = _frame_points()
    poses = [np.eye(4, dtype=np.float32)] * 6
    gt_boxes = [np.array([[5 + f + 0.2, 0, 0, 4.2, 2.0, 1.5, 0.05]]) for f in range(6)]
    recs = daemon.prepare_object_data(tr, frames, poses, gt_boxes=gt_boxes,
                                      gt_ids=[[7]] * 6)
    rec = recs[0]
    assert rec["matched"].all()
    ious = daemon.generate_iou_gt(recs, refined_sizes={0: np.array([4.2, 2.0, 1.5])})
    assert (ious[0] > 0.5).all()


def test_combine_output_roundtrip_with_refinements():
    tr = _track_result()
    frames = _frame_points()
    poses = [np.eye(4, dtype=np.float32)] * 6
    recs = daemon.prepare_object_data(tr, frames, poses)
    new_size = np.array([4.4, 2.1, 1.6])
    new_centers = {0: recs[0]["boxes_global"][:, :3] + 0.1}
    new_scores = {0: np.full(6, 0.77)}
    out = daemon.combine_output(recs, grm_sizes={0: new_size},
                                prm_centers=new_centers, crm_scores=new_scores,
                                drop_data=tr["drop"])
    assert len(out) == 6
    for f, fr in enumerate(out):
        assert fr["boxes"].shape == (1, 7)
        np.testing.assert_allclose(fr["boxes"][0, 3:6], new_size)
        np.testing.assert_allclose(fr["boxes"][0, :3],
                                   [5 + f + 0.1, 0.1, 0.1], atol=1e-6)
        assert fr["scores"][0] == pytest.approx(0.77)


def test_refine_feature_shapes_and_locality():
    rng = np.random.RandomState(1)
    box = np.array([3.0, -2.0, 0.5, 4.0, 2.0, 1.5, 0.6])
    pts_local_true = rng.uniform(-0.5, 0.5, (100, 3)) * [3.6, 1.8, 1.3]
    from detzero_tpu.ops import box_np
    pts_world = box_np.rotate_points_along_z(pts_local_true.copy(), 0.6) + box[:3]
    pts4 = np.concatenate([pts_world, rng.rand(100, 1)], 1).astype(np.float32)

    f = rf.grm_point_features(pts4, box, 0.9, 64, rng=np.random.RandomState(0))
    assert f.shape == (64, 11)
    # local coords inside the half-dims; p2s distances all positive (inside)
    assert (np.abs(f[:, 0]) <= 2.01).all() and (np.abs(f[:, 1]) <= 1.01).all()
    assert (f[:, 4:10] > -1e-4).all()
    assert (f[:, 10] == np.float32(0.9)).all()

    f2 = rf.prm_point_features(pts4, box, 0.9, 32, rng=np.random.RandomState(0))
    assert f2.shape == (32, 32)


def test_init_coords_roundtrip():
    boxes = np.array([[i * 1.0, i * 0.5, 0.2, 4, 2, 1.5, 0.1 * i] for i in range(10)],
                     np.float32)
    init = boxes[5]
    local = rf.boxes_to_init_coords(boxes, init)
    np.testing.assert_allclose(local[5, :3], 0, atol=1e-5)
    np.testing.assert_allclose(local[5, 6], 0, atol=1e-6)
    back = rf.boxes_from_init_coords(local, init)
    np.testing.assert_allclose(back, boxes, atol=1e-4)


def test_grm_prm_samples_from_daemon_record():
    tr = _track_result()
    frames = _frame_points()
    poses = [np.eye(4, dtype=np.float32)] * 6
    rec = daemon.prepare_object_data(tr, frames, poses)[0]
    g = rf.GRMSample(query_num=3, query_points=32, memory_points=128,
                     rng=np.random.RandomState(0))(rec)
    assert g["query_pts"].shape == (3, 32, 11)
    assert g["memory_pts"].shape == (128, 11)
    assert g["memory_mask"].all()
    p = rf.PRMSample(query_num=16, query_points=32, memory_points=8,
                     training=False, rng=np.random.RandomState(0))(rec)
    assert p["query_pts"].shape == (16, 32, 32)
    assert p["pad_mask"].sum() == 6
    c, h = rf.revert_prm_to_world(p["local_boxes"][:6, :3],
                                  p["local_boxes"][:6, 6], p["init_box"])
    np.testing.assert_allclose(c, rec["boxes_global"][:, :3], atol=1e-4)


def test_evaluator_perfect_predictions():
    gts, preds = [], []
    rng = np.random.RandomState(0)
    for f in range(5):
        boxes = np.concatenate([
            rng.uniform(-40, 40, (4, 2)), np.zeros((4, 1)),
            np.tile([[4.5, 2.0, 1.6]], (4, 1)),
            rng.uniform(-np.pi, np.pi, (4, 1))], axis=1)
        gts.append({"gt_boxes": boxes, "name": np.array(["Vehicle"] * 4),
                    "num_points": np.full(4, 50)})
        preds.append({"boxes_lidar": boxes.copy(),
                      "score": np.linspace(0.9, 0.6, 4),
                      "name": np.array(["Vehicle"] * 4)})
    res = evaluator.evaluate_detection(preds, gts, class_names=("Vehicle",))
    assert res["Vehicle"]["AP_L2"] == pytest.approx(1.0, abs=1e-6)
    assert res["Vehicle"]["APH_L2"] == pytest.approx(1.0, abs=1e-6)


def test_evaluator_heading_error_lowers_aph_not_ap():
    gts, preds = [], []
    for f in range(5):
        boxes = np.array([[f * 5.0, 0, 0, 4.5, 2.0, 1.6, 0.0]])
        flipped = boxes.copy()
        flipped[:, 6] = np.pi  # heading off by pi -> heading accuracy 0
        gts.append({"gt_boxes": boxes, "name": np.array(["Vehicle"]),
                    "num_points": np.full(1, 50)})
        preds.append({"boxes_lidar": flipped, "score": np.array([0.9]),
                      "name": np.array(["Vehicle"])})
    res = evaluator.evaluate_detection(preds, gts, class_names=("Vehicle",))
    assert res["Vehicle"]["AP_L2"] == pytest.approx(1.0, abs=1e-6)
    assert res["Vehicle"]["APH_L2"] == pytest.approx(0.0, abs=1e-6)


def test_evaluator_l1_excludes_hard_gt():
    gts, preds = [], []
    boxes = np.array([[5.0, 0, 0, 4.5, 2.0, 1.6, 0.0],
                      [20.0, 0, 0, 4.5, 2.0, 1.6, 0.0]])
    gts.append({"gt_boxes": boxes, "name": np.array(["Vehicle"] * 2),
                "num_points": np.array([50, 2])})  # 2nd is hard (<=5 pts)
    preds.append({"boxes_lidar": boxes[:1], "score": np.array([0.9]),
                  "name": np.array(["Vehicle"])})
    res = evaluator.evaluate_detection(preds, gts, class_names=("Vehicle",))
    assert res["Vehicle"]["AP_L1"] == pytest.approx(1.0, abs=1e-6)  # easy GT found
    assert res["Vehicle"]["AP_L2"] < 1.0  # hard GT missed at L2


def test_tracking_metrics():
    gt = [{"boxes": np.array([[f * 1.0, 0, 0, 4, 2, 1.5, 0]]),
           "obj_ids": np.array([1])} for f in range(10)]
    perfect = [{"boxes": g["boxes"].copy(), "obj_ids": np.array([5])} for g in gt]
    res = evaluator.evaluate_tracking(perfect, gt)
    assert res["MOTA"] == pytest.approx(1.0)
    assert res["MOTP"] == pytest.approx(1.0, abs=1e-5)
    # id switch at frame 5
    switched = [{"boxes": g["boxes"].copy(),
                 "obj_ids": np.array([5 if f < 5 else 6])}
                for f, g in enumerate(gt)]
    res2 = evaluator.evaluate_tracking(switched, gt)
    assert res2["mismatch"] == pytest.approx(0.1)
    assert res2["MOTA"] == pytest.approx(0.9)


def test_evaluator_waymo101_perfect_predictions():
    gts, preds = [], []
    rng = np.random.RandomState(0)
    for f in range(5):
        boxes = np.concatenate([
            rng.uniform(-40, 40, (4, 2)), np.zeros((4, 1)),
            np.tile([[4.5, 2.0, 1.6]], (4, 1)),
            rng.uniform(-np.pi, np.pi, (4, 1))], axis=1)
        gts.append({"gt_boxes": boxes, "name": np.array(["Vehicle"] * 4),
                    "num_points": np.full(4, 50)})
        # 20 globally-distinct scores -> every 101-cutoff operating point
        # gains exactly 1/20 = 0.05 recall, right at the op's cap
        preds.append({"boxes_lidar": boxes.copy(),
                      "score": 0.895 - (f * 4 + np.arange(4)) * 0.04,
                      "name": np.array(["Vehicle"] * 4)})
    res = evaluator.evaluate_detection(preds, gts, class_names=("Vehicle",),
                                       ap_mode="waymo101")
    assert res["Vehicle"]["AP_L2"] == pytest.approx(1.0, abs=1e-6)
    assert res["Vehicle"]["APH_L2"] == pytest.approx(1.0, abs=1e-6)


def test_evaluator_waymo101_hand_computed_staircase():
    # one frame: 10 GT; 5 perfect preds @0.8, 5 far FPs @0.4.
    # cutoffs <=0.4: P=0.5 R=0.5; 0.41..0.8: P=1 R=0.5; >0.8: no preds.
    # area = 0.5 recall span at precision 1 (envelope tail closure) = 0.5
    rng = np.random.RandomState(1)
    gb = np.concatenate([
        rng.uniform(-40, 40, (10, 2)), np.zeros((10, 1)),
        np.tile([[4.5, 2.0, 1.6]], (10, 1)), np.zeros((10, 1))], axis=1)
    fps = gb[:5].copy()
    fps[:, :2] += 200.0
    pb = np.concatenate([gb[:5], fps])
    gts = [{"gt_boxes": gb, "name": np.array(["Vehicle"] * 10),
            "num_points": np.full(10, 50)}]
    preds = [{"boxes_lidar": pb,
              "score": np.array([0.8] * 5 + [0.4] * 5),
              "name": np.array(["Vehicle"] * 10)}]
    res = evaluator.evaluate_detection(preds, gts, class_names=("Vehicle",),
                                       ap_mode="waymo101")
    # exact op semantics: ALL the recall (0.5) arrives at the single 0.8
    # operating point -> capped at 0.05 (degenerate score distributions
    # are crushed by the real metric — see tests/test_evaluator_golden.py)
    assert res["Vehicle"]["AP_L2"] == pytest.approx(0.05, abs=1e-9)
    # envelope mode integrates the full area
    res_e = evaluator.evaluate_detection(preds, gts, class_names=("Vehicle",))
    assert res_e["Vehicle"]["AP_L2"] == pytest.approx(0.5, abs=1e-6)


def test_evaluator_waymo101_close_to_envelope_on_noisy_data():
    rng = np.random.RandomState(3)
    gts, preds = [], []
    for f in range(8):
        gb = np.concatenate([
            rng.uniform(-40, 40, (6, 2)), np.zeros((6, 1)),
            np.tile([[4.5, 2.0, 1.6]], (6, 1)),
            rng.uniform(-np.pi, np.pi, (6, 1))], axis=1)
        hit = gb[:4].copy()
        hit[:, :2] += rng.uniform(-0.3, 0.3, (4, 2))
        miss = gb[:3].copy()
        miss[:, :2] += 150.0
        pb = np.concatenate([hit, miss])
        gts.append({"gt_boxes": gb, "name": np.array(["Vehicle"] * 6),
                    "num_points": np.full(6, 50)})
        preds.append({"boxes_lidar": pb, "score": rng.uniform(0.05, 0.95, 7),
                      "name": np.array(["Vehicle"] * 7)})
    r101 = evaluator.evaluate_detection(preds, gts, class_names=("Vehicle",),
                                        ap_mode="waymo101")["Vehicle"]
    renv = evaluator.evaluate_detection(preds, gts,
                                        class_names=("Vehicle",))["Vehicle"]
    for k in ("AP_L2", "APH_L2", "AP_L1"):
        assert abs(r101[k] - renv[k]) < 0.08, (k, r101[k], renv[k])


def test_evaluator_waymo101_l1_excludes_hard_gt_and_range_breakdown():
    boxes = np.array([[5.0, 0, 0, 4.5, 2.0, 1.6, 0.0],
                      [40.0, 0, 0, 4.5, 2.0, 1.6, 0.0]])
    gts = [{"gt_boxes": boxes, "name": np.array(["Vehicle"] * 2),
            "num_points": np.array([50, 2])}]  # 2nd is hard
    preds = [{"boxes_lidar": boxes[:1], "score": np.array([0.9]),
              "name": np.array(["Vehicle"])}]
    res = evaluator.evaluate_detection(preds, gts, class_names=("Vehicle",),
                                       ap_mode="waymo101",
                                       with_range_breakdown=True)
    v = res["Vehicle"]
    # one operating point carrying all the recall -> capped at 0.05 each
    assert v["AP_L1"] == pytest.approx(0.05, abs=1e-9)
    assert v["AP_L2"] < v["AP_L1"] + 1e-9
    assert v["AP_[0,30)"] == pytest.approx(0.05, abs=1e-9)  # near GT found
    assert v["AP_[30,50)"] == 0.0  # far (hard) GT missed
    # envelope mode expresses the same semantics without the cutoff cap
    res_e = evaluator.evaluate_detection(preds, gts, class_names=("Vehicle",),
                                         with_range_breakdown=True)
    v_e = res_e["Vehicle"]
    assert v_e["AP_L1"] == pytest.approx(1.0, abs=1e-6)
    assert v_e["AP_L2"] < 1.0
    assert v_e["AP_[0,30)"] == pytest.approx(1.0, abs=1e-6)
    assert v_e["AP_[30,50)"] == 0.0


def test_tracking_metrics_by_class():
    rng = np.random.RandomState(9)
    gt_frames, pred_frames = [], []
    vbox = np.array([5.0, 0, 0, 4.5, 2.0, 1.6, 0.0])
    pbox = np.array([-8.0, 3, 0, 0.9, 0.9, 1.8, 0.5])
    for f in range(10):
        v = vbox.copy(); v[0] += f * 0.8
        p = pbox.copy(); p[1] += f * 0.3
        gt_frames.append({"boxes": np.stack([v, p]),
                          "obj_ids": np.array([1, 2]),
                          "name": np.array(["Vehicle", "Pedestrian"])})
        # vehicle tracked perfectly; pedestrian id switches mid-track
        pid = 20 if f < 5 else 21
        pred_frames.append({"boxes": np.stack([v, p]),
                            "obj_ids": np.array([10, pid]),
                            "name": np.array(["Vehicle", "Pedestrian"])})
    res = evaluator.evaluate_tracking_by_class(
        [(pred_frames, gt_frames)],
        class_names=("Vehicle", "Pedestrian"))
    assert res["Vehicle"]["MOTA"] == pytest.approx(1.0)
    assert res["Vehicle"]["mismatch"] == 0.0
    assert res["Pedestrian"]["mismatch"] == pytest.approx(0.1)  # 1 of 10
    assert res["Pedestrian"]["MOTA"] == pytest.approx(0.9)
    assert res["mean"]["MOTA"] == pytest.approx(0.95)


def test_submission_writes_real_proto_bin(tmp_path):
    from detzero_tpu.pipeline import submit
    from detzero_tpu.protos import waymo_metrics_pb2 as m

    preds = [{"boxes_lidar": np.array([[1., 2., 0.5, 4.5, 2.0, 1.6, 0.3]]),
              "score": np.array([0.88]), "name": np.array(["Vehicle"]),
              "obj_ids": np.array(["trk7"])}]
    meta = [{"context_name": "ctx-1", "frame_timestamp_micros": 1234567}]
    recs = submit.build_submission_records(preds, meta, tracking=True)
    out = submit.write_submission(recs, tmp_path / "sub.bin", tracking=True)
    assert out.suffix == ".bin"
    objs = m.Objects()
    objs.ParseFromString(out.read_bytes())
    o = objs.objects[0]
    assert o.context_name == "ctx-1"
    assert o.frame_timestamp_micros == 1234567
    assert o.object.type == 1  # TYPE_VEHICLE
    assert o.object.id == "trk7"
    assert abs(o.object.box.length - 4.5) < 1e-6
    assert abs(o.object.box.heading - 0.3) < 1e-6
    assert abs(o.score - 0.88) < 1e-6
