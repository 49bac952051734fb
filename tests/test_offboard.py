"""Full offboard pipeline (stages 2-6) on a synthetic sequence, with and
without refinement models — the configs[4] integration test."""

import numpy as np
import jax
import pytest

from detzero_tpu.models.refining import (
    ConfidencePointNet, GeometryTransformer, PositionTransformer,
)
from detzero_tpu.pipeline.evaluator import evaluate_detection
from detzero_tpu.pipeline.offboard import OffboardPipeline


N_FRAMES = 12


@pytest.fixture(scope="module")
def scene():
    rng = np.random.RandomState(0)
    det_frames, frame_points, poses, gt_boxes = [], [], [], []
    for f in range(N_FRAMES):
        pose = np.eye(4, dtype=np.float32)
        gt = np.array([[5 + f * 0.8, 0, 0, 4.4, 2.0, 1.5, 0.1],
                       [20, 10, 0, 0.9, 0.9, 1.7, 0.0]], np.float32)
        noisy = gt.copy()
        noisy[:, :2] += rng.randn(2, 2) * 0.05
        noisy[:, 3:6] *= 1 + rng.randn(2, 3) * 0.03
        det_frames.append({"boxes": noisy, "scores": np.array([0.9, 0.8]),
                           "labels": np.array([0, 1]), "pose": pose})
        pts = []
        for b in gt:
            local = rng.uniform(-0.5, 0.5, (80, 3)) * (b[3:6] * 0.9)
            pts.append(local + b[:3])
        bg = rng.uniform(-30, 30, (300, 3))
        xyz = np.concatenate(pts + [bg]).astype(np.float32)
        frame_points.append(np.concatenate(
            [xyz, rng.rand(len(xyz), 1).astype(np.float32)], axis=1))
        poses.append(pose)
        gt_boxes.append(gt)
    return det_frames, frame_points, poses, gt_boxes


def test_pipeline_track_and_combine_only(scene):
    det_frames, frame_points, poses, gt_boxes = scene
    pipe = OffboardPipeline({"TRACKING": {"SCORE_THRESH": 0.5}})
    out = pipe.run_sequence(det_frames, frame_points, poses, gt_boxes=gt_boxes)
    assert len(out["frames"]) == N_FRAMES
    assert len(out["tracks"]["tracks"]) == 2
    # evaluate final boxes vs GT with the native metric
    preds, gts = [], []
    for f, fr in enumerate(out["frames"]):
        names = np.array(["Vehicle" if i == 0 else "Pedestrian"
                          for i in range(len(fr["boxes"]))])
        order = np.argsort(-fr["boxes"][:, 3])  # veh (larger) first
        preds.append({"boxes_lidar": fr["boxes"][order],
                      "score": fr["scores"][order], "name": names})
        gts.append({"gt_boxes": gt_boxes[f],
                    "name": np.array(["Vehicle", "Pedestrian"]),
                    "num_points": np.full(2, 80)})
    res = evaluate_detection(preds, gts,
                             class_names=("Vehicle", "Pedestrian"))
    assert res["mean"]["AP_L2"] > 0.9, res


def test_pipeline_with_refinement_models(scene):
    det_frames, frame_points, poses, gt_boxes = scene
    rng = np.random.RandomState(1)
    qn, qp, mp = 3, 32, 256
    grm = GeometryTransformer(d_model=32)
    gp = grm.init(jax.random.PRNGKey(0), np.zeros((qn, qp, 11), np.float32),
                  np.zeros((qn, 3), np.float32), np.zeros((mp, 11), np.float32),
                  np.ones(mp, bool))
    tn, tqp, tmp = 32, 32, 8
    prm = PositionTransformer(d_model=32, mem_points=tmp)
    pp = prm.init(jax.random.PRNGKey(1), np.zeros((tn, tqp, 32), np.float32),
                  np.zeros((tn, 4), np.float32), np.zeros((tn, tmp, 32), np.float32),
                  np.ones(tn, bool))
    crm = ConfidencePointNet(d_model=32)
    cp = crm.init(jax.random.PRNGKey(2), np.zeros((tn, tqp, 32), np.float32),
                  np.ones(tn, bool))

    pipe = OffboardPipeline(
        {"TRACKING": {"SCORE_THRESH": 0.5}},
        grm=(grm, gp, {"query_num": qn, "query_points": qp, "memory_points": mp}),
        prm=(prm, pp, {"query_num": tn, "query_points": tqp, "memory_points": tmp}),
        crm=(crm, cp, {"query_num": tn, "query_points": tqp, "memory_points": tmp}),
    )
    out = pipe.run_sequence(det_frames, frame_points, poses, gt_boxes=gt_boxes)
    assert len(out["frames"]) == N_FRAMES
    fr0 = out["frames"][0]
    assert fr0["boxes"].shape[1] == 7
    assert np.isfinite(fr0["boxes"]).all()
    assert ((fr0["scores"] >= 0) & (fr0["scores"] <= 1)).all()
    # refined sizes must come from the GRM anchors (untrained, but finite)
    assert (fr0["boxes"][:, 3:6] > 0).all()


def test_pipeline_artifact_roundtrip(tmp_path, scene):
    det_frames, frame_points, poses, gt_boxes = scene
    pipe = OffboardPipeline({"TRACKING": {"SCORE_THRESH": 0.5}})
    tr = pipe.track(det_frames)
    p = tmp_path / "tracking.pkl"
    pipe.save_artifact(tr, p)
    tr2 = pipe.load_artifact(p)
    assert set(tr2["tracks"]) == set(tr["tracks"])
    np.testing.assert_allclose(
        tr2["tracks"][0]["boxes_global"], tr["tracks"][0]["boxes_global"])
