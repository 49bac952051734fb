"""Offline tracker: synthetic-sequence behavioral tests (golden-trace style,
SURVEY §7 hard-part 5)."""

import numpy as np
import pytest

from detzero_tpu.models.tracking.association import (
    affinity_matrix, associate_two_stage,
)
from detzero_tpu.models.tracking.kalman import AB3DMOTFilter, CenterKalmanFilter
from detzero_tpu.models.tracking.tracker import DetZeroTracker, overlap_box_filter


def make_sequence(n_frames=20, noise=0.02, drop_frames=(), seed=0):
    """Two objects: one moving +x at 1 m/frame, one static. Returns frames."""
    rng = np.random.RandomState(seed)
    frames = []
    for f in range(n_frames):
        boxes, scores, labels = [], [], []
        if f not in drop_frames:
            boxes.append([f * 1.0 + rng.randn() * noise, 0.0, 0.0,
                          4.0, 2.0, 1.5, 0.0])
            scores.append(0.9)
            labels.append(0)
        boxes.append([10.0 + rng.randn() * noise, 10.0 + rng.randn() * noise,
                      0.0, 4.0, 2.0, 1.5, 0.5])
        scores.append(0.8)
        labels.append(0)
        frames.append({
            "boxes": np.array(boxes, np.float32),
            "scores": np.array(scores, np.float32),
            "labels": np.array(labels),
            "pose": np.eye(4, dtype=np.float32),
        })
    return frames


def test_kalman_tracks_constant_velocity():
    kf = CenterKalmanFilter([0, 0, 0, 4, 2, 1.5, 0], 0.9, 0, 0,
                            cfg={"MIN_VELOCITY": 0.01})
    for f in range(1, 10):
        kf.predict()
        kf.update([f * 1.0, 0, 0, 4, 2, 1.5, 0], 0.9)
    pred = kf.predict()
    assert abs(pred[0] - 10.0) < 0.5, pred  # learned ~1 m/frame velocity
    assert abs(kf.velocity[0] - 10.0) < 3.0  # ~1 m / 0.1 s


def test_ab3dmot_heading_flip():
    kf = AB3DMOTFilter([0, 0, 0, 4, 2, 1.5, 0.1], 0.9, 0, 0)
    kf.predict()
    kf.update([0.1, 0, 0, 4, 2, 1.5, 0.1 + np.pi], 0.9)  # flipped measurement
    box = kf.current_box()
    assert abs(np.sin(box[6] - 0.1)) < 0.2  # heading stays near 0.1 mod pi


def test_two_stage_drops_weak_unmatched():
    det = np.array([[0, 0, 0, 4, 2, 1.5, 0], [50, 50, 0, 4, 2, 1.5, 0]], float)
    labels = np.array([0, 0])
    scores = np.array([0.9, 0.1])  # second is weak and matches no track
    npts = np.array([100, 100])
    trk = np.array([[0.2, 0, 0, 4, 2, 1.5, 0]], float)
    matches, stages, new, unmatched_t, dropped = associate_two_stage(
        det, labels, scores, npts, trk, np.array([0]),
        tight_thresh=[0.2], loose_thresh=[0.3],
    )
    assert matches == [(0, 0)]
    assert stages == [0]
    assert new == [] and dropped == [1]


def test_tracker_end_to_end_two_objects():
    frames = make_sequence()
    out = DetZeroTracker({"TRACKING": {"SCORE_THRESH": 0.5}})(frames)
    tracks = out["tracks"]
    assert len(tracks) == 2, f"expected 2 tracks, got {len(tracks)}"
    lengths = sorted(len(t["sample_idx"]) for t in tracks.values())
    assert lengths == [20, 20]
    states = sorted(t["state"] for t in tracks.values())
    assert states == ["dynamic", "static"]
    # moving track covers ~19m
    moving = [t for t in tracks.values() if t["state"] == "dynamic"][0]
    span = moving["boxes_global"][-1, 0] - moving["boxes_global"][0, 0]
    assert span > 17.0


def test_tracker_survives_missed_detections():
    frames = make_sequence(drop_frames=(8, 9))
    out = DetZeroTracker({"TRACKING": {"SCORE_THRESH": 0.5}})(frames)
    tracks = out["tracks"]
    moving = [t for t in tracks.values() if t["state"] == "dynamic"]
    assert len(moving) == 1, "gap must not split the moving track"
    t = moving[0]
    assert len(t["sample_idx"]) == 20
    assert not t["hit"][8] and not t["hit"][9]  # predicted-only entries
    # predicted boxes keep moving (KF velocity)
    assert t["boxes_global"][9, 0] > t["boxes_global"][7, 0] + 0.5


def test_reverse_pass_extends_track_head():
    # moving object ABSENT at frame 0 (reference zero-track early return
    # spawns even weak frame-0 dets, data_association.py:74-76, so a weak
    # frame-0 det would birth the track) and weak in frames 1-2 — the
    # forward pass can't start the track there; reverse pass must back-fill.
    frames = make_sequence(drop_frames=(0,))
    for f in (1, 2):
        frames[f]["scores"][0] = 0.2  # below SCORE_THRESH, kept in det list
    out = DetZeroTracker({"TRACKING": {"SCORE_THRESH": 0.5, "REVERSE": True}})(frames)
    moving = [t for t in out["tracks"].values() if t["state"] == "dynamic"]
    assert len(moving) == 1
    assert moving[0]["sample_idx"][0] <= 1, (
        f"reverse pass should extend head to ~frame 0, got {moving[0]['sample_idx'][0]}"
    )
    out_norev = DetZeroTracker(
        {"TRACKING": {"SCORE_THRESH": 0.5, "REVERSE": False}}
    )(frames)
    moving_nr = [t for t in out_norev["tracks"].values() if t["state"] == "dynamic"]
    assert moving_nr[0]["sample_idx"][0] >= 3  # without reverse it starts late


def test_overlap_filter_keeps_best_and_reports_drops():
    boxes = np.array([
        [0, 0, 0, 4, 2, 1.5, 0.0],
        [0.1, 0, 0, 4, 2, 1.5, 0.0],  # duplicate, lower score
        [20, 0, 0, 4, 2, 1.5, 0.0],
    ])
    keep, drop = overlap_box_filter(boxes, [0.9, 0.5, 0.7], [0, 0, 0])
    assert keep.tolist() == [True, False, True]
    assert drop.tolist() == [False, True, False]


def test_static_drift_eliminate():
    # static object with missing middle detections: predicted entries must be
    # pinned to the best observed box, not the KF drift
    frames = make_sequence(drop_frames=())
    for f in range(6, 12):  # static object (index depends on frame)
        fr = frames[f]
        m = fr["boxes"][:, 0] > 5  # the static box at (10, 10)
        fr["boxes"] = fr["boxes"][~m]
        fr["scores"] = fr["scores"][~m]
        fr["labels"] = fr["labels"][~m]
    out = DetZeroTracker({"TRACKING": {"SCORE_THRESH": 0.5}})(frames)
    static = [t for t in out["tracks"].values() if t["state"] == "static"]
    assert len(static) == 1
    t = static[0]
    miss = t["hit"] == 0
    if miss.any():
        # parity semantics: the static Vehicle's velocity is clamped to
        # zero (||v|| <= max(size)/2), so every gap box equals the last
        # observed box exactly; trailing gaps would be pinned to the
        # max-score observed box (reference static_drift_eliminate)
        obs = t["boxes_global"][t["hit"] > 0]
        for b in t["boxes_global"][miss]:
            assert any(np.allclose(b, o) for o in obs)


def test_drop_data_is_global_frame():
    """r2 regression: drop entries must be pose-transformed to the GLOBAL
    frame (combine_output re-merges them with global-frame track boxes)."""
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [100.0, -50.0, 2.0]
    boxes = np.array([[0, 0, 0, 4, 2, 1.5, 0.0],
                      [0.05, 0, 0, 4, 2, 1.5, 0.0]], np.float32)  # dup pair
    frames = [{"boxes": boxes, "scores": np.array([0.9, 0.5]),
               "labels": np.array([0, 0]), "pose": pose}]
    tracker = DetZeroTracker({})
    seq, drops = tracker.preprocess(frames)
    assert len(drops[0]["boxes"]) == 1  # the duplicate was dropped
    # dropped box carries the ego translation -> global frame
    np.testing.assert_allclose(drops[0]["boxes"][0][:3],
                               [100.05, -50.0, 2.0], atol=1e-5)
    assert drops[0]["labels"].tolist() == [0]
