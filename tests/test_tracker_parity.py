"""Reference-parity golden-trace tests for the tracker (VERDICT r1 #4).

`_OracleKF` + `_oracle_forward` are a MINIMAL, independently-written
re-statement of the reference's forward-tracking semantics
(kalman_filter.py:75-146, data_association.py:62-124,
track_manager.py:162-198): cumulative 1.5x Q inflation per predict,
norm-based size-relative Vehicle velocity clamp, stage-2 pool = weak
detections only, stage-2 matches skip the KF update and record the
predicted box. The production TrackManager (PARITY default) must agree
frame-by-frame on boxes, hit codes and scores.
"""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from detzero_tpu.models.tracking.kalman import CenterKalmanFilter
from detzero_tpu.models.tracking.track_manager import TrackManager
from detzero_tpu.ops import box_np


class _OracleKF:
    def __init__(self, box, name, score, q=(5.0, 15.0), p=(50.0, 1000.0),
                 r=0.1, dt=0.1):
        box = np.asarray(box, float)
        self.x = np.zeros(5)
        self.x[:3] = box[:3]
        self.size = box[3:6].copy()
        self.heading = float(box[6])
        self.name = name
        self.score = float(score)
        self.F = np.eye(5)
        self.F[0, 3] = self.F[1, 4] = dt
        self.P = np.eye(5)
        self.P[:3, :3] *= p[0]
        self.P[3:, 3:] *= p[1]
        self.Q = np.eye(5)
        self.Q[:3, :3] *= q[0]
        self.Q[3:, 3:] *= q[1]
        self.R = np.eye(3) * r
        self.H = np.zeros((3, 5))
        self.H[:3, :3] = np.eye(3)

    def box7(self):
        return np.concatenate([self.x[:3], self.size, [self.heading]])

    def predict(self):
        x = self.x.copy()
        if self.name == "Vehicle" and \
                np.linalg.norm(x[3:5]) <= self.size.max() / 2.0:
            x[3:5] = 0.0
        self.x = self.F @ x
        self.P = self.F @ self.P @ self.F.T + self.Q
        self.Q = self.Q * 1.5  # cumulative, never reset
        return self.box7()

    def update(self, box, score, two_stage=False):
        self.score = float(score)
        if two_stage:
            return  # state/size/heading untouched
        box = np.asarray(box, float)
        z = box[:3]
        self.size = box[3:6].copy()
        self.heading = float(box[6])
        S = self.H @ self.P @ self.H.T + self.R
        K = self.P @ self.H.T @ np.linalg.inv(S)
        self.x = self.x + K @ (z - self.H @ self.x)
        self.P = self.P - K @ self.H @ self.P
        self.x[:3] = z.copy()


def _hungarian(dets, trks, thresh):
    if not len(dets) or not len(trks):
        return [], list(range(len(dets))), list(range(len(trks)))
    aff = box_np.boxes_iou_bev_vec(box_np.boxes3d_to_bev(np.asarray(dets)),
                                   box_np.boxes3d_to_bev(np.asarray(trks)))
    aff = np.where(aff < thresh, 0.0, aff)
    cost = np.where(aff <= 0, 1e5, 1.0 - aff)
    r, c = linear_sum_assignment(cost)
    m = [(int(i), int(j)) for i, j in zip(r, c) if cost[i, j] < 1e5]
    md = {i for i, _ in m}
    mt = {j for _, j in m}
    return m, [i for i in range(len(dets)) if i not in md], \
        [j for j in range(len(trks)) if j not in mt]


def _oracle_forward(seq, score_thresh=0.5, tight=0.2, loose=0.3):
    """Single-class forward pass, reference semantics. Returns per-track
    dict(frames, boxes, scores, hits)."""
    tracks = []  # list of dicts with 'kf' and history

    for f, fr in enumerate(seq):
        boxes = np.asarray(fr["boxes"], float).reshape(-1, 7)
        scores = np.asarray(fr["scores"], float)
        preds = np.array([t["kf"].predict() for t in tracks]).reshape(-1, 7)

        if len(tracks) == 0:
            # reference zero-track early return (data_association.py:74-76):
            # every det passing the point threshold spawns, score ignored
            for d in range(len(boxes)):
                kf = _OracleKF(boxes[d], "Vehicle", scores[d])
                tracks.append({"kf": kf, "frames": [f],
                               "boxes": [boxes[d].copy()],
                               "scores": [float(scores[d])], "hits": [1]})
            continue

        strong = scores >= score_thresh
        si = np.where(strong)[0]
        wi = np.where(~strong)[0]
        m1, un_d1, un_t = _hungarian(boxes[si], preds, tight)
        matches = [(int(si[d]), t, False) for d, t in m1]
        # stage 2: ONLY weak dets vs unmatched tracks, loose threshold
        if len(wi) and len(un_t):
            m2, _, un_t2 = _hungarian(boxes[wi], preds[un_t], loose)
            matches += [(int(wi[d]), int(un_t[t]), True) for d, t in m2]
            un_t = [un_t[t] for t in un_t2]
        matched_t = {t for _, t, _ in matches}

        for d, t, two_stage in matches:
            trk = tracks[t]
            trk["kf"].update(boxes[d], scores[d], two_stage=two_stage)
            trk["frames"].append(f)
            trk["boxes"].append(trk["kf"].box7() if two_stage
                                else boxes[d].copy())
            trk["scores"].append(float(scores[d]))
            trk["hits"].append(2 if two_stage else 1)
        for t, trk in enumerate(tracks):
            if t not in matched_t:
                trk["frames"].append(f)
                trk["boxes"].append(trk["kf"].box7())
                trk["scores"].append(trk["scores"][-1])
                trk["hits"].append(0)
        # unmatched STRONG dets spawn (weak leftovers dropped)
        for d in si:
            if not any(md == d for md, _, _ in matches):
                kf = _OracleKF(boxes[d], "Vehicle", scores[d])
                tracks.append({"kf": kf, "frames": [f],
                               "boxes": [boxes[d].copy()],
                               "scores": [float(scores[d])], "hits": [1]})
    return tracks


def _scene_slow_vehicle_with_gap(seed=0):
    """A slow vehicle (clamp active), a 3-frame detection gap (cumulative Q
    + predicted-only extension), then strong detections resume."""
    rng = np.random.RandomState(seed)
    frames = []
    for f in range(15):
        if 5 <= f < 8:
            boxes = np.zeros((0, 7))
            scores = np.zeros(0)
        else:
            boxes = np.array([[f * 0.15 + rng.randn() * 0.01, 0, 0,
                               4.0, 2.0, 1.5, 0.0]])
            scores = np.array([0.9])
        frames.append({"boxes": boxes, "scores": scores,
                       "labels": np.zeros(len(boxes), int)})
    return frames


def _scene_weak_stage2(seed=1):
    """A fast vehicle whose detections alternate strong / weak — weak ones
    must match via stage 2 and record the PREDICTED box."""
    rng = np.random.RandomState(seed)
    frames = []
    for f in range(12):
        boxes = np.array([[f * 2.0 + rng.randn() * 0.02, 0, 0,
                           4.0, 2.0, 1.5, 0.0]])
        scores = np.array([0.9 if f % 2 == 0 else 0.2])
        frames.append({"boxes": boxes, "scores": scores,
                       "labels": np.zeros(1, int)})
    return frames


def _scene_two_vehicles(seed=2):
    rng = np.random.RandomState(seed)
    frames = []
    for f in range(10):
        boxes = np.array([
            [f * 1.5 + rng.randn() * 0.02, 0, 0, 4.0, 2.0, 1.5, 0.0],
            [30.0 + rng.randn() * 0.02, 20, 0, 4.0, 2.0, 1.5, 0.3],
        ])
        scores = np.array([0.9, 0.8])
        frames.append({"boxes": boxes, "scores": scores,
                       "labels": np.zeros(2, int)})
    return frames


def _scene_weak_frame0(seed=3):
    """First detection of the object is WEAK (score 0.2): the reference's
    zero-track early return spawns it anyway (point threshold only), so the
    track must be born at frame 0, not frame 1 (ADVICE r2 medium)."""
    rng = np.random.RandomState(seed)
    frames = []
    for f in range(8):
        boxes = np.array([[f * 0.5 + rng.randn() * 0.02, 0, 0,
                           4.0, 2.0, 1.5, 0.0]])
        scores = np.array([0.2 if f == 0 else 0.9])
        frames.append({"boxes": boxes, "scores": scores,
                       "labels": np.zeros(1, int)})
    return frames


@pytest.mark.parametrize("scene_fn", [_scene_slow_vehicle_with_gap,
                                      _scene_weak_stage2,
                                      _scene_two_vehicles,
                                      _scene_weak_frame0])
def test_forward_matches_reference_oracle(scene_fn):
    seq = scene_fn()
    mgr = TrackManager({"SCORE_THRESH": 0.5, "MIN_POINTS": 0,
                        "MAX_AGE": -1, "REVERSE": False,
                        "TIGHT_THRESH": [0.2], "LOOSE_THRESH": [0.3]})
    got, _ = mgr.forward(seq)
    want = _oracle_forward(seq)
    assert len(got) == len(want), (len(got), len(want))
    got = sorted(got, key=lambda t: (t.birth_frame, t.boxes[0][0]))
    want = sorted(want, key=lambda t: (t["frames"][0], t["boxes"][0][0]))
    for g, w in zip(got, want):
        assert g.frames == w["frames"]
        assert g.hits == w["hits"], (g.hits, w["hits"])
        np.testing.assert_allclose(g.scores, w["scores"], atol=1e-9)
        np.testing.assert_allclose(np.stack(g.boxes), np.stack(w["boxes"]),
                                   atol=1e-9)


def test_kf_parity_unit_semantics():
    """Direct pins of the four reference behaviors on the production KF."""
    # (a) cumulative Q: two predicts -> Q scaled 1.5^2, never reset by update
    kf = CenterKalmanFilter([0, 0, 0, 4, 2, 1.5, 0], 0.9, "Pedestrian", 0)
    q0 = kf.Q.copy()
    kf.predict()
    kf.update([0.1, 0, 0, 4, 2, 1.5, 0], 0.9)
    kf.predict()
    np.testing.assert_allclose(kf.Q, q0 * 1.5 ** 2)
    # (b) Vehicle norm clamp at max(size)/2: v=(1.5, 1.0) has norm 1.8 <=
    # 2.0 -> zeroed; a Pedestrian with the same state is NOT clamped
    for name, clamped in (("Vehicle", True), ("Pedestrian", False)):
        kf = CenterKalmanFilter([0, 0, 0, 4, 2, 1.5, 0], 0.9, name, 0)
        kf.x[3:5] = [1.5, 1.0]
        kf.predict()
        if clamped:
            np.testing.assert_allclose(kf.x[3:5], 0.0)
            np.testing.assert_allclose(kf.x[:2], 0.0)
        else:
            assert np.linalg.norm(kf.x[3:5]) > 0
    # (c) two_stage update: state, box, size untouched; score refreshed
    kf = CenterKalmanFilter([0, 0, 0, 4, 2, 1.5, 0], 0.9, "Vehicle", 0)
    kf.predict()
    x_before, box_before = kf.x.copy(), kf.box.copy()
    kf.update([5, 5, 5, 9, 9, 9, 1.0], 0.4, two_stage=True)
    np.testing.assert_allclose(kf.x, x_before)
    np.testing.assert_allclose(kf.box, box_before)
    assert kf.score == pytest.approx(0.4)
    assert kf.time_since_update == 0
    # (d) update_score floor
    kf.update([0, 0, 0, 4, 2, 1.5, 0], 0.001)
    assert kf.update_score == pytest.approx(0.03)
