import numpy as np

from detzero_tpu.models.tracking.target_assign import (
    assign_track_target, track_recall,
)


def _gt_frames(n=10):
    frames = []
    for f in range(n):
        frames.append({
            "boxes": np.array([[f * 1.0, 0, 0, 4, 2, 1.5, 0],
                               [10, 10, 0, 1, 1, 1.7, 0]]),
            "obj_ids": np.array([100, 200]),
        })
    return frames


def _pred_tracks(n=10, offset=0.0):
    boxes_a = np.array([[f * 1.0 + offset, 0, 0, 4, 2, 1.5, 0]
                        for f in range(n)])
    boxes_b = np.array([[10 + offset, 10, 0, 1, 1, 1.7, 0]
                        for f in range(n)])
    return {
        0: {"boxes_global": boxes_a, "sample_idx": np.arange(n)},
        1: {"boxes_global": boxes_b, "sample_idx": np.arange(n)},
    }


def test_assign_matches_tracks_to_gt():
    out = assign_track_target(_pred_tracks(), _gt_frames())
    assert set(out["label"]) == {0, 1}
    assert out["label"][0]["gt_id"] == 100
    assert out["label"][1]["gt_id"] == 200
    assert out["label"][0]["matched"].all()
    np.testing.assert_allclose(out["label"][0]["gt_boxes"][:, 0],
                               np.arange(10))


def test_assign_unmatched_track():
    tracks = _pred_tracks()
    tracks[2] = {"boxes_global": np.array([[50, 50, 0, 4, 2, 1.5, 0]] * 10),
                 "sample_idx": np.arange(10)}
    out = assign_track_target(tracks, _gt_frames())
    assert 2 in out["unlabel"]


def test_track_recall_perfect_and_offset():
    res = track_recall(_pred_tracks(), _gt_frames())
    assert res[0.5]["recall"] == 1.0 and res[0.5]["precision"] == 1.0
    # shift tracks so IoU < 0.7: vehicle trajectory not recalled at 0.7
    res2 = track_recall(_pred_tracks(offset=2.0), _gt_frames(),
                        iou_thresholds=(0.7, 0.5, 0.5))
    assert res2[0.5]["recall"] < 1.0
