"""Coverage for less-tested paths: WBF tracking variant, evaluator range
breakdown, refine dataset classes over daemon-format records."""

import numpy as np
import pytest

from detzero_tpu.core.config import Config
from detzero_tpu.data.refine_dataset import (
    WaymoConfidenceDataset, WaymoGeometryDataset, WaymoPositionDataset,
    augment_full_track,
)
from detzero_tpu.ops import wbf
from detzero_tpu.pipeline import evaluator


def test_wbf_tracking_propagates_ids():
    boxes = np.array([
        [0, 0, 0, 4, 2, 1.5, 0.0],
        [0.05, 0, 0, 4, 2, 1.5, 0.0],
        [20, 20, 0, 4, 2, 1.5, 0.5],
    ])
    scores = np.array([0.9, 0.7, 0.6])
    ids = np.array([11, 22, 33])
    fb, fs, fids = wbf.weighted_tracking_boxes_fusion_3d(boxes, scores, ids, 0.7)
    assert len(fb) == 2
    assert fids.tolist() == [11, 33]  # best-member ids survive


def test_evaluator_range_breakdown():
    gts, preds = [], []
    boxes = np.array([[10.0, 0, 0, 4.5, 2, 1.6, 0.0],
                      [40.0, 0, 0, 4.5, 2, 1.6, 0.0],
                      [60.0, 0, 0, 4.5, 2, 1.6, 0.0]])
    gts.append({"gt_boxes": boxes, "name": np.array(["Vehicle"] * 3),
                "num_points": np.full(3, 50)})
    preds.append({"boxes_lidar": boxes[:2],  # miss the far one
                  "score": np.array([0.9, 0.8]),
                  "name": np.array(["Vehicle"] * 2)})
    res = evaluator.evaluate_detection(preds, gts, class_names=("Vehicle",),
                                       with_range_breakdown=True)
    v = res["Vehicle"]
    assert v["AP_[0,30)"] == pytest.approx(1.0, abs=1e-6)
    assert v["AP_[30,50)"] == pytest.approx(1.0, abs=1e-6)
    assert v["AP_[50,inf)"] == pytest.approx(0.0, abs=1e-6)


def _records(n_tracks=3, t=8, seed=0):
    rng = np.random.RandomState(seed)
    recs = []
    for k in range(n_tracks):
        boxes = np.array([[k * 10 + f * 0.5, 0, 0, 4.4, 2.0, 1.5, 0.1]
                          for f in range(t)], np.float32)
        pts = [np.concatenate([
            rng.uniform(-0.5, 0.5, (60, 3)) * [4, 1.8, 1.3] + boxes[f, :3],
            rng.rand(60, 1)], 1).astype(np.float32) for f in range(t)]
        recs.append({
            "boxes_global": boxes, "score": np.full(t, 0.8, np.float32),
            "sample_idx": np.arange(t), "hit": np.ones(t, bool),
            "state": "dynamic", "label": 0, "pts": pts,
            "gt_boxes": boxes + 0.05, "matched": np.ones(t, bool),
            "iou_gt": np.full(t, 0.8, np.float32), "_key": ("seq0", k),
        })
    return recs


def test_refine_dataset_classes():
    cfg = Config({"QUERY_NUM": 8, "QUERY_POINTS": 16, "MEMORY_POINTS": 32,
                  "AUGMENT": True})
    g = WaymoGeometryDataset(cfg, "Vehicle", training=True, records=_records())
    s = g[0]
    assert s["query_pts"].shape == (8, 16, 11)  # QUERY_NUM x pts x feats
    assert s["memory_pts"].shape == (32, 11)
    assert s["has_gt"]

    p = WaymoPositionDataset(cfg, "Vehicle", training=False, records=_records())
    sp = p[0]
    assert sp["query_pts"].shape == (8, 16, 32)
    assert sp["pad_mask"].sum() == 8
    assert sp["gt_mask"].sum() == 8

    c = WaymoConfidenceDataset(cfg, "Vehicle", training=False,
                               records=_records())
    sc = c[0]
    assert sc["gt_ious"][:8].min() > 0.7
    assert (sc["gt_ious"][8:] == -1).all() if len(sc["gt_ious"]) > 8 else True


def test_augment_full_track_consistency():
    rec = _records(1)[0]
    rng = np.random.RandomState(1)
    out = augment_full_track(rec, rng)
    # points stay inside their (transformed) boxes: crop test per frame
    from detzero_tpu.ops import box_np
    for f in range(len(out["boxes_global"])):
        b = out["boxes_global"][f].copy()
        b[3:6] *= 1.2
        inside = box_np.points_in_rotated_box(out["pts"][f], b)
        assert inside.mean() > 0.9, f"frame {f}: augment broke box/point sync"
