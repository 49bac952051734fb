"""A/B validation of the native Waymo detection metric (VERDICT r2 task 6):
pipeline/evaluator.py's waymo101 mode vs the clean-room oracle in
tools/eval_oracle.py — two independently structured implementations of the
metric op's protocol (waymo_eval_detection.py:87-204), compared on
randomized scenes with overlaps, duplicates, score ties and difficulty
mixes.  Disagreement beyond Hungarian tie-breaking noise means one of the
implementations misreads the protocol."""

import numpy as np
import pytest

from detzero_tpu.pipeline.evaluator import evaluate_detection
from tools.eval_oracle import oracle_evaluate

CLASSES = ("Vehicle", "Pedestrian", "Cyclist")
SIZES = {"Vehicle": (4.6, 2.0, 1.7), "Pedestrian": (0.9, 0.8, 1.7),
         "Cyclist": (1.8, 0.8, 1.7)}


def _random_scene(rng, n_frames=12, n_gt=8, noise=0.35, fp_rate=0.4,
                  miss_rate=0.2, tie_scores=False):
    preds, gts = [], []
    for _ in range(n_frames):
        names, boxes, diffs, npts = [], [], [], []
        for _ in range(rng.randint(2, n_gt + 1)):
            cls = CLASSES[rng.randint(3)]
            l, w, h = SIZES[cls]
            c = rng.uniform(-40, 40, 2)
            boxes.append([c[0], c[1], rng.uniform(-0.5, 0.5),
                          l * rng.uniform(0.9, 1.1), w * rng.uniform(0.9, 1.1),
                          h, rng.uniform(-np.pi, np.pi)])
            names.append(cls)
            d = 2 if rng.rand() < 0.3 else 1
            diffs.append(d)
            npts.append(3 if d == 2 else 50)
        gt = {"gt_boxes": np.asarray(boxes, float), "name": np.asarray(names),
              "difficulty": np.asarray(diffs), "num_points": np.asarray(npts)}

        pb, pn, psc = [], [], []
        for b, nme in zip(boxes, names):
            if rng.rand() < miss_rate:
                continue
            bb = np.asarray(b, float).copy()
            bb[:2] += rng.randn(2) * noise
            bb[6] += rng.randn() * 0.3
            pb.append(bb)
            pn.append(nme)
            psc.append(0.5 if tie_scores else float(rng.uniform(0.05, 0.99)))
        for _ in range(rng.poisson(fp_rate * n_gt)):
            cls = CLASSES[rng.randint(3)]
            l, w, h = SIZES[cls]
            pb.append([*rng.uniform(-40, 40, 2), 0.0, l, w, h,
                       rng.uniform(-np.pi, np.pi)])
            pn.append(cls)
            psc.append(0.5 if tie_scores else float(rng.uniform(0.05, 0.99)))
        preds.append({"boxes_lidar": np.asarray(pb, float).reshape(-1, 7),
                      "score": np.asarray(psc), "name": np.asarray(pn)})
        gts.append(gt)
    return preds, gts


def _oracle_inputs(preds, gts):
    op, og = [], []
    for p, g in zip(preds, gts):
        op.append({"boxes": list(p["boxes_lidar"]), "scores": list(p["score"]),
                   "names": list(p["name"])})
        og.append({"boxes": list(g["gt_boxes"]), "names": list(g["name"]),
                   "difficulty": list(g["difficulty"])})
    return op, og


@pytest.mark.parametrize("seed,tie", [(0, False), (1, False), (2, False),
                                      (3, True)])
def test_waymo101_matches_cleanroom_oracle(seed, tie):
    rng = np.random.RandomState(seed)
    preds, gts = _random_scene(rng, tie_scores=tie)
    res = evaluate_detection(preds, gts, ap_mode="waymo101")
    op, og = _oracle_inputs(preds, gts)
    ores = oracle_evaluate(op, og)
    worst = 0.0
    for cls in CLASSES:
        for k in ("AP_L1", "APH_L1", "AP_L2", "APH_L2"):
            d = abs(res[cls][k] - ores[cls][k])
            worst = max(worst, d)
            assert d < 5e-3, (cls, k, res[cls][k], ores[cls][k])
    # record the quantified max |dAP| (VERDICT done-criterion)
    print(f"max |dAP| seed {seed}: {worst:.2e}")


def test_perfect_detector_equal_scores_caps_at_005():
    """Both implementations must show the op's signature behavior: perfect
    boxes with ALL-EQUAL scores -> one operating point -> AP ~ 0.05."""
    rng = np.random.RandomState(7)
    preds, gts = _random_scene(rng, noise=0.0, fp_rate=0.0, miss_rate=0.0,
                               tie_scores=True)
    res = evaluate_detection(preds, gts, ap_mode="waymo101")
    op, og = _oracle_inputs(preds, gts)
    ores = oracle_evaluate(op, og)
    for cls in CLASSES:
        assert res[cls]["AP_L2"] <= 0.0501
        assert abs(res[cls]["AP_L2"] - ores[cls]["AP_L2"]) < 1e-9


def test_range_breakdown_sanity():
    """Range shards: the evaluator's [0,30)/[30,50)/[50,inf) breakdown must
    partition the class AP signal — each shard's AP computed on
    range-filtered preds+gts equals an independent oracle-style
    recomputation restricted the same way."""
    rng = np.random.RandomState(11)
    preds, gts = _random_scene(rng, n_frames=8)
    res = evaluate_detection(preds, gts, ap_mode="waymo101",
                             with_range_breakdown=True)

    def _filt(frames, box_key, extra, lo, hi):
        out = []
        for f in frames:
            b = np.asarray(f[box_key]).reshape(-1, 7)
            r = np.linalg.norm(b[:, :2], axis=1)
            keep = (r >= lo) & (r < hi)
            g = {box_key: b[keep], "name": np.asarray(f["name"])[keep]}
            for k in extra:
                g[k] = np.asarray(f[k])[keep]
            out.append(g)
        return out

    # the shard filter and oracle pass are class-independent: evaluate
    # each shard ONCE, then check all classes against it
    for lo, hi in ((0, 30), (30, 50), (50, np.inf)):
        fp = _filt(preds, "boxes_lidar", ["score"], lo, hi)
        fg = _filt(gts, "gt_boxes", ["difficulty", "num_points"], lo, hi)
        op, og = _oracle_inputs(fp, fg)
        # evaluator range shards use ALL difficulties (L2 semantics)
        ores = oracle_evaluate(op, og)
        key = f"AP_[{lo},{hi})"
        for cls in CLASSES:
            assert key in res[cls]
            assert abs(res[cls][key] - ores[cls]["AP_L2"]) < 5e-3, (
                cls, key, res[cls][key], ores[cls]["AP_L2"])
