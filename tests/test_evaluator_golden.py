"""Golden-fixture validation of the native Waymo-protocol evaluator
(VERDICT r1 #5): adversarial scenes with ANALYTICALLY-known AP/APH for both
``envelope`` and ``waymo101`` modes, pinning the protocol semantics the
reference gets from the waymo_open_dataset TF op
(waymo_eval_detection.py:87-204): 101-cutoff sampling, capped-recall-delta
integration, heading-weighted precision on an unweighted recall axis,
L1-ignores-hard-GT-matches, and range binning.
"""

import numpy as np
import pytest

from detzero_tpu.pipeline.evaluator import (
    _average_precision, _integrate_pr_capped, evaluate_detection,
)


def _mk_frames(pred_boxes, pred_scores, gt_boxes, num_points=None,
               cls="Vehicle"):
    """Single-class helper: one frame per (pred, gt) pair in the lists."""
    preds, gts = [], []
    for pb, ps, gb, npt in zip(pred_boxes, pred_scores, gt_boxes,
                               num_points or [None] * len(gt_boxes)):
        pb = np.asarray(pb, np.float32).reshape(-1, 7)
        gb = np.asarray(gb, np.float32).reshape(-1, 7)
        preds.append({"boxes_lidar": pb, "score": np.asarray(ps, np.float32),
                      "name": np.array([cls] * len(pb))})
        gts.append({"gt_boxes": gb, "name": np.array([cls] * len(gb)),
                    "num_points": (np.asarray(npt) if npt is not None
                                   else np.full(len(gb), 100))})
    return preds, gts


def _spread_boxes(n, spacing=20.0):
    """n far-apart unit-IoU-isolated boxes."""
    b = np.zeros((n, 7), np.float32)
    b[:, 0] = np.arange(n) * spacing
    b[:, 3:6] = [4.0, 2.0, 1.5]
    return b


CLS = ("Vehicle",)


def _eval(preds, gts, **kw):
    return evaluate_detection(preds, gts, class_names=CLS, **kw)["Vehicle"]


# ----------------------------------------------------------------------
def test_perfect_detector_spread_scores():
    """50 exact TPs with distinct spread scores -> AP = APH = 1 in BOTH
    modes (every waymo101 recall step is 1/50 = 0.02 < the 0.05 cap)."""
    gt = _spread_boxes(50)
    scores = 0.005 + np.arange(50) * 0.0199  # distinct, dense in [0, 1)
    preds, gts = _mk_frames([gt], [scores], [gt])
    for mode in ("envelope", "waymo101"):
        r = _eval(preds, gts, ap_mode=mode)
        for k in ("AP_L1", "APH_L1", "AP_L2", "APH_L2"):
            assert r[k] == pytest.approx(1.0, abs=1e-6), (mode, k, r)


def test_perfect_detector_equal_scores_waymo101_collapses():
    """The op's signature behavior: all scores identical -> ONE operating
    point -> recall delta 1.0 capped at 0.05 -> AP = 0.05 exactly under
    waymo101 (score calibration matters!), while envelope still gives 1."""
    gt = _spread_boxes(30)
    scores = np.full(30, 0.5)
    preds, gts = _mk_frames([gt], [scores], [gt])
    r101 = _eval(preds, gts, ap_mode="waymo101")
    assert r101["AP_L2"] == pytest.approx(0.05, abs=1e-9)
    assert r101["APH_L2"] == pytest.approx(0.05, abs=1e-9)
    renv = _eval(preds, gts, ap_mode="envelope")
    assert renv["AP_L2"] == pytest.approx(1.0, abs=1e-6)


def test_half_tp_half_fp():
    """20 TPs (high scores) + 20 FPs (low scores) over 40 GT -> the PR
    curve is precision 1 down to recall 0.5, then flat recall -> AP = 0.5
    exactly in both modes."""
    gt = _spread_boxes(40)
    tp = gt[:20]
    fp = _spread_boxes(20) + np.array([1000, 0, 0, 0, 0, 0, 0], np.float32)
    pred = np.concatenate([tp, fp])
    scores = np.concatenate([0.5 + np.arange(20) * 0.024,
                             0.02 + np.arange(20) * 0.022])
    preds, gts = _mk_frames([pred], [scores], [gt])
    for mode in ("envelope", "waymo101"):
        r = _eval(preds, gts, ap_mode=mode)
        assert r["AP_L2"] == pytest.approx(0.5, abs=1e-6), mode
        assert r["AP_L1"] == pytest.approx(0.5, abs=1e-6), mode


def test_aph_uniform_heading_error():
    """All TPs with heading off by pi/2 -> heading accuracy 0.5 for every
    TP. SQUARE boxes so the rotated box still has IoU 1 with the GT. Per
    the protocol the recall axis is UNWEIGHTED and h(r) = 0.5 where
    p(r) = 1, so APH = 0.5 * AP exactly (not 0.25)."""
    gt = _spread_boxes(50)
    gt[:, 3:5] = 2.0  # square footprint: pi/2 rotation keeps IoU = 1
    pred = gt.copy()
    pred[:, 6] += np.pi / 2
    scores = 0.005 + np.arange(50) * 0.0199
    preds, gts = _mk_frames([pred], [scores], [gt])
    for mode in ("envelope", "waymo101"):
        r = _eval(preds, gts, ap_mode=mode)
        assert r["AP_L2"] == pytest.approx(1.0, abs=1e-6), mode
        assert r["APH_L2"] == pytest.approx(0.5, abs=1e-6), mode


def test_aph_opposite_heading_is_zero():
    gt = _spread_boxes(20)
    pred = gt.copy()
    pred[:, 6] += np.pi  # heading accuracy max(0, 1 - pi/pi) = 0
    scores = 0.1 + np.arange(20) * 0.04
    preds, gts = _mk_frames([pred], [scores], [gt])
    for mode in ("envelope", "waymo101"):
        r = _eval(preds, gts, ap_mode=mode)
        assert r["AP_L2"] == pytest.approx(1.0, abs=1e-6), mode
        assert r["APH_L2"] == pytest.approx(0.0, abs=1e-9), mode


def test_l1_ignores_hard_gt_matches():
    """10 GT of which 4 are hard (<=5 points). Predictions cover ALL 10
    with distinct scores. Envelope: L2 = L1 = 1 (hard matches are neither
    TP nor FP at L1, easy all found, no FPs). waymo101: each of the 10
    operating points gains 0.1 recall but only 0.05 is creditable (the
    cap), so a perfect sparse-GT detector maxes out at 0.5 — pinned here
    as protocol semantics, not a bug."""
    gt = _spread_boxes(10)
    npts = np.array([100] * 6 + [3] * 4)
    scores = 0.1 + np.arange(10) * 0.08
    preds, gts = _mk_frames([gt], [scores], [gt], num_points=[npts])
    renv = _eval(preds, gts, ap_mode="envelope")
    assert renv["AP_L2"] == pytest.approx(1.0, abs=1e-6)
    assert renv["AP_L1"] == pytest.approx(1.0, abs=1e-6)
    r101 = _eval(preds, gts, ap_mode="waymo101")
    assert r101["AP_L2"] == pytest.approx(0.5, abs=1e-6)
    # L1: 6 easy GT, recall steps 1/6 > cap -> 6 * 0.05 = 0.3
    assert r101["AP_L1"] == pytest.approx(0.3, abs=1e-6)

    hard_only = gt[6:]
    hard_scores = scores[6:]
    preds, gts = _mk_frames([hard_only], [hard_scores], [gt],
                            num_points=[npts])
    for mode in ("envelope", "waymo101"):
        r = _eval(preds, gts, ap_mode=mode)
        assert r["AP_L1"] == pytest.approx(0.0, abs=1e-9), mode
    # L2 envelope: 4 TPs over 10 GT, precision 1 -> AP = 0.4;
    # waymo101: 4 capped 0.05 steps -> 0.2
    assert _eval(preds, gts, ap_mode="envelope")["AP_L2"] == \
        pytest.approx(0.4, abs=1e-6)
    assert _eval(preds, gts, ap_mode="waymo101")["AP_L2"] == \
        pytest.approx(0.2, abs=1e-6)


def test_high_score_fp_costs_known_amount():
    """1 FP outscoring 10 TPs: precision at recall k/10 is k/(k+1).
    Envelope AP = sum_k (1/10) * max_{j>=k} j/(j+1) = mean(k/(k+1)),
    k=1..10 (envelope of an increasing sequence is itself)."""
    gt = _spread_boxes(10)
    fp = gt[:1] + np.array([1000, 0, 0, 0, 0, 0, 0], np.float32)
    pred = np.concatenate([fp, gt])
    scores = np.concatenate([[0.99], 0.05 + np.arange(10) * 0.09])
    preds, gts = _mk_frames([pred], [scores], [gt])
    # precision at recall k/10 is k/(k+1), INCREASING in k, so the
    # envelope lifts every earlier step to the max 10/11:
    r = _eval(preds, gts, ap_mode="envelope")
    assert r["AP_L2"] == pytest.approx(10 / 11, abs=1e-6)
    # waymo101 rectangle sum: no envelope — each 0.1 recall step is
    # capped to 0.05 and credited with that point's own precision:
    expected101 = 0.05 * sum(k / (k + 1) for k in range(1, 11))
    r101 = _eval(preds, gts, ap_mode="waymo101")
    assert r101["AP_L2"] == pytest.approx(expected101, abs=1e-6)


def test_multiframe_accumulation_matches_single_frame():
    """Splitting the same boxes across frames must not change AP."""
    gt = _spread_boxes(40)
    scores = 0.005 + np.arange(40) * 0.024
    one_p, one_g = _mk_frames([gt], [scores], [gt])
    many_p, many_g = _mk_frames(
        [gt[i * 10:(i + 1) * 10] for i in range(4)],
        [scores[i * 10:(i + 1) * 10] for i in range(4)],
        [gt[i * 10:(i + 1) * 10] for i in range(4)])
    for mode in ("envelope", "waymo101"):
        a = _eval(one_p, one_g, ap_mode=mode)
        b = _eval(many_p, many_g, ap_mode=mode)
        assert a["AP_L2"] == pytest.approx(b["AP_L2"], abs=1e-9), mode


def test_range_breakdown_bins():
    """GT at ranges 10 (bin [0,30)), 40 (bin [30,50)), 60 (bin [50,inf));
    predictions only hit the near box -> AP 1/0/0 per bin."""
    gt = np.zeros((3, 7), np.float32)
    gt[:, 0] = [10, 40, 60]
    gt[:, 3:6] = [4, 2, 1.5]
    pred = gt[:1]
    preds, gts = _mk_frames([pred], [np.array([0.9])], [gt])
    r = evaluate_detection(preds, gts, class_names=CLS,
                           with_range_breakdown=True)["Vehicle"]
    assert r["AP_[0,30)"] == pytest.approx(1.0, abs=1e-6)
    assert r["AP_[30,50)"] == pytest.approx(0.0, abs=1e-9)
    assert r["AP_[50,inf)"] == pytest.approx(0.0, abs=1e-9)


# ----------------------------------------------------------------------
def test_integrate_pr_capped_unit():
    """Direct unit pin of the capped rectangle sum: cutoff-ascending
    points (r, p) = [(1.0, 0.5), (0.5, 1.0)] -> walking descending
    cutoff: 0.05-capped credit of the r=0.5 point at p=1, then capped
    credit of the r=1.0 point at p=0.5."""
    ap = _integrate_pr_capped(np.array([0.5, 1.0]), np.array([1.0, 0.5]),
                              max_recall_delta=0.05)
    assert ap == pytest.approx(0.05 * 1.0 + 0.05 * 0.5, abs=1e-12)
    # dense sampling reproduces exact area: r = 1..0 in 0.01 steps, p = 1
    n = 101
    r = np.linspace(1, 0, n)
    p = np.ones(n)
    assert _integrate_pr_capped(p, r) == pytest.approx(1.0, abs=1e-9)


def test_average_precision_prec_weights():
    """Envelope APH helper: weighted precision on an unweighted recall
    axis."""
    tp = np.ones(4)
    fp = np.zeros(4)
    scores = np.array([0.9, 0.7, 0.5, 0.3])
    ha = np.full(4, 0.5)
    ap = _average_precision(tp, fp, scores, 4)
    aph = _average_precision(tp, fp, scores, 4, prec_weights=ha)
    assert ap == pytest.approx(1.0)
    assert aph == pytest.approx(0.5)
