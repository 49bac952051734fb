"""Ensemble recipe smoke test (VERDICT r1 #7): two result pickles ->
WBF fuse (n_models damping) -> eval, via the tools/ensemble_dets.py CLI —
the reference's published-number workflow (wbf_offline over multiple
det_model_cfgs)."""

import pickle
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from tools.ensemble_dets import fuse_result_lists


def _mk_result(rng, gt, jitter, n_frames=4):
    out = []
    for fi in range(n_frames):
        boxes = gt + rng.randn(*gt.shape) * jitter
        out.append({
            "frame_id": fi, "sequence_name": "seq0",
            "name": np.array(["Vehicle"] * len(gt)),
            "boxes_lidar": boxes.astype(np.float32),
            "score": rng.uniform(0.5, 1.0, len(gt)).astype(np.float32),
        })
    return out


@pytest.fixture()
def two_results():
    rng = np.random.RandomState(0)
    gt = np.zeros((5, 7), np.float32)
    gt[:, 0] = np.arange(5) * 20.0
    gt[:, 3:6] = [4.4, 2.0, 1.6]
    return gt, _mk_result(rng, gt, 0.02), _mk_result(rng, gt, 0.02)


def test_fuse_result_lists(two_results):
    gt, r1, r2 = two_results
    fused = fuse_result_lists([r1, r2], class_names=("Vehicle",))
    assert len(fused) == len(r1)
    for fr in fused:
        # two jittered copies of each GT box fuse back to ~5 boxes
        assert len(fr["boxes_lidar"]) == 5
        # cluster of 2 from 2 models -> no damping loss (min(2,2)/2 = 1)
        assert (fr["score"] > 0.4).all()
        d = np.abs(np.sort(fr["boxes_lidar"][:, 0]) - gt[:, 0])
        assert d.max() < 0.5


def test_frame_id_mismatch_rejected(two_results):
    _, r1, r2 = two_results
    r2[1]["frame_id"] = 99
    with pytest.raises(AssertionError, match="frame_id mismatch"):
        fuse_result_lists([r1, r2], class_names=("Vehicle",))


def test_ensemble_cli_end_to_end(tmp_path, two_results):
    gt, r1, r2 = two_results
    for name, r in (("a", r1), ("b", r2)):
        with open(tmp_path / f"{name}.pkl", "wb") as f:
            pickle.dump(r, f)
    gts = [{"gt_boxes": gt, "name": np.array(["Vehicle"] * len(gt)),
            "num_points": np.full(len(gt), 100)} for _ in r1]
    with open(tmp_path / "gt.pkl", "wb") as f:
        pickle.dump(gts, f)
    out = tmp_path / "fused.pkl"
    r = subprocess.run(
        [sys.executable, "tools/ensemble_dets.py",
         "--results", str(tmp_path / "a.pkl"), str(tmp_path / "b.pkl"),
         "--output", str(out), "--gt_path", str(tmp_path / "gt.pkl"),
         "--class_names", "Vehicle"],
        capture_output=True, text=True,
        cwd=Path(__file__).resolve().parents[1])
    assert r.returncode == 0, r.stderr
    with open(out, "rb") as f:
        fused = pickle.load(f)
    assert len(fused) == len(r1)
    assert "AP_L2" in r.stderr + r.stdout  # eval table printed
