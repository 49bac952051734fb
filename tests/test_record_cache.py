import pickle
from pathlib import Path

import numpy as np
import pytest

from detzero_tpu.data.record_cache import (
    RecordCache, RecordListView, write_record_cache,
)


def _records(rng, n=3, t=5):
    recs = {}
    for i in range(n):
        boxes = np.concatenate([
            rng.uniform(-20, 20, (t, 2)), np.zeros((t, 1)),
            np.tile([[4.5, 2.0, 1.6]], (t, 1)),
            rng.uniform(-np.pi, np.pi, (t, 1))], 1).astype(np.float32)
        recs[f"obj{i}"] = {
            "boxes_global": boxes,
            "score": rng.rand(t).astype(np.float32),
            "pts": [np.concatenate([b[None, :3] + rng.rand(k, 3),
                                    rng.rand(k, 1)], 1).astype(np.float32)
                    for k, b in zip(rng.randint(0, 30, t), boxes)],
            "gt_boxes": boxes.copy(),
            "matched": np.ones(t, bool),
            "state": "dynamic",
            "pose": [np.eye(4, dtype=np.float32)] * t,
            "sample_idx": list(range(t)),
            "hit": [1] * t,
        }
    return recs


def test_round_trip_equality(tmp_path):
    rng = np.random.RandomState(0)
    recs = _records(rng)
    path = tmp_path / "seq0.dzrc"
    write_record_cache(path, recs)
    cache = RecordCache(path)
    assert set(cache.keys) == set(recs)
    for k, want in recs.items():
        got = cache[k]
        np.testing.assert_array_equal(got["boxes_global"],
                                      want["boxes_global"])
        np.testing.assert_array_equal(got["score"], want["score"])
        np.testing.assert_array_equal(got["matched"], want["matched"])
        assert got["state"] == "dynamic"
        assert got["sample_idx"] == list(range(5))
        assert len(got["pts"]) == len(want["pts"])
        for a, b in zip(got["pts"], want["pts"]):
            np.testing.assert_array_equal(a, b)
        for a, b in zip(got["pose"], want["pose"]):
            np.testing.assert_array_equal(a, b)


def test_empty_point_frames_and_zero_length(tmp_path):
    recs = {"o": {"boxes_global": np.zeros((2, 7), np.float32),
                  "pts": [np.zeros((0, 4), np.float32),
                          np.zeros((0, 4), np.float32)]}}
    path = tmp_path / "e.dzrc"
    write_record_cache(path, recs)
    got = RecordCache(path)["o"]
    assert [len(p) for p in got["pts"]] == [0, 0]
    assert got["pts"][0].shape[1] == 4


def test_list_view_repeat_and_keys(tmp_path):
    rng = np.random.RandomState(1)
    write_record_cache(tmp_path / "seqA.dzrc", _records(rng, n=2))
    write_record_cache(tmp_path / "seqB.dzrc", _records(rng, n=1))
    view = RecordListView([RecordCache(tmp_path / "seqA.dzrc"),
                           RecordCache(tmp_path / "seqB.dzrc")])
    assert len(view) == 3
    assert view[0]["_key"] == ("seqA", "obj0")
    assert view[2]["_key"] == ("seqB", "obj0")
    rep = view * 3
    assert len(rep) == 9
    np.testing.assert_array_equal(rep[0]["boxes_global"],
                                  rep[3]["boxes_global"])


def test_refine_dataset_uses_cache(tmp_path):
    from tools.train_refine import build_refine_dataset

    rng = np.random.RandomState(2)
    recs = _records(rng, n=2, t=6)
    cls_dir = tmp_path / "Vehicle"
    cls_dir.mkdir(parents=True)
    write_record_cache(cls_dir / "seq0.dzrc", recs)
    cfg = {"DATASET": "WaymoGeometryDataset", "DATA_PATH": str(tmp_path),
           "CLASS_NAME": "Vehicle", "QUERY_NUM": 2, "QUERY_POINTS": 16,
           "MEMORY_POINTS": 64, "AUGMENT": False}
    ds = build_refine_dataset(cfg, training=False)
    assert len(ds) == 2
    s = ds[0]
    assert s["query_pts"].shape == (2, 16, 11)
    assert np.isfinite(s["query_pts"]).all()
    # pickle path yields identical samples (cache vs pickle parity)
    import pickle as pk
    (cls_dir / "seq0.dzrc").unlink()
    with open(cls_dir / "seq0.pkl", "wb") as f:
        pk.dump(recs, f)
    ds2 = build_refine_dataset(cfg, training=False)
    s2 = ds2[0]
    np.testing.assert_allclose(s["query_sizes"], s2["query_sizes"])


def test_build_cli_verifies_before_delete(tmp_path):
    """--delete_pickles must deep-verify contents first (ADVICE r1)."""
    import pickle
    import subprocess
    import sys

    rng = np.random.RandomState(0)
    cls_dir = tmp_path / "Vehicle"
    cls_dir.mkdir(parents=True)
    seq = {i: {"boxes_global": rng.randn(4, 7).astype(np.float32),
               "score": rng.rand(4).astype(np.float32),
               "pts": [rng.randn(5, 4).astype(np.float32) for _ in range(4)],
               "label": 0} for i in range(3)}
    with open(cls_dir / "seq0.pkl", "wb") as f:
        pickle.dump(seq, f)
    r = subprocess.run(
        [sys.executable, "tools/build_record_cache.py", "--object_root",
         str(tmp_path), "--classes", "Vehicle", "--delete_pickles"],
        capture_output=True, text=True, cwd=Path(__file__).resolve().parents[1])
    assert r.returncode == 0, r.stderr
    assert not (cls_dir / "seq0.pkl").exists()
    assert (cls_dir / "seq0.dzrc").exists()
