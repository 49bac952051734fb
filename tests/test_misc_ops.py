import numpy as np
import pytest

from detzero_tpu.ops.kde import gaussian_kde_density
from detzero_tpu.pipeline.submit import build_submission_records, write_submission


def test_kde_density_orders_by_crowding():
    tight = np.random.RandomState(0).randn(1, 8, 3).astype(np.float32) * 0.1
    loose = np.random.RandomState(0).randn(1, 8, 3).astype(np.float32) * 2.0
    found = np.ones((1, 8), bool)
    d_tight = float(np.asarray(gaussian_kde_density(tight, found))[0])
    d_loose = float(np.asarray(gaussian_kde_density(loose, found))[0])
    assert d_tight > d_loose
    empty = np.asarray(gaussian_kde_density(tight, np.zeros((1, 8), bool)))
    assert empty[0] == 0.0


def test_submission_records_and_fallback(tmp_path):
    preds = [{"boxes_lidar": np.array([[1, 2, 3, 4, 2, 1.5, 0.3]]),
              "score": np.array([0.9]), "name": np.array(["Vehicle"])}]
    meta = [{"context_name": "ctx", "frame_timestamp_micros": 123}]
    recs = build_submission_records(preds, meta)
    assert recs[0]["type"] == 1 and recs[0]["box"]["length"] == 4.0
    out = write_submission(recs, tmp_path / "sub.bin")
    assert out.exists()
