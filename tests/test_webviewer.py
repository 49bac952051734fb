"""Standalone HTML sequence viewer: structural validation (no browser in
this image — the embedded data payload and document structure are checked;
the inline JS renderer is dependency-free ES6)."""

import base64
import json
import re

import numpy as np

from detzero_tpu.utils.webviewer import (
    export_from_offboard, export_sequence_html,
)


def _mk_frames(n=3):
    rng = np.random.RandomState(0)
    frames = []
    for f in range(n):
        frames.append({
            "points": rng.uniform(-20, 20, (500, 4)).astype(np.float32),
            "boxes": np.array([[f, 0, 0, 4, 2, 1.5, 0.1]], np.float32),
            "names": ["Vehicle"], "scores": [0.8], "obj_ids": [5],
            "gt_boxes": np.array([[f, 0, 0, 4, 2, 1.5, 0.1]], np.float32),
            "gt_names": ["Vehicle"],
        })
    return frames


def test_export_structure_and_payload(tmp_path):
    out = export_sequence_html(_mk_frames(), tmp_path / "v.html",
                               title="t", max_points=200)
    html = out.read_text()
    assert "<canvas" in html and "__DATA__" not in html
    data = json.loads(re.search(r"const DATA=(\[.*?\]), COLORS=", html,
                                re.S).group(1))
    assert len(data) == 3
    raw = base64.b64decode(data[0]["pts"])
    pts = np.frombuffer(raw, np.float32)
    # downsampled to max_points; 4-col input keeps intensity (pc=4)
    assert data[0]["pc"] == 4 and len(pts) == 200 * 4
    assert np.isfinite(pts).all()
    det = data[1]["det"][0]
    assert det["n"] == "Vehicle" and det["id"] == 5
    assert abs(det["b"][0] - 1.0) < 1e-6
    assert data[2]["gt"][0]["n"] == "Vehicle"


def test_export_from_offboard_adapter(tmp_path):
    final = [{"boxes": np.array([[0, 0, 0, 4, 2, 1.5, 0.0]]),
              "scores": np.array([0.9]), "obj_ids": np.array([1]),
              "labels": np.array([2])}]
    pts = [np.zeros((10, 3), np.float32)]
    out = export_from_offboard(final, pts, out_path=tmp_path / "o.html")
    data = json.loads(re.search(r"const DATA=(\[.*?\]), COLORS=",
                                out.read_text(), re.S).group(1))
    assert data[0]["det"][0]["n"] == "Cyclist"  # label 2 -> class name


def test_empty_frames(tmp_path):
    out = export_sequence_html(
        [{"points": np.zeros((0, 3))}], tmp_path / "e.html")
    data = json.loads(re.search(r"const DATA=(\[.*?\]), COLORS=",
                                out.read_text(), re.S).group(1))
    assert "det" not in data[0] and "gt" not in data[0]
    assert data[0]["pc"] == 3  # 3-col input stays xyz-only
