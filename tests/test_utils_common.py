import numpy as np

from detzero_tpu.utils.common import (circle_nms, drop_info_with_name,
                                      multi_processing, remove_points_in_boxes3d)
from detzero_tpu.utils.visualize import plot_bev


def test_circle_nms():
    centers = np.array([[0, 0], [0.5, 0], [10, 10], [10.2, 10]])
    scores = np.array([0.9, 0.8, 0.7, 0.95])
    keep = circle_nms(centers, scores, radius=1.0)
    assert sorted(keep.tolist()) == [0, 3]


def test_remove_points_in_boxes():
    pts = np.array([[0, 0, 0], [10, 10, 10]], float)
    boxes = np.array([[0, 0, 0, 2, 2, 2, 0.3]])
    out = remove_points_in_boxes3d(pts, boxes)
    assert len(out) == 1 and out[0, 0] == 10


def test_multiprocessing_order():
    out = multi_processing(abs, [-3, -1, -2], workers=1)
    assert out == [3, 1, 2]


def test_drop_info_with_name():
    info = {"name": np.array(["Vehicle", "unknown"]),
            "gt_boxes": np.zeros((2, 7)), "meta": "x"}
    out = drop_info_with_name(info)
    assert len(out["name"]) == 1 and out["meta"] == "x"


def test_plot_bev_headless(tmp_path):
    pts = np.random.RandomState(0).uniform(-20, 20, (500, 3))
    boxes = np.array([[0, 0, 0, 4, 2, 1.5, 0.4]])
    p = plot_bev(pts, pred_boxes=boxes, gt_boxes=boxes,
                 names=["Vehicle"], out_path=tmp_path / "bev.png")
    assert p.exists() and p.stat().st_size > 1000
