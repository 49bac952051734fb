"""Pallas kernels in interpreter mode (CPU) vs oracle/XLA reference."""

import numpy as np
import jax.numpy as jnp
import pytest

from detzero_tpu.ops import iou3d, nms as nms_mod, pallas_iou
from detzero_tpu.ops import box_np


@pytest.fixture(scope="module")
def boxes(rng=None):
    r = np.random.RandomState(0)
    n = 64
    b = np.zeros((n, 5), np.float32)
    b[:, :2] = r.uniform(-15, 15, (n, 2))
    b[:, 2:4] = r.uniform(1, 5, (n, 2))
    b[:, 4] = r.uniform(-3, 3, n)
    return b


def test_allpairs_iou_interpret(boxes):
    got = np.asarray(pallas_iou.boxes_iou_bev(boxes, boxes))
    want = box_np.boxes_iou_bev(boxes.astype(np.float64), boxes.astype(np.float64))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pairwise_iou_interpret(boxes):
    got = np.asarray(pallas_iou.boxes_iou_bev_pairwise(boxes, boxes[::-1].copy()))
    want = np.array([
        box_np.boxes_iou_bev(boxes[i:i+1].astype(np.float64),
                             boxes[::-1][i:i+1].astype(np.float64))[0, 0]
        for i in range(len(boxes))
    ])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fused_nms_interpret(boxes):
    scores = np.random.RandomState(1).rand(len(boxes)).astype(np.float32)
    order = np.argsort(-scores)
    srt = boxes[order]
    keep = np.asarray(pallas_iou.nms_keep_mask(srt, np.ones(len(srt), bool),
                                               0.5, budget=128))
    iou = np.asarray(iou3d.boxes_iou_bev(srt, srt))
    ref = np.asarray(nms_mod._greedy_suppress(jnp.asarray(iou),
                                              jnp.ones(len(srt), bool), 0.5))
    assert (keep == ref).all()
