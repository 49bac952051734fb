"""Two-stage CenterPoint (PDV RoI head): forward/loss/grad/predict."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from detzero_tpu.core.config import Config
from detzero_tpu.models.detection.centerpoint import CenterPoint
from detzero_tpu.models.detection.pdv_head import (
    assign_roi_targets, roi_grid_points,
)
from detzero_tpu.ops.box_coder import ResidualCoder


def test_roi_grid_points_inside_box():
    rois = np.array([[2.0, -1.0, 0.5, 4.0, 2.0, 1.5, 0.7]], np.float32)
    pts = np.asarray(roi_grid_points(jnp.asarray(rois), 4))
    assert pts.shape == (1, 64, 3)
    from detzero_tpu.ops import box_np
    inside = box_np.points_in_rotated_box(pts[0], rois[0])
    assert inside.all()


def test_residual_coder_roundtrip():
    coder = ResidualCoder()
    rng = np.random.RandomState(0)
    anchors = np.concatenate([
        rng.uniform(-10, 10, (8, 3)), rng.uniform(1, 4, (8, 3)),
        rng.uniform(-3, 3, (8, 1))], 1).astype(np.float32)
    boxes = anchors + rng.randn(8, 7).astype(np.float32) * 0.2
    dec = np.asarray(coder.decode(coder.encode(boxes, anchors), anchors))
    np.testing.assert_allclose(dec, boxes, atol=1e-4)


def test_assign_roi_targets():
    rois = np.array([
        [0, 0, 0, 4, 2, 1.5, 0.0],      # exact match -> fg
        [0.4, 0.2, 0, 4, 2, 1.5, 0.0],  # partial
        [30, 30, 0, 4, 2, 1.5, 0.0],    # background
    ], np.float32)
    gt = np.array([[0, 0, 0, 4, 2, 1.5, 0.0]], np.float32)
    tgt = assign_roi_targets(jnp.asarray(rois), jnp.ones(3, bool),
                             jnp.asarray(gt), jnp.ones(1, bool))
    cls_t = np.asarray(tgt["cls_target"])
    assert cls_t[0] == 1.0 and cls_t[2] == 0.0 and 0 <= cls_t[1] <= 1
    assert np.asarray(tgt["fg_mask"]).tolist() == [True, True, False]


@pytest.fixture(scope="module")
def two_stage_model():
    cfg = Config({
        "WITH_VELOCITY": False, "WITH_IOU": True,
        "CLASS_IDS_EACH_HEAD": [[0], [1]],
        "VOXEL_CAPACITIES": (512, 256, 128, 64),
        "SECOND_STAGE": True, "ROI_BUDGET": 16, "ROI_GRID_SIZE": 3,
        "ROI_ATTENTION": True,
    })
    return CenterPoint(
        cfg, 2, pc_range=(-6.4, -6.4, -2.0, 6.4, 6.4, 2.0),
        voxel_size=(0.2, 0.2, 0.5), max_voxels=512, max_points=2048,
        max_objs=8, dtype=jnp.float32,
    )


def test_two_stage_forward_loss_grad_predict(two_stage_model):
    model = two_stage_model
    rng = np.random.RandomState(0)
    B, P = 2, 2048
    pts = rng.uniform(-6, 6, (B, P, 5)).astype(np.float32)
    pts[..., 2] *= 0.3
    pv = np.ones((B, P), bool)
    variables = model.init(jax.random.PRNGKey(0), pts, pv)
    assert any("roi_head" in str(k) for k in variables["params"])

    gb = np.zeros((B, 8, 7), np.float32)
    gb[:, 0] = [1, 1, 0, 2, 1, 1, 0.3]
    gc = np.zeros((B, 8), np.int32)
    gv = np.zeros((B, 8), bool)
    gv[:, 0] = True
    loss, (aux, updates) = jax.jit(model.loss)(variables, pts, pv, gb, gc, gv)
    assert np.isfinite(float(loss))
    assert "roi_cls" in aux and "roi_reg" in aux

    grads = jax.jit(jax.grad(lambda v, *a: model.loss(v, *a)[0]))(
        variables, pts, pv, gb, gc, gv)
    flat = jax.tree_util.tree_flatten_with_path(grads["params"])[0]
    roi_gnorm = float(jnp.sqrt(sum(
        (g.astype(jnp.float32) ** 2).sum() for p, g in flat
        if "roi_head" in str(p))))
    assert np.isfinite(roi_gnorm) and roi_gnorm > 0, "roi head got no gradient"

    pred = jax.jit(model.predict)(variables, pts, pv)
    assert pred["boxes"].shape == (B, 16, 7)
    assert np.isfinite(np.asarray(pred["boxes"])).all()
    assert ((np.asarray(pred["scores"]) >= 0)
            & (np.asarray(pred["scores"]) <= 1)).all()


def test_subsample_rois_composition():
    """proposal_target_layer.subsample_rois parity (VERDICT r1 #8): fg
    capped at FG_RATIO*M, bg split hard/easy by HARD_BG_RATIO, all shapes
    static, degenerate pools -> invalid slots instead of raising."""
    import jax
    from detzero_tpu.models.detection.pdv_head import subsample_rois

    n, m = 64, 16
    rng = np.random.RandomState(0)
    iou = np.concatenate([
        np.full(20, 0.8),   # fg
        np.full(24, 0.3),   # hard bg [0.1, 0.55)
        np.full(20, 0.02),  # easy bg
    ]).astype(np.float32)
    mask = np.ones(n, bool)
    idx, valid = jax.jit(
        lambda k: subsample_rois(k, jnp.asarray(iou), jnp.asarray(mask),
                                 roi_per_image=m)
    )(jax.random.PRNGKey(0))
    idx, valid = np.asarray(idx), np.asarray(valid)
    assert idx.shape == (m,) and valid.all()
    cat = np.where(iou[idx] >= 0.55, "fg",
                   np.where(iou[idx] >= 0.1, "hard", "easy"))
    # 8 fg (FG_RATIO 0.5), 8 bg of which floor(8*0.8)=6 hard + 2 easy
    assert (cat == "fg").sum() == 8
    assert (cat == "hard").sum() == 6
    assert (cat == "easy").sum() == 2
    # fg slots are drawn without replacement when the pool is big enough
    assert len(set(idx[cat == "fg"])) == 8

    # no fg at all -> every slot is background, still valid
    iou2 = np.full(n, 0.3, np.float32)
    idx2, valid2 = subsample_rois(jax.random.PRNGKey(1), jnp.asarray(iou2),
                                  jnp.asarray(mask), roi_per_image=m)
    assert np.asarray(valid2).all()
    # no bg -> all m slots fg (wrapping the pool, reference bg==0 branch)
    iou3 = np.full(n, 0.9, np.float32)
    idx3, valid3 = subsample_rois(jax.random.PRNGKey(2), jnp.asarray(iou3),
                                  jnp.asarray(mask), roi_per_image=m)
    assert np.asarray(valid3).all()
    # everything masked off -> all slots invalid
    idx4, valid4 = subsample_rois(jax.random.PRNGKey(3), jnp.asarray(iou),
                                  jnp.zeros(n, bool), roi_per_image=m)
    assert not np.asarray(valid4).any()
