"""GRM / PRM / CRM refining models: shapes, losses, masking, quick overfit."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from detzero_tpu.models.refining import (
    ConfidencePointNet, GeometryTransformer, PositionTransformer,
    crm_decode, crm_loss, grm_decode, grm_loss, prm_decode, prm_loss,
)
from detzero_tpu.models.refining import target_assign as ta


ANCHORS = np.array([[4.7, 2.1, 1.7], [8.5, 2.8, 3.2], [12.0, 2.9, 3.6]])


def test_size_anchor_roundtrip():
    gt = jnp.asarray([4.9, 2.0, 1.8])
    cls, res = ta.encode_size(gt, ANCHORS)  # cls (), res (K, 3)
    assert int(cls) == 0
    logits = jax.nn.one_hot(cls, 3) * 10.0  # (K,)
    dec = ta.decode_size(logits, res, ANCHORS)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(gt), rtol=1e-4)


def test_heading_bin_roundtrip():
    h = jnp.asarray([-3.0, -1.0, 0.0, 0.5, 3.0])
    b, r = ta.encode_heading(h)
    logits = jax.nn.one_hot(b, ta.NUM_HEADING_BINS) * 10
    res = jnp.zeros((5, ta.NUM_HEADING_BINS)).at[jnp.arange(5), b].set(r)
    dec = ta.decode_heading(logits, res)
    np.testing.assert_allclose(np.sin(np.asarray(dec)), np.sin(np.asarray(h)), atol=1e-5)
    np.testing.assert_allclose(np.cos(np.asarray(dec)), np.cos(np.asarray(h)), atol=1e-5)


def _grm_inputs(rng, q=3, npts=64, m=256, f=11):
    qp = rng.randn(q, npts, f).astype(np.float32)
    qs = np.abs(rng.randn(q, 3)).astype(np.float32) + 3
    mp = rng.randn(m, f).astype(np.float32)
    mm = np.ones(m, bool)
    mm[m // 2:] = False
    return qp, qs, mp, mm


def test_grm_forward_and_overfit():
    rng = np.random.RandomState(0)
    model = GeometryTransformer(d_model=64)
    qp, qs, mp, mm = _grm_inputs(rng)
    params = model.init(jax.random.PRNGKey(0), qp, qs, mp, mm)
    pred = model.apply(params, qp, qs, mp, mm)
    assert pred["anchor_logits"].shape == (1, 3, 3)
    assert pred["size_res"].shape == (1, 3, 3, 3)

    gt_size = jnp.asarray([4.9, 2.0, 1.8])
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def lfn(p):
            out = model.apply(p, qp, qs, mp, mm)
            return grm_loss(out, gt_size, ANCHORS)[0]
        loss, g = jax.value_and_grad(lfn)(params)
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    losses = []
    for _ in range(40):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses[::10]
    size = grm_decode(model.apply(params, qp, qs, mp, mm), ANCHORS)
    np.testing.assert_allclose(np.asarray(size), np.asarray(gt_size), atol=0.5)


def test_prm_forward_loss_masking():
    rng = np.random.RandomState(1)
    t, npts, nm, f = 16, 32, 8, 8
    model = PositionTransformer(d_model=64, mem_points=nm)
    qp = rng.randn(t, npts, f).astype(np.float32)
    qb = rng.randn(t, 4).astype(np.float32)
    mp = rng.randn(t, nm, f).astype(np.float32)
    mask = np.ones(t, bool)
    mask[10:] = False
    params = model.init(jax.random.PRNGKey(0), qp, qb, mp, mask)
    pred = model.apply(params, qp, qb, mp, mask)
    assert pred["center"].shape == (1, t, 3)
    assert pred["heading_logits"].shape == (1, t, ta.NUM_HEADING_BINS)

    gt_c = rng.randn(t, 3).astype(np.float32)
    gt_h = rng.uniform(-np.pi, np.pi, t).astype(np.float32)
    loss, aux = prm_loss(pred, gt_c, gt_h, mask)
    assert np.isfinite(float(loss))
    # padded boxes must not affect the loss
    gt_c2 = gt_c.copy()
    gt_c2[10:] += 100.0
    loss2, _ = prm_loss(pred, gt_c2, gt_h, mask)
    np.testing.assert_allclose(float(loss), float(loss2), rtol=1e-6)
    c, h = prm_decode(pred)
    assert c.shape == (t, 3) and h.shape == (t,)


def test_prm_padding_invariance_forward():
    """Changing padded box contents must not change valid-box outputs."""
    rng = np.random.RandomState(2)
    t, npts, nm, f = 8, 16, 4, 8
    model = PositionTransformer(d_model=32, mem_points=nm)
    qp = rng.randn(t, npts, f).astype(np.float32)
    qb = rng.randn(t, 4).astype(np.float32)
    mp = rng.randn(t, nm, f).astype(np.float32)
    mask = np.ones(t, bool)
    mask[5:] = False
    params = model.init(jax.random.PRNGKey(0), qp, qb, mp, mask)
    p1 = model.apply(params, qp, qb, mp, mask)
    qp2, mp2 = qp.copy(), mp.copy()
    qp2[5:] = 999.0
    mp2[5:] = -999.0
    p2 = model.apply(params, qp2, qb, mp2, mask)
    np.testing.assert_allclose(
        np.asarray(p1["center"][:, :5]), np.asarray(p2["center"][:, :5]),
        atol=1e-4,
    )


def test_crm_forward_loss_decode():
    rng = np.random.RandomState(3)
    t, npts, f = 16, 32, 8
    model = ConfidencePointNet(d_model=64)
    pts = rng.randn(t, npts, f).astype(np.float32)
    mask = np.ones(t, bool)
    mask[12:] = False
    params = model.init(jax.random.PRNGKey(0), pts, mask)
    pred = model.apply(params, pts, mask)
    assert pred["score_logit"].shape == (t,)

    ious = rng.rand(t).astype(np.float32)
    loss, aux = crm_loss(pred, ious, mask)
    assert np.isfinite(float(loss))
    conf = crm_decode(pred)
    assert ((np.asarray(conf) >= 0) & (np.asarray(conf) <= 1)).all()

    # overfit: high-iou boxes -> high confidence, low-iou -> low
    ious_bin = np.where(np.arange(t) % 2 == 0, 0.9, 0.1).astype(np.float32)
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def lfn(p):
            return crm_loss(model.apply(p, pts, mask), ious_bin, mask)[0]
        loss, g = jax.value_and_grad(lfn)(params)
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    for _ in range(60):
        params, opt, loss = step(params, opt)
    conf = np.asarray(crm_decode(model.apply(params, pts, mask)))
    assert conf[0] > conf[1] + 0.2, conf[:4]


def test_augment_full_track_transforms_gt_consistently():
    """r2 regression: flip/rot/scale must hit gt_boxes exactly like
    boxes_global, or augmented PRM residual targets rotate out of
    alignment by meters."""
    from detzero_tpu.data.refine_dataset import augment_full_track

    rng = np.random.RandomState(0)
    t = 6
    boxes = np.tile([5.0, 3.0, 0.2, 4.4, 2.0, 1.6, 0.7], (t, 1))
    boxes[:, 0] += np.arange(t)
    obj = {"boxes_global": boxes.astype(np.float32),
           "pts": [rng.randn(10, 4).astype(np.float32) for _ in range(t)],
           "gt_boxes": (boxes + 0.1).astype(np.float32)}
    for seed in range(5):
        out = augment_full_track(obj, np.random.RandomState(seed))
        d_in = obj["gt_boxes"][:, :2] - obj["boxes_global"][:, :2]
        d_out = out["gt_boxes"][:, :2] - out["boxes_global"][:, :2]
        # relative offset magnitude is preserved up to the scale factor
        np.testing.assert_allclose(
            np.linalg.norm(d_out, axis=1) / np.linalg.norm(d_in, axis=1),
            np.full(t, np.linalg.norm(d_out[0]) / np.linalg.norm(d_in[0])),
            rtol=1e-5)
        # heading delta preserved exactly (flip negates both, rot shifts both)
        np.testing.assert_allclose(
            out["gt_boxes"][:, 6] - out["boxes_global"][:, 6],
            np.sign(out["boxes_global"][0, 6] / obj["boxes_global"][0, 6])
            * (obj["gt_boxes"][:, 6] - obj["boxes_global"][:, 6]), atol=1e-6)


# ---------------------------------------------------------------------------
# r5 root-cause pins (VERDICT r4 #4: the GRM/PRM ladder collapse)
# ---------------------------------------------------------------------------

def _moving_box_track(t=8, dims=(4.4, 2.0, 1.6), speed=3.0, seed=0):
    """Synthetic rigid object moving at `speed` m/frame with surface points
    sampled in ITS OWN frame each step (what a lidar would see)."""
    rng = np.random.RandomState(seed)
    boxes, pts = [], []
    for i in range(t):
        c = np.array([1.0 + speed * i, 2.0, 0.5])
        yaw = 0.3
        boxes.append([*c, *dims, yaw])
        # points on the box surface, in the box frame -> world
        local = rng.uniform(-0.5, 0.5, (64, 3)) * np.asarray(dims)
        cs, sn = np.cos(yaw), np.sin(yaw)
        world = local.copy()
        world[:, 0] = local[:, 0] * cs - local[:, 1] * sn + c[0]
        world[:, 1] = local[:, 0] * sn + local[:, 1] * cs + c[1]
        world[:, 2] = local[:, 2] + c[2]
        pts.append(np.concatenate([world, np.full((64, 1), 0.1)], 1
                                  ).astype(np.float32))
    return {"boxes_global": np.asarray(boxes, np.float32),
            "score": np.linspace(0.9, 0.5, t).astype(np.float32),
            "pts": pts}


def test_grm_memory_registers_moving_object():
    """The GRM memory must be the track-REGISTERED cloud: each frame's
    points transformed by its OWN box (reference waymo_geometry_dataset.py
    :77 local_coords_transform) — NOT the global concat through one box,
    which smears a moving object along its trajectory (the r4 GRM
    mode-collapsed to the class-mean size exactly this way)."""
    from detzero_tpu.data.refine_features import GRMSample

    obj = _moving_box_track(t=8, speed=3.0)
    s = GRMSample(rng=np.random.RandomState(0))(obj)
    mem_xyz = s["memory_pts"][:, :3]
    dims = np.array([4.4, 2.0, 1.6])
    # registered: every memory point lies within the (half-)box extents;
    # unregistered smear would spread x over ~24 m of trajectory
    assert np.all(np.abs(mem_xyz) <= dims / 2 + 1e-4), (
        np.abs(mem_xyz).max(0), "memory not registered per-frame")
    # p2s face distances must be consistent with the registered coords
    assert np.all(s["memory_pts"][:, 4:10] >= -1e-4)


def test_prm_decode_heading_is_absolute():
    """PRM heading decodes ABSOLUTE in init coords (reference
    target_assign.py:50/decode_torch:99-103): the decoded heading must not
    depend on the input trajectory's (pi-flip-noisy) headings; only the
    center adds the query box back."""
    t = 4
    pred = {
        "center": jnp.zeros((1, t, 3)),
        "heading_logits": jnp.tile(
            jax.nn.one_hot(jnp.full((t,), 7), ta.NUM_HEADING_BINS) * 10,
            (1, 1, 1)),
        "heading_res": jnp.zeros((1, t, ta.NUM_HEADING_BINS)),
    }
    qb_a = jnp.zeros((t, 4))
    qb_b = jnp.concatenate([jnp.ones((t, 3)),
                            jnp.full((t, 1), np.pi)], axis=1)
    c_a, h_a = prm_decode(pred, query_boxes=qb_a)
    c_b, h_b = prm_decode(pred, query_boxes=qb_b)
    np.testing.assert_allclose(np.asarray(h_a), np.asarray(h_b), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_b - c_a), 1.0, atol=1e-6)


def test_position_dataset_heading_targets_absolute_and_matched_frames():
    """Training targets: heading = absolute GT heading in init coords;
    frame selection restricted to matched rows (reference
    waymo_position_dataset.py:44-60)."""
    from detzero_tpu.data.refine_dataset import WaymoPositionDataset

    obj = _moving_box_track(t=8)
    # detector headings carry pi-flips on odd frames; GT heading constant
    obj["boxes_global"][1::2, 6] += np.pi
    gt = obj["boxes_global"].copy()
    gt[:, 6] = 0.3
    gt[:, :2] += 0.1
    obj["gt_boxes"] = gt
    obj["matched"] = np.array([True, True, False, True,
                               True, False, True, True])
    ds = WaymoPositionDataset({"QUERY_NUM": 8, "QUERY_POINTS": 32,
                               "MEMORY_POINTS": 8, "AUGMENT": False},
                              "Vehicle", training=True, records=[obj])
    s = ds[0]
    m = s["pad_mask"]
    # only matched rows selected
    assert np.all(np.asarray(obj["matched"])[s["frame_idx"][m]])
    # heading target = absolute gt heading in init coords: constant 0.3
    # minus the init box heading, NOT contaminated by the per-frame flips
    init_h = s["init_box"][6]
    expect = np.arctan2(np.sin(0.3 - init_h), np.cos(0.3 - init_h))
    np.testing.assert_allclose(s["gt_headings"][m], expect, atol=1e-5)


def test_confidence_dataset_pos_neg_alternation():
    """CRM training alternates matched and FP tracklets 50/50 (reference
    waymo_confidence_dataset.py:36-46) with honest per-frame iou labels."""
    from detzero_tpu.data.refine_dataset import WaymoConfidenceDataset

    pos = _moving_box_track(t=6, seed=1)
    pos["matched"] = np.ones(6, bool)
    pos["iou_gt"] = np.full(6, 0.8, np.float32)
    neg = _moving_box_track(t=6, seed=2)
    neg["matched"] = np.zeros(6, bool)
    neg["iou_gt"] = np.zeros(6, np.float32)
    ds = WaymoConfidenceDataset({"QUERY_NUM": 6, "QUERY_POINTS": 16,
                                 "AUGMENT": False}, "Vehicle",
                                training=True, records=[pos, neg])
    assert len(ds) == 2  # 1 pos track * 2
    s0, s1 = ds[0], ds[1]
    assert s0["gt_ious"][s0["pad_mask"]].max() > 0.5      # pos tracklet
    assert np.all(s1["gt_ious"][s1["pad_mask"]] == 0.0)   # neg tracklet
