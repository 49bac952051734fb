"""pillar_pallas backend (fused rowpad convs): end-to-end parity with the
gather-based pillar backend from SHARED params — same param tree, same
forward, same loss/grads (CPU runs the XLA reference implementation of the
rowpad contract, so this pins the plan/nbr/slot plumbing; the kernels
themselves are pinned in tests/test_pallas_pillar.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from detzero_tpu.core.config import Config
from detzero_tpu.models.detection.centerpoint import CenterPoint


def _build(backend, second_stage=False, row_budget=128):
    cfg = Config({
        "WITH_VELOCITY": True, "WITH_IOU": True,
        "CLASS_IDS_EACH_HEAD": [[0], [1, 2]],
        "VOXEL_CAPACITIES": (512, 256, 128, 64),
        "BACKBONE3D": backend,
        "PILLAR_ROW_BUDGET": row_budget,
        "SECOND_STAGE": second_stage,
    })
    return CenterPoint(cfg, 3, pc_range=(-6.4, -6.4, -2.0, 6.4, 6.4, 2.0),
                       voxel_size=(0.2, 0.2, 0.5), max_voxels=512,
                       max_points=2048, max_objs=8, dtype=jnp.float32)


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    pts = rng.uniform(-6, 6, (1, 2048, 5)).astype(np.float32)
    pts[..., 2] = rng.uniform(-1.8, 1.8, (1, 2048))
    pv = np.ones((1, 2048), bool)
    gb = np.zeros((1, 8, 9), np.float32)
    gb[:, 0, :7] = [1.0, 1.0, 0.0, 4.4, 2.0, 1.6, 0.3]
    gb[:, 1, :7] = [-2.0, 3.0, 0.2, 0.8, 0.8, 1.7, 1.2]
    gc = np.zeros((1, 8), np.int32)
    gc[:, 1] = 1
    gv = np.zeros((1, 8), bool)
    gv[:, :2] = True
    return pts, pv, gb, gc, gv


@pytest.fixture(scope="module")
def models(data):
    """Shared model pair + variables (each CenterPoint init costs a full
    CPU compile; building them once per module keeps the file fast)."""
    pts, pv, *_ = data
    m1, m2 = _build("pillar"), _build("pillar_pallas")
    v = m1.init(jax.random.PRNGKey(0), pts, pv)
    return m1, m2, v


def test_forward_parity(data, models):
    pts, pv, *_ = data
    m1, m2, v1 = models
    v2 = m2.init(jax.random.PRNGKey(0), pts, pv)
    assert jax.tree.structure(v1) == jax.tree.structure(v2)
    p1, _, _ = m1.apply(v1, pts, pv, train=False, mutable_stats=False)
    p2, _, _ = m2.apply(v1, pts, pv, train=False, mutable_stats=False)
    for k in ("hm", "center", "dim", "rot"):
        a, b = np.float32(p1[0][k]), np.float32(p2[0][k])
        assert np.abs(a - b).max() < 0.05 * max(np.abs(a).max(), 1.0), k


def test_loss_and_grad_parity(data, models):
    pts, pv, gb, gc, gv = data
    m1, m2, v = models

    def loss(m, params):
        l, _ = m.loss({"params": params, "batch_stats": v["batch_stats"]},
                      pts, pv, gb, gc, gv)
        return l

    l1, g1 = jax.value_and_grad(lambda p: loss(m1, p))(v["params"])
    l2, g2 = jax.value_and_grad(lambda p: loss(m2, p))(v["params"])
    assert abs(float(l1) - float(l2)) < 0.05 * abs(float(l1))
    flat1 = jax.tree.leaves(g1)
    flat2 = jax.tree.leaves(g2)
    for a, b in zip(flat1, flat2):
        a, b = np.float32(a), np.float32(b)
        scale = max(np.abs(a).max(), 1e-3)
        assert np.abs(a - b).max() < 0.08 * scale


def test_second_stage_parity(data):
    pts, pv, *_ = data
    m1 = _build("pillar", second_stage=True)
    m2 = _build("pillar_pallas", second_stage=True)
    v = m1.init(jax.random.PRNGKey(0), pts, pv)
    o1 = m1.predict(v, pts, pv)
    o2 = m2.predict(v, pts, pv)
    a, b = np.float32(o1["scores"]), np.float32(o2["scores"])
    assert np.abs(a - b).max() < 0.05


def test_stream_vfe_parity(data, models, monkeypatch):
    """DETZERO_STREAM_VFE=1 (stream_rowpad_feats kernel reduces the sorted
    point stream straight into the rowpad layout) matches the dense
    segment-sum table + rowpad_gather path end to end within 1e-4 relative
    (bit-exactness is only claimed on real TPU hardware, where both paths
    share the MXU accumulate order; interpret mode reorders).

    FORCE_PALLAS=1 so the stream kernel actually runs (interpret mode on
    CPU) — stream VFE follows resolve_use_pallas like the convs, so the
    bench's FORCE_PALLAS=0 FLOP-count trace stays cpu-lowerable."""
    pts, pv, *_ = data
    _, _, v = models  # models fixture builds with the env default (on)
    monkeypatch.setenv("DETZERO_FORCE_PALLAS", "1")
    monkeypatch.setenv("DETZERO_STREAM_VFE", "0")
    m2 = _build("pillar_pallas")
    p_off, _, _ = m2.apply(v, pts, pv, train=False, mutable_stats=False)
    monkeypatch.setenv("DETZERO_STREAM_VFE", "1")
    m3 = _build("pillar_pallas")
    p_on, _, _ = m3.apply(v, pts, pv, train=False, mutable_stats=False)
    for k in ("hm", "center", "dim", "rot"):
        a, b = np.float32(p_off[0][k]), np.float32(p_on[0][k])
        assert np.abs(a - b).max() < 1e-4 * max(np.abs(a).max(), 1.0), k


def test_stream_vfe_overflow_parity(data, monkeypatch):
    """Row overflow (budget 8): the stream kernel must drop exactly the
    pillars the gather path drops (lane-vs-slot assignment agreement)."""
    pts, pv, *_ = data
    monkeypatch.setenv("DETZERO_FORCE_PALLAS", "1")
    monkeypatch.setenv("DETZERO_STREAM_VFE", "0")
    m_off = _build("pillar_pallas", row_budget=8)
    v = m_off.init(jax.random.PRNGKey(0), pts, pv)
    p_off, _, _ = m_off.apply(v, pts, pv, train=False, mutable_stats=False)
    monkeypatch.setenv("DETZERO_STREAM_VFE", "1")
    m_on = _build("pillar_pallas", row_budget=8)
    p_on, _, _ = m_on.apply(v, pts, pv, train=False, mutable_stats=False)
    for k in ("hm", "center", "dim", "rot"):
        a, b = np.float32(p_off[0][k]), np.float32(p_on[0][k])
        assert np.abs(a - b).max() < 1e-4 * max(np.abs(a).max(), 1.0), k


def test_small_row_budget_no_crash(data):
    """Overflowing rows (budget 8) must drop pillars, not crash or NaN."""
    pts, pv, *_ = data
    m = _build("pillar_pallas", row_budget=8)
    v = m.init(jax.random.PRNGKey(0), pts, pv)
    p, _, _ = m.apply(v, pts, pv, train=False, mutable_stats=False)
    assert np.isfinite(np.float32(p[0]["hm"])).all()
