"""Batched refining inference (VERDICT r1 weak #3) + the run_offboard
_load_refine triple contract (ADVICE r1 high).

The reference batches a 200-box track through one forward
(position_transformer.py:98-126); here objects also stack across the batch
axis, so results must be invariant to the batch size and to full-Config vs
kwargs-dict sampler configuration.
"""

import numpy as np
import jax
import pytest
import yaml

from detzero_tpu.core.config import Config
from detzero_tpu.models.refining import (
    ConfidencePointNet, GeometryTransformer, PositionTransformer,
)
from detzero_tpu.models.refining.batched import BatchedRefiner
from detzero_tpu.pipeline.offboard import OffboardPipeline, _sampler_kwargs


def _rand_samples(rng, kind, n, qn=3, qp=16, mp=64, tn=8, tmp=4):
    out = []
    for _ in range(n):
        if kind == "grm":
            out.append({
                "query_pts": rng.randn(qn, qp, 11).astype(np.float32),
                "query_sizes": rng.rand(qn, 3).astype(np.float32) + 1,
                "memory_pts": rng.randn(mp, 11).astype(np.float32),
                "memory_mask": np.ones(mp, bool),
                "anchors": np.array([[4.4, 2, 1.5], [1, 1, 1.7], [2, 1, 1.7]],
                                    np.float32),
            })
        else:
            out.append({
                "query_pts": rng.randn(tn, qp, 32).astype(np.float32),
                "query_boxes": rng.randn(tn, 4).astype(np.float32),
                "memory_pts": rng.randn(tn, tmp, 32).astype(np.float32),
                "pad_mask": np.arange(tn) < tn - 2,
            })
    return out


@pytest.mark.parametrize("kind", ["grm", "prm", "crm"])
def test_batch_size_invariance(kind):
    rng = np.random.RandomState(0)
    if kind == "grm":
        model = GeometryTransformer(d_model=32)
        s = _rand_samples(rng, kind, 1)[0]
        params = model.init(jax.random.PRNGKey(0), s["query_pts"],
                            s["query_sizes"], s["memory_pts"],
                            s["memory_mask"])
    elif kind == "prm":
        model = PositionTransformer(d_model=32, mem_points=4)
        s = _rand_samples(rng, kind, 1)[0]
        params = model.init(jax.random.PRNGKey(0), s["query_pts"],
                            s["query_boxes"], s["memory_pts"], s["pad_mask"])
    else:
        model = ConfidencePointNet(d_model=32)
        s = _rand_samples(rng, kind, 1)[0]
        params = model.init(jax.random.PRNGKey(0), s["query_pts"],
                            s["pad_mask"])

    samples = _rand_samples(np.random.RandomState(1), kind, 7)
    r1 = BatchedRefiner(model, params, kind, batch_size=1).run(samples)
    r4 = BatchedRefiner(model, params, kind, batch_size=4).run(samples)
    for a, b in zip(r1, r4):
        for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_allclose(la, lb, rtol=2e-5, atol=2e-5)


def test_sampler_kwargs_accepts_full_config():
    cfg = Config({"DATASET": "WaymoGeometryDataset", "QUERY_NUM": 5,
                  "QUERY_POINTS": 64, "MEMORY_POINTS": 512,
                  "MODEL": {"NAME": "GeometryTransformer"}})
    kw = _sampler_kwargs(cfg, "grm")
    assert kw == {"query_num": 5, "query_points": 64, "memory_points": 512}
    kw2 = _sampler_kwargs({"query_num": 2, "query_points": 8,
                           "memory_points": 32}, "grm")
    assert kw2 == {"query_num": 2, "query_points": 8, "memory_points": 32}
    assert _sampler_kwargs(None, "prm")["query_num"] == 200


def test_run_offboard_load_refine_and_refine(tmp_path):
    """End-to-end: YAML cfg + orbax ckpt -> _load_refine triple -> a
    pipeline refine pass over object records (the exact path ADVICE r1
    found broken)."""
    from detzero_tpu.core.checkpoint import CheckpointManager
    from tools.run_offboard import _load_refine

    cfg_p = tmp_path / "grm.yaml"
    cfg_p.write_text(yaml.safe_dump({
        "CLASS_NAME": "Vehicle",
        "DATASET": "WaymoGeometryDataset",
        "QUERY_NUM": 2, "QUERY_POINTS": 16, "MEMORY_POINTS": 64,
        "MODEL": {"NAME": "GeometryTransformer", "D_MODEL": 32,
                  "N_HEADS": 2, "NUM_ANCHORS": 3, "NUM_DECODER_LAYERS": 1},
    }))
    model = GeometryTransformer(d_model=32, n_heads=2)
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((2, 16, 11), np.float32),
        np.zeros((2, 3), np.float32), np.zeros((64, 11), np.float32),
        np.ones(64, bool))
    mgr = CheckpointManager(tmp_path / "ckpt")
    mgr.save(1, {"params": variables["params"], "batch_stats": {}})

    triple = _load_refine(str(cfg_p), tmp_path / "ckpt")
    assert triple[2] == {"query_num": 2, "query_points": 16,
                         "memory_points": 64}

    rng = np.random.RandomState(0)
    recs = {}
    for oid in range(3):
        t = 4 + oid
        boxes = np.tile([5.0, 0, 0, 4.4, 2.0, 1.5, 0.1], (t, 1)).astype(
            np.float32)
        recs[oid] = {
            "boxes_global": boxes,
            "score": np.full(t, 0.9, np.float32),
            "pts": [rng.randn(20, 4).astype(np.float32) for _ in range(t)],
            "label": 0,
        }
    pipe = OffboardPipeline(grm=triple, refine_batch=2)
    grm_sizes, _, _, _ = pipe.refine(recs)
    assert set(grm_sizes) == {0, 1, 2}
    for s in grm_sizes.values():
        assert s.shape == (3,) and np.isfinite(s).all() and (s > 0).all()
