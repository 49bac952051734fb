import os

import numpy as np
import pytest

from detzero_tpu.core.profiling import StageTimer, annotate, trace


def test_stage_timer_accumulates_and_reports():
    import time

    t = StageTimer()
    with t("a"):
        time.sleep(0.01)
    with t("a"):
        time.sleep(0.01)
    with t("b"):
        pass
    d = t.as_dict()
    assert d["a"]["calls"] == 2 and d["a"]["total_s"] >= 0.02
    rep = t.report()
    assert "a" in rep and "b" in rep and "share" in rep
    # exception inside the block still records the time
    with pytest.raises(ValueError):
        with t("c"):
            raise ValueError
    assert t.as_dict()["c"]["calls"] == 1


def test_timer_block_attributes_device_work():
    import jax
    import jax.numpy as jnp

    t = StageTimer()
    x = jnp.ones((256, 256))
    out = t.block("matmul", jax.jit(lambda a: a @ a)(x))
    assert np.isfinite(np.asarray(out)).all()
    assert t.as_dict()["matmul"]["calls"] == 1


def test_trace_writes_xplane(tmp_path):
    import jax
    import jax.numpy as jnp

    logdir = tmp_path / "trace"
    with trace(logdir):
        with annotate("step", step_num=0):
            jax.jit(lambda a: a * 2)(jnp.ones(8)).block_until_ready()
    files = list(logdir.rglob("*.xplane.pb"))
    assert files, "no xplane trace written"
    # falsy logdir is a no-op
    with trace(None):
        pass


def test_offboard_pipeline_reports_timings():
    from detzero_tpu.pipeline.offboard import OffboardPipeline

    pipe = OffboardPipeline()
    rng = np.random.RandomState(0)
    frames, pts, poses = [], [], []
    box = np.array([5.0, 2.0, 0.0, 4.5, 2.0, 1.6, 0.1])
    for f in range(4):
        b = box.copy()
        b[0] += f * 0.5
        frames.append({"boxes": b[None], "scores": np.array([0.9]),
                       "labels": np.array([0]), "pose": np.eye(4)})
        pts.append(np.concatenate(
            [b[None, :3] + rng.uniform(-1, 1, (32, 3)),
             rng.rand(32, 1)], axis=1).astype(np.float32))
        poses.append(np.eye(4))
    out = pipe.run_sequence(frames, pts, poses)
    assert set(out["timings"]) == {"track", "prepare_objects", "refine",
                                   "combine"}
    assert all(v["calls"] == 1 for v in out["timings"].values())
