"""End-to-end CenterPoint: init/loss/grad/predict + short overfit run."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from detzero_tpu.core.config import Config
from detzero_tpu.models.detection.centerpoint import CenterPoint


@pytest.fixture(scope="module")
def tiny_model():
    cfg = Config({
        "WITH_VELOCITY": False, "WITH_IOU": True,
        "CLASS_IDS_EACH_HEAD": [[0], [1]],
        "VOXEL_CAPACITIES": (512, 256, 128, 64),
    })
    return CenterPoint(
        cfg, 2, pc_range=(-6.4, -6.4, -2.0, 6.4, 6.4, 2.0),
        voxel_size=(0.2, 0.2, 0.5), max_voxels=512, max_points=2048,
        max_objs=8, dtype=jnp.float32,
    )


@pytest.fixture(scope="module")
def tiny_batch():
    rng = np.random.RandomState(0)
    B, P = 2, 2048
    # points clustered around two "objects" + background
    obj = rng.normal(0, 0.5, (B, P // 2, 3)).astype(np.float32) + np.array([1.0, 1.0, 0.0], np.float32)
    bg = rng.uniform(-6, 6, (B, P - P // 2, 3)).astype(np.float32)
    bg[..., 2] *= 0.3
    xyz = np.concatenate([obj, bg], axis=1)
    inten = rng.rand(B, P, 2).astype(np.float32)
    pts = np.concatenate([xyz, inten], axis=-1)
    pv = np.ones((B, P), bool)
    gt_boxes = np.zeros((B, 8, 7), np.float32)
    gt_boxes[:, 0] = [1, 1, 0, 2, 1, 1, 0.3]
    gt_cls = np.zeros((B, 8), np.int32)
    gt_valid = np.zeros((B, 8), bool)
    gt_valid[:, 0] = True
    return pts, pv, gt_boxes, gt_cls, gt_valid


def test_forward_loss_grad_predict(tiny_model, tiny_batch):
    pts, pv, gb, gc, gv = tiny_batch
    variables = tiny_model.init(jax.random.PRNGKey(0), pts, pv)
    loss, (aux, updates) = jax.jit(tiny_model.loss)(variables, pts, pv, gb, gc, gv)
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert "batch_stats" in updates
    # running stats actually moved
    before = jax.tree.leaves(variables["batch_stats"])[0]
    after = jax.tree.leaves(updates["batch_stats"])[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))

    grads = jax.jit(jax.grad(lambda v, *a: tiny_model.loss(v, *a)[0]))(
        variables, pts, pv, gb, gc, gv
    )
    gnorm = float(
        jnp.sqrt(sum((g.astype(jnp.float32) ** 2).sum()
                     for g in jax.tree.leaves(grads["params"])))
    )
    assert np.isfinite(gnorm) and gnorm > 0

    pred = jax.jit(tiny_model.predict)(variables, pts, pv)
    assert pred["boxes"].shape == (2, 256, 7)
    assert pred["scores"].shape == (2, 256)


def test_overfit_loss_decreases(tiny_model, tiny_batch):
    pts, pv, gb, gc, gv = tiny_batch
    variables = tiny_model.init(jax.random.PRNGKey(1), pts, pv)
    params, stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(3e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, stats, opt_state):
        def lfn(p):
            loss, (aux, updates) = tiny_model.loss(
                {"params": p, "batch_stats": stats}, pts, pv, gb, gc, gv
            )
            return loss, updates

        (loss, updates), grads = jax.value_and_grad(lfn, has_aux=True)(params)
        upd, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), updates["batch_stats"], opt_state2, loss

    losses = []
    for _ in range(12):
        params, stats, opt_state, loss = step(params, stats, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, f"no convergence: {losses}"
