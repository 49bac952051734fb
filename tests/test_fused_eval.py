"""Fused eval-mode epilogue (DETZERO_FUSED_EVAL): the conv kernel applies
the folded BN affine + residual + ReLU + zmask itself.  Module-level parity
against the unfused path from SHARED params (CPU: the fused path runs the
kernel in interpret mode, the unfused path runs the XLA reference)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import detzero_tpu.models.detection.backbone3d_pallas as bp
from detzero_tpu.ops import pallas_pillar as ppk

NY, B, NZ, C = 8, 128, 8, 16


@pytest.fixture()
def data():
    # a CONTRACT-VALID rowpad structure (random nbr ranks would violate the
    # subm invariant the shift-tap selection relies on: within a row the
    # dx=+-1 neighbor is always the adjacent rank — build_rowpad_nbr
    # guarantees it, so the fixture must too)
    from detzero_tpu.ops import pillars

    rng = np.random.RandomState(0)
    nx = 256
    mp = 600
    cells = np.sort(rng.choice(NY * nx, mp, replace=False)).astype(np.int32)
    mask = np.ones(mp, bool)
    coords2d = np.stack([cells // nx, cells % nx], 1).astype(np.int32)
    slot, keep, rank_lut = pillars.rowpad_slots(
        jnp.asarray(cells), jnp.asarray(mask), (NY, nx), B)
    nbr = np.asarray(pillars.build_rowpad_nbr(
        jnp.asarray(coords2d), jnp.asarray(mask), slot, keep, rank_lut,
        (NY, nx), NY, B, B, mode="subm"))
    zmask_c = rng.rand(mp, NZ) < 0.7
    zmask = np.asarray(pillars.to_rowpad(
        jnp.asarray(zmask_c.astype(np.int8)), slot, keep, NY, B)) > 0
    z3 = zmask[:, :, None, :].repeat(C, 2).reshape(NY, NZ * C, B)
    x_c = rng.randn(mp, NZ * C).astype(np.float32)
    x = np.where(z3, np.asarray(pillars.to_rowpad(
        jnp.asarray(x_c), slot, keep, NY, B)), 0.0).astype(np.float32)
    res_c = rng.randn(mp, NZ * C).astype(np.float32)
    res = np.where(z3, np.asarray(pillars.to_rowpad(
        jnp.asarray(res_c), slot, keep, NY, B)), 0.0).astype(np.float32)
    return x, nbr, zmask, res


def _run(fused, x, nbr, zmask, res, variables=None):
    old = bp.USE_FUSED_EVAL
    bp.USE_FUSED_EVAL = fused
    try:
        mod = bp.SparseConvBNReLU(C, 27, use_running_average=True,
                                  act=False, use_pallas=fused)
        if variables is None:
            variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x),
                                 jnp.asarray(zmask), jnp.asarray(nbr),
                                 nz=NZ, residual=jnp.asarray(res),
                                 fuse_relu=True)
        out = mod.apply(variables, jnp.asarray(x), jnp.asarray(zmask),
                        jnp.asarray(nbr), nz=NZ,
                        residual=jnp.asarray(res), fuse_relu=True)
        return np.float32(out), variables
    finally:
        bp.USE_FUSED_EVAL = old


def test_fused_eval_epilogue_parity(data):
    x, nbr, zmask, res = data
    mod = bp.SparseConvBNReLU(C, 27, use_running_average=True, act=False,
                              use_pallas=False)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x),
                         jnp.asarray(zmask), jnp.asarray(nbr), nz=NZ,
                         residual=jnp.asarray(res), fuse_relu=True)
    # nontrivial running stats so the affine fold is exercised
    rng = np.random.RandomState(1)
    variables = jax.tree_util.tree_map(lambda a: a, variables)
    stats = variables["batch_stats"]["MaskedBatchNorm_0"]
    stats["mean"] = jnp.asarray(rng.randn(C).astype(np.float32) * 0.3)
    stats["var"] = jnp.asarray(rng.rand(C).astype(np.float32) + 0.5)
    ref, _ = _run(False, x, nbr, zmask, res, variables)
    fused, _ = _run(True, x, nbr, zmask, res, variables)
    scale = max(np.abs(ref).max(), 1e-3)
    assert np.abs(ref - fused).max() < 0.02 * scale
    # zmask honored
    z3 = zmask[:, :, None, :].repeat(C, 2).reshape(NY, NZ * C, B)
    assert np.abs(fused[~z3]).max() == 0.0
