"""Pillar (z-dense) backend vs the sorted-table backend.

The two backbone implementations deliberately share param-tree structure
(backbone3d_pillar.py docstring), so the strongest oracle is: identical
params => identical outputs, through the full model. Plus op-level checks
for the pillar table builder, the scatter-free bev_gather VJP, and the
union-site downsample semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from detzero_tpu.core.config import Config
from detzero_tpu.models.detection.centerpoint import CenterPoint
from detzero_tpu.ops import pillars
from detzero_tpu.ops.voxelize import dynamic_voxelize, INVALID_ID

GRID = (8, 32, 32)  # nz, ny, nx
VS = (0.4, 0.4, 0.5)
RANGE = (-6.4, -6.4, -2.0, 6.4, 6.4, 2.0)


def _cloud(n=600, seed=0):
    rng = np.random.RandomState(seed)
    pts = rng.uniform(-6.3, 6.3, (n, 5)).astype(np.float32)
    pts[:, 2] = rng.uniform(-1.9, 1.9, n)
    # cluster some points so pillars hold multiple z voxels
    pts[: n // 3, :2] = rng.uniform(-2, 2, (n // 3, 2))
    valid = rng.rand(n) > 0.05
    return pts, valid


def _model(backend, second_stage=False, seed=0):
    cfg = Config({
        "WITH_VELOCITY": True, "WITH_IOU": True,
        "CLASS_IDS_EACH_HEAD": [[0], [1, 2]],
        "VOXEL_CAPACITIES": (1024, 512, 256, 128),
        "BACKBONE3D": backend,
        "SECOND_STAGE": second_stage,
        "ROI_BUDGET": 16,
        "ROI_GRID_SIZE": 3,
    })
    return CenterPoint(cfg, 3, pc_range=RANGE, voxel_size=VS,
                       max_voxels=1024, max_points=600, max_objs=8,
                       dtype=jnp.float32)


def test_pillar_table_matches_voxelize():
    pts, valid = _cloud()
    tab = pillars.build_pillar_table(jnp.asarray(pts), jnp.asarray(valid),
                                     GRID, VS, RANGE, 512)
    ref = dynamic_voxelize(jnp.asarray(pts), jnp.asarray(valid), GRID, VS,
                           RANGE, 1024)
    nz, ny, nx = GRID
    # collect (z, y, x) -> mean feature from both structures
    got = {}
    zm = np.asarray(tab["zmask"])
    cells = np.asarray(tab["cells"])
    feats = np.asarray(tab["feats"])
    for p in range(512):
        if not tab["mask"][p]:
            continue
        y, x = divmod(int(cells[p]), nx)
        for z in range(nz):
            if zm[p, z]:
                got[(z, y, x)] = feats[p, z]
    want = {}
    for v in range(int(ref["num_voxels"])):
        z, y, x = np.asarray(ref["voxel_coords"])[v]
        want[(int(z), int(y), int(x))] = np.asarray(ref["voxel_features"])[v]
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-5, atol=1e-5)


def test_bev_gather_vjp_matches_autodiff():
    rng = np.random.RandomState(1)
    pts, valid = _cloud(300, seed=2)
    tab = pillars.build_pillar_table(jnp.asarray(pts), jnp.asarray(valid),
                                     GRID, VS, RANGE, 256)
    lut = pillars.build_row_lut(tab["cells"], tab["mask"], GRID[1:])
    idx, found = pillars.build_subm_neighbors(lut, tab["coords2d"],
                                              tab["mask"], GRID[1:])
    feats = jnp.asarray(rng.randn(256, GRID[0], 4).astype(np.float32))
    idx_t, found_t = idx[:, ::-1], found[:, ::-1]

    def with_vjp(f):
        return (pillars.bev_gather(f, idx, found, idx_t, found_t) ** 2).sum()

    def reference(f):
        parts = []
        for j in range(9):
            g = f[idx[:, j]]
            parts.append(jnp.where(found[:, j][:, None, None], g, 0))
        return (jnp.concatenate(parts, -1) ** 2).sum()

    v1, g1 = jax.value_and_grad(with_vjp)(feats)
    v2, g2 = jax.value_and_grad(reference)(feats)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("site_mode", ["principal", "union"])
def test_downsample_sites_match_sparse(site_mode):
    from detzero_tpu.ops import sparse

    pts, valid = _cloud(seed=3)
    tab = pillars.build_pillar_table(jnp.asarray(pts), jnp.asarray(valid),
                                     GRID, VS, RANGE, 512)
    ref = dynamic_voxelize(jnp.asarray(pts), jnp.asarray(valid), GRID, VS,
                           RANGE, 1024)
    out = pillars.downsample_pillars(tab, GRID[1:], GRID[0], 512,
                                     site_mode=site_mode)
    oids, _, omask, *_ = sparse.build_downsample(
        ref["voxel_ids"], ref["voxel_coords"], ref["voxel_mask"], GRID,
        (2, 2, 2), (3, 3, 3), 1024, site_mode=site_mode)
    onz, ony, onx = -(-GRID[0] // 2), -(-GRID[1] // 2), -(-GRID[2] // 2)
    want = set()
    for v in range(1024):
        if omask[v]:
            i = int(oids[v])
            z = i // (ony * onx)
            rem = i - z * ony * onx
            want.add((z, rem // onx, rem % onx))
    got = set()
    zm = np.asarray(out["zmask"])
    for p in range(512):
        if out["mask"][p]:
            y, x = divmod(int(out["cells"][p]), onx)
            for z in range(onz):
                if zm[p, z]:
                    got.add((z, y, x))
    assert got == want


def test_downsample_lutfree_parity():
    """LUT-free principal downsample (sorted run-OR payload, in_lut=None)
    is bit-identical to the dense-LUT route across every output field,
    including at/over the capacity cliff."""
    pts, valid = _cloud(seed=11)
    tab = pillars.build_pillar_table(jnp.asarray(pts), jnp.asarray(valid),
                                     GRID, VS, RANGE, 512)
    lut = pillars.build_row_lut(tab["cells"], tab["mask"],
                                (GRID[1], GRID[2]))
    for cap in (512, 17, 4):  # roomy, tight, overflowing
        free = pillars.downsample_pillars(tab, GRID[1:], GRID[0], cap)
        ref = pillars.downsample_pillars(tab, GRID[1:], GRID[0], cap,
                                         in_lut=lut)
        for k in ("cells", "coords2d", "mask", "num_pillars", "zmask"):
            np.testing.assert_array_equal(np.asarray(free[k]),
                                          np.asarray(ref[k]), err_msg=k)


def _parity_inputs(b=2, n=400):
    rng = np.random.RandomState(7)
    pts = rng.uniform(-6.3, 6.3, (b, n, 5)).astype(np.float32)
    pts[..., 2] = rng.uniform(-1.9, 1.9, (b, n))
    pv = rng.rand(b, n) > 0.05
    gb = np.zeros((b, 8, 9), np.float32)
    gb[:, 0, :7] = [1, 1, 0, 3.8, 1.8, 1.5, 0.4]
    gb[:, 1, :7] = [-2, 2, 0.2, 0.8, 0.8, 1.7, -0.8]
    gc = np.zeros((b, 8), np.int32)
    gc[:, 1] = 1
    gv = np.zeros((b, 8), bool)
    gv[:, :2] = True
    return pts, pv, gb, gc, gv


def test_backend_forward_parity():
    pts, pv, *_ = _parity_inputs()
    mp = _model("pillar")
    ms = _model("sorted")
    variables = mp.init(jax.random.PRNGKey(0), pts, pv)
    # identical param trees by construction — this assert IS the contract
    vs_sorted = ms.init(jax.random.PRNGKey(0), pts, pv)
    assert (jax.tree.structure(variables["params"])
            == jax.tree.structure(vs_sorted["params"]))
    preds_p, _, _ = mp.apply(variables, pts, pv, train=False,
                             mutable_stats=False)
    preds_s, _, _ = ms.apply(variables, pts, pv, train=False,
                             mutable_stats=False)
    for hp, hs in zip(preds_p, preds_s):
        for k in hp:
            np.testing.assert_allclose(
                np.asarray(hp[k]), np.asarray(hs[k]), rtol=2e-3, atol=2e-3,
                err_msg=f"head output {k}")


def test_backend_loss_and_grad_parity():
    pts, pv, gb, gc, gv = _parity_inputs()
    mp = _model("pillar")
    ms = _model("sorted")
    variables = mp.init(jax.random.PRNGKey(0), pts, pv)

    def loss_of(model):
        def f(p):
            l, _ = model.loss({"params": p,
                               "batch_stats": variables["batch_stats"]},
                              pts, pv, gb, gc, gv)
            return l
        return f

    lp, gp = jax.value_and_grad(loss_of(mp))(variables["params"])
    ls, gs = jax.value_and_grad(loss_of(ms))(variables["params"])
    np.testing.assert_allclose(float(lp), float(ls), rtol=1e-4, atol=1e-4)
    flat_p = jax.tree.leaves(gp)
    flat_s = jax.tree.leaves(gs)
    for a, b in zip(flat_p, flat_s):
        # f32 accumulation order differs (z-conv1d vs 27 gathered matmuls);
        # tolerance is relative to the leaf's gradient scale
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a / scale, b / scale, rtol=2e-3, atol=2e-3)


def test_second_stage_parity():
    pts, pv, *_ = _parity_inputs()
    mp = _model("pillar", second_stage=True)
    ms = _model("sorted", second_stage=True)
    variables = mp.init(jax.random.PRNGKey(0), pts, pv)
    out_p = mp.predict(variables, pts, pv)
    out_s = ms.predict(variables, pts, pv)
    np.testing.assert_allclose(np.asarray(out_p["boxes"]),
                               np.asarray(out_s["boxes"]),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_p["scores"]),
                               np.asarray(out_s["scores"]),
                               rtol=2e-3, atol=2e-3)


def test_densify_pillars_matches_dense():
    pts, valid = _cloud(seed=5)
    tab = pillars.build_pillar_table(jnp.asarray(pts), jnp.asarray(valid),
                                     GRID, VS, RANGE, 256)
    rng = np.random.RandomState(2)
    feats = jnp.asarray(rng.randn(256, 6).astype(np.float32))
    dense = np.asarray(pillars.densify_pillars(
        feats, tab["cells"], tab["mask"], GRID[1:]))
    nz, ny, nx = GRID
    want = np.zeros((ny, nx, 6), np.float32)
    for p in range(256):
        if tab["mask"][p]:
            y, x = divmod(int(tab["cells"][p]), nx)
            want[y, x] = np.asarray(feats)[p]
    np.testing.assert_allclose(dense, want, rtol=1e-6)

    # custom VJP (pure-gather backward) vs the hand oracle: the cotangent
    # of a live pillar is the dense-map cotangent at its cell
    co = jnp.asarray(rng.randn(ny, nx, 6).astype(np.float32))
    g = np.asarray(jax.grad(lambda f: jnp.vdot(pillars.densify_pillars(
        f, tab["cells"], tab["mask"], GRID[1:]), co))(feats))
    want_g = np.zeros((256, 6), np.float32)
    for p in range(256):
        if tab["mask"][p]:
            y, x = divmod(int(tab["cells"][p]), nx)
            want_g[p] = np.asarray(co)[y, x]
    np.testing.assert_allclose(g, want_g, rtol=1e-6)
