import numpy as np

from detzero_tpu.ops import sparse, voxelize


GRID = (4, 8, 8)  # zyx
VS = (0.25, 0.25, 0.25)
PCR = (-1.0, -1.0, -0.5, 1.0, 1.0, 0.5)


def _table(points, max_voxels=64):
    pts = np.asarray(points, np.float32)
    return voxelize.dynamic_voxelize(
        pts, np.ones(len(pts), bool), GRID, VS, PCR, max_voxels
    )


def test_submanifold_index_finds_neighbors():
    # two voxels adjacent in x
    pts = np.array([[0.05, 0.05, 0.05], [0.3, 0.05, 0.05]], np.float32)
    t = _table(pts)
    idx, found = sparse.build_submanifold_index(
        t["voxel_ids"], t["voxel_coords"], t["voxel_mask"], GRID, (3, 3, 3)
    )
    idx, found = np.asarray(idx), np.asarray(found)
    assert found[0].sum() == 2 and found[1].sum() == 2  # self + one neighbor
    k_center = 13  # (0,0,0) offset in 3x3x3
    assert idx[0, k_center] == 0 and idx[1, k_center] == 1
    # offset (0,0,+1) = k 14 of voxel 0 must be voxel 1
    assert found[0, 14] and idx[0, 14] == 1


def test_submanifold_conv_identity_kernel():
    rng = np.random.RandomState(1)
    pts = rng.uniform(-0.9, 0.9, (100, 3)).astype(np.float32)
    pts[:, 2] *= 0.4
    t = _table(pts, max_voxels=128)
    idx, found = sparse.build_submanifold_index(
        t["voxel_ids"], t["voxel_coords"], t["voxel_mask"], GRID, (3, 3, 3)
    )
    cin, cout = 4, 4
    feats = rng.randn(128, cin).astype(np.float32)
    w = np.zeros((27, cin, cout), np.float32)
    w[13] = np.eye(cin)  # identity at the center tap
    out = np.asarray(sparse.sparse_conv_apply(feats, idx, found, w))
    mask = np.asarray(t["voxel_mask"])
    np.testing.assert_allclose(out[mask], feats[mask], atol=1e-5)


def test_submanifold_conv_sums_neighbors():
    pts = np.array([[0.05, 0.05, 0.05], [0.3, 0.05, 0.05]], np.float32)
    t = _table(pts, max_voxels=8)
    idx, found = sparse.build_submanifold_index(
        t["voxel_ids"], t["voxel_coords"], t["voxel_mask"], GRID, (3, 3, 3)
    )
    feats = np.zeros((8, 1), np.float32)
    feats[0] = 1.0
    feats[1] = 10.0
    w = np.ones((27, 1, 1), np.float32)  # sum over window
    out = np.asarray(sparse.sparse_conv_apply(feats, idx, found, w))
    assert out[0, 0] == 11.0 and out[1, 0] == 11.0


def test_downsample_unique_sites():
    rng = np.random.RandomState(2)
    pts = rng.uniform(-0.9, 0.9, (200, 3)).astype(np.float32)
    pts[:, 2] *= 0.4
    t = _table(pts, max_voxels=256)
    out_ids, out_coords, out_mask, idx, found, out_grid = sparse.build_downsample(
        t["voxel_ids"], t["voxel_coords"], t["voxel_mask"], GRID,
        (2, 2, 2), (3, 3, 3), out_capacity=128,
    )
    out_ids, out_coords, out_mask = map(np.asarray, (out_ids, out_coords, out_mask))
    assert out_grid == (2, 4, 4)
    ids = out_ids[out_mask]
    assert (np.diff(ids) > 0).all()
    # every input voxel's principal site must exist in the output set
    in_coords = np.asarray(t["voxel_coords"])[np.asarray(t["voxel_mask"])]
    want = np.unique(
        (in_coords // 2 * [out_grid[1] * out_grid[2], out_grid[2], 1]).sum(1)
    )
    assert set(want.tolist()) == set(ids.tolist())
    # gather: center tap of each output site points at an existing input voxel
    found = np.asarray(found)
    assert found[out_mask].any(axis=1).all()


def test_downsample_conv_pools_features():
    # 2 input voxels mapping to the same output site
    pts = np.array([[0.05, 0.05, 0.05], [0.3, 0.05, 0.05]], np.float32)
    t = _table(pts, max_voxels=8)
    out_ids, out_coords, out_mask, idx, found, out_grid = sparse.build_downsample(
        t["voxel_ids"], t["voxel_coords"], t["voxel_mask"], GRID,
        (2, 2, 2), (3, 3, 3), out_capacity=4,
    )
    feats = np.zeros((8, 1), np.float32)
    feats[0], feats[1] = 1.0, 10.0
    w = np.ones((27, 1, 1), np.float32)
    out = np.asarray(sparse.sparse_conv_apply(feats, idx, found, w))
    out_mask = np.asarray(out_mask)
    assert out_mask.sum() >= 1
    assert out[np.where(out_mask)[0][0], 0] == 11.0


def test_custom_vjp_matches_autodiff():
    """sparse_conv_apply_vjp (transpose-map backward) must produce the same
    gradients as plain autodiff of sparse_conv_apply."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(3)
    pts = rng.uniform(-0.9, 0.9, (150, 3)).astype(np.float32)
    pts[:, 2] *= 0.4
    t = _table(pts, max_voxels=128)
    feats = rng.randn(128, 8).astype(np.float32)
    w = rng.randn(27, 8, 16).astype(np.float32) * 0.1
    g_out = rng.randn(64, 16).astype(np.float32)

    # strided downsample conv (the hard case: in/out tables differ)
    out_ids, out_coords, out_mask, idx, found, out_grid = sparse.build_downsample(
        t["voxel_ids"], t["voxel_coords"], t["voxel_mask"], GRID,
        (2, 2, 2), (3, 3, 3), out_capacity=64,
    )
    idx_t, found_t = sparse.build_transpose_index(
        out_ids, t["voxel_coords"], t["voxel_mask"], (2, 2, 2), (3, 3, 3),
        out_grid,
    )

    def f_ref(feats, w):
        return (sparse.sparse_conv_apply(feats, idx, found, w) * g_out).sum()

    def f_vjp(feats, w):
        return (sparse.sparse_conv_apply_vjp(feats, w, idx, found, idx_t,
                                             found_t) * g_out).sum()

    gx_ref, gw_ref = jax.grad(f_ref, argnums=(0, 1))(feats, w)
    gx_new, gw_new = jax.grad(f_vjp, argnums=(0, 1))(feats, w)
    np.testing.assert_allclose(np.asarray(gx_new), np.asarray(gx_ref),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gw_new), np.asarray(gw_ref),
                               atol=1e-3, rtol=1e-3)

    # submanifold case (stride 1, same table)
    sidx, sfound = sparse.build_submanifold_index(
        t["voxel_ids"], t["voxel_coords"], t["voxel_mask"], GRID, (3, 3, 3))
    sidx_t, sfound_t = sparse.build_transpose_index(
        t["voxel_ids"], t["voxel_coords"], t["voxel_mask"], (1, 1, 1),
        (3, 3, 3), GRID)
    w2 = rng.randn(27, 8, 8).astype(np.float32) * 0.1
    g2 = rng.randn(128, 8).astype(np.float32)

    def f2_ref(feats, w):
        return (sparse.sparse_conv_apply(feats, sidx, sfound, w) * g2).sum()

    def f2_vjp(feats, w):
        return (sparse.sparse_conv_apply_vjp(feats, w, sidx, sfound, sidx_t,
                                             sfound_t) * g2).sum()

    gx_ref, gw_ref = jax.grad(f2_ref, argnums=(0, 1))(feats, w2)
    gx_new, gw_new = jax.grad(f2_vjp, argnums=(0, 1))(feats, w2)
    np.testing.assert_allclose(np.asarray(gx_new), np.asarray(gx_ref),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gw_new), np.asarray(gw_ref),
                               atol=1e-3, rtol=1e-3)
