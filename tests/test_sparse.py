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


def test_downsample_union_sites_match_spconv_semantics():
    """site_mode='union' must yield exactly the positions whose gather
    window touches an input voxel (spconv SparseConv3d stride 2 pad 1)."""
    rng = np.random.RandomState(5)
    pts = rng.uniform(-0.9, 0.9, (120, 3)).astype(np.float32)
    pts[:, 2] *= 0.4
    t = _table(pts, max_voxels=256)
    out = sparse.build_downsample(
        t["voxel_ids"], t["voxel_coords"], t["voxel_mask"], GRID,
        (2, 2, 2), (3, 3, 3), out_capacity=256, site_mode="union",
    )
    out_ids, out_coords, out_mask, idx, found, out_grid = out
    out_ids, out_mask = np.asarray(out_ids), np.asarray(out_mask)
    got = set(out_ids[out_mask].tolist())

    # oracle: dense occupancy, window test at every output position
    occ = np.zeros(GRID, bool)
    in_coords = np.asarray(t["voxel_coords"])[np.asarray(t["voxel_mask"])]
    occ[tuple(in_coords.T)] = True
    onz, ony, onx = out_grid
    want = set()
    for oz in range(onz):
        for oy in range(ony):
            for ox in range(onx):
                base = np.array([oz, oy, ox]) * 2
                for off in sparse.kernel_offsets_zyx((3, 3, 3)):
                    u = base + off
                    if (u >= 0).all() and (u < GRID).all() and occ[tuple(u)]:
                        want.add((oz * ony + oy) * onx + ox)
                        break
    assert got == want
    # union is a superset of principal
    p_ids, _, p_mask, *_ = sparse.build_downsample(
        t["voxel_ids"], t["voxel_coords"], t["voxel_mask"], GRID,
        (2, 2, 2), (3, 3, 3), out_capacity=256, site_mode="principal",
    )
    p = set(np.asarray(p_ids)[np.asarray(p_mask)].tolist())
    assert p <= got


def test_downsample_union_conv_matches_dense_oracle():
    """Strided sparse conv on union sites == dense conv3d (stride 2, pad 1)
    evaluated at the occupied outputs."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(6)
    pts = rng.uniform(-0.9, 0.9, (60, 3)).astype(np.float32)
    pts[:, 2] *= 0.4
    t = _table(pts, max_voxels=128)
    cin, cout = 3, 4
    feats = rng.randn(128, cin).astype(np.float32)
    feats[~np.asarray(t["voxel_mask"])] = 0.0
    w = rng.randn(27, cin, cout).astype(np.float32) * 0.1

    out_ids, out_coords, out_mask, idx, found, out_grid = sparse.build_downsample(
        t["voxel_ids"], t["voxel_coords"], t["voxel_mask"], GRID,
        (2, 2, 2), (3, 3, 3), out_capacity=128, site_mode="union",
    )
    got = np.asarray(sparse.sparse_conv_apply(feats, idx, found, w))

    # dense oracle
    dense = np.zeros(GRID + (cin,), np.float32)
    in_coords = np.asarray(t["voxel_coords"])
    in_mask = np.asarray(t["voxel_mask"])
    dense[tuple(in_coords[in_mask].T)] = feats[in_mask]
    x = jnp.asarray(dense)[None]  # (1, Z, Y, X, C)
    wd = jnp.asarray(w.reshape(3, 3, 3, cin, cout))
    y = jax.lax.conv_general_dilated(
        x, wd, window_strides=(2, 2, 2), padding=((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    y = np.asarray(y)[0]
    om = np.asarray(out_mask)
    oc = np.asarray(out_coords)[om]
    np.testing.assert_allclose(got[om], y[tuple(oc.T)], atol=1e-4)


def test_downsample_union_capacity_overflow_masks():
    """More union sites than capacity: mask stays consistent, no crash."""
    rng = np.random.RandomState(7)
    pts = rng.uniform(-0.9, 0.9, (200, 3)).astype(np.float32)
    pts[:, 2] *= 0.4
    t = _table(pts, max_voxels=256)
    out_ids, out_coords, out_mask, idx, found, _ = sparse.build_downsample(
        t["voxel_ids"], t["voxel_coords"], t["voxel_mask"], GRID,
        (2, 2, 2), (3, 3, 3), out_capacity=8, site_mode="union",
    )
    out_ids, out_mask, found = map(np.asarray, (out_ids, out_mask, found))
    assert out_mask.sum() == 8  # clipped to capacity
    assert (np.diff(out_ids[out_mask]) > 0).all()
    assert not found[~out_mask].any()


def test_custom_vjp_matches_autodiff_union_sites():
    """Transpose-rulebook backward stays exact when the output set is the
    spconv candidate union (out sites with no principal input voxel)."""
    import jax

    rng = np.random.RandomState(8)
    pts = rng.uniform(-0.9, 0.9, (150, 3)).astype(np.float32)
    pts[:, 2] *= 0.4
    t = _table(pts, max_voxels=128)
    feats = rng.randn(128, 8).astype(np.float32)
    w = rng.randn(27, 8, 16).astype(np.float32) * 0.1
    g_out = rng.randn(128, 16).astype(np.float32)

    out_ids, out_coords, out_mask, idx, found, out_grid = sparse.build_downsample(
        t["voxel_ids"], t["voxel_coords"], t["voxel_mask"], GRID,
        (2, 2, 2), (3, 3, 3), out_capacity=128, site_mode="union",
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
