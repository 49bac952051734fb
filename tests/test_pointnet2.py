import numpy as np
import jax.numpy as jnp

from detzero_tpu.ops import pointnet2 as pn2
from detzero_tpu.ops import voxelize


def test_fps_spreads_points():
    pts = np.zeros((100, 3), np.float32)
    pts[:50, 0] = np.linspace(0, 10, 50)
    pts[50:, 1] = np.linspace(0, 10, 50)
    valid = np.ones(100, bool)
    idx = np.asarray(pn2.farthest_point_sampling(pts, valid, 4))
    sel = pts[idx]
    # the 4 samples must cover the extremes of both arms
    assert sel[:, 0].max() > 8 and sel[:, 1].max() > 8
    assert len(set(idx.tolist())) == 4


def test_fps_respects_mask():
    pts = np.random.RandomState(0).randn(50, 3).astype(np.float32)
    pts[25:] += 100  # far cluster is invalid
    valid = np.zeros(50, bool)
    valid[:25] = True
    idx = np.asarray(pn2.farthest_point_sampling(pts, valid, 8))
    assert (idx < 25).all()


def test_ball_query_first_in_order():
    centers = np.array([[0, 0, 0]], np.float32)
    pts = np.array([[0.1, 0, 0], [5, 5, 5], [0, 0.1, 0], [0.05, 0.05, 0]],
                   np.float32)
    idx, cnt = pn2.ball_query(centers, pts, np.ones(4, bool), 1.0, 2)
    idx, cnt = np.asarray(idx), np.asarray(cnt)
    assert cnt[0] == 2
    assert idx[0].tolist() == [0, 2]  # first two in index order within radius


def test_ball_query_empty_row():
    centers = np.array([[100, 100, 100]], np.float32)
    pts = np.random.RandomState(0).randn(10, 3).astype(np.float32)
    idx, cnt = pn2.ball_query(centers, pts, np.ones(10, bool), 0.5, 4)
    assert int(np.asarray(cnt)[0]) == 0


def test_voxel_query_hits_table():
    GRID = (4, 8, 8)
    pts = np.array([[0.05, 0.05, 0.05], [0.3, 0.05, 0.05]], np.float32)
    t = voxelize.dynamic_voxelize(pts, np.ones(2, bool), GRID,
                                  (0.25, 0.25, 0.25), (-1, -1, -0.5, 1, 1, 0.5), 8)
    q = np.asarray(t["voxel_coords"])[:1]  # query at the first voxel
    idx, found = pn2.voxel_query(jnp.asarray(q), t["voxel_ids"], GRID,
                                 max_range=1, nsample=8)
    idx, found = np.asarray(idx), np.asarray(found)
    assert found[0].sum() == 2  # itself + the x-neighbor
    hit_rows = set(idx[0][found[0]].tolist())
    assert hit_rows == {0, 1}


def test_three_interpolate_exact_at_point():
    pts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [3, 3, 3]], np.float32)
    feats = np.eye(4, dtype=np.float32)
    q = np.array([[0, 0, 0]], np.float32)
    dist, idx = pn2.three_nn(q, pts, np.ones(4, bool))
    out = np.asarray(pn2.three_interpolate(feats, idx, dist))
    assert out[0, 0] > 0.99  # dominated by the coincident point


def test_group_points_zeroes_missing():
    feats = np.arange(12, dtype=np.float32).reshape(4, 3)
    idx = np.array([[0, 2]], np.int32)
    found = np.array([[True, False]])
    g = np.asarray(pn2.group_points(feats, idx, found))
    np.testing.assert_allclose(g[0, 0], feats[0])
    np.testing.assert_allclose(g[0, 1], 0)


def test_vector_pool_matches_numpy_oracle():
    from detzero_tpu.ops.pointnet2 import vector_pool

    rng = np.random.RandomState(0)
    centers = rng.uniform(-1, 1, (4, 3)).astype(np.float32)
    points = rng.uniform(-2, 2, (64, 3)).astype(np.float32)
    valid = np.ones(64, bool)
    valid[50:] = False
    feats = rng.randn(64, 5).astype(np.float32)
    radius, grid, nsample = 0.8, (2, 2, 2), 48

    pooled, counts = vector_pool(centers, points, valid, feats, radius,
                                 grid, nsample)
    pooled, counts = np.asarray(pooled), np.asarray(counts)
    assert pooled.shape == (4, 8, 8) and counts.shape == (4, 8)

    gx = gy = gz = 2
    for m in range(4):
        rel = points - centers[m]
        hit = (np.sum(rel ** 2, 1) < radius ** 2) & valid
        order = np.flatnonzero(hit)[:nsample]  # first-nsample semantics
        want_cnt = np.zeros(8)
        want_xyz = np.zeros((8, 3))
        want_f = np.zeros((8, 5))
        for i in order:
            c = np.floor((rel[i] + radius) / (2 * radius) *
                         np.array([gx, gy, gz])).astype(int)
            c = np.clip(c, 0, [gx - 1, gy - 1, gz - 1])
            cid = (c[2] * gy + c[1]) * gx + c[0]
            want_cnt[cid] += 1
            want_xyz[cid] += rel[i]
            want_f[cid] += feats[i]
        nz = want_cnt > 0
        want_xyz[nz] /= want_cnt[nz, None]
        want_f[nz] /= want_cnt[nz, None]
        np.testing.assert_array_equal(counts[m], want_cnt)
        np.testing.assert_allclose(pooled[m, :, :3], want_xyz, atol=1e-5)
        np.testing.assert_allclose(pooled[m, :, 3:], want_f, atol=1e-5)


def test_vector_pool_all_invalid_points():
    from detzero_tpu.ops.pointnet2 import vector_pool

    rng = np.random.RandomState(1)
    centers = rng.uniform(-1, 1, (2, 3)).astype(np.float32)
    points = rng.uniform(-1, 1, (16, 3)).astype(np.float32)
    feats = rng.randn(16, 4).astype(np.float32)
    pooled, counts = vector_pool(centers, points, np.zeros(16, bool), feats,
                                 0.5, (2, 2, 2), 8)
    assert np.asarray(counts).sum() == 0
    assert np.isfinite(np.asarray(pooled)).all()
