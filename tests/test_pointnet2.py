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
