import numpy as np

from detzero_tpu.ops import voxelize


VS = (0.5, 0.5, 0.5)
PCR = (-2.0, -2.0, -2.0, 2.0, 2.0, 2.0)
GRID = (8, 8, 8)  # zyx


def _voxelize(points, valid=None, max_voxels=32):
    points = np.asarray(points, np.float32)
    if valid is None:
        valid = np.ones(len(points), bool)
    return voxelize.dynamic_voxelize(points, np.asarray(valid), GRID, VS, PCR, max_voxels)


def test_mean_and_dedup():
    pts = np.array([
        [0.1, 0.1, 0.1, 1.0],
        [0.2, 0.2, 0.2, 3.0],   # same voxel as above
        [-1.9, -1.9, -1.9, 5.0],
    ], np.float32)
    out = _voxelize(pts)
    assert int(out["num_voxels"]) == 2
    feats = np.asarray(out["voxel_features"])
    mask = np.asarray(out["voxel_mask"])
    assert mask.sum() == 2
    # voxel ids sorted ascending -> corner voxel (id 0) first
    np.testing.assert_allclose(feats[0], pts[2], atol=1e-6)
    np.testing.assert_allclose(feats[1], pts[:2].mean(0), atol=1e-6)


def test_out_of_range_and_invalid_dropped():
    pts = np.array([
        [10.0, 0.0, 0.0, 1.0],   # out of range
        [0.1, 0.1, 0.1, 1.0],    # valid
        [0.3, 0.3, 0.3, 9.0],    # same voxel but masked invalid
    ], np.float32)
    out = _voxelize(pts, valid=[True, True, False])
    assert int(out["num_voxels"]) == 1
    np.testing.assert_allclose(np.asarray(out["voxel_features"])[0], pts[1], atol=1e-6)
    pvi = np.asarray(out["point_voxel_idx"])
    assert pvi[0] == -1 and pvi[1] == 0 and pvi[2] == -1


def test_capacity_budget():
    rng = np.random.RandomState(0)
    pts = rng.uniform(-1.9, 1.9, (500, 3)).astype(np.float32)
    out = _voxelize(pts, max_voxels=16)
    assert int(out["num_voxels"]) == 16
    ids = np.asarray(out["voxel_ids"])[np.asarray(out["voxel_mask"])]
    assert (np.diff(ids) > 0).all(), "voxel table must be sorted/unique"


def test_coords_roundtrip():
    pts = np.array([[1.9, -1.9, 0.1, 0.0]], np.float32)
    out = _voxelize(pts)
    coords = np.asarray(out["voxel_coords"])[0]  # zyx
    # x=1.9 -> idx 7, y=-1.9 -> idx 0, z=0.1 -> idx 4
    assert coords.tolist() == [4, 0, 7]


def test_scatter_to_dense_bev():
    pts = np.array([[0.1, 0.1, 0.1, 2.0]], np.float32)
    out = _voxelize(pts)
    dense = np.array(
        voxelize.scatter_to_dense_bev(
            out["voxel_features"], out["voxel_coords"], out["voxel_mask"], GRID
        )
    )
    assert dense.shape == (8, 8, 8 * 4)
    # voxel (z=4, y=4, x=4): channel block 4*4..4*4+4
    np.testing.assert_allclose(dense[4, 4, 16:20], [0.1, 0.1, 0.1, 2.0], atol=1e-6)
    assert np.abs(dense).sum() > 0
    dense[4, 4, 16:20] = 0
    assert np.abs(dense).sum() < 1e-6
