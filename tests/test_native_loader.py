"""Native C++ loader vs the Python merge_sweeps reference."""

import numpy as np
import pytest

from detzero_tpu import native
from detzero_tpu.data.dataset import merge_sweeps

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="g++ toolchain unavailable")


def _write_frame(tmp_path, name, rng, n=200):
    pts = np.zeros((n, 6), np.float32)
    pts[:, :3] = rng.uniform(-10, 10, (n, 3))
    pts[:, 3] = rng.rand(n) * 3          # intensity
    pts[:, 4] = rng.rand(n)              # elongation
    pts[:, 5] = np.where(rng.rand(n) < 0.1, 3.0, -1.0)  # some NLZ points
    p = tmp_path / name
    np.save(p, pts)
    return p, pts


def test_matches_python_merge(tmp_path):
    rng = np.random.RandomState(0)
    p_cur, cur = _write_frame(tmp_path, "cur.npy", rng)
    p_swp, swp = _write_frame(tmp_path, "swp.npy", rng)
    pose_c = np.eye(4, dtype=np.float32)
    pose_s = np.eye(4, dtype=np.float32)
    pose_s[0, 3] = 2.0
    rel_c = np.eye(4, dtype=np.float32)
    rel_s = np.linalg.inv(pose_c) @ pose_s

    out, n = native.load_merged_sample(
        [p_cur, p_swp], [rel_c, rel_s], [0.0, -0.1], out_stride=6, budget=1024)
    want = merge_sweeps(cur, pose_c, [swp], [pose_s], [-0.1])
    assert n == len(want)
    got = out[:n]
    # native preserves per-file order; python concatenates the same way
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert (out[n:] == 0).all()


def test_budget_truncation(tmp_path):
    rng = np.random.RandomState(1)
    p, _ = _write_frame(tmp_path, "f.npy", rng, n=500)
    out, n = native.load_merged_sample(
        [p], [np.eye(4)], [0.0], out_stride=6, budget=64)
    assert n == 64


def test_batch_parallel(tmp_path):
    rng = np.random.RandomState(2)
    paths, all_pts = [], []
    for i in range(6):
        p, pts = _write_frame(tmp_path, f"b{i}.npy", rng)
        paths.append([p])
        all_pts.append(pts)
    eye = np.eye(4, dtype=np.float32)
    out, mask = native.load_batch(
        paths, [[eye]] * 6, [[0.0]] * 6, out_stride=6, budget=512, n_threads=4)
    assert out.shape == (6, 512, 6)
    for i in range(6):
        keep = all_pts[i][:, 5] == -1
        assert mask[i].sum() == keep.sum()


def test_missing_file_raises(tmp_path):
    with pytest.raises(IOError):
        native.load_merged_sample([tmp_path / "nope.npy"], [np.eye(4)], [0.0],
                                  out_stride=6, budget=16)


def test_crop_points_multi_matches_numpy_oracle():
    from detzero_tpu import native
    from detzero_tpu.ops import box_np

    if not native.available():
        pytest.skip("no toolchain")
    rng = np.random.RandomState(3)
    pts = rng.uniform(-30, 30, (20000, 5)).astype(np.float32)
    boxes = np.concatenate([
        rng.uniform(-25, 25, (9, 2)), np.zeros((9, 1)),
        rng.uniform(1, 5, (9, 3)), rng.uniform(-3, 3, (9, 1))],
        axis=1).astype(np.float32)
    got = native.crop_points_multi(pts, boxes, 1.1)
    for j, b in enumerate(boxes):
        eb = b.copy()
        eb[3:6] *= 1.1
        ref = pts[box_np.points_in_rotated_box(pts, eb)]
        assert got[j].shape == ref.shape
        np.testing.assert_allclose(
            got[j][np.lexsort(got[j].T)], ref[np.lexsort(ref.T)])
    # empty inputs
    assert native.crop_points_multi(pts, np.zeros((0, 7))) == []
    out = native.crop_points_multi(np.zeros((0, 4), np.float32), boxes)
    assert all(len(o) == 0 for o in out)
