"""GRM/PRM test-time augmentation: feature-space transforms must equal
features rebuilt from a transformed world, and fuse must invert every
variant exactly (perfect-model round trip)."""

import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from detzero_tpu.data.refine_features import p2co_features, p2s_features
from detzero_tpu.models.refining import tta


def _grm_feats(local, dims, score=0.7):
    inten = np.random.RandomState(0).rand(len(local), 1).astype(np.float32)
    return np.concatenate([
        local, inten, p2s_features(local, dims),
        np.full((len(local), 1), score, np.float32)], axis=1), inten


def test_grm_flip_matches_rebuilt_features():
    rng = np.random.RandomState(1)
    local = rng.uniform(-2, 2, (64, 3)).astype(np.float32)
    dims = np.array([4.2, 1.9, 1.6], np.float32)
    feats, inten = _grm_feats(local, dims)
    for variant, flip in (("flip_x", [1, -1, 1]), ("flip_y", [-1, 1, 1]),
                          ("flip_xy", [-1, -1, 1])):
        got = np.asarray(tta._grm_transform_feats(jnp.asarray(feats), variant))
        local_f = local * np.asarray(flip, np.float32)
        want = np.concatenate([local_f, inten, p2s_features(local_f, dims),
                               feats[:, 10:]], axis=1)
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=variant)


def test_grm_rot_and_scale_match_rebuilt_features():
    rng = np.random.RandomState(2)
    local = rng.uniform(-2, 2, (64, 3)).astype(np.float32)
    dims = np.array([4.2, 1.9, 1.6], np.float32)
    feats, inten = _grm_feats(local, dims)

    ang = 0.78539816
    got = np.asarray(tta._grm_transform_feats(jnp.asarray(feats),
                                              f"rot_{ang}"))
    c, s = np.cos(ang), np.sin(ang)
    rot = local.copy()
    rot[:, 0] = local[:, 0] * c - local[:, 1] * s
    rot[:, 1] = local[:, 0] * s + local[:, 1] * c
    want = np.concatenate([rot, inten, p2s_features(rot, dims),
                           feats[:, 10:]], axis=1)
    np.testing.assert_allclose(got, want, atol=1e-5)

    f = 1.1
    got = np.asarray(tta._grm_transform_feats(jnp.asarray(feats),
                                              f"scale_{f}"))
    want = np.concatenate([local * f, inten,
                           p2s_features(local * f, dims * f),
                           feats[:, 10:]], axis=1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_grm_fuse_inverts_perfect_predictions():
    size = jnp.array([4.5, 1.8, 1.5])
    preds = []
    for v in tta.GRM_DEFAULT_VARIANTS:
        kind, val = tta.parse_variant(v)
        preds.append(size * val if kind == "scale" else size)
    fused = np.asarray(tta.grm_tta_fuse(jnp.stack(preds)))
    np.testing.assert_allclose(fused, np.asarray(size), atol=1e-6)


def test_prm_flip_x_matches_rebuilt_p2co():
    rng = np.random.RandomState(3)
    rel = rng.uniform(-2, 2, (32, 3)).astype(np.float32)  # box-frame points
    dims = np.array([4.0, 2.0, 1.5], np.float32)
    pts_init = rng.uniform(-10, 10, (32, 3)).astype(np.float32)
    feats = np.concatenate([
        pts_init, rng.rand(32, 1).astype(np.float32),
        p2co_features(rel, dims),
        np.full((32, 1), 0.5, np.float32)], axis=1)
    got = np.asarray(tta._prm_transform_feats(jnp.asarray(feats), "flip_x"))
    rel_f = rel * np.array([1, -1, 1], np.float32)
    np.testing.assert_allclose(got[:, 4:31], p2co_features(rel_f, dims),
                               atol=1e-5)
    np.testing.assert_allclose(got[:, 0], pts_init[:, 0], atol=1e-6)
    np.testing.assert_allclose(got[:, 1], -pts_init[:, 1], atol=1e-6)
    # flip_xy leaves the box frame unchanged
    got2 = np.asarray(tta._prm_transform_feats(jnp.asarray(feats), "flip_xy"))
    np.testing.assert_allclose(got2[:, 4:31], feats[:, 4:31], atol=1e-6)
    np.testing.assert_allclose(got2[:, :2], -pts_init[:, :2], atol=1e-6)


def test_prm_fuse_inverts_perfect_predictions():
    rng = np.random.RandomState(4)
    centers = jnp.asarray(rng.uniform(-20, 20, (12, 3)).astype(np.float32))
    headings = jnp.asarray(rng.uniform(-np.pi, np.pi, 12).astype(np.float32))
    cs, hs = [], []
    for v in tta.PRM_DEFAULT_VARIANTS:
        c, h = tta.prm_tta_apply_forward(centers, headings, v)
        cs.append(c)
        hs.append(h)
    fc, fh = tta.prm_tta_fuse(jnp.stack(cs), jnp.stack(hs))
    np.testing.assert_allclose(np.asarray(fc), np.asarray(centers), atol=1e-4)
    d = (np.asarray(fh) - np.asarray(headings)) % (2 * np.pi)
    d = np.minimum(d, 2 * np.pi - d)
    np.testing.assert_allclose(d, 0, atol=1e-4)


def test_prm_query_box_transform_consistent_with_forward():
    """_prm_transform_boxes on (x, y, z, yaw) must agree with
    prm_tta_apply_forward on (centers, headings)."""
    rng = np.random.RandomState(5)
    qb = jnp.asarray(rng.uniform(-5, 5, (7, 4)).astype(np.float32))
    for v in tta.PRM_DEFAULT_VARIANTS:
        got = np.asarray(tta._prm_transform_boxes(qb, v))
        c, h = tta.prm_tta_apply_forward(qb[:, :3], qb[:, 3], v)
        np.testing.assert_allclose(got[:, :3], np.asarray(c), atol=1e-5,
                                   err_msg=v)
        dh = (got[:, 3] - np.asarray(h)) % (2 * np.pi)
        dh = np.minimum(dh, 2 * np.pi - dh)
        np.testing.assert_allclose(dh, 0, atol=1e-5, err_msg=v)


def test_grm_tta_through_real_model():
    """Expand -> vmapped GeometryTransformer -> decode -> fuse runs under
    jit and returns finite sizes; padded-zero samples stay finite too."""
    from detzero_tpu.models.refining.grm import GeometryTransformer, grm_decode

    rng = np.random.RandomState(6)
    sample = {
        "query_pts": rng.rand(3, 16, 11).astype(np.float32),
        "query_sizes": np.abs(rng.rand(3, 3)).astype(np.float32) + 1,
        "memory_pts": rng.rand(64, 11).astype(np.float32),
        "memory_mask": np.ones(64, bool),
    }
    model = GeometryTransformer(d_model=32, n_heads=2)
    variables = model.init(jax.random.PRNGKey(0), sample["query_pts"],
                           sample["query_sizes"], sample["memory_pts"],
                           sample["memory_mask"])
    ex = tta.grm_tta_expand(sample)
    k = len(tta.GRM_DEFAULT_VARIANTS)
    assert ex["query_pts"].shape == (k, 3, 16, 11)
    pred = jax.jit(jax.vmap(model.apply, in_axes=(None, 0, 0, 0, 0)))(
        variables, ex["query_pts"], ex["query_sizes"], ex["memory_pts"],
        ex["memory_mask"])
    anchors = np.array([[4.5, 2.0, 1.6], [2.0, 1.0, 1.6], [0.9, 0.9, 1.8]])
    sizes = jax.vmap(lambda p: grm_decode(p, anchors))(pred)
    fused = np.asarray(tta.grm_tta_fuse(sizes))
    assert fused.shape == (3,) and np.isfinite(fused).all()
