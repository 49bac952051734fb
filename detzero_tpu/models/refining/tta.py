"""GRM / PRM test-time augmentation (device-side fan-out + fuse).

The reference ships dataset-level TTA fan-out helpers
(refining/detzero_refine/utils/geometry_augment.py:80-137,
position_augment.py:85-131) but the model-side fuse is
``NotImplementedError`` (geometry_refine_model.py:42-44,
position_refine_model.py:47-49; README:116 marks GRM/PRM TTA unreleased).
This module implements the complete, working feature — designed TPU-first:

  * the variant fan-out is a **static stack** over a configurable variant
    list (flips / scales / rotations, defaults = the reference's lists), so
    one ``jax.vmap``-ed forward evaluates all variants in a single XLA
    program — no per-variant dispatch;
  * transforms act exactly on the engineered features: GRM p2s
    point-to-surface channels are swapped/recomputed under flips/rotations
    (the half-extents are recovered from opposing surface distances), and
    PRM p2co corner-offset channels are permuted + sign-flipped using the
    corner symmetry of the anchor layout — the reference stub left these
    channels stale under flips/rotations;
  * fuse inverts each variant on the decoded outputs (sizes for GRM,
    centers+headings for PRM) and averages — circular mean for headings.

Variant syntax: "original", "flip_x", "flip_y", "flip_xy",
"scale_<f>", "rot_<angle>".
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# Reference default lists (geometry_augment.py:107-121 scales/rots,
# position_augment.py:113-128).
GRM_DEFAULT_VARIANTS = (
    "original", "flip_x", "flip_y", "flip_xy",
    "scale_0.9", "scale_0.95", "scale_1.05", "scale_1.1",
    "rot_-0.78539816", "rot_0.78539816",
)
PRM_DEFAULT_VARIANTS = (
    "original", "flip_x", "flip_y", "flip_xy",
    "scale_0.85", "scale_0.9", "scale_0.95", "scale_1.05", "scale_1.1",
    "scale_1.15",
    "rot_-0.39365818", "rot_-0.78539816", "rot_-1.17809724",
    "rot_-2.74889357",
    "rot_0.39365818", "rot_0.78539816", "rot_1.17809724", "rot_2.74889357",
)

# p2co anchor permutation when the box-frame y axis flips: corners are
# ordered sx in (1,-1) x sy in (1,-1) x sz in (1,-1) (index = 4*(sx<0) +
# 2*(sy<0) + (sz<0)), center last — flipping sy toggles bit 1.
_P2CO_FLIP_Y_PERM = np.array([2, 3, 0, 1, 6, 7, 4, 5, 8])


def parse_variant(v: str):
    if v == "original":
        return "orig", 0.0
    if v.startswith("flip_"):
        return v, 0.0
    kind, _, val = v.partition("_")
    return kind, float(val)


def _rot2d(xy, angle):
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.stack([xy[..., 0] * c - xy[..., 1] * s,
                      xy[..., 0] * s + xy[..., 1] * c], axis=-1)


# ----------------------------------------------------------------- GRM ----
# feature layout (data/refine_features.grm_point_features): [x, y, z,
# intensity, p2s(+x, -x, +y, -y, +z, -z), score] = 11 channels.

def _grm_transform_feats(f, variant):
    kind, val = parse_variant(variant)
    if kind == "orig":
        return f
    if kind.startswith("flip"):
        out = f
        if "x" in kind[5:]:  # flip about x axis: y := -y, swap +y/-y faces
            out = out.at[..., 1].multiply(-1.0)
            out = out.at[..., jnp.array([6, 7])].set(out[..., jnp.array([7, 6])])
        if "y" in kind[5:]:  # flip about y axis: x := -x, swap +x/-x faces
            out = out.at[..., 0].multiply(-1.0)
            out = out.at[..., jnp.array([4, 5])].set(out[..., jnp.array([5, 4])])
        return out
    if kind == "scale":
        return jnp.concatenate([f[..., 0:3] * val, f[..., 3:4],
                                f[..., 4:10] * val, f[..., 10:]], axis=-1)
    if kind == "rot":
        xy = _rot2d(f[..., 0:2], val)
        # half-extents recovered from opposing face distances, then p2s
        # recomputed against the rotated coordinates
        dx = (f[..., 4] + f[..., 5]) / 2
        dy = (f[..., 6] + f[..., 7]) / 2
        x, y = xy[..., 0], xy[..., 1]
        p2s = jnp.stack([dx - x, dx + x, dy - y, dy + y,
                         f[..., 8], f[..., 9]], axis=-1)
        return jnp.concatenate([xy, f[..., 2:4], p2s, f[..., 10:]], axis=-1)
    raise ValueError(f"unknown TTA variant {variant!r}")


def grm_tta_expand(sample, variants=GRM_DEFAULT_VARIANTS):
    """sample: dict(query_pts (Q,Np,11), query_sizes (Q,3),
    memory_pts (M,11), memory_mask (M,)). Returns the same dict with a
    leading K = len(variants) axis on every array."""
    qs, ms, sizes = [], [], []
    for v in variants:
        qs.append(_grm_transform_feats(jnp.asarray(sample["query_pts"]), v))
        ms.append(_grm_transform_feats(jnp.asarray(sample["memory_pts"]), v))
        kind, val = parse_variant(v)
        sz = jnp.asarray(sample["query_sizes"])
        sizes.append(sz * val if kind == "scale" else sz)
    k = len(variants)
    return {
        "query_pts": jnp.stack(qs),
        "query_sizes": jnp.stack(sizes),
        "memory_pts": jnp.stack(ms),
        "memory_mask": jnp.broadcast_to(jnp.asarray(sample["memory_mask"]),
                                        (k,) + sample["memory_mask"].shape),
    }


def grm_tta_fuse(sizes, variants=GRM_DEFAULT_VARIANTS):
    """sizes (K, 3) decoded per variant -> fused (3,): un-scale then mean."""
    inv = np.ones(len(variants), np.float32)
    for i, v in enumerate(variants):
        kind, val = parse_variant(v)
        if kind == "scale":
            inv[i] = 1.0 / val
    return (sizes * jnp.asarray(inv)[:, None]).mean(axis=0)


# ----------------------------------------------------------------- PRM ----
# feature layout (prm_point_features): [x, y, z (init coords), intensity,
# p2co (9 anchors x 3, box-frame offsets), score] = 32 channels.

def _prm_p2co_flip_y(p2co):
    """Box-frame y flip on (..., 27) p2co: permute sy-paired anchors and
    negate the y component."""
    off = p2co.reshape(p2co.shape[:-1] + (9, 3))
    off = off[..., _P2CO_FLIP_Y_PERM, :]
    off = off.at[..., 1].multiply(-1.0)
    return off.reshape(p2co.shape)


def _prm_transform_feats(f, variant):
    kind, val = parse_variant(variant)
    if kind == "orig":
        return f
    if kind == "flip_x":  # world y := -y; box frame sees a y flip
        out = f.at[..., 1].multiply(-1.0)
        return out.at[..., 4:31].set(_prm_p2co_flip_y(out[..., 4:31]))
    if kind == "flip_y":  # world x := -x; box frame also sees a y flip
        out = f.at[..., 0].multiply(-1.0)
        return out.at[..., 4:31].set(_prm_p2co_flip_y(out[..., 4:31]))
    if kind == "flip_xy":  # box frame unchanged (two y flips cancel)
        out = f.at[..., 0].multiply(-1.0)
        return out.at[..., 1].multiply(-1.0)
    if kind == "scale":
        return jnp.concatenate([f[..., 0:3] * val, f[..., 3:4],
                                f[..., 4:31] * val, f[..., 31:]], axis=-1)
    if kind == "rot":  # rotation about the init origin; box frame unchanged
        xy = _rot2d(f[..., 0:2], val)
        return jnp.concatenate([xy, f[..., 2:]], axis=-1)
    raise ValueError(f"unknown TTA variant {variant!r}")


def _prm_transform_boxes(qb, variant):
    """query_boxes (T, 4) [x, y, z, yaw] in init coords."""
    kind, val = parse_variant(variant)
    if kind == "orig":
        return qb
    x, y, z, yaw = qb[..., 0], qb[..., 1], qb[..., 2], qb[..., 3]
    if kind == "flip_x":
        return jnp.stack([x, -y, z, -yaw], axis=-1)
    if kind == "flip_y":
        return jnp.stack([-x, y, z, -(yaw + jnp.pi)], axis=-1)
    if kind == "flip_xy":
        return jnp.stack([-x, -y, z, yaw - jnp.pi], axis=-1)
    if kind == "scale":
        return jnp.concatenate([qb[..., 0:3] * val, qb[..., 3:4]], axis=-1)
    if kind == "rot":
        xy = _rot2d(qb[..., 0:2], val)
        return jnp.concatenate([xy, z[..., None], (yaw + val)[..., None]],
                               axis=-1)
    raise ValueError(f"unknown TTA variant {variant!r}")


def prm_tta_expand(sample, variants=PRM_DEFAULT_VARIANTS):
    """sample: dict(query_pts (T,Np,32), query_boxes (T,4),
    memory_pts (T,Nm,32), pad_mask (T,)). Adds a leading K axis."""
    k = len(variants)
    return {
        "query_pts": jnp.stack([
            _prm_transform_feats(jnp.asarray(sample["query_pts"]), v)
            for v in variants]),
        "query_boxes": jnp.stack([
            _prm_transform_boxes(jnp.asarray(sample["query_boxes"]), v)
            for v in variants]),
        "memory_pts": jnp.stack([
            _prm_transform_feats(jnp.asarray(sample["memory_pts"]), v)
            for v in variants]),
        "pad_mask": jnp.broadcast_to(jnp.asarray(sample["pad_mask"]),
                                     (k,) + sample["pad_mask"].shape),
    }


def prm_tta_apply_forward(centers, headings, variant):
    """Forward variant transform on init-coord (T,3)/(T,) track poses —
    what a perfect model would predict on the transformed input. Used by
    tests and by target construction."""
    kind, val = parse_variant(variant)
    c, h = jnp.asarray(centers), jnp.asarray(headings)
    if kind == "orig":
        return c, h
    if kind == "flip_x":
        return c.at[..., 1].multiply(-1.0), -h
    if kind == "flip_y":
        return c.at[..., 0].multiply(-1.0), -(h + jnp.pi)
    if kind == "flip_xy":
        c = c.at[..., 0].multiply(-1.0)
        return c.at[..., 1].multiply(-1.0), h - jnp.pi
    if kind == "scale":
        return c * val, h
    if kind == "rot":
        return jnp.concatenate([_rot2d(c[..., 0:2], val), c[..., 2:]],
                               axis=-1), h + val
    raise ValueError(f"unknown TTA variant {variant!r}")


def prm_tta_fuse(centers, headings, variants=PRM_DEFAULT_VARIANTS):
    """centers (K,T,3), headings (K,T) decoded per variant -> fused
    ((T,3), (T,)). Each variant is inverted, then centers average and
    headings circular-mean."""
    cs, hs = [], []
    for i, v in enumerate(variants):
        kind, val = parse_variant(v)
        c, h = centers[i], headings[i]
        if kind == "flip_x":
            c, h = c.at[..., 1].multiply(-1.0), -h
        elif kind == "flip_y":
            c = c.at[..., 0].multiply(-1.0)
            h = -h - jnp.pi
        elif kind == "flip_xy":
            c = c.at[..., 0].multiply(-1.0)
            c = c.at[..., 1].multiply(-1.0)
            h = h + jnp.pi
        elif kind == "scale":
            c = c / val
        elif kind == "rot":
            c = jnp.concatenate([_rot2d(c[..., 0:2], -val), c[..., 2:]],
                                axis=-1)
            h = h - val
        cs.append(c)
        hs.append(h)
    c = jnp.stack(cs).mean(axis=0)
    hs = jnp.stack(hs)
    h = jnp.arctan2(jnp.sin(hs).mean(axis=0), jnp.cos(hs).mean(axis=0))
    return c, h
