"""PDV second-stage RoI head (reference pdv_head.py: VoxelAggregationHead /
PDVHead + proposal_target_layer.py), re-designed for static shapes:

  * proposals = the first stage's top post-NMS boxes (fixed budget R);
  * each RoI spawns a G^3 grid of points; every grid point gathers neighbor
    voxel features from the level-3/4 sparse tables via voxel_query through
    the sorted-id table (the reference's CUDA voxel-hash query), relative-pos
    encoded, MLP'd and max-pooled;
  * a density feature log1p(#neighbors) rides along (the reference's density
    confidence, pdv_head.py:525-545), plus an optional small transformer
    encoder over the grid tokens with density positional encoding;
  * heads: class-agnostic IoU-quality logit + ResidualCoder box refinement;
  * training targets: RoI-vs-GT 3D IoU -> scaled cls target (reference
    proposal_target_layer), canonical-frame reg residuals on foreground RoIs.

Single-sample module (vmap over batch), same convention as the backbone.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from detzero_tpu.models.layers import MLP
from detzero_tpu.ops import pointnet2 as pn2
from detzero_tpu.ops.box_coder import ResidualCoder
from detzero_tpu.ops.box_ops import rotate_points_along_z
from detzero_tpu.ops.iou3d import boxes_iou3d
from detzero_tpu.ops.losses import corner_loss_lidar, weighted_smooth_l1


def roi_grid_points(rois, grid_size: int):
    """(R, 7) -> (R, G^3, 3) global grid-point coords (reference
    get_dense_grid_points, pdv_head.py:451)."""
    g = grid_size
    idx = jnp.stack(jnp.meshgrid(*([jnp.arange(g)] * 3), indexing="ij"),
                    -1).reshape(-1, 3).astype(jnp.float32)  # (G^3, 3) xyz order
    local = (idx + 0.5) / g - 0.5  # in [-0.5, 0.5)
    local = local[None, :, :] * rois[:, None, 3:6]
    world = rotate_points_along_z(local, rois[:, 6])
    return world + rois[:, None, :3]


class PDVHead(nn.Module):
    """grid pooling + refinement heads. Inputs are per-sample."""

    pc_range: tuple
    voxel_size: tuple
    grid_size: int = 6
    mlp_channels: Sequence[int] = (32, 32)
    shared_channels: Sequence[int] = (256, 256)
    nsample: int = 16
    code_size: int = 7
    with_attention: bool = False
    attn_heads: int = 4
    use_running_average: bool = False
    axis_names: Sequence[str] = ("batch",)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rois, roi_mask, levels, extra_feats=None):
        """rois (R, 7); levels: list of dicts {features (V, C), ids (V,),
        mask (V,), stride (static int)}; extra_feats (R, E) optional
        (e.g. BEV keypoint samples). Returns (cls_logit (R,),
        reg_deltas (R, code_size), pooled (R, G^3, C'))."""
        r = rois.shape[0]
        g3 = self.grid_size ** 3
        grid = roi_grid_points(rois, self.grid_size)  # (R, G^3, 3)
        flat = grid.reshape(r * g3, 3)
        pc_min = jnp.asarray(self.pc_range[:3])
        vs = jnp.asarray(self.voxel_size)

        pooled_scales = []
        density = jnp.zeros((r * g3, 1), jnp.float32)
        for li, lvl in enumerate(levels):
            stride = lvl["stride"]
            nz, ny, nx = lvl["grid_zyx"]
            coords = jnp.floor((flat - pc_min) / (vs * stride)).astype(jnp.int32)
            coords = jnp.clip(coords[:, ::-1], 0,
                              jnp.asarray([nz - 1, ny - 1, nx - 1]))  # zyx
            if "lut" in lvl:  # pillar backend: LUT probe, flat slot table
                from detzero_tpu.ops import pillars as _pillars
                idx, found = _pillars.voxel_query_pillar(
                    coords, lvl["lut"], lvl["mask"], nz, (ny, nx),
                    max_range=1, nsample=self.nsample)
            else:  # sorted-table backend: searchsorted probe
                idx, found = pn2.voxel_query(coords, lvl["ids"], (nz, ny, nx),
                                             max_range=1, nsample=self.nsample)
            found = found & lvl["mask"][idx]
            feats = lvl["features"][idx]  # (RG, S, C)
            if "centroids" in lvl:
                # PDV: relative position to the voxel's POINT CENTROID
                # (pdv_head.py:592 PDVHead vs VoxelCenterHead:567)
                centers = lvl["centroids"][idx]
            elif "lut" in lvl:
                vz = (idx % nz).astype(jnp.float32)
                cell = lvl["cells"][idx // nz]
                vy = (cell // nx).astype(jnp.float32)
                vx = (cell % nx).astype(jnp.float32)
                centers = (jnp.stack([vx, vy, vz], -1)
                           + 0.5) * (vs * stride) + pc_min
            else:
                vids = lvl["ids"][idx]
                vz = vids // (ny * nx)
                rem = vids - vz * (ny * nx)
                vy, vx = rem // nx, rem - (rem // nx) * nx
                centers = (jnp.stack([vx, vy, vz], -1).astype(jnp.float32)
                           + 0.5) * (vs * stride) + pc_min
            rel = centers - flat[:, None, :]
            h = jnp.concatenate([feats.astype(self.dtype),
                                 rel.astype(self.dtype)], axis=-1)
            h = MLP(self.mlp_channels,
                    use_running_average=self.use_running_average,
                    axis_names=self.axis_names, dtype=self.dtype,
                    name=f"pool_mlp{li}")(h, found)
            h = jnp.where(found[..., None], h, -jnp.inf)
            h = h.max(axis=1)
            h = jnp.where(jnp.isfinite(h), h, 0.0)
            pooled_scales.append(h)
            density = density + found.sum(axis=1, keepdims=True).astype(jnp.float32)

        pooled = jnp.concatenate(
            pooled_scales + [jnp.log1p(density).astype(self.dtype)], axis=-1)
        pooled = pooled.reshape(r, g3, -1)

        if self.with_attention:
            # self-attention over the grid tokens with density pos-encoding
            # (reference attention_utils TransformerEncoder, pdv_head.py:504)
            dpos = nn.Dense(pooled.shape[-1], dtype=self.dtype,
                            name="density_pos")(
                jnp.log1p(density).reshape(r, g3, 1).astype(self.dtype))
            q = pooled + dpos
            qkv = ((pooled.shape[-1] + self.attn_heads - 1)
                   // self.attn_heads) * self.attn_heads
            attn = nn.MultiHeadDotProductAttention(
                num_heads=self.attn_heads, qkv_features=qkv,
                dtype=self.dtype, name="grid_attn",
            )(inputs_q=q, inputs_k=q, inputs_v=pooled)
            pooled = nn.LayerNorm(dtype=self.dtype)(pooled + attn)

        h = pooled.reshape(r, -1)
        if extra_feats is not None:
            h = jnp.concatenate([h, extra_feats.astype(self.dtype)], axis=-1)
        h = MLP(self.shared_channels,
                use_running_average=self.use_running_average,
                axis_names=self.axis_names, dtype=self.dtype,
                name="shared_fc")(h, roi_mask)
        cls = nn.Dense(1, dtype=jnp.float32, name="cls")(h)[:, 0]
        reg = nn.Dense(self.code_size, dtype=jnp.float32, name="reg")(h)
        return cls, reg, pooled


# ----------------------------------------------------------------------
def assign_roi_targets(rois, roi_mask, gt_boxes, gt_valid,
                       reg_fg_thresh: float = 0.55,
                       cls_fg_thresh: float = 0.75,
                       cls_bg_thresh: float = 0.25,
                       coder: ResidualCoder | None = None):
    """Vectorized proposal_target_layer targets: per-RoI max-IoU GT,
    roi_iou-scaled cls target (CLS_BG 0.25 -> CLS_FG 0.75 linear ramp,
    proposal_target_layer.py:44-54), reg valid above REG_FG_THRESH (:36),
    canonical reg residuals. Returns dict of static-shape targets."""
    coder = coder or ResidualCoder()
    iou = boxes_iou3d(rois[:, :7], gt_boxes[:, :7])
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    best = iou.max(axis=1)
    gt_idx = iou.argmax(axis=1)
    matched = gt_boxes[gt_idx][:, :7]
    cls_t = jnp.clip((best - cls_bg_thresh) / (cls_fg_thresh - cls_bg_thresh),
                     0.0, 1.0)
    fg = (best > reg_fg_thresh) & roi_mask
    # canonical-frame residuals: encode GT against the RoI as anchor
    reg_t = coder.encode(matched, rois[:, :7])
    return {"cls_target": cls_t, "reg_target": reg_t, "fg_mask": fg,
            "roi_iou": best, "matched_gt": matched}


def subsample_rois(key, roi_iou, roi_mask, roi_per_image: int = 128,
                   fg_ratio: float = 0.5, reg_fg_thresh: float = 0.55,
                   cls_fg_thresh: float = 0.75,
                   cls_bg_thresh_lo: float = 0.1,
                   hard_bg_ratio: float = 0.8):
    """Static-shape fg/bg RoI subsampling (VERDICT r1 #8) —
    proposal_target_layer.subsample_rois semantics (:121-170) re-expressed
    for TPU: every count is a traced scalar and the output is a fixed
    (roi_per_image,) gather index, so nothing has a data-dependent shape.

    Composition matches the reference: up to FG_RATIO*M foreground RoIs
    (IoU >= min(REG_FG, CLS_FG), shuffled without replacement, wrapping
    only when fg alone must fill all M slots), the rest background split
    HARD_BG_RATIO hard (IoU in [LO, REG_FG)) vs easy (IoU < LO), each
    drawn WITH replacement as the reference's randint does. Slots whose
    pool is empty come back invalid instead of raising.

    Returns (idx (M,) int32, valid (M,) bool).
    """
    import numpy as np

    n = roi_iou.shape[0]
    m = int(roi_per_image)
    kf, kh, ke, kd = jax.random.split(key, 4)
    fg_thresh = min(reg_fg_thresh, cls_fg_thresh)
    fg = (roi_iou >= fg_thresh) & roi_mask
    easy = (roi_iou < cls_bg_thresh_lo) & roi_mask
    hard = (roi_iou >= cls_bg_thresh_lo) & (roi_iou < reg_fg_thresh) \
        & roi_mask
    fg_cnt = fg.sum()
    hard_cnt = hard.sum()
    easy_cnt = easy.sum()
    bg_cnt = hard_cnt + easy_cnt

    fg_target = int(np.round(fg_ratio * m))
    n_fg = jnp.where(bg_cnt > 0, jnp.minimum(fg_target, fg_cnt),
                     jnp.where(fg_cnt > 0, m, 0))
    n_bg = m - n_fg
    n_hard = jnp.where((hard_cnt > 0) & (easy_cnt > 0),
                       jnp.minimum((n_bg * hard_bg_ratio).astype(jnp.int32),
                                   hard_cnt),
                       jnp.where(hard_cnt > 0, n_bg, 0))

    # category pools: member indices shuffled to the front
    fg_pool = jnp.argsort(jnp.where(fg, jax.random.uniform(kf, (n,)), 2.0))
    hard_pool = jnp.argsort(jnp.where(hard, jax.random.uniform(kh, (n,)), 2.0))
    easy_pool = jnp.argsort(jnp.where(easy, jax.random.uniform(ke, (n,)), 2.0))

    slots = jnp.arange(m)
    draw = jax.random.randint(kd, (m,), 0, 1 << 30)
    is_fg = slots < n_fg
    is_hard = (~is_fg) & (slots < n_fg + n_hard)
    idx = jnp.where(
        is_fg, fg_pool[slots % jnp.maximum(fg_cnt, 1)],
        jnp.where(is_hard, hard_pool[draw % jnp.maximum(hard_cnt, 1)],
                  easy_pool[draw % jnp.maximum(easy_cnt, 1)]))
    valid = jnp.where(is_fg, fg_cnt > 0,
                      jnp.where(is_hard, hard_cnt > 0, easy_cnt > 0))
    return idx.astype(jnp.int32), valid


def pdv_loss(cls_logit, reg_deltas, targets, rois, roi_mask,
             coder: ResidualCoder | None = None, cls_weight=1.0,
             reg_weight=1.0, corner_weight=1.0):
    """BCE(cls vs iou target) + smooth-L1(reg) + corner loss on fg
    (RoIHeadTemplate get_box_reg_layer_loss / get_box_cls_layer_loss)."""
    coder = coder or ResidualCoder()
    m = roi_mask.astype(jnp.float32)
    bce = (jnp.maximum(cls_logit, 0) - cls_logit * targets["cls_target"]
           + jnp.log1p(jnp.exp(-jnp.abs(cls_logit))))
    cls_loss = (bce * m).sum() / jnp.maximum(m.sum(), 1.0)
    fg = targets["fg_mask"].astype(jnp.float32)
    l1 = weighted_smooth_l1(reg_deltas, targets["reg_target"]).mean(-1)
    reg_loss = (l1 * fg).sum() / jnp.maximum(fg.sum(), 1.0)
    decoded = coder.decode(reg_deltas, rois[:, :7])
    corner = corner_loss_lidar(decoded, targets["matched_gt"],
                               mask=targets["fg_mask"])
    total = cls_weight * cls_loss + reg_weight * reg_loss + corner_weight * corner
    return total, {"roi_cls": cls_loss, "roi_reg": reg_loss,
                   "roi_corner": corner}


def pdv_predict(cls_logit, reg_deltas, rois, first_stage_scores,
                coder: ResidualCoder | None = None):
    """Refined boxes + rectified scores (centerpoint.py:258:
    score = sqrt(sigmoid(iou_logit) * roi_score))."""
    coder = coder or ResidualCoder()
    boxes = coder.decode(reg_deltas, rois[:, :7])
    scores = jnp.sqrt(jnp.clip(
        jax.nn.sigmoid(cls_logit) * first_stage_scores, 1e-8, 1.0))
    return boxes, scores
