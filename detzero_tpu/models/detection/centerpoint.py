"""CenterPoint assembled for TPU.

Re-designs the reference CenterPoint (models/centerpoint.py:15: VFE -> sparse
3D backbone -> height compression -> 2D BEV backbone -> center head) as a
functional flax pipeline:

  * voxelization (= the reference's DynamicMeanVFE) happens in-graph via
    ops/voxelize.dynamic_voxelize — points go straight to the device;
  * the sparse backbone runs per sample and is vmapped over the batch with a
    named 'batch' axis so BatchNorm statistics sync across samples (and the
    data mesh axis) — SyncBatchNorm for free;
  * target assignment + losses jit into the same step (no CPU gaussian loop).

The flagship single-stage model; the PDV second stage plugs in behind
`multi_scale_3d_features`.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from detzero_tpu.core.registry import MODELS
from detzero_tpu.models.detection.backbone2d import BaseBEVBackbone
from detzero_tpu.models.detection.backbone3d import VoxelResBackbone8x, build_plan
from detzero_tpu.models.detection.center_head import (
    CenterHead, assign_targets, center_head_loss, decode_predictions,
)
from detzero_tpu.ops.voxelize import dynamic_voxelize


class CenterPointNet(nn.Module):
    """Single-sample network: voxel table -> per-head prediction dicts.

    backend: '3d' voxel layout — 'pillar' (z-dense pillar structure,
    ops/pillars.py; the TPU-fast default) or 'sorted' (sorted-id voxel
    table, ops/sparse.py; the r2 design, kept as the cross-check oracle and
    for the PDV second stage until its pillar voxel-query lands). Both
    produce identical outputs from identical params
    (tests/test_pillars.py)."""

    class_ids_each_head: Sequence[Sequence[int]]
    backend: str = "pillar"
    grid_zyx: tuple = (40, 1504, 1504)
    backbone_channels: Sequence[int] = (16, 32, 64, 128)
    backbone_residual: bool = True
    backbone_blocks: int = 2
    row_budget: int = 128
    bev_layer_nums: Sequence[int] = (5, 5)
    bev_num_filters: Sequence[int] = (128, 256)
    with_velocity: bool = True
    with_iou: bool = True
    # second stage (PDV RoI head, reference SECOND_STAGE: True configs)
    second_stage: bool = False
    roi_budget: int = 128
    roi_grid_size: int = 6
    roi_attention: bool = False
    voxel_size: tuple = (0.1, 0.1, 0.15)
    pc_range: tuple = (-75.2, -75.2, -2.0, 75.2, 75.2, 4.0)
    feature_map_stride: int = 8
    bev_hw: tuple = (188, 188)
    use_running_average: bool = False
    axis_names: Sequence[str] = ("batch",)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, voxel_features, plan):
        from detzero_tpu.models.detection.pdv_head import PDVHead
        from detzero_tpu.models.detection.backbone3d import plan_grids

        kw = dict(use_running_average=self.use_running_average,
                  axis_names=self.axis_names, dtype=self.dtype)
        if self.backend == "pillar_pallas":
            from detzero_tpu.models.detection.backbone3d_pallas import (
                PallasResBackbone8x,
            )
            out3d = PallasResBackbone8x(
                grid_zyx=self.grid_zyx, channels=self.backbone_channels,
                residual=self.backbone_residual, name="backbone3d",
                blocks_per_level=self.backbone_blocks,
                row_budget=self.row_budget,
                with_multi_scale=self.second_stage, **kw,
            )(voxel_features, plan)
        elif self.backend == "pillar":
            from detzero_tpu.models.detection.backbone3d_pillar import (
                PillarResBackbone8x,
            )
            out3d = PillarResBackbone8x(
                grid_zyx=self.grid_zyx, channels=self.backbone_channels,
                residual=self.backbone_residual, name="backbone3d",
                blocks_per_level=self.backbone_blocks, **kw,
            )(voxel_features, plan)
        else:
            out3d = VoxelResBackbone8x(
                grid_zyx=self.grid_zyx, channels=self.backbone_channels,
                residual=self.backbone_residual, name="backbone3d",
                blocks_per_level=self.backbone_blocks, **kw,
            )(voxel_features, plan)
        bev = BaseBEVBackbone(
            layer_nums=self.bev_layer_nums, num_filters=self.bev_num_filters,
            name="backbone2d", **kw,
        )(out3d["spatial_features"])
        preds = CenterHead(
            class_ids_each_head=self.class_ids_each_head,
            with_velocity=self.with_velocity, with_iou=self.with_iou,
            name="center_head", **kw,
        )(bev)
        roi_out = None
        if self.second_stage:
            dec = decode_predictions(
                jax.tree.map(jax.lax.stop_gradient, preds),
                self.class_ids_each_head, self.bev_hw,
                self.feature_map_stride, self.voxel_size, self.pc_range,
                top_k=self.roi_budget, score_thresh=0.0,
                nms_pre=self.roi_budget * 4, nms_post=self.roi_budget,
            )
            grids = plan_grids(self.grid_zyx)
            levels = []
            for name, lvl_i, stride in (("x_conv3", 2, 4), ("x_conv4", 3, 8)):
                ms = out3d["multi_scale_3d_features"][name]
                if self.backend in ("pillar", "pillar_pallas"):
                    # flat (MP*nz) slot table + row LUT probe
                    c = ms["pillar_features"].shape[-1]
                    lvl = {
                        "features": jax.lax.stop_gradient(
                            ms["pillar_features"]).reshape(-1, c),
                        "mask": ms["zmask"].reshape(-1),
                        "lut": plan[lvl_i]["lut"], "cells": ms["cells"],
                        "stride": stride, "grid_zyx": grids[lvl_i],
                    }
                    if "centroids" in plan[lvl_i]:
                        lvl["centroids"] = plan[lvl_i]["centroids"].reshape(-1, 3)
                else:
                    lvl = {
                        "features": jax.lax.stop_gradient(ms["features"]),
                        "ids": ms["ids"], "mask": ms["mask"],
                        "stride": stride, "grid_zyx": grids[lvl_i],
                    }
                    if "centroids" in plan[lvl_i]:
                        lvl["centroids"] = plan[lvl_i]["centroids"]
                levels.append(lvl)
            rois = dec["boxes"][:, :7]
            # BEV keypoint features: sample the 2D map at center + 4 side
            # midpoints per RoI (reference center_head.py:457-484)
            from detzero_tpu.ops.box_ops import (
                bilinear_sample_bev, box_keypoints_bev,
            )
            kps = box_keypoints_bev(rois)  # (R, 5, 2)
            kp_feats = bilinear_sample_bev(
                jax.lax.stop_gradient(bev), kps.reshape(-1, 2),
                self.voxel_size, self.pc_range, self.feature_map_stride,
            ).reshape(rois.shape[0], -1)
            cls, reg, _ = PDVHead(
                pc_range=self.pc_range, voxel_size=self.voxel_size,
                grid_size=self.roi_grid_size,
                with_attention=self.roi_attention,
                use_running_average=self.use_running_average,
                axis_names=self.axis_names, dtype=self.dtype, name="roi_head",
            )(rois, dec["mask"], levels, extra_feats=kp_feats)
            roi_out = {"rois": rois, "roi_mask": dec["mask"],
                       "roi_scores": dec["scores"], "roi_labels": dec["labels"],
                       "cls_logit": cls, "reg_deltas": reg}
        out3d = dict(out3d)
        out3d["roi"] = roi_out
        return preds, out3d


@MODELS.register("CenterPoint")
class CenterPoint:
    """Functional wrapper: owns geometry constants + batched apply/loss/decode.

    Geometry mirrors the reference waymo configs (det_dataset_cfgs/
    waymo_5sweeps.yaml): pc range [-75.2, 75.2]^2 x [-2, 4], voxel
    0.1x0.1x0.15 -> grid (40, 1504, 1504), 8x BEV stride.
    """

    def __init__(self, model_cfg, num_classes: int, *, pc_range, voxel_size,
                 max_voxels: int = 150_000, max_points: int = 200_000,
                 max_objs: int = 500, dtype=jnp.bfloat16):
        self.cfg = model_cfg
        self.pc_range = tuple(float(v) for v in pc_range)
        self.voxel_size = tuple(float(v) for v in voxel_size)
        nx = round((self.pc_range[3] - self.pc_range[0]) / self.voxel_size[0])
        ny = round((self.pc_range[4] - self.pc_range[1]) / self.voxel_size[1])
        nz = round((self.pc_range[5] - self.pc_range[2]) / self.voxel_size[2])
        self.grid_zyx = (nz, ny, nx)
        self.max_voxels = max_voxels
        self.max_points = max_points
        self.max_objs = max_objs
        self.feature_map_stride = int(model_cfg.get("FEATURE_MAP_STRIDE", 8))
        groups = model_cfg.get("CLASS_IDS_EACH_HEAD")
        if groups is None:
            groups = [[i] for i in range(num_classes)]
        self.class_ids_each_head = tuple(tuple(g) for g in groups)
        self.site_mode = model_cfg.get("DOWNSAMPLE_SITE_MODE", "principal")
        self.capacities = tuple(model_cfg.get(
            "VOXEL_CAPACITIES", (max_voxels, max_voxels // 2,
                                 max_voxels // 4, max_voxels // 8)))
        # 'pillar' (z-dense pillar layout — the fast TPU path) or 'sorted'
        # (the r2 sorted-id voxel table). Pillar count <= voxel count at
        # every level, so the voxel capacities are safe pillar budgets.
        self.backend = model_cfg.get("BACKBONE3D", "pillar")
        # per-BEV-row pillar budget for the fused-pallas rowpad layout
        self.row_budget = int(model_cfg.get("PILLAR_ROW_BUDGET", 128))
        self.pillar_capacities = tuple(model_cfg.get(
            "PILLAR_CAPACITIES", self.capacities))
        h = -(-ny // self.feature_map_stride)
        w = -(-nx // self.feature_map_stride)
        self.bev_hw = (h, w)
        self.second_stage = bool(model_cfg.get("SECOND_STAGE", False))
        self.net = CenterPointNet(
            backend=self.backend,
            row_budget=self.row_budget,
            class_ids_each_head=self.class_ids_each_head,
            grid_zyx=self.grid_zyx,
            with_velocity=bool(model_cfg.get("WITH_VELOCITY", True)),
            with_iou=bool(model_cfg.get("WITH_IOU", True)),
            backbone_residual=bool(model_cfg.get("BACKBONE_RESIDUAL", True)),
            backbone_blocks=int(model_cfg.get("BLOCKS_PER_LEVEL", 2)),
            bev_layer_nums=tuple(model_cfg.get("BEV_LAYER_NUMS", (5, 5))),
            bev_num_filters=tuple(model_cfg.get("BEV_NUM_FILTERS", (128, 256))),
            second_stage=self.second_stage,
            roi_budget=int(model_cfg.get("ROI_BUDGET", 128)),
            roi_grid_size=int(model_cfg.get("ROI_GRID_SIZE", 6)),
            roi_attention=bool(model_cfg.get("ROI_ATTENTION", False)),
            voxel_size=self.voxel_size, pc_range=self.pc_range,
            feature_map_stride=self.feature_map_stride, bev_hw=self.bev_hw,
            use_running_average=False,
            dtype=dtype,
        )
        self.eval_net = self.net.copy(use_running_average=True)

    # ---------------- single-sample pieces ----------------

    def voxelize(self, points, points_valid):
        return dynamic_voxelize(points, points_valid, self.grid_zyx,
                                self.voxel_size, self.pc_range, self.max_voxels)

    def build_plan(self, table):
        # voxel xyz feature columns ARE the per-voxel point centroids
        # (segment means) — propagate them for PDV centroid-relative pooling
        return build_plan(table["voxel_ids"], table["voxel_coords"],
                          table["voxel_mask"], self.grid_zyx, self.capacities,
                          centroids=table["voxel_features"][:, :3],
                          site_mode=self.site_mode)

    # ---------------- batched entry points ----------------

    @staticmethod
    def _vmapped_call():
        """Batch-axis lift: params/batch_stats broadcast, 'batch' named axis
        so MaskedBatchNorm psums stats across samples."""
        return nn.vmap(
            CenterPointNet.__call__,
            variable_axes={"params": None, "batch_stats": None},
            split_rngs={"params": False},
            in_axes=(0, 0), out_axes=0, axis_name="batch",
        )

    def _tables(self, points, points_valid):
        if self.backend in ("pillar", "pillar_pallas"):
            from detzero_tpu.models.detection.backbone3d_pillar import (
                build_pillar_plan,
            )
            from detzero_tpu.ops.pillars import build_pillar_table

            # stream VFE: the pallas backend never materializes the dense
            # (MP, nz, F) mean table — stream_rowpad_feats reduces the
            # sorted point stream straight into the rowpad conv layout
            # (bit-exact vs the dense path; ~16 ms/frame cheaper on v5e).
            # The dense table is still built when the PDV second stage
            # needs per-voxel centroids.
            from detzero_tpu.ops import pallas_pillar as ppk
            # resolve_use_pallas gates the kernel at TRACE time like the
            # convs: DETZERO_FORCE_PALLAS=0 (bench._flops_cpu) falls back
            # to the dense segment-sum table, =1 runs the kernel in
            # interpret mode off-TPU (CPU multichip dryrun).
            # NOTE: read at TRACE time (like DETZERO_FORCE_PALLAS) — an
            # already-cached jit entry keeps the old path if the env flips
            # later in the same process; re-jit/retrace to switch (ADVICE r4)
            stream_vfe = (self.backend == "pillar_pallas"
                          and not self.second_stage
                          and ppk.resolve_use_pallas(None)
                          and os.environ.get("DETZERO_STREAM_VFE",
                                             "1") == "1")

            def one(p, v):
                table = build_pillar_table(
                    p, v, self.grid_zyx, self.voxel_size, self.pc_range,
                    self.pillar_capacities[0],
                    feats_mode="stream" if stream_vfe else "dense")
                plan = build_pillar_plan(
                    table, self.grid_zyx, self.pillar_capacities,
                    site_mode=self.site_mode,
                    with_centroids=self.second_stage,
                    with_gather_maps=self.backend != "pillar_pallas")
                if self.backend == "pillar_pallas":
                    from detzero_tpu.models.detection.backbone3d_pallas \
                        import augment_plan_rowpad
                    plan = augment_plan_rowpad(plan, self.grid_zyx,
                                               self.row_budget)
                return table, plan

            nz0, ny0 = self.grid_zyx[0], self.grid_zyx[1]

            def stream_feats(s):
                return ppk.stream_rowpad_feats(
                    s["payload"], s["meta"], s["wstart"], nz=nz0,
                    ny=ny0, row_budget=self.row_budget,
                    out_dtype=self.net.dtype,
                    interpret=not ppk._on_tpu())

            if points.shape[0] == 1:
                # batch-1 fast path: the vmapped scatters in the plan build
                # (rowpad_layout counts, build_row_lut, segment ops) lower
                # ~3 ms/frame worse as batched scatters on TPU even with a
                # unit batch dim — run unbatched and re-add the axis
                table, plan = one(points[0], points_valid[0])
                if stream_vfe:
                    rp_feats = stream_feats(table.pop("stream"))
                    plan[0]["rp_feats"] = rp_feats
                return jax.tree.map(lambda x: x[None], (table, plan))
            table, plan = jax.vmap(one)(points, points_valid)
            if stream_vfe:
                # the pallas kernel cannot trace under vmap: map it
                plan[0]["rp_feats"] = jax.lax.map(
                    stream_feats, table.pop("stream"))
            return table, plan
        table = jax.vmap(self.voxelize)(points, points_valid)
        plan = jax.vmap(self.build_plan)(table)
        return table, plan

    def init(self, rng, points, points_valid):
        """points (B, P, F). Returns variables (params + batch_stats).
        Jitted as one program: eager init would dispatch thousands of single
        ops, which is pathological on a remote-tunneled TPU backend."""

        def _init(rng, points, points_valid):
            table, plan = self._tables(points, points_valid)
            feats = table["feats" if self.backend.startswith("pillar")
                          else "voxel_features"]
            return self.net.init(rng, feats, plan,
                                 method=self._vmapped_call())

        return jax.jit(_init)(rng, points, points_valid)

    def apply(self, variables, points, points_valid, train: bool,
              mutable_stats: bool = True):
        table, plan = self._tables(points, points_valid)
        feats = table["feats" if self.backend.startswith("pillar")
                      else "voxel_features"]
        net = self.net if train else self.eval_net
        fn = self._vmapped_call()
        if train and mutable_stats:
            (preds, out3d), updates = net.apply(
                variables, feats, plan, method=fn,
                mutable=["batch_stats"],
            )
            return preds, out3d, updates
        preds, out3d = net.apply(variables, feats, plan, method=fn)
        return preds, out3d, {}

    def loss(self, variables, points, points_valid, gt_boxes, gt_classes,
             gt_valid, rng=None):
        """Full training loss for a batch. gt_boxes (B, M, 7/9).

        rng: optional PRNGKey for the second stage's fg/bg RoI subsampling
        (proposal_target_layer semantics); when absent a key is derived
        from the batch's GT bits so the subsample still varies across
        batches without threading a key through every trainer."""
        preds, out3d, updates = self.apply(variables, points, points_valid,
                                           train=True)
        tgt_fn = functools.partial(
            assign_targets,
            class_ids_each_head=self.class_ids_each_head, hw=self.bev_hw,
            feature_map_stride=self.feature_map_stride,
            voxel_size=self.voxel_size, pc_range=self.pc_range,
            max_objs=self.max_objs,
            with_velocity=bool(self.cfg.get("WITH_VELOCITY", True)),
        )
        targets = jax.vmap(tgt_fn)(gt_boxes, gt_classes, gt_valid)
        loss_fn = functools.partial(
            center_head_loss, hw=self.bev_hw,
            feature_map_stride=self.feature_map_stride,
            voxel_size=self.voxel_size, pc_range=self.pc_range,
        )
        per_sample_loss, aux = jax.vmap(loss_fn)(preds, targets)
        total = per_sample_loss.mean()
        if self.second_stage and out3d.get("roi") is not None:
            from detzero_tpu.models.detection.pdv_head import (
                assign_roi_targets, pdv_loss, subsample_rois,
            )
            roi = out3d["roi"]
            scfg = self.cfg.get("ROI_SAMPLER", {}) or {}
            roi_per_image = int(scfg.get("ROI_PER_IMAGE",
                                         roi["rois"].shape[1]))
            if rng is None:
                # batch-dependent deterministic key: fold the GT bits in so
                # the subsample varies with the (augmented) batch content
                seed = jnp.abs(jax.lax.bitcast_convert_type(
                    gt_boxes.astype(jnp.float32), jnp.int32)).sum()
                rng = jax.random.fold_in(jax.random.PRNGKey(17),
                                         seed.astype(jnp.uint32))
            keys = jax.random.split(rng, gt_boxes.shape[0])

            def one(key, roi_s, gb, gv):
                tgt = assign_roi_targets(roi_s["rois"], roi_s["roi_mask"],
                                         gb[:, :7], gv)
                # reference proposal_target_layer fg/bg subsampling
                # (FG_RATIO + hard-bg mining), static-shape gather
                idx, valid = subsample_rois(
                    key, tgt["roi_iou"], roi_s["roi_mask"],
                    roi_per_image=roi_per_image,
                    fg_ratio=float(scfg.get("FG_RATIO", 0.5)),
                    hard_bg_ratio=float(scfg.get("HARD_BG_RATIO", 0.8)))
                sub_tgt = jax.tree.map(lambda a: a[idx], tgt)
                mask = valid & roi_s["roi_mask"][idx]
                sub_tgt["fg_mask"] = sub_tgt["fg_mask"] & mask
                return pdv_loss(roi_s["cls_logit"][idx],
                                roi_s["reg_deltas"][idx], sub_tgt,
                                roi_s["rois"][idx], mask)

            roi_loss, roi_aux = jax.vmap(one)(keys, roi, gt_boxes, gt_valid)
            total = total + roi_loss.mean()
            aux = {**aux, **roi_aux}
        return total, (aux, updates)

    def predict(self, variables, points, points_valid, **decode_kwargs):
        preds, out3d, _ = self.apply(variables, points, points_valid,
                                     train=False, mutable_stats=False)
        if self.second_stage and out3d.get("roi") is not None:
            from detzero_tpu.models.detection.pdv_head import pdv_predict
            roi = out3d["roi"]
            boxes, scores = jax.vmap(pdv_predict)(
                roi["cls_logit"], roi["reg_deltas"], roi["rois"],
                roi["roi_scores"])
            return {"boxes": boxes, "scores": scores,
                    "labels": roi["roi_labels"], "mask": roi["roi_mask"]}
        dec = functools.partial(
            decode_predictions,
            class_ids_each_head=self.class_ids_each_head, hw=self.bev_hw,
            feature_map_stride=self.feature_map_stride,
            voxel_size=self.voxel_size, pc_range=self.pc_range,
            **decode_kwargs,
        )
        return jax.vmap(dec)(preds)
