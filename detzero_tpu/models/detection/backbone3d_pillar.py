"""Sparse residual 3D backbone on the z-dense pillar structure (r3).

Same network as models/detection/backbone3d.VoxelResBackbone8x (reference
spconv VoxelResBackBone8x, backbone3d.py:231) but computed over the pillar
layout of ops/pillars.py: sparse over BEV, dense over z.  Motivation and
measurements are in ops/pillars.py — the sorted-table backend spends ~1.5
s/frame in searchsorted index math at Waymo scale; this one replaces every
search with LUT gathers and turns the z-extent of each conv into MXU work.

Param-tree compatibility: the module classes here are deliberately named
`SparseConvBNReLU` / `SparseBasicBlock` (same as the sorted backend) and are
instantiated in the same order with the same (K, Cin, Cout) kernel shapes, so
the two backbones share checkpoints — and the test suite pins them to produce
identical outputs from identical params (tests/test_pillars.py).
"""

from __future__ import annotations

import os as _os
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from detzero_tpu.models.layers import MaskedBatchNorm
from detzero_tpu.models.detection.backbone3d import plan_grids
from detzero_tpu.ops import pillars


def build_pillar_plan(table, grid_zyx, capacities: Sequence[int],
                      site_mode: str = "principal", with_centroids: bool = True,
                      with_gather_maps: bool = True):
    """Precompute pillar sets + neighbor maps for all stride levels.

    table: output of pillars.build_pillar_table at stride 1.
    capacities: pillar budgets per level [MP1, MP2, MP3, MP4].
    Returns a list of 5 dicts of ARRAYS only (vmap-safe); static grids come
    from plan_grids(grid_zyx).
    """
    grids = plan_grids(grid_zyx)
    # The dense (ny*nx) row LUT is consumed only by the XLA gather backbone
    # (subm/down gather maps) and the PDV second stage (voxel_query_pillar
    # probe + centroid downsample).  The flagship pallas path selects by
    # per-row RANK (augment_plan_rowpad), and downsample_pillars has a
    # LUT-free principal route (sorted run-OR payload) that skips the 4
    # dense scatters.  Measured on v5e (r5): ISOLATED plan build 18.7 ->
    # 11.3 ms/frame, but the FUSED forward got ~2 ms SLOWER (14.67 ->
    # 14.25 f/s headline, clean box, 2 runs) — XLA evidently overlaps the
    # LUT scatters in the full graph.  Default therefore stays on the LUT
    # route; DETZERO_LUTFREE_PLAN=1 flips it (trace-time read, like
    # DETZERO_STREAM_VFE — retrace to switch).
    lutfree = _os.environ.get("DETZERO_LUTFREE_PLAN", "0") == "1"
    need_lut = (with_gather_maps or with_centroids
                or site_mode != "principal" or not lutfree)
    levels = []
    cur = {k: table[k] for k in ("cells", "coords2d", "mask", "zmask")}
    if with_centroids:
        # voxel xyz segment-means ARE the per-voxel point centroids
        cur["centroids"] = table["feats"][..., :3]
    for lvl in range(4):
        nz, ny, nx = grids[lvl]
        lut = cur.pop("lut", None)
        if lut is None and need_lut:
            lut = pillars.build_row_lut(cur["cells"], cur["mask"], (ny, nx))
        entry = dict(cur)
        if lut is not None:
            entry["lut"] = lut  # PDV voxel_query_pillar probes through this
        if with_gather_maps:
            # (MP, 9) global-row gather maps: only the XLA (gather-based)
            # backbone uses these; the fused-pallas backend selects by
            # per-row RANK (augment_plan_rowpad) and skips this work
            s_idx, s_found = pillars.build_subm_neighbors(
                lut, cur["coords2d"], cur["mask"], (ny, nx))
            entry["subm_idx"], entry["subm_found"] = s_idx, s_found
        if lvl < 3:
            onz, ony, onx = grids[lvl + 1]
            nxt = pillars.downsample_pillars(
                cur, (ny, nx), nz, capacities[lvl + 1], site_mode=site_mode,
                in_lut=lut)
            out_lut = (pillars.build_row_lut(nxt["cells"], nxt["mask"],
                                             (ony, onx))
                       if need_lut else None)
            if with_gather_maps:
                d_idx, d_found = pillars.build_down_neighbors(
                    lut, nxt["coords2d"], nxt["mask"], (ny, nx))
                dt_idx, dt_found = pillars.build_down_transpose(
                    out_lut, cur["coords2d"], cur["mask"], (ony, onx))
                entry["down_idx"], entry["down_found"] = d_idx, d_found
                entry["down_idx_t"], entry["down_found_t"] = dt_idx, dt_found
            nxt_level = {"cells": nxt["cells"], "coords2d": nxt["coords2d"],
                         "mask": nxt["mask"], "zmask": nxt["zmask"]}
            if out_lut is not None:
                nxt_level["lut"] = out_lut
            if with_centroids:
                nxt_level["centroids"] = _downsample_centroids_pillar(
                    cur["centroids"], cur["zmask"], cur, nxt,
                    (ny, nx), out_lut, onz)
            cur = nxt_level
        levels.append(entry)
    # final z-halving level: same pillar set as level 3
    final_nz = grids[4][0]
    levels.append({
        "cells": cur["cells"], "coords2d": cur["coords2d"],
        "mask": cur["mask"],
        "zmask": pillars.halve_zmask(cur["zmask"], final_nz),
    })
    return levels


def _downsample_centroids_pillar(centroids, zmask, cur, nxt,
                                 in_bev_hw, out_lut, out_nz):
    """Mean point-centroid per downsampled voxel (PDV
    get_centroids_per_voxel_layer, voxel_aggregation_utils.py:108): each
    occupied input voxel contributes its centroid to its principal output
    site (zo = z//2, child pillar -> out pillar)."""
    ny, nx = in_bev_hw
    ony = -(-ny // 2)
    onx = -(-nx // 2)
    y, x = cur["coords2d"][:, 0], cur["coords2d"][:, 1]
    ocell = (y // 2) * onx + x // 2
    v = out_lut[jnp.clip(ocell, 0, ony * onx - 1)]
    orow = jnp.maximum(v - 1, 0)
    ok = (v > 0) & cur["mask"]
    nz = zmask.shape[1]
    pad = nz + (-nz) % 2
    w = jnp.pad(zmask, ((0, 0), (0, pad - nz))).astype(centroids.dtype)
    c = jnp.pad(centroids, ((0, 0), (0, pad - nz), (0, 0)))
    # z-pair sums of (centroid * occupied)
    csum = (c * w[..., None]).reshape(c.shape[0], pad // 2, 2, 3).sum(2)
    wsum = w.reshape(w.shape[0], pad // 2, 2).sum(2)
    csum = csum[:, :out_nz]
    wsum = wsum[:, :out_nz]
    mp_out = nxt["cells"].shape[0]
    seg = jnp.where(ok, orow, mp_out)
    num = jax.ops.segment_sum(
        jnp.where(ok[:, None, None], csum, 0.0), seg,
        num_segments=mp_out + 1)[:-1]
    den = jax.ops.segment_sum(
        jnp.where(ok[:, None], wsum, 0.0), seg, num_segments=mp_out + 1)[:-1]
    return num / jnp.maximum(den[..., None], 1.0)


class SparseConvBNReLU(nn.Module):
    """One pillar sparse conv (subm / BEV-strided / z-only — the maps and
    kernel_volume decide) + masked BN + ReLU.  Class name matches the
    sorted-table backend so param trees are interchangeable."""

    features: int
    kernel_volume: int  # 27 (3x3x3) or 3 ((3,1,1) z-conv)
    use_running_average: bool = False
    act: bool = True
    axis_names: Sequence[str] = ()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, zmask_out, idx=None, found=None,
                 idx_t=None, found_t=None, z_stride: int = 1,
                 out_nz: int | None = None):
        cin = feats.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (self.kernel_volume, cin, self.features), jnp.float32,
        )
        if self.kernel_volume == 3:
            x = pillars.z_conv(feats.astype(self.dtype), zmask_out,
                               w.astype(self.dtype), z_stride, out_nz)
        else:
            x = pillars.pillar_conv(
                feats.astype(self.dtype), zmask_out, idx, found, idx_t,
                found_t, w.astype(self.dtype), z_stride, out_nz)
        nzo = x.shape[1]
        x = MaskedBatchNorm(
            use_running_average=self.use_running_average,
            axis_names=self.axis_names, dtype=self.dtype,
        )(x, zmask_out[:, :nzo])
        if self.act:
            x = nn.relu(x)
        return jnp.where(zmask_out[:, :nzo, None], x, 0.0)


class SparseBasicBlock(nn.Module):
    """Residual pair of submanifold convs (reference SparseBasicBlock,
    backbone3d.py:85) on the pillar layout."""

    features: int
    use_running_average: bool = False
    axis_names: Sequence[str] = ()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, zmask, idx, found):
        idx_t, found_t = idx[:, ::-1], found[:, ::-1]
        identity = feats
        x = SparseConvBNReLU(
            self.features, 27, self.use_running_average, act=True,
            axis_names=self.axis_names, dtype=self.dtype,
        )(feats, zmask, idx, found, idx_t, found_t)
        x = SparseConvBNReLU(
            self.features, 27, self.use_running_average, act=False,
            axis_names=self.axis_names, dtype=self.dtype,
        )(x, zmask, idx, found, idx_t, found_t)
        return nn.relu(x + identity)


class PillarResBackbone8x(nn.Module):
    """[16,32,64,128]-channel sparse residual backbone, 8x BEV downsample,
    on the pillar structure.  __call__(pillar_feats, plan) -> dict with
    'spatial_features' (H/8, W/8, nz_final*C NHWC) and per-level pillar
    tables for the second stage."""

    grid_zyx: tuple = (40, 1504, 1504)
    channels: Sequence[int] = (16, 32, 64, 128)
    blocks_per_level: int = 2
    residual: bool = True
    use_running_average: bool = False
    axis_names: Sequence[str] = ()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pillar_feats, plan):
        grids = plan_grids(self.grid_zyx)
        kw = dict(use_running_average=self.use_running_average,
                  axis_names=self.axis_names, dtype=self.dtype)
        lvl0 = plan[0]
        x = pillar_feats.astype(self.dtype)
        s_t = (lvl0["subm_idx"][:, ::-1], lvl0["subm_found"][:, ::-1])
        x = SparseConvBNReLU(self.channels[0], 27, **kw)(
            x, lvl0["zmask"], lvl0["subm_idx"], lvl0["subm_found"], *s_t)
        multi_scale = {}
        for lvl in range(4):
            entry = plan[lvl]
            for b in range(self.blocks_per_level):
                if self.residual:
                    x = SparseBasicBlock(self.channels[lvl], **kw)(
                        x, entry["zmask"], entry["subm_idx"],
                        entry["subm_found"])
                else:
                    st = (entry["subm_idx"][:, ::-1],
                          entry["subm_found"][:, ::-1])
                    x = SparseConvBNReLU(
                        self.channels[lvl], 27, **kw)(
                        x, entry["zmask"], entry["subm_idx"],
                        entry["subm_found"], *st)
            ms = {
                "pillar_features": x, "zmask": entry["zmask"],
                "cells": entry["cells"], "mask": entry["mask"],
            }
            if "centroids" in entry:
                ms["centroids"] = entry["centroids"]
            multi_scale[f"x_conv{lvl + 1}"] = ms
            if lvl < 3:
                nxt = plan[lvl + 1]
                x = SparseConvBNReLU(self.channels[lvl + 1], 27, **kw)(
                    x, nxt["zmask"], entry["down_idx"], entry["down_found"],
                    entry["down_idx_t"], entry["down_found_t"],
                    z_stride=2, out_nz=grids[lvl + 1][0])
        final = plan[4]
        x = SparseConvBNReLU(self.channels[3], 3, **kw)(
            x, final["zmask"], z_stride=2, out_nz=grids[4][0])
        mp = x.shape[0]
        bev = pillars.densify_pillars(
            x.reshape(mp, -1), final["cells"], final["mask"],
            (grids[4][1], grids[4][2]))
        return {
            "spatial_features": bev,
            "multi_scale_3d_features": multi_scale,
        }
