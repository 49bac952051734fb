"""Sparse residual 3D backbone on the row-padded pillar layout, computed by
the fused Pallas convs of ops/pallas_pallas — the fast-TPU variant of
models/detection/backbone3d_pillar.PillarResBackbone8x (r3).

Same network as the reference spconv VoxelResBackBone8x (detection/
detzero_det/models/centerpoint_modules/backbone3d.py:231).  Measured on v5e
at Waymo L0 scale: one fused conv = ~4.5 ms vs ~31.6 ms for the XLA
gather-based pillar conv (tools/bisect_perf.py) — the gather never leaves
VMEM here.

Param-tree compatibility: module classes are named `SparseConvBNReLU` /
`SparseBasicBlock` (same as the other two backends) and instantiated in the
same order with identical (K, Cin, Cout) kernel shapes, so all three
backbones share checkpoints; tests/test_pallas_backbone.py pins the rowpad
backbone's outputs against the gather backbone's from shared params.

Layout notes: features flow through the levels as (ny, nz*C, B) bf16 tiles
(pillars in lanes); BN runs with channel_axis=2 on the (ny, nz, C, B) view;
the final (3,1,1) z-conv and BEV densify run on the compact table after one
from_rowpad gather.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from detzero_tpu.models.layers import MaskedBatchNorm
from detzero_tpu.models.detection.backbone3d import plan_grids
from detzero_tpu.ops import pillars
from detzero_tpu.ops import pallas_pillar as ppk

# Fuse the eval-mode BN affine + residual + ReLU + zmask into the conv
# kernel's epilogue (removes one 2x-table-size elementwise HBM pass per
# conv during inference). Interpret-exact (tests/test_fused_eval.py);
# DEFAULT ON since r4 TPU timing: kernel-level 4.27 vs 4.24 ms at L0 but
# the full predict graph gains ~1 f/s from the removed XLA BN passes.
# DETZERO_FUSED_EVAL=0 restores the unfused path for measurement.
import os as _os

USE_FUSED_EVAL = _os.environ.get("DETZERO_FUSED_EVAL", "1") == "1"


def augment_plan_rowpad(plan, grid_zyx, row_budget: int = 128,
                        use_pallas=None):
    """Extend a build_pillar_plan() plan with the row-padded structures the
    fused convs need.  Adds to level lvl: rp_slot, rp_keep, rp_zmask
    (ny, nz, B), rp_nbr (ny, 16, B); and for lvl < 3: rp_down_nbr (at the
    output grid) and rp_up_nbr (this grid, transpose of the strided conv).
    Returns a NEW list of level dicts (arrays only, vmap-safe).

    The 10 neighbor maps come from ops/pillars.rowpad_nbr_rank — pure-XLA
    rank-by-count over per-row sorted x-coords, bit-identical to BOTH the
    pallas kernel (ops/pallas_pillar.rowpad_nbr) and the original 16-wide-
    scatter build (tests/test_pallas_pillar.py::test_rowpad_nbr_parity /
    test_rowpad_nbr_rank_parity).  History: the scatter build cost
    48.8 ms/frame (r3), the per-row pallas kernel 6-7 ms (r4: ~0.9 us x
    6768 grid steps over 10 invocations), the fused XLA broadcast-compare
    ~2-3 ms (r5) — and it runs everywhere, so the CPU multichip dryrun no
    longer pays interpret-mode for plan building.  All rowpad structures
    here are GATHERS through rowpad_layout's gidx map; the only scatter
    left per level is its counts histogram."""
    grids = plan_grids(grid_zyx)
    b = row_budget
    out = [dict(entry) for entry in plan[:4]] + [dict(plan[4])]
    level_aux = []
    for lvl in range(4):
        nz, ny, nx = grids[lvl]
        e = out[lvl]
        lay = pillars.rowpad_layout(
            e["cells"], e["mask"], (ny, nx), b, with_rank_lut=False)
        slot, keep = lay["slot"], lay["keep"]
        gidx, gvalid = lay["gidx"], lay["gvalid"]
        e["rp_slot"], e["rp_keep"] = slot, keep
        e["rp_gidx"], e["rp_gvalid"] = gidx, gvalid
        e["rp_zmask"] = pillars.rowpad_gather(
            e["zmask"].astype(jnp.int8), gidx, gvalid, slot, keep) > 0
        xq = pillars.rowpad_xcoords(
            e["coords2d"][:, 1], gidx, gvalid, ppk.NBR_BIG)
        e["rp_nbr"] = pillars.rowpad_nbr_rank(xq, xq, mode="subm",
                                              big=ppk.NBR_BIG)
        level_aux.append((slot, keep, xq, (nz, ny, nx)))
    for lvl in range(3):
        aux_i = level_aux[lvl][2]
        aux_o = level_aux[lvl + 1][2]
        # forward strided conv: output slots match input cells 2y+dy;
        # transpose: input slots match output cells (y+dy)//2
        out[lvl]["rp_down_nbr"] = pillars.rowpad_nbr_rank(
            aux_o, aux_i, mode="down", big=ppk.NBR_BIG)
        out[lvl]["rp_up_nbr"] = pillars.rowpad_nbr_rank(
            aux_i, aux_o, mode="up", big=ppk.NBR_BIG)
    return out


class SparseConvBNReLU(nn.Module):
    """One fused-pallas sparse conv (+ masked BN + ReLU) on the row-padded
    layout.  Class name matches the other backends for checkpoint parity."""

    features: int
    kernel_volume: int            # 27 only (the z-only conv runs compact)
    use_running_average: bool = False
    act: bool = True
    axis_names: Sequence[str] = ()
    dtype: Any = jnp.float32
    use_pallas: Any = None        # None = auto (TPU)

    @nn.compact
    def __call__(self, x_rp, zmask_rp, nbr, nbr_up=None, mode="subm",
                 nz=None, out_nz=None, z_stride=1, residual=None,
                 fuse_relu=False):
        if self.kernel_volume == 3:
            # final (3,1,1) z-stride conv: x_rp is the COMPACT (MP, nz, C)
            # table (tiny at L3), zmask_rp the output-level compact zmask
            cin = x_rp.shape[-1]
            w = self.param(
                "kernel",
                nn.initializers.variance_scaling(1.0, "fan_in",
                                                 "truncated_normal"),
                (3, cin, self.features), jnp.float32,
            )
            x = pillars.z_conv(x_rp.astype(self.dtype), zmask_rp,
                               w.astype(self.dtype), 2, out_nz)
            nzo = x.shape[1]
            x = MaskedBatchNorm(
                use_running_average=self.use_running_average,
                axis_names=self.axis_names, dtype=self.dtype,
            )(x, zmask_rp[:, :nzo])
            if self.act:
                x = nn.relu(x)
            return jnp.where(zmask_rp[:, :nzo, None], x, 0.0)
        ny, w_in, b = x_rp.shape
        cin = w_in // nz
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (self.kernel_volume, cin, self.features), jnp.float32,
        )
        onz = out_nz if out_nz is not None else nz
        bn = MaskedBatchNorm(
            use_running_average=self.use_running_average,
            axis_names=self.axis_names, dtype=self.dtype, channel_axis=2,
        )
        pallas_on = ppk.resolve_use_pallas(self.use_pallas)
        if USE_FUSED_EVAL and pallas_on and self.use_running_average:
            # folded BN affine in f32 straight from the module's running
            # stats (param tree stays identical; a bf16 probe-difference
            # fold cancels catastrophically when |bias| >> |scale|)
            zeros = jnp.zeros((1, 1, self.features, 1), jnp.float32)
            sc4, bi4 = bn(zeros, return_affine=True)
            out = ppk.rowpad_conv_fused(
                x_rp.astype(jnp.bfloat16), nbr,
                ppk.weight_fwd(w, cin, self.features),
                sc4, bi4,
                zmask_rp[:, :onz], residual,
                nz=nz, cin=cin, cout=self.features, z_stride=z_stride,
                out_nz=out_nz, mode=mode, relu=self.act or fuse_relu,
                interpret=not ppk._on_tpu())
            return out
        conv = ppk.make_conv_op(nz=nz, cin=cin, cout=self.features,
                                z_stride=z_stride, out_nz=out_nz, mode=mode,
                                use_pallas=self.use_pallas, dtype=self.dtype)
        x = conv(x_rp.astype(self.dtype), w,
                 nbr, nbr if nbr_up is None else nbr_up)
        ny_o = x.shape[0]
        x4 = x.reshape(ny_o, onz, self.features, b)
        m4 = zmask_rp[:, :onz, None, :]
        x4 = bn(x4, m4)
        if self.act:
            x4 = nn.relu(x4)
        x4 = jnp.where(m4, x4, 0.0)
        x4 = x4.reshape(ny_o, onz * self.features, b)
        if residual is not None:
            x4 = nn.relu(x4 + residual.astype(x4.dtype))
        return x4


class SparseBasicBlock(nn.Module):
    """Residual pair of submanifold convs (reference SparseBasicBlock,
    backbone3d.py:85) on the row-padded layout."""

    features: int
    use_running_average: bool = False
    axis_names: Sequence[str] = ()
    dtype: Any = jnp.float32
    use_pallas: Any = None

    @nn.compact
    def __call__(self, x_rp, zmask_rp, nbr, nz):
        identity = x_rp
        x = SparseConvBNReLU(
            self.features, 27, self.use_running_average, act=True,
            axis_names=self.axis_names, dtype=self.dtype,
            use_pallas=self.use_pallas,
        )(x_rp, zmask_rp, nbr, nz=nz)
        # the second conv absorbs the skip-add + final ReLU; on the fused
        # eval path all of it happens inside the kernel epilogue
        return SparseConvBNReLU(
            self.features, 27, self.use_running_average, act=False,
            axis_names=self.axis_names, dtype=self.dtype,
            use_pallas=self.use_pallas,
        )(x, zmask_rp, nbr, nz=nz, residual=identity, fuse_relu=True)


class PallasResBackbone8x(nn.Module):
    """[16,32,64,128]-channel sparse residual backbone, 8x BEV downsample,
    on the row-padded pillar structure with fused Pallas convs.

    __call__(pillar_feats (MP, nz, F), plan-with-rowpad) -> same dict
    contract as PillarResBackbone8x: 'spatial_features' (H/8, W/8, C*nzf)
    + per-level compact pillar tables for the second stage."""

    grid_zyx: tuple = (40, 1504, 1504)
    channels: Sequence[int] = (16, 32, 64, 128)
    blocks_per_level: int = 2
    residual: bool = True
    row_budget: int = 128
    use_running_average: bool = False
    axis_names: Sequence[str] = ()
    dtype: Any = jnp.float32
    use_pallas: Any = None
    with_multi_scale: bool = True

    @nn.compact
    def __call__(self, pillar_feats, plan):
        grids = plan_grids(self.grid_zyx)
        b = self.row_budget
        kw = dict(use_running_average=self.use_running_average,
                  axis_names=self.axis_names, dtype=self.dtype,
                  use_pallas=self.use_pallas)
        lvl0 = plan[0]
        nz0, ny0, _ = grids[0]
        mp, _, f_in = pillar_feats.shape
        if "rp_feats" in lvl0:
            # stream VFE (ops/pallas_pillar.stream_rowpad_feats): the table
            # arrived already reduced into the rowpad layout; pillar_feats
            # is a dead placeholder (XLA DCEs its zeros fill)
            x = lvl0["rp_feats"].astype(self.dtype)
        else:
            # compact -> row-padded transposed (gather both ways, see
            # pillars.rowpad_gather)
            x = pillars.rowpad_gather(
                pillar_feats.reshape(mp, -1).astype(self.dtype),
                lvl0["rp_gidx"], lvl0["rp_gvalid"],
                lvl0["rp_slot"], lvl0["rp_keep"])
        x = SparseConvBNReLU(self.channels[0], 27, **kw)(
            x, lvl0["rp_zmask"], lvl0["rp_nbr"], nz=nz0)
        multi_scale = {}
        for lvl in range(4):
            entry = plan[lvl]
            nz = grids[lvl][0]
            for _ in range(self.blocks_per_level):
                if self.residual:
                    x = SparseBasicBlock(self.channels[lvl], **kw)(
                        x, entry["rp_zmask"], entry["rp_nbr"], nz)
                else:
                    x = SparseConvBNReLU(self.channels[lvl], 27, **kw)(
                        x, entry["rp_zmask"], entry["rp_nbr"], nz=nz)
            if self.with_multi_scale:
                mp_l = entry["cells"].shape[0]
                ms = {
                    "pillar_features": _compact_feats(
                        x, entry, mp_l, nz, self.channels[lvl]),
                    "zmask": entry["zmask"],
                    "cells": entry["cells"], "mask": entry["mask"],
                }
                if "centroids" in entry:
                    ms["centroids"] = entry["centroids"]
                multi_scale[f"x_conv{lvl + 1}"] = ms
            if lvl < 3:
                nxt = plan[lvl + 1]
                x = SparseConvBNReLU(self.channels[lvl + 1], 27, **kw)(
                    x, nxt["rp_zmask"], entry["rp_down_nbr"],
                    entry["rp_up_nbr"], mode="down", nz=nz,
                    out_nz=grids[lvl + 1][0], z_stride=2)
        # final (3,1,1) z-stride conv + densify on the COMPACT table
        l3 = plan[3]
        final = plan[4]
        nz3 = grids[3][0]
        xc = _compact_feats(x, l3, mp=l3["cells"].shape[0], nz=nz3,
                            c=self.channels[3])
        xz = SparseConvBNReLU(self.channels[3], 3, **kw)(
            xc, final["zmask"], None, out_nz=grids[4][0])
        mp3 = xz.shape[0]
        bev = pillars.densify_pillars(
            xz.reshape(mp3, -1), final["cells"], final["mask"],
            (grids[4][1], grids[4][2]))
        return {
            "spatial_features": bev,
            "multi_scale_3d_features": multi_scale,
        }


def _compact_feats(x_rp, entry, mp, nz, c):
    """(ny, nz*C, B) row-padded -> compact (MP, nz, C).  Gather-only in
    both directions (the plain slot-gather autodiffs to a scatter-add)."""
    return pillars.from_rowpad_g(
        x_rp, entry["rp_slot"], entry["rp_keep"],
        entry["rp_gidx"], entry["rp_gvalid"]).reshape(mp, nz, c)


