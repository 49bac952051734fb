"""Sparse residual 3D backbone on the MXU.

Re-designs the reference's spconv VoxelResBackBone8x (backbone3d.py:231:
SparseBasicBlock residual pairs over channels [16,32,64,128], 8x BEV
downsample, final (3,1,1)/(2,1,1) z-conv) as gather-matmul sparse convs
(ops/sparse.py). The voxel index maps depend only on coordinates, so they are
built once per forward (build_plan) and shared by every layer at a stride —
spconv rebuilds rulebooks per layer; we don't.

Layout: one sample = one sorted voxel table. Batch via vmap (axis 'batch');
BN stats sync across vmap+data axes in MaskedBatchNorm.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from detzero_tpu.models.layers import MaskedBatchNorm
from detzero_tpu.ops import sparse
from detzero_tpu.ops.voxelize import scatter_to_dense_bev


def plan_grids(grid_zyx):
    """Static per-level grids: strides 1/2/4/8 plus the final z-halved grid.
    Pure python ints — kept out of the (vmapped) plan pytree."""
    grids = [tuple(grid_zyx)]
    g = grid_zyx
    for _ in range(3):
        g = tuple(-(-d // 2) for d in g)
        grids.append(g)
    grids.append((-(-g[0] // 2), g[1], g[2]))
    return grids


def _downsample_centroids(centroids, in_coords, in_mask, out_ids, stride_zyx,
                          out_grid_zyx):
    """Mean point-centroid per downsampled voxel (PDV's
    get_centroids_per_voxel_layer, voxel_aggregation_utils.py:108): each input
    voxel contributes its centroid to its principal output site."""
    onz, ony, onx = out_grid_zyx
    st = jnp.asarray(stride_zyx, jnp.int32)
    oc = in_coords // st[None, :]
    oid = (oc[:, 0] * ony + oc[:, 1]) * onx + oc[:, 2]
    pos = jnp.minimum(jnp.searchsorted(out_ids, oid).astype(jnp.int32),
                      out_ids.shape[0] - 1)
    ok = (out_ids[pos] == oid) & in_mask
    seg = jnp.where(ok, pos, out_ids.shape[0])
    sums = jax.ops.segment_sum(
        jnp.where(ok[:, None], centroids, 0.0), seg,
        num_segments=out_ids.shape[0] + 1)[:-1]
    cnts = jax.ops.segment_sum(ok.astype(centroids.dtype), seg,
                               num_segments=out_ids.shape[0] + 1)[:-1]
    return sums / jnp.maximum(cnts[:, None], 1.0)


def build_plan(voxel_ids, coords, mask, grid_zyx, capacities: Sequence[int],
               centroids=None, site_mode: str = "principal"):
    """Precompute index maps for all four stride levels.

    capacities: voxel budgets per level [V1, V2, V3, V4]. Returns a list of
    per-level dicts of ARRAYS only (vmap-safe): {ids, coords, mask, subm_idx,
    subm_found[, centroids]} plus downsample gather maps between levels.
    Static grids come from plan_grids(). `centroids` (V, 3): per-voxel mean
    point positions (= the voxelizer's xyz feature columns) — propagated per
    level for PDV centroid-relative pooling. `site_mode`: downsample output
    site derivation — "principal" (default) or "union" (exact spconv
    candidate-union semantics; see ops/sparse.build_downsample).
    """
    grids = plan_grids(grid_zyx)
    levels = []
    ids, cds, msk = voxel_ids, coords, mask
    for lvl in range(4):
        grid = grids[lvl]
        sub_idx, sub_found = sparse.build_submanifold_index(ids, cds, msk, grid, (3, 3, 3))
        # transpose map for the scatter-free backward (same table, stride 1)
        st_idx, st_found = sparse.build_transpose_index(
            ids, cds, msk, (1, 1, 1), (3, 3, 3), grid)
        entry = {
            "ids": ids, "coords": cds, "mask": msk,
            "subm_idx": sub_idx, "subm_found": sub_found,
            "subm_idx_t": st_idx, "subm_found_t": st_found,
        }
        if centroids is not None:
            entry["centroids"] = centroids
        if lvl < 3:
            (n_ids, n_coords, n_mask, d_idx, d_found, _) = sparse.build_downsample(
                ids, cds, msk, grid, (2, 2, 2), (3, 3, 3), capacities[lvl + 1],
                site_mode=site_mode,
            )
            dt_idx, dt_found = sparse.build_transpose_index(
                n_ids, cds, msk, (2, 2, 2), (3, 3, 3), grids[lvl + 1])
            entry["down_idx"] = d_idx
            entry["down_found"] = d_found
            entry["down_idx_t"] = dt_idx
            entry["down_found_t"] = dt_found
            if centroids is not None:
                centroids = _downsample_centroids(
                    centroids, cds, msk, n_ids, (2, 2, 2), grids[lvl + 1])
            ids, cds, msk = n_ids, n_coords, n_mask
        levels.append(entry)
    # final z-compression conv: stride (2,1,1), kernel (3,1,1)
    (f_ids, f_coords, f_mask, f_idx, f_found, _) = sparse.build_downsample(
        ids, cds, msk, grids[3], (2, 1, 1), (3, 1, 1), capacities[3],
        site_mode=site_mode,
    )
    ft_idx, ft_found = sparse.build_transpose_index(
        f_ids, cds, msk, (2, 1, 1), (3, 1, 1), grids[4])
    levels.append({
        "ids": f_ids, "coords": f_coords, "mask": f_mask,
        "down_idx": f_idx, "down_found": f_found,
        "down_idx_t": ft_idx, "down_found_t": ft_found,
    })
    return levels


class SparseConvBNReLU(nn.Module):
    """One sparse conv (subm or strided — the index map decides) + BN + ReLU."""

    features: int
    kernel_volume: int
    use_running_average: bool = False
    act: bool = True
    axis_names: Sequence[str] = ()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, idx, found, out_mask, idx_t=None, found_t=None):
        cin = feats.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (self.kernel_volume, cin, self.features), jnp.float32,
        )
        if idx_t is not None:
            x = sparse.sparse_conv_apply_vjp(
                feats.astype(self.dtype), w.astype(self.dtype), idx, found,
                idx_t, found_t)
        else:
            x = sparse.sparse_conv_apply(
                feats.astype(self.dtype), idx, found, w.astype(self.dtype))
        x = MaskedBatchNorm(
            use_running_average=self.use_running_average,
            axis_names=self.axis_names, dtype=self.dtype,
        )(x, out_mask)
        if self.act:
            x = nn.relu(x)
        return jnp.where(out_mask[:, None], x, 0.0)


class SparseBasicBlock(nn.Module):
    """Residual pair of submanifold convs (reference SparseBasicBlock,
    backbone3d.py:85)."""

    features: int
    use_running_average: bool = False
    axis_names: Sequence[str] = ()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, idx, found, mask, idx_t=None, found_t=None):
        identity = feats
        x = SparseConvBNReLU(
            self.features, idx.shape[1], self.use_running_average,
            act=True, axis_names=self.axis_names, dtype=self.dtype,
        )(feats, idx, found, mask, idx_t, found_t)
        x = SparseConvBNReLU(
            self.features, idx.shape[1], self.use_running_average,
            act=False, axis_names=self.axis_names, dtype=self.dtype,
        )(x, idx, found, mask, idx_t, found_t)
        return nn.relu(x + identity)


class VoxelResBackbone8x(nn.Module):
    """[16,32,64,128]-channel sparse residual backbone, 8x BEV downsample.

    __call__(voxel_features, plan) -> dict with the dense BEV map
    ('spatial_features', NHWC with z folded into channels) and per-level
    sparse features for a second-stage head (multi_scale_3d_features in the
    reference, backbone3d.py:330).
    """

    grid_zyx: tuple = (40, 1504, 1504)
    channels: Sequence[int] = (16, 32, 64, 128)
    blocks_per_level: int = 2
    residual: bool = True  # False = plain subm stacks (reference VoxelBackBone8x)
    use_running_average: bool = False
    axis_names: Sequence[str] = ()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, voxel_features, plan):
        grids = plan_grids(self.grid_zyx)
        kw = dict(use_running_average=self.use_running_average,
                  axis_names=self.axis_names, dtype=self.dtype)
        x = voxel_features.astype(self.dtype)
        lvl0 = plan[0]
        # input stem: one submanifold conv to channels[0]
        x = SparseConvBNReLU(self.channels[0], lvl0["subm_idx"].shape[1], **kw)(
            x, lvl0["subm_idx"], lvl0["subm_found"], lvl0["mask"],
            lvl0.get("subm_idx_t"), lvl0.get("subm_found_t"),
        )
        multi_scale = {}
        for lvl in range(4):
            entry = plan[lvl]
            for b in range(self.blocks_per_level):
                block = (SparseBasicBlock(self.channels[lvl], **kw)
                         if self.residual else
                         SparseConvBNReLU(self.channels[lvl],
                                          entry["subm_idx"].shape[1], **kw))
                x = block(
                    x, entry["subm_idx"], entry["subm_found"], entry["mask"],
                    entry.get("subm_idx_t"), entry.get("subm_found_t"),
                )
            multi_scale[f"x_conv{lvl + 1}"] = {
                "features": x, "coords": entry["coords"],
                "mask": entry["mask"], "ids": entry["ids"],
            }
            if lvl < 3:
                nxt = plan[lvl + 1]
                x = SparseConvBNReLU(self.channels[lvl + 1], entry["down_idx"].shape[1], **kw)(
                    x, entry["down_idx"], entry["down_found"], nxt["mask"],
                    entry.get("down_idx_t"), entry.get("down_found_t"),
                )
        # final z-stride conv to the BEV table (gather maps live on the final
        # level entry itself — they read from level-4's table)
        final = plan[4]
        x = SparseConvBNReLU(self.channels[3], final["down_idx"].shape[1], **kw)(
            x, final["down_idx"], final["down_found"], final["mask"],
            final.get("down_idx_t"), final.get("down_found_t"),
        )
        bev = scatter_to_dense_bev(x, final["coords"], final["mask"], grids[4])
        return {
            "spatial_features": bev,  # (H/8, W/8, nz_final * C)
            "multi_scale_3d_features": multi_scale,
        }
