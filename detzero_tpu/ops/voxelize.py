"""Fixed-capacity dynamic voxelization — the TPU replacement for both the
reference's CPU voxelizer (spconv Point2VoxelCPU3d, detection data_processor
py:61-91) and its on-GPU DynamicMeanVFE (vfe.py:124-146, torch unique +
torch_scatter.scatter_mean).

Design: everything is static-shape and on-device. Points arrive padded to a
fixed budget P with a validity mask. We hash integer voxel coords to a linear
id, sort once, detect segment boundaries, and segment-mean the point features
into a fixed voxel budget V (the reference's MAX_NUMBER_OF_VOXELS semantics,
waymo_5sweeps.yaml:79-82). The voxel table comes out **sorted by linear id**,
which is exactly the order the sparse backbone's hash lookups need — the sort
is paid once per step and shared by every sparse conv layer at stride 1.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

INVALID_ID = jnp.iinfo(jnp.int32).max


def compute_voxel_coords(points, voxel_size, pc_range):
    """points (P, 3+) -> int32 (P, 3) zyx coords + in-range mask (P,)."""
    vs = jnp.asarray(voxel_size, dtype=points.dtype)
    lo = jnp.asarray(pc_range[:3], dtype=points.dtype)
    hi = jnp.asarray(pc_range[3:6], dtype=points.dtype)
    grid = jnp.round((hi - lo) / vs).astype(jnp.int32)  # (nx, ny, nz)
    xyz = points[:, :3]
    idx = jnp.floor((xyz - lo) / vs).astype(jnp.int32)  # (P, 3) xyz order
    in_range = jnp.all((idx >= 0) & (idx < grid[None, :]), axis=1)
    coords_zyx = idx[:, ::-1]
    return coords_zyx, in_range, (int(grid[2]), int(grid[1]), int(grid[0]))


def linearize_coords(coords_zyx, grid_zyx):
    """(N, 3) zyx int -> (N,) linear id. Row-major z-major so that sorted order
    groups z-planes (cheap locality for the final z-compression)."""
    nz, ny, nx = grid_zyx
    return (coords_zyx[:, 0] * ny + coords_zyx[:, 1]) * nx + coords_zyx[:, 2]


def delinearize_ids(ids, grid_zyx):
    nz, ny, nx = grid_zyx
    z = ids // (ny * nx)
    rem = ids - z * (ny * nx)
    y = rem // nx
    x = rem - y * nx
    return jnp.stack([z, y, x], axis=1)


@partial(jax.jit, static_argnames=("max_voxels", "grid_zyx"))
def dynamic_voxelize(points, valid, grid_zyx, voxel_size, pc_range, max_voxels):
    """Segment-mean voxelization with a static voxel budget.

    Args:
        points: (P, 3+F) padded point cloud (first 3 = xyz).
        valid:  (P,) bool validity of each point row.
        grid_zyx: static (nz, ny, nx).
        max_voxels: static voxel budget V.

    Returns dict with:
        voxel_features: (V, 3+F) mean of member points.
        voxel_ids:      (V,) linear ids, sorted ascending; INVALID_ID padding.
        voxel_coords:   (V, 3) int32 zyx.
        voxel_mask:     (V,) bool.
        num_voxels:     () int32.
        point_voxel_idx:(P,) int32 index into the voxel table (-1 when dropped)
                        — lets later stages scatter per-point data per voxel.
    """
    p = points.shape[0]
    vs = jnp.asarray(voxel_size, dtype=points.dtype)
    lo = jnp.asarray(pc_range[:3], dtype=points.dtype)
    nz, ny, nx = grid_zyx
    idx = jnp.floor((points[:, :3] - lo) / vs).astype(jnp.int32)
    in_range = (
        (idx[:, 0] >= 0) & (idx[:, 0] < nx)
        & (idx[:, 1] >= 0) & (idx[:, 1] < ny)
        & (idx[:, 2] >= 0) & (idx[:, 2] < nz)
    )
    ok = valid & in_range
    ids = jnp.where(ok, (idx[:, 2] * ny + idx[:, 1]) * nx + idx[:, 0], INVALID_ID)

    order = jnp.argsort(ids)
    sids = ids[order]
    spoints = points[order]
    sok = ok[order]

    first = jnp.concatenate([jnp.array([True]), sids[1:] != sids[:-1]]) & sok
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1  # segment index per sorted point
    seg = jnp.where(sok, seg, max_voxels)  # invalid points -> overflow bucket
    seg = jnp.minimum(seg, max_voxels)  # voxels beyond budget also overflow

    num_voxels = jnp.minimum(first.sum(), max_voxels)

    sums = jax.ops.segment_sum(
        spoints, seg, num_segments=max_voxels + 1, indices_are_sorted=True
    )[:max_voxels]
    counts = jax.ops.segment_sum(
        sok.astype(points.dtype), seg, num_segments=max_voxels + 1,
        indices_are_sorted=True,
    )[:max_voxels]
    feats = sums / jnp.maximum(counts[:, None], 1.0)

    # Each segment's id: scatter-min of sorted ids into segments.
    voxel_ids = jax.ops.segment_min(
        jnp.where(sok, sids, INVALID_ID), seg, num_segments=max_voxels + 1,
        indices_are_sorted=True,
    )[:max_voxels]
    voxel_mask = jnp.arange(max_voxels) < num_voxels
    voxel_ids = jnp.where(voxel_mask, voxel_ids, INVALID_ID)
    vz = voxel_ids // (ny * nx)
    rem = voxel_ids - vz * (ny * nx)
    coords = jnp.stack([vz, rem // nx, rem - (rem // nx) * nx], axis=1)
    coords = jnp.where(voxel_mask[:, None], coords, 0)

    inv = jnp.zeros(p, jnp.int32).at[order].set(jnp.where(seg >= max_voxels, -1, seg))
    return {
        "voxel_features": feats,
        "voxel_ids": voxel_ids,
        "voxel_coords": coords,
        "voxel_mask": voxel_mask,
        "num_voxels": num_voxels,
        "point_voxel_idx": inv,
    }


def scatter_to_dense_bev(features, coords_zyx, mask, grid_zyx, reduce_z: bool = True):
    """(V, C) sparse voxels -> dense BEV map.

    With reduce_z=True, stacks z-slices into channels like the reference's
    HeightCompression (height_compression.py:4): output (H, W, C*nz).

    TPU-native densification: instead of a V-row scatter-add (scatter is
    the slowest op class on TPU and showed up as a prime suspect in the
    r2 full-scale profile), sort the (unique) voxel ids and build the
    dense grid as a searchsorted GATHER — every dense cell binary-searches
    its id in the sorted table and pulls the row on hit. Voxel ids are
    unique by construction (one row per voxel); if duplicates were ever
    fed in, the first match wins instead of summing.
    """
    nz, ny, nx = grid_zyx
    n_cells = nz * ny * nx
    flat_idx = (coords_zyx[:, 0] * ny + coords_zyx[:, 1]) * nx + coords_zyx[:, 2]
    flat_idx = jnp.where(mask, flat_idx, n_cells)  # padding past every query
    dense = _densify(features, flat_idx, mask, n_cells).reshape(nz, ny, nx,
                                                                -1)
    if reduce_z:
        # (nz, H, W, C) -> (H, W, nz*C): channel blocks ordered by z
        c = features.shape[1]
        return jnp.transpose(dense, (1, 2, 0, 3)).reshape(ny, nx, nz * c)
    return dense


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _densify(features, flat_idx, mask, n_cells):
    return _densify_fwd_impl(features, flat_idx, mask, n_cells)


def _densify_fwd_impl(features, flat_idx, mask, n_cells):
    v = features.shape[0]
    feats = jnp.where(mask[:, None], features, 0.0)
    order = jnp.argsort(flat_idx)  # V log V, V ~ 1e4-1e5: cheap
    sid = flat_idx[order]
    sfeat = feats[order]
    q = jnp.arange(n_cells, dtype=sid.dtype)
    pos = jnp.clip(jnp.searchsorted(sid, q), 0, v - 1)
    hit = sid[pos] == q
    return jnp.where(hit[:, None], sfeat[pos], 0)


def _densify_fwd(features, flat_idx, mask, n_cells):
    return _densify_fwd_impl(features, flat_idx, mask, n_cells), \
        (flat_idx, mask)


def _densify_bwd(n_cells, res, g):
    # unique ids => each voxel row simply reads its own cell's gradient:
    # a V-row GATHER (autodiff of the forward gather would emit an
    # n_cells-row scatter-add instead — the op this rewrite removed)
    flat_idx, mask = res
    safe = jnp.clip(flat_idx, 0, n_cells - 1)
    dfeat = jnp.where(mask[:, None], g[safe], 0.0)
    return dfeat, None, None


_densify.defvjp(_densify_fwd, _densify_bwd)
