"""PointNet++-style grouping ops as static-shape XLA programs.

Replaces the reference's pointnet2_stack/_batch CUDA extensions
(pointnet2_api.cpp: ball_query, farthest_point_sampling, group_points,
three_nn, three_interpolate, voxel_query) with masked vectorized programs:

  * farthest_point_sampling — fixed-K lax.fori_loop over a running min-dist;
  * ball_query — per-query masked 'first nsample within radius' via a rank
    compaction (matches the CUDA op's take-in-index-order semantics);
  * voxel_query — neighbor search through the SORTED voxel-id table
    (searchsorted over a fixed offset pattern), the PDV-efficient variant;
  * three_nn / three_interpolate — top-3 nearest + inverse-distance weights.

Everything takes validity masks and returns fixed shapes, so the ops compose
under jit/vmap for the PDV second stage (pdv_head).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from detzero_tpu.ops.voxelize import INVALID_ID


def farthest_point_sampling(points, valid, k: int):
    """(N, 3), (N,) -> (k,) int32 indices. Classic FPS with masked distances."""
    points = jnp.asarray(points)
    valid = jnp.asarray(valid)
    n = points.shape[0]
    big = jnp.where(valid, 0.0, -jnp.inf)

    def body(i, carry):
        idx, mind = carry
        last = points[idx[i - 1]]
        d = jnp.sum((points - last) ** 2, axis=1)
        mind = jnp.minimum(mind, d)
        nxt = jnp.argmax(jnp.where(valid, mind, -jnp.inf))
        idx = idx.at[i].set(nxt.astype(jnp.int32))
        return idx, mind

    first = jnp.argmax(valid).astype(jnp.int32)
    idx0 = jnp.zeros(k, jnp.int32).at[0].set(first)
    mind0 = jnp.full(n, jnp.inf) + big
    idx, _ = jax.lax.fori_loop(1, k, body, (idx0, mind0))
    return idx


def ball_query(centers, points, points_valid, radius: float, nsample: int):
    """(M, 3) centers x (N, 3) points -> idx (M, nsample), cnt (M,).

    Keeps the first `nsample` in-radius points in index order (CUDA ball_query
    semantics); rows with fewer matches repeat the first match (CUDA fills
    with idx[0]); empty rows return cnt 0.
    """
    d2 = jnp.sum((centers[:, None, :] - points[None, :, :3]) ** 2, axis=-1)
    hit = (d2 < radius * radius) & points_valid[None, :]
    rank = jnp.cumsum(hit, axis=1) - 1  # rank of each hit within its row
    take = hit & (rank < nsample)
    # compact to (M, nsample): scatter column index by rank
    m = centers.shape[0]
    idx = jnp.zeros((m, nsample), jnp.int32)
    col = jnp.broadcast_to(jnp.arange(points.shape[0])[None, :], hit.shape)
    scatter_rows = jnp.broadcast_to(jnp.arange(m)[:, None], hit.shape)
    safe_rank = jnp.where(take, rank, nsample)  # dump overflow
    idx = jnp.zeros((m, nsample + 1), jnp.int32).at[
        scatter_rows.reshape(-1), safe_rank.reshape(-1)
    ].max(jnp.where(take, col, 0).reshape(-1))[:, :nsample]
    cnt = jnp.minimum(hit.sum(axis=1), nsample)
    # fill empty slots with the row's first hit (slot 0)
    fill = idx[:, :1]
    slot = jnp.arange(nsample)[None, :]
    idx = jnp.where(slot < jnp.maximum(cnt, 1)[:, None], idx, fill)
    return idx, cnt.astype(jnp.int32)


def voxel_query(query_coords_zyx, voxel_ids, grid_zyx, max_range: int = 1,
                nsample: int = 16):
    """Neighbor voxels of integer coords through the sorted-id table.

    query_coords_zyx (M, 3) int32; voxel_ids (V,) sorted. Returns
    idx (M, nsample) rows into the voxel table + found (M, nsample).
    Probes the (2r+1)^3 offset pattern in fixed order and keeps the first
    nsample hits (reference voxel_query semantics).
    """
    nz, ny, nx = grid_zyx
    r = max_range
    offs = np.stack(np.meshgrid(*( [np.arange(-r, r + 1)] * 3), indexing="ij"),
                    -1).reshape(-1, 3).astype(np.int32)
    order = np.argsort(np.abs(offs).sum(1), kind="stable")  # near-first
    offs = jnp.asarray(offs[order])  # (K, 3)
    nb = query_coords_zyx[:, None, :] + offs[None, :, :]
    inb = (
        (nb[..., 0] >= 0) & (nb[..., 0] < nz)
        & (nb[..., 1] >= 0) & (nb[..., 1] < ny)
        & (nb[..., 2] >= 0) & (nb[..., 2] < nx)
    )
    nid = (nb[..., 0] * ny + nb[..., 1]) * nx + nb[..., 2]
    nid = jnp.where(inb, nid, INVALID_ID)
    pos = jnp.searchsorted(voxel_ids, nid).astype(jnp.int32)
    pos = jnp.minimum(pos, voxel_ids.shape[0] - 1)
    found = (voxel_ids[pos] == nid) & inb
    k = offs.shape[0]
    if k <= nsample:
        pad = nsample - k
        idx = jnp.pad(pos, ((0, 0), (0, pad)))
        fnd = jnp.pad(found, ((0, 0), (0, pad)))
        return idx, fnd
    # keep first nsample found (near-first order)
    rank = jnp.cumsum(found, axis=1) - 1
    take = found & (rank < nsample)
    m = query_coords_zyx.shape[0]
    rows = jnp.broadcast_to(jnp.arange(m)[:, None], found.shape)
    safe_rank = jnp.where(take, rank, nsample)
    idx = jnp.zeros((m, nsample + 1), jnp.int32).at[
        rows.reshape(-1), safe_rank.reshape(-1)
    ].max(jnp.where(take, pos, 0).reshape(-1))[:, :nsample]
    fnd = jnp.arange(nsample)[None, :] < jnp.minimum(found.sum(1), nsample)[:, None]
    return idx, fnd


def group_points(features, idx, found=None):
    """features (N, C), idx (M, S) -> (M, S, C), zeroed where not found."""
    g = features[idx]
    if found is not None:
        g = jnp.where(found[..., None], g, 0.0)
    return g


def three_nn(query, points, points_valid):
    """(M, 3) x (N, 3) -> (dist (M, 3), idx (M, 3)) of the 3 nearest valid."""
    d2 = jnp.sum((query[:, None, :] - points[None, :, :3]) ** 2, axis=-1)
    d2 = jnp.where(points_valid[None, :], d2, jnp.inf)
    neg, idx = jax.lax.top_k(-d2, 3)
    return jnp.sqrt(jnp.maximum(-neg, 0.0)), idx.astype(jnp.int32)


def three_interpolate(features, idx, dist):
    """features (N, C); idx/dist (M, 3) -> (M, C) inverse-distance blend."""
    w = 1.0 / jnp.maximum(dist, 1e-8)
    w = w / w.sum(axis=1, keepdims=True)
    return (features[idx] * w[..., None]).sum(axis=1)


def vector_pool(centers, points, points_valid, features, radius: float,
                grid=(2, 2, 2), nsample: int = 32):
    """Local vector pooling (reference pointnet2_stack vector_pool_wrapper,
    pointnet2_utils.py:467; PV-RCNN++ VectorPoolAggregation — present in the
    reference's compiled op surface, off DetZero's main path).

    For each center, in-radius neighbors are binned into a (gz, gy, gx)
    local grid spanning the [-radius, radius]^3 cube; features are MEAN
    pooled per cell and concatenated with the cell's mean relative offset.

    centers (M, 3); points (N, 3); points_valid (N,); features (N, C).
    Returns (pooled (M, G, C + 3), counts (M, G)) with G = gz*gy*gx —
    a fixed "vector" of per-subvoxel descriptors per center, zero where a
    cell is empty. One one-hot (nsample x G) matmul per center does the
    binning — MXU-friendly, no scatters.
    """
    gz, gy, gx = grid
    g = gz * gy * gx
    idx, cnt = ball_query(centers, points, points_valid, radius, nsample)
    nb = points[idx]  # (M, S, 3)
    valid = jnp.arange(nsample)[None, :] < cnt[:, None]  # (M, S)
    rel = nb - centers[:, None, :]
    # bin into the local grid (clip handles boundary fp wobble)
    cell = jnp.floor((rel + radius) / (2 * radius) *
                     jnp.asarray([gx, gy, gz], rel.dtype)).astype(jnp.int32)
    cell = jnp.clip(cell, 0, jnp.asarray([gx - 1, gy - 1, gz - 1]))
    cid = (cell[..., 2] * gy + cell[..., 1]) * gx + cell[..., 0]  # (M, S)
    onehot = jax.nn.one_hot(jnp.where(valid, cid, g), g, axis=-1,
                            dtype=features.dtype)  # (M, S, G)
    counts = onehot.sum(axis=1)  # (M, G)
    denom = jnp.maximum(counts, 1.0)
    fg = group_points(features, idx, valid)  # (M, S, C)
    pooled_f = jnp.einsum("msg,msc->mgc", onehot, fg) / denom[..., None]
    pooled_xyz = jnp.einsum("msg,msc->mgc", onehot,
                            jnp.where(valid[..., None], rel, 0.0)) \
        / denom[..., None]
    pooled = jnp.concatenate([pooled_xyz, pooled_f], axis=-1)
    return pooled, counts.astype(jnp.int32)
