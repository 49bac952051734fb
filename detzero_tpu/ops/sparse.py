"""Sparse 3D convolution re-expressed for the MXU.

Replaces spconv 2.x (submanifold + strided sparse conv; reference
backbone3d.py:3,68-73,190-195) with a TPU-native formulation (SURVEY §7):

  * the voxel table is kept **sorted by linear id** (the voxelizer emits it
    that way), so neighbor lookup is a binary search (`jnp.searchsorted`)
    instead of a hash table;
  * a submanifold conv becomes  gather -> (V, K*Cin) @ (K*Cin, Cout)  — one
    large dense matmul per layer that tiles straight onto the MXU;
  * a strided ("regular") sparse conv first derives the downsampled voxel set
    (unique of floor(coords/stride), again via sort) and then does the same
    gather-matmul from the input table.

Everything is static-shape: each stride level has a fixed voxel budget and a
validity mask. Index maps depend only on coordinates, so they are built once
per forward pass and shared by every layer at the same stride (build_* are
pure jnp and jit-inline into the train step).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from detzero_tpu.ops.voxelize import INVALID_ID


def kernel_offsets_zyx(kernel_size) -> np.ndarray:
    """(K, 3) integer offsets, zyx order, centered (kernel must be odd)."""
    kz, ky, kx = kernel_size
    oz, oy, ox = np.meshgrid(
        np.arange(kz) - kz // 2, np.arange(ky) - ky // 2, np.arange(kx) - kx // 2,
        indexing="ij",
    )
    return np.stack([oz.ravel(), oy.ravel(), ox.ravel()], axis=1).astype(np.int32)


def _lookup(ids_sorted, query_ids):
    """Binary search query ids in the sorted table. Returns (idx, found)."""
    idx = jnp.searchsorted(ids_sorted, query_ids).astype(jnp.int32)
    idx = jnp.minimum(idx, ids_sorted.shape[0] - 1)
    found = ids_sorted[idx] == query_ids
    return idx, found


def build_submanifold_index(voxel_ids, coords_zyx, mask, grid_zyx, kernel_size):
    """Neighbor index map for a submanifold conv at this stride level.

    Returns idx (V, K) int32 rows into the (sorted) voxel table and
    found (V, K) bool. Built once and reused by every SubM layer at the level.
    """
    nz, ny, nx = grid_zyx
    offs = jnp.asarray(kernel_offsets_zyx(kernel_size))  # (K, 3)
    nb = coords_zyx[:, None, :] + offs[None, :, :]  # (V, K, 3)
    inb = (
        (nb[..., 0] >= 0) & (nb[..., 0] < nz)
        & (nb[..., 1] >= 0) & (nb[..., 1] < ny)
        & (nb[..., 2] >= 0) & (nb[..., 2] < nx)
    ) & mask[:, None]
    nid = (nb[..., 0] * ny + nb[..., 1]) * nx + nb[..., 2]
    nid = jnp.where(inb, nid, INVALID_ID)
    idx, found = _lookup(voxel_ids, nid)
    return idx, found & inb


def _unique_capped(ids, capacity: int):
    """Sorted-unique of a (possibly INVALID_ID-padded) id vector under a
    static capacity. Returns (unique_ids (capacity,), valid_mask (capacity,));
    overflow beyond capacity is dropped (validity-mask contract)."""
    sids = jnp.sort(ids)
    first = jnp.concatenate([jnp.array([True]), sids[1:] != sids[:-1]])
    first = first & (sids != INVALID_ID)
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    seg = jnp.where(sids != INVALID_ID, jnp.minimum(seg, capacity), capacity)
    n_out = jnp.minimum(first.sum(), capacity)
    out_ids = jax.ops.segment_min(
        jnp.where(sids != INVALID_ID, sids, INVALID_ID), seg,
        num_segments=capacity + 1, indices_are_sorted=True,
    )[:capacity]
    out_mask = jnp.arange(capacity) < n_out
    return jnp.where(out_mask, out_ids, INVALID_ID), out_mask


def build_downsample(voxel_ids, coords_zyx, mask, grid_zyx, stride_zyx,
                     kernel_size, out_capacity: int,
                     site_mode: str = "principal"):
    """Derive the strided-conv output voxel set and its gather index.

    site_mode:
      * "principal" (default): output sites = unique(floor(in_coords /
        stride)) — each input voxel contributes its principal output site.
        Cheapest index build; the site set the detector trains with.
      * "union": exact spconv semantics (SparseConv3d stride s, padding
        ks//2, backbone3d.py:190-195) — every output position whose gather
        window touches >= 1 input voxel, i.e. the union of
        {(u - k) / stride : k in offsets, stride | (u - k)} over inputs u.
        Superset of "principal"; costs a sort over V_in*K candidates.

    The gather window for output o is {o*stride + k, k in [-(ks//2), ks//2]}
    in input coords either way. Returns
    (out_ids, out_coords, out_mask, idx (Vo, K), found (Vo, K), out_grid).
    """
    nz, ny, nx = grid_zyx
    sz, sy, sx = stride_zyx
    onz, ony, onx = -(-nz // sz), -(-ny // sy), -(-nx // sx)
    st = jnp.asarray([sz, sy, sx], jnp.int32)

    if site_mode == "principal":
        oc = coords_zyx // st[None, :]
        oid = (oc[:, 0] * ony + oc[:, 1]) * onx + oc[:, 2]
        oid = jnp.where(mask, oid, INVALID_ID)
    elif site_mode == "union":
        offs = jnp.asarray(kernel_offsets_zyx(kernel_size))  # (K, 3)
        cand = coords_zyx[:, None, :] - offs[None, :, :]     # o*s == u - k
        div = (cand % st[None, None, :] == 0).all(-1)
        oc = cand // st[None, None, :]
        ok = (
            (oc[..., 0] >= 0) & (oc[..., 0] < onz)
            & (oc[..., 1] >= 0) & (oc[..., 1] < ony)
            & (oc[..., 2] >= 0) & (oc[..., 2] < onx)
        ) & div & mask[:, None]
        oid = (oc[..., 0] * ony + oc[..., 1]) * onx + oc[..., 2]
        oid = jnp.where(ok, oid, INVALID_ID).reshape(-1)
    else:
        raise ValueError(f"unknown site_mode {site_mode!r}")

    out_ids, out_mask = _unique_capped(oid, out_capacity)

    z = out_ids // (ony * onx)
    rem = out_ids - z * (ony * onx)
    out_coords = jnp.stack([z, rem // onx, rem - (rem // onx) * onx], axis=1)
    out_coords = jnp.where(out_mask[:, None], out_coords, 0)

    offs = jnp.asarray(kernel_offsets_zyx(kernel_size))
    base = out_coords * jnp.asarray([sz, sy, sx], jnp.int32)[None, :]
    nb = base[:, None, :] + offs[None, :, :]  # (Vo, K, 3) in input coords
    inb = (
        (nb[..., 0] >= 0) & (nb[..., 0] < nz)
        & (nb[..., 1] >= 0) & (nb[..., 1] < ny)
        & (nb[..., 2] >= 0) & (nb[..., 2] < nx)
    ) & out_mask[:, None]
    nid = (nb[..., 0] * ny + nb[..., 1]) * nx + nb[..., 2]
    nid = jnp.where(inb, nid, INVALID_ID)
    idx, found = _lookup(voxel_ids, nid)
    return out_ids, out_coords, out_mask, idx, found & inb, (onz, ony, onx)


def sparse_conv_apply(features, idx, found, weight, preferred_dtype=jnp.float32):
    """The conv compute: gather neighbors, one MXU matmul.

    features: (V_in, Cin); idx/found: (V_out, K); weight: (K, Cin, Cout).
    Returns (V_out, Cout) accumulations.

    NOTE: autodiff of the gather produces a scatter-add over (V_out*K)
    duplicate indices — pathologically slow on TPU. Training paths should use
    sparse_conv_apply_vjp with a transpose index map instead.
    """
    v_out, k = idx.shape
    cin = features.shape[1]
    gathered = features[idx]  # (V_out, K, Cin)
    gathered = jnp.where(found[..., None], gathered, 0.0)
    flat = gathered.reshape(v_out, k * cin)
    w = weight.reshape(k * cin, -1)
    return jnp.dot(flat, w, preferred_element_type=preferred_dtype)


def build_transpose_index(out_ids, in_coords, in_mask, stride_zyx, kernel_size,
                          out_grid_zyx):
    """Inverse rulebook: for each INPUT voxel u and kernel offset k, the
    OUTPUT row v with  v*stride + off[k] == u  (i.e. the output that gathered
    u through slot k). The gradient of a sparse conv w.r.t. its input is then
    itself a gather-matmul through this map — no scatter ever materializes.

    Returns idx_t (V_in, K), found_t (V_in, K) rows into the out table.
    """
    onz, ony, onx = out_grid_zyx
    st = jnp.asarray(stride_zyx, jnp.int32)
    offs = jnp.asarray(kernel_offsets_zyx(kernel_size))  # (K, 3)
    cand = in_coords[:, None, :] - offs[None, :, :]      # (V_in, K, 3)
    divisible = (cand % st[None, None, :] == 0).all(-1)
    oc = cand // st[None, None, :]
    inb = (
        (oc[..., 0] >= 0) & (oc[..., 0] < onz)
        & (oc[..., 1] >= 0) & (oc[..., 1] < ony)
        & (oc[..., 2] >= 0) & (oc[..., 2] < onx)
    ) & divisible & in_mask[:, None]
    oid = (oc[..., 0] * ony + oc[..., 1]) * onx + oc[..., 2]
    oid = jnp.where(inb, oid, INVALID_ID)
    idx_t, found_t = _lookup(out_ids, oid)
    return idx_t, found_t & inb


@jax.custom_vjp
def sparse_conv_apply_vjp(features, weight, idx, found, idx_t, found_t):
    """sparse_conv_apply with a scatter-free backward:
        d features = gather-matmul(g, idx_t, found_t, W^T per slot)
        d weight[k] = gathered_k^T @ g   (a dense MXU contraction)
    """
    return sparse_conv_apply(features, idx, found, weight)


def _scv_fwd(features, weight, idx, found, idx_t, found_t):
    out = sparse_conv_apply(features, idx, found, weight)
    return out, (features, weight, idx, found, idx_t, found_t)


def _scv_bwd(res, g):
    features, weight, idx, found, idx_t, found_t = res
    k, cin, cout = weight.shape
    g = g.astype(features.dtype)
    # dW: contraction over output rows, per slot — one batched matmul
    gathered = jnp.where(found[..., None], features[idx], 0.0)  # (Vo, K, Cin)
    dw = jnp.einsum("vkc,vd->kcd", gathered, g,
                    preferred_element_type=jnp.float32).astype(weight.dtype)
    # dX: sparse conv of g through the transpose map with W^T slots
    w_t = jnp.transpose(weight, (0, 2, 1))  # (K, Cout, Cin)
    dx = sparse_conv_apply(g, idx_t, found_t, w_t).astype(features.dtype)
    return dx, dw, None, None, None, None


sparse_conv_apply_vjp.defvjp(_scv_fwd, _scv_bwd)
