"""Z-dense pillar voxel structure — the TPU-native sparse-conv layout (r3).

Why this exists (measured on TPU v5e, tools/bisect_perf.py): the r2 sorted-
voxel-table design paid for neighbor lookup with `jnp.searchsorted`, and one
27-neighborhood search (3.2M queries into a 120k table) costs **395 ms** on
TPU — XLA lowers binary search to ~18 serial gather passes, and TPU gathers
cost ~4.6 ns per *index* regardless of row width.  With ~6 such searches per
forward the old layout spent ~1.5 s/frame on index math alone (the r2 bench:
0.52 frames/s).  The fixes that follow from the measurements:

  * make gathers FEWER and FATTER: sparse only over BEV cells (a "pillar" =
    one occupied (y, x) cell), DENSE over z within a pillar.  A pillar row
    is nz*C contiguous values, so a 3x3x3 conv needs 9 row gathers per
    output instead of 27 scalar-row gathers;
  * replace every search with a dense row LUT: one (ny*nx,) int32 table per
    stride level, built with a single small scatter, makes neighbor lookup
    ONE gather (measured: LUT build 64k rows ~5 ms, 450k lookups ~2 ms —
    vs 395 ms of searchsorted);
  * the z-extent of the conv becomes a dense conv1d along z — MXU FLOPs
    (which are nearly free) instead of gathers;
  * submanifold semantics (outputs only at occupied sites; reference
    backbone3d.py:68-73 spconv SubMConv3d) are restored exactly by masking
    conv outputs with the per-pillar z-occupancy mask;
  * HeightCompression (reference height_compression.py:4) becomes a reshape
    of the final pillar table plus one small scatter to the BEV grid.

Everything is static-shape: a fixed pillar budget MP per stride level with a
validity mask, dense (MP, nz, C) feature tensors, and (MP, 9) neighbor maps.
The backward pass never scatters: the gradient of the 9-offset BEV gather is
itself a 9-offset BEV gather through the column-reversed (stride 1) or
explicitly-built transpose (strided) neighbor map.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

INVALID_ID = jnp.iinfo(jnp.int32).max

# BEV kernel offsets in (dy, dx) raster order; j and 8-j are negations.
BEV_OFFSETS = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


# ---------------------------------------------------------------------------
# Pillar table construction (the voxelizer)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("grid_zyx", "max_pillars",
                                   "with_point_slot", "feats_mode"))
def build_pillar_table(points, valid, grid_zyx, voxel_size, pc_range,
                       max_pillars, with_point_slot: bool = False,
                       feats_mode: str = "dense"):
    """Points -> z-dense pillar table. One argsort; no searches.

    Replaces both the reference CPU voxelizer (Point2VoxelCPU3d,
    data_processor.py:61-91) and DynamicMeanVFE (vfe.py:124-146).

    Args:
        points: (P, 3+F) padded cloud, xyz first.
        valid: (P,) bool.
        grid_zyx: static (nz, ny, nx).
        max_pillars: static pillar budget MP.
        with_point_slot: also emit per-point dense slot index (adds an
            inverse-permutation scatter; only request when needed).
        feats_mode: "dense" (default) materializes the (MP, nz, F) mean
            table via the wide segment scatter; "stream" skips it (feats
            is a zeros placeholder the consumer must ignore) and instead
            emits a "stream" sub-dict (payload/meta/wstart) for the
            pallas stream_rowpad_feats kernel, which reduces the sorted
            stream STRAIGHT into the row-padded conv layout — the wide
            scatter costs 14.2 ms/frame on TPU, the kernel ~2
            (tools/bisect_perf.py segsum_sorted_160kx5 vs stream_feats).

    Returns dict:
        cells:    (MP,) int32 linear BEV id y*nx+x, ascending; INVALID pad.
        coords2d: (MP, 2) int32 (y, x).
        mask:     (MP,) bool pillar validity.
        num_pillars: () int32.
        feats:    (MP, nz, 3+F) per-voxel segment means (zeros where empty).
        zmask:    (MP, nz) bool voxel occupancy.
        [point_slot: (P,) int32 pillar_row * nz + z, or -1.]
    """
    p = points.shape[0]
    nz, ny, nx = grid_zyx
    # the fused scatter below rides the BEV cell id through a float payload
    # column in points.dtype — exact only while every id fits the mantissa
    # (ADVICE r4): enforce statically rather than corrupt silently
    assert points.dtype == jnp.float32, (
        f"build_pillar_table needs float32 points (cell ids ride a float "
        f"payload column), got {points.dtype}")
    assert ny * nx < (1 << 24), (
        f"BEV grid {ny}x{nx} overflows the f32-exact integer range of the "
        f"fused cell-id payload (need ny*nx < 2^24)")
    vs = jnp.asarray(voxel_size, dtype=points.dtype)
    lo = jnp.asarray(pc_range[:3], dtype=points.dtype)
    idx = jnp.floor((points[:, :3] - lo) / vs).astype(jnp.int32)  # xyz order
    ok = (
        valid
        & (idx[:, 0] >= 0) & (idx[:, 0] < nx)
        & (idx[:, 1] >= 0) & (idx[:, 1] < ny)
        & (idx[:, 2] >= 0) & (idx[:, 2] < nz)
    )
    cell = idx[:, 1] * nx + idx[:, 0]          # y * nx + x
    key = cell * nz + idx[:, 2]                 # pillar-major, z minor
    key = jnp.where(ok, key, INVALID_ID)

    order = jnp.argsort(key)
    skey = key[order]
    spts = points[order]
    sok = ok[order]
    scell = skey // nz
    sz = skey - scell * nz

    # pillar boundaries over the sorted stream
    pfirst = jnp.concatenate([jnp.array([True]), scell[1:] != scell[:-1]]) & sok
    prow = jnp.cumsum(pfirst.astype(jnp.int32)) - 1           # pillar index
    in_budget = sok & (prow < max_pillars)
    num_pillars = jnp.minimum(pfirst.sum(), max_pillars)

    # dense slot per point; overflow/invalid -> dump slot
    slot = jnp.where(in_budget, prow * nz + sz, max_pillars * nz)

    # ONE fused scatter for sums + counts + per-pillar cell id.  TPU scatter
    # cost is dominated by a per-row serialization (~90 ns/row measured via
    # tools/bisect_perf.py), so three separate segment ops over the same
    # 160k-row stream triple the bill for no reason.  The cell id rides as a
    # payload column: every occupied slot's points share one scell value
    # (<= ny*nx ~ 2.3M, exact in f32), so sum(scell * slot_first) recovers
    # it per slot, and a dense max over z lifts it to the pillar.
    w = in_budget.astype(points.dtype)
    stream = None
    if feats_mode == "dense":
        cellcol = jnp.where(in_budget, scell, 0).astype(points.dtype)
        sfirst = (jnp.concatenate([jnp.array([True]), skey[1:] != skey[:-1]])
                  & in_budget)
        payload = jnp.concatenate([
            jnp.where(in_budget[:, None], spts, 0.0),  # where, not *w:
            w[:, None],                                # 0*nan = nan
            (cellcol * sfirst)[:, None],
        ], axis=1)
        agg = jax.ops.segment_sum(
            payload, slot,
            num_segments=max_pillars * nz + 1, indices_are_sorted=True,
        )[:-1]
        sums, counts, cellv = agg[:, :-2], agg[:, -2], agg[:, -1]
        feats = (sums / jnp.maximum(counts[:, None], 1.0)).reshape(
            max_pillars, nz, -1)
        zmask = (counts > 0).reshape(max_pillars, nz)
        # per-pillar cell id: every occupied z slot of a pillar carries the
        # same scell, so a dense z-max replaces the old segment_min scatter
        cells = cellv.reshape(max_pillars, nz).max(axis=1).astype(jnp.int32)
    elif feats_mode == "stream":
        # narrow (1-column) scatters only: slot occupancy + per-pillar cell.
        # The means never materialize densely — stream_rowpad_feats reduces
        # them straight into the conv layout.
        counts1 = jax.ops.segment_sum(
            w, slot, num_segments=max_pillars * nz + 1,
            indices_are_sorted=True)[:-1]
        zmask = (counts1 > 0).reshape(max_pillars, nz)
        feats = jnp.zeros((max_pillars, nz, points.shape[1]), points.dtype)
        pseg = jnp.where(in_budget, prow, max_pillars)
        cells = jax.ops.segment_max(
            jnp.where(in_budget, scell, -1), pseg,
            num_segments=max_pillars + 1, indices_are_sorted=True,
        )[:-1].astype(jnp.int32)
        srow = jnp.where(in_budget, scell // nx, ny)
        # per-row point windows + per-row pillar starts (rank -> lane)
        whist = jnp.zeros(ny + 1, jnp.int32).at[srow].add(
            in_budget.astype(jnp.int32))[:-1]
        wstart = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(whist)])
        prow_row = jnp.where(in_budget & pfirst, srow, ny)
        phist = jnp.zeros(ny + 1, jnp.int32).at[prow_row].add(1)[:-1]
        pstart = jnp.cumsum(phist) - phist
        lane = jnp.where(in_budget,
                         prow - pstart[jnp.clip(srow, 0, ny - 1)],
                         jnp.iinfo(jnp.int32).max // 2)
        n = spts.shape[0]
        nq = -(-n // 128)
        pad = nq * 128 - n

        def _pack(cols, dtype):
            a = jnp.pad(jnp.stack(cols, axis=1).astype(dtype),
                        ((0, pad), (0, 0)))
            k = a.shape[1]
            return jnp.transpose(a.reshape(nq, 128, k),
                                 (0, 2, 1)).reshape(nq * k, 128)

        stream = {
            "payload": _pack(
                [jnp.where(in_budget, spts[:, i], 0.0)
                 for i in range(spts.shape[1])] + [w], points.dtype),
            "meta": _pack([lane, jnp.where(in_budget, sz, nz)], jnp.int32),
            "wstart": wstart,
        }
    else:
        raise ValueError(feats_mode)
    mask = jnp.arange(max_pillars) < num_pillars
    cells = jnp.where(mask, cells, INVALID_ID)
    coords2d = jnp.where(
        mask[:, None],
        jnp.stack([cells // nx, cells % nx], axis=1), 0).astype(jnp.int32)

    out = {
        "cells": cells.astype(jnp.int32), "coords2d": coords2d,
        "mask": mask, "num_pillars": num_pillars,
        "feats": feats, "zmask": zmask,
    }
    if with_point_slot:
        out["point_slot"] = jnp.full(p, -1, jnp.int32).at[order].set(
            jnp.where(in_budget, slot, -1))
    if stream is not None:
        out["stream"] = stream
    return out


# ---------------------------------------------------------------------------
# Row LUT + neighbor maps
# ---------------------------------------------------------------------------

def build_row_lut(cells, mask, bev_hw):
    """Dense (ny*nx,) int32 LUT: cell -> pillar row + 1 (0 = empty).

    One unique-index scatter of MP values — this replaces every searchsorted
    of the r2 design."""
    ny, nx = bev_hw
    safe = jnp.where(mask, cells, ny * nx)
    lut = jnp.zeros(ny * nx + 1, jnp.int32)
    rows = (jnp.arange(cells.shape[0], dtype=jnp.int32) + 1) * mask
    return lut.at[safe].max(rows, unique_indices=True)[:-1]


def build_subm_neighbors(lut, coords2d, mask, bev_hw):
    """(MP, 9) neighbor rows/found for a stride-1 (submanifold) conv.
    Column j holds BEV offset BEV_OFFSETS[j]; column 8-j is its negation,
    which is exactly the transpose map the backward pass needs."""
    ny, nx = bev_hw
    y, x = coords2d[:, 0], coords2d[:, 1]
    idx_cols, fnd_cols = [], []
    for dy, dx in BEV_OFFSETS:
        yy, xx = y + dy, x + dx
        inb = (yy >= 0) & (yy < ny) & (xx >= 0) & (xx < nx) & mask
        v = lut[jnp.clip(yy * nx + xx, 0, ny * nx - 1)]
        fnd_cols.append(inb & (v > 0))
        idx_cols.append(jnp.maximum(v - 1, 0))
    return jnp.stack(idx_cols, 1), jnp.stack(fnd_cols, 1)


def build_down_neighbors(in_lut, out_coords2d, out_mask, in_bev_hw):
    """(MPo, 9) gather map for a BEV-stride-2 conv: output (yo, xo) gathers
    input cells (2yo+dy, 2xo+dx) (spconv SparseConv3d stride 2, padding 1;
    reference backbone3d.py:190-195)."""
    ny, nx = in_bev_hw
    yo, xo = out_coords2d[:, 0], out_coords2d[:, 1]
    idx_cols, fnd_cols = [], []
    for dy, dx in BEV_OFFSETS:
        yy, xx = 2 * yo + dy, 2 * xo + dx
        inb = (yy >= 0) & (yy < ny) & (xx >= 0) & (xx < nx) & out_mask
        v = in_lut[jnp.clip(yy * nx + xx, 0, ny * nx - 1)]
        fnd_cols.append(inb & (v > 0))
        idx_cols.append(jnp.maximum(v - 1, 0))
    return jnp.stack(idx_cols, 1), jnp.stack(fnd_cols, 1)


def build_down_transpose(out_lut, in_coords2d, in_mask, out_bev_hw):
    """(MPi, 9) transpose map for the strided conv's input gradient: input
    (y, x) contributed through offset (dy, dx) to output ((y-dy)/2, (x-dx)/2)
    when divisible. Column j corresponds to forward column j."""
    ony, onx = out_bev_hw
    y, x = in_coords2d[:, 0], in_coords2d[:, 1]
    idx_cols, fnd_cols = [], []
    for dy, dx in BEV_OFFSETS:
        ty, tx = y - dy, x - dx
        div = (ty % 2 == 0) & (tx % 2 == 0)
        yo, xo = ty // 2, tx // 2
        inb = (yo >= 0) & (yo < ony) & (xo >= 0) & (xo < onx) & div & in_mask
        v = out_lut[jnp.clip(yo * onx + xo, 0, ony * onx - 1)]
        fnd_cols.append(inb & (v > 0))
        idx_cols.append(jnp.maximum(v - 1, 0))
    return jnp.stack(idx_cols, 1), jnp.stack(fnd_cols, 1)


# ---------------------------------------------------------------------------
# Downsampled pillar sets
# ---------------------------------------------------------------------------

def _unique_capped_cells(cand, capacity, payload=None):
    """Sorted-unique of an INVALID-padded candidate vector under a static
    budget (same contract as ops/sparse._unique_capped).

    With `payload` (int32, >= 0, same length), additionally returns the
    bitwise-OR of the payload over each unique value's duplicate run —
    REQUIRES runs of length <= 4 (true for principal-site downsampling:
    a parent cell has at most 4 distinct BEV children).  The OR rides the
    sort as a second operand, so the whole reduction is one unstable
    2-operand sort + 2 shifted OR passes + 1 segment_max (no dense LUT)."""
    if payload is None:
        s = jnp.sort(cand)
    else:
        s, p = jax.lax.sort((cand, payload), num_keys=1, is_stable=False)
    first = jnp.concatenate([jnp.array([True]), s[1:] != s[:-1]])
    first = first & (s != INVALID_ID)
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    seg = jnp.where(s != INVALID_ID, jnp.minimum(seg, capacity), capacity)
    n = jnp.minimum(first.sum(), capacity)
    out = jax.ops.segment_min(
        jnp.where(s != INVALID_ID, s, INVALID_ID), seg,
        num_segments=capacity + 1, indices_are_sorted=True)[:capacity]
    mask = jnp.arange(capacity) < n
    cells = jnp.where(mask, out, INVALID_ID)
    if payload is None:
        return cells, mask, n
    # run-OR over duplicates: after d=1 row i covers [i, i+1]; after d=2,
    # [i, i+3] — so each run's FIRST row holds the full OR (run <= 4), and
    # every later row holds a bit-subset, making segment_max == that OR.
    for d in (1, 2):
        same = jnp.concatenate([s[:-d] == s[d:],
                                jnp.zeros((d,), bool)])
        shifted = jnp.concatenate([p[d:], jnp.zeros((d,), p.dtype)])
        p = jnp.where(same, p | shifted, p)
    por = jax.ops.segment_max(
        jnp.where(s != INVALID_ID, p, 0), seg,
        num_segments=capacity + 1, indices_are_sorted=True)[:capacity]
    return cells, mask, n, jnp.where(mask, por, 0)


def downsample_pillars(table, in_bev_hw, in_nz, out_capacity,
                       site_mode: str = "principal", in_lut=None):
    """Derive the stride-(2,2,2) output pillar set + z occupancy.

    site_mode "principal": out voxel (zo,yo,xo) occupied iff an occupied
    input voxel has floor-halved coords (zo,yo,xo) — the site set
    unique(floor(coords/2)) the detector trains with (ops/sparse.py default).
    site_mode "union": exact spconv semantics — occupied iff the 3x3x3
    gather window around (2zo,2yo,2xo) touches any occupied input voxel.

    in_lut=None with "principal" takes the LUT-FREE route: the z-pair-
    reduced occupancy rides the unique sort as packed int32 bits and is
    OR-reduced along each parent's <= 4-child run (_unique_capped_cells
    payload) — no dense (ny*nx) scatter anywhere.  Bit-identical to the
    LUT route (tests/test_pillars.py::test_downsample_lutfree_parity).
    """
    ny, nx = in_bev_hw
    ony, onx = -(-ny // 2), -(-nx // 2)
    onz = -(-in_nz // 2)
    cells, mask, zmask = table["cells"], table["mask"], table["zmask"]
    y, x = cells // nx, cells % nx

    if site_mode == "principal" and in_lut is None:
        # LUT-free principal route (flagship pallas path)
        assert onz < 31, "z occupancy bits must fit an int32 payload"
        cand = jnp.where(mask, (y // 2) * onx + x // 2, INVALID_ID)
        pad = in_nz + (-in_nz) % 2
        zm = jnp.pad(zmask, ((0, 0), (0, pad - in_nz)))
        zhalf = zm.reshape(zm.shape[0], pad // 2, 2).any(-1)[:, :onz]
        weights = (jnp.int32(1) << jnp.arange(onz, dtype=jnp.int32))
        bits = (zhalf.astype(jnp.int32) * weights).sum(1, dtype=jnp.int32)
        bits = jnp.where(mask, bits, 0)
        out_cells, out_mask, n_out, zbits = _unique_capped_cells(
            cand, out_capacity, payload=bits)
        out_coords2d = jnp.where(
            out_mask[:, None],
            jnp.stack([out_cells // onx, out_cells % onx], 1),
            0).astype(jnp.int32)
        zagg = ((zbits[:, None] >> jnp.arange(onz, dtype=jnp.int32)) & 1
                ).astype(bool) & out_mask[:, None]
        return {"cells": out_cells.astype(jnp.int32),
                "coords2d": out_coords2d, "mask": out_mask,
                "num_pillars": n_out, "zmask": zagg,
                "bev_hw": (ony, onx), "nz": onz}

    if site_mode == "principal":
        cand = jnp.where(mask, (y // 2) * onx + x // 2, INVALID_ID)
    elif site_mode == "union":
        cols = []
        for dy, dx in BEV_OFFSETS:
            ty, tx = y - dy, x - dx
            div = (ty % 2 == 0) & (tx % 2 == 0)
            yo, xo = ty // 2, tx // 2
            inb = (yo >= 0) & (yo < ony) & (xo >= 0) & (xo < onx) & div & mask
            cols.append(jnp.where(inb, yo * onx + xo, INVALID_ID))
        cand = jnp.concatenate(cols)
    else:
        raise ValueError(f"unknown site_mode {site_mode!r}")

    out_cells, out_mask, n_out = _unique_capped_cells(cand, out_capacity)
    out_coords2d = jnp.where(
        out_mask[:, None],
        jnp.stack([out_cells // onx, out_cells % onx], 1), 0).astype(jnp.int32)

    # output z occupancy from child/window zmasks
    if in_lut is None:
        in_lut = build_row_lut(cells, mask, in_bev_hw)
    pad = in_nz + (-in_nz) % 2
    zm = jnp.pad(zmask, ((0, 0), (0, pad - in_nz)))
    if site_mode == "principal":
        # children pillars (2yo+{0,1}, 2xo+{0,1}); z pairs OR-reduced
        zagg = jnp.zeros((out_cells.shape[0], onz), bool)
        for cy in (0, 1):
            for cx in (0, 1):
                yy, xx = 2 * out_coords2d[:, 0] + cy, 2 * out_coords2d[:, 1] + cx
                inb = (yy < ny) & (xx < nx) & out_mask
                v = in_lut[jnp.clip(yy * nx + xx, 0, ny * nx - 1)]
                child = zm[jnp.maximum(v - 1, 0)] & ((v > 0) & inb)[:, None]
                zagg = zagg | child.reshape(-1, pad // 2, 2).any(-1)[:, :onz]
    else:
        # union: any occupied input in the 3-window around (2zo, 2yo, 2xo)
        zext = jnp.pad(zmask, ((0, 0), (1, 1)))  # z-halo
        zagg = jnp.zeros((out_cells.shape[0], onz), bool)
        zo_idx = 2 * jnp.arange(onz)
        for dy, dx in BEV_OFFSETS:
            yy = 2 * out_coords2d[:, 0] + dy
            xx = 2 * out_coords2d[:, 1] + dx
            inb = (yy >= 0) & (yy < ny) & (xx >= 0) & (xx < nx) & out_mask
            v = in_lut[jnp.clip(yy * nx + xx, 0, ny * nx - 1)]
            nb = zext[jnp.maximum(v - 1, 0)] & ((v > 0) & inb)[:, None]
            win = (nb[:, zo_idx] | nb[:, zo_idx + 1] | nb[:, zo_idx + 2])
            zagg = zagg | win
    zagg = zagg & out_mask[:, None]
    return {"cells": out_cells.astype(jnp.int32), "coords2d": out_coords2d,
            "mask": out_mask, "num_pillars": n_out, "zmask": zagg,
            "bev_hw": (ony, onx), "nz": onz}


def halve_zmask(zmask, out_nz):
    """Principal-site z occupancy for a z-only stride-2 conv (the final
    (3,1,1)/(2,1,1) layer): out z occupied iff either child z occupied."""
    nz = zmask.shape[1]
    pad = nz + (-nz) % 2
    zm = jnp.pad(zmask, ((0, 0), (0, pad - nz)))
    return zm.reshape(zmask.shape[0], pad // 2, 2).any(-1)[:, :out_nz]


# ---------------------------------------------------------------------------
# The conv compute: BEV gather (scatter-free VJP) + dense z conv1d
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=())
def bev_gather(feats, idx, found, idx_t, found_t):
    """Gather-concat of the 9 BEV neighbors directly into the conv1d input
    layout: feats (MPi, nz, C) -> (MPo, nz, 9*C), block j = offset
    BEV_OFFSETS[j] (zeros where not found).  The 9 per-offset gathers fuse
    into one output buffer (no (MPo, 9, nz, C) + transpose copy, which at
    L0 Waymo scale would be an extra 1.4 GB round-trip).

    Backward is itself a bev_gather through the transpose map:
        dF[q] = sum_j found_t[q, j] * dG[idx_t[q, j], :, jC:(j+1)C]
    so no scatter ever materializes.  For stride-1 maps pass
    idx_t = idx[:, ::-1] (offset negation)."""
    mp, nz, c = feats.shape
    flat = feats.reshape(mp, nz * c)   # FLAT rows: a (nz,C)-slice gather is
    # 6.7x slower than the same bytes as flat rows (bisect: gather3d 62 ms
    # vs gather2d 9.2 ms) — always gather 2D
    parts = []
    for j in range(idx.shape[1]):
        g = flat[idx[:, j]].reshape(-1, nz, c)
        parts.append(jnp.where(found[:, j][:, None, None], g, 0))
    return jnp.concatenate(parts, axis=-1)


def _bev_gather_fwd(feats, idx, found, idx_t, found_t):
    return bev_gather(feats, idx, found, idx_t, found_t), (idx_t, found_t)


def _bev_gather_bwd(res, dg):
    idx_t, found_t = res
    nine = idx_t.shape[1]
    mpo, nz, _ = dg.shape
    c = dg.shape[-1] // nine
    # one contiguous reorder (j major), then 9 flat 2D gathers
    dgt = dg.reshape(mpo, nz, nine, c).transpose(2, 0, 1, 3).reshape(
        nine, mpo, nz * c)
    parts = 0.0
    for j in range(nine):
        rows = dgt[j][idx_t[:, j]].reshape(-1, nz, c)
        parts = parts + jnp.where(found_t[:, j][:, None, None], rows, 0)
    return parts.astype(dg.dtype), None, None, None, None


bev_gather.defvjp(_bev_gather_fwd, _bev_gather_bwd)


def pillar_conv(feats, zmask_out, idx, found, idx_t, found_t, weight,
                z_stride: int = 1, out_nz: int | None = None,
                preferred_dtype=jnp.float32):
    """One sparse 3D conv on the pillar structure.

    feats: (MPi, nz_in, Cin); weight: (27, Cin, Cout) in kernel_offsets_zyx
    order (k = ((dz+1)*3 + (dy+1))*3 + (dx+1)); idx/found: (MPo, 9) BEV
    gather map; idx_t/found_t: transpose map for the backward.

    The 27-tap conv = 9-offset BEV gather + conv1d over z with a
    (3, 9*Cin, Cout) kernel; outputs are masked to the occupied sites
    (submanifold semantics).
    """
    nz_in, cin = feats.shape[1], feats.shape[2]
    cout = weight.shape[2]
    g = bev_gather(feats, idx, found, idx_t, found_t)     # (MPo, nz, 9*Cin)
    # weight (27, Cin, Cout) -> (3(z-tap), 9(bev j), Cin, Cout)
    w = weight.reshape(3, 9, cin, cout).reshape(3, 9 * cin, cout)
    out = _zconv_matmul(g, w, z_stride, out_nz, preferred_dtype)
    return jnp.where(zmask_out[:, :out.shape[1], None], out, 0.0)


def _zconv_matmul(g, w3, z_stride, out_nz, preferred_dtype):
    """z-window conv as ONE matmul with N = 3*Cout plus an overlap-add of
    three strided slices.  lax.conv_general_dilated on (120k, 40, 144)
    measured 12.9 ms on v5e (the implicit GEMM runs at N=Cout=16, wasting
    7/8 of the MXU); this formulation runs the GEMM at N=3*Cout and the
    tap alignment as cheap slices: out[z] = sum_t unf[z*s + t, t]."""
    mpo, nz, k = g.shape
    cout = w3.shape[2]
    onz = out_nz if out_nz is not None else (nz - 1) // z_stride + 1
    gp = jnp.pad(g, ((0, 0), (1, 1), (0, 0)))
    w2 = jnp.transpose(w3, (1, 0, 2)).reshape(k, 3 * cout)
    unf = jnp.dot(gp.reshape(-1, k), w2,
                  preferred_element_type=preferred_dtype)
    unf = unf.reshape(mpo, nz + 2, 3, cout)
    out = 0.0
    for t in range(3):
        part = jax.lax.slice(
            unf, (0, t, t, 0),
            (mpo, t + z_stride * (onz - 1) + 1, t + 1, cout),
            (1, z_stride, 1, 1))
        out = out + part[:, :, 0, :]
    return out


def z_conv(feats, zmask_out, weight, z_stride: int = 2,
           out_nz: int | None = None, preferred_dtype=jnp.float32):
    """The final (3,1,1)-kernel z-stride conv (reference backbone3d.py's
    conv_out): no BEV gather at all — one strided z-window matmul."""
    out = _zconv_matmul(feats, weight, z_stride, out_nz, preferred_dtype)
    return jnp.where(zmask_out[:, :out.shape[1], None], out, 0.0)


def voxel_query_pillar(query_coords_zyx, lut, zmask_flat, nz: int, bev_hw,
                       max_range: int = 1, nsample: int = 16):
    """Neighbor voxels of integer zyx coords through the pillar row LUT —
    the pillar-backend replacement for ops/pointnet2.voxel_query (reference
    voxel_query_wrapper): same (2r+1)^3 near-first probe order and
    first-nsample compaction, but each probe is ONE LUT gather instead of a
    binary search (the searchsorted probe costs ~12 ns/query/step on TPU;
    see tools/bisect_perf.py).

    Returns idx (M, nsample) rows into the FLAT (MP*nz) slot table +
    found (M, nsample)."""
    ny, nx = bev_hw
    r = max_range
    offs = np.stack(np.meshgrid(*([np.arange(-r, r + 1)] * 3), indexing="ij"),
                    -1).reshape(-1, 3).astype(np.int32)
    order = np.argsort(np.abs(offs).sum(1), kind="stable")  # near-first
    offs = jnp.asarray(offs[order])                          # (K, 3) zyx
    nb = query_coords_zyx[:, None, :] + offs[None, :, :]
    inb = (
        (nb[..., 0] >= 0) & (nb[..., 0] < nz)
        & (nb[..., 1] >= 0) & (nb[..., 1] < ny)
        & (nb[..., 2] >= 0) & (nb[..., 2] < nx)
    )
    cell = jnp.clip(nb[..., 1] * nx + nb[..., 2], 0, ny * nx - 1)
    v = lut[cell]                                            # (M, K)
    slot = jnp.maximum(v - 1, 0) * nz + jnp.clip(nb[..., 0], 0, nz - 1)
    found = inb & (v > 0) & zmask_flat[slot]
    k = offs.shape[0]
    if k <= nsample:
        pad = nsample - k
        return (jnp.pad(slot, ((0, 0), (0, pad))),
                jnp.pad(found, ((0, 0), (0, pad))))
    # keep first nsample found (near-first order)
    m = query_coords_zyx.shape[0]
    rank = jnp.cumsum(found, axis=1) - 1
    take = found & (rank < nsample)
    rows = jnp.broadcast_to(jnp.arange(m)[:, None], found.shape)
    safe_rank = jnp.where(take, rank, nsample)
    idx = jnp.zeros((m, nsample + 1), jnp.int32).at[
        rows.reshape(-1), safe_rank.reshape(-1)
    ].max(jnp.where(take, slot, 0).reshape(-1))[:, :nsample]
    fnd = jnp.arange(nsample)[None, :] < jnp.minimum(
        found.sum(1), nsample)[:, None]
    return idx, fnd


# ---------------------------------------------------------------------------
# Row-padded transposed layout (the fused Pallas conv path, ops/pallas_pillar)
# ---------------------------------------------------------------------------

def rowpad_layout(cells, mask, bev_hw, row_budget, with_rank_lut=False):
    """BOTH sides of the row-padded mapping from one counts-scatter +
    cumsum.  BEV row y owns slots [y*B, (y+1)*B); rank = position within
    the row (cells are sorted, so same-row pillars are consecutive, which
    also means slot (y, r) <-> compact row row_start[y] + r is a pure
    GATHER — no scatter is needed to enter the rowpad layout).

    Returns dict:
        slot   (MP,)   int32  compact -> rowpad (ny*B for dropped/invalid)
        keep   (MP,)   bool   mask & rank < B
        gidx   (ny, B) int32  rowpad slot -> compact row (clipped)
        gvalid (ny, B) bool   slot occupancy
        [rank_lut (ny*nx,) int32 rank+1, 0 = empty — only the XLA
         build_rowpad_nbr consumes it]
    """
    ny, nx = bev_hw
    b = row_budget
    mp = cells.shape[0]
    y = jnp.where(mask, cells // nx, 0)
    counts = jnp.zeros(ny, jnp.int32).at[y].add(mask.astype(jnp.int32))
    row_start = jnp.cumsum(counts) - counts
    rank = jnp.arange(mp, dtype=jnp.int32) - row_start[y]
    keep = mask & (rank < b)
    slot = jnp.where(keep, y * b + rank, ny * b)
    gidx = jnp.clip(row_start[:, None] + jnp.arange(b, dtype=jnp.int32),
                    0, max(mp - 1, 0))
    gvalid = jnp.arange(b, dtype=jnp.int32)[None, :] < jnp.minimum(
        counts, b)[:, None]
    out = {"slot": slot.astype(jnp.int32), "keep": keep,
           "gidx": gidx.astype(jnp.int32), "gvalid": gvalid}
    if with_rank_lut:
        safe_cells = jnp.where(keep, cells, ny * nx)
        out["rank_lut"] = jnp.zeros(ny * nx + 1, jnp.int32).at[
            safe_cells].max((rank + 1) * keep, unique_indices=True)[:-1]
    return out


def rowpad_slots(cells, mask, bev_hw, row_budget, with_rank_lut=True):
    """Compat wrapper over rowpad_layout: (slot, keep, rank_lut)."""
    lay = rowpad_layout(cells, mask, bev_hw, row_budget,
                        with_rank_lut=with_rank_lut)
    return lay["slot"], lay["keep"], lay.get("rank_lut")


def rowpad_xcoords(xcoord, gidx, gvalid, big):
    """Per-slot x-coordinate table (ny, B) int32 for the Pallas
    neighbor-map kernel (ops/pallas_pillar.rowpad_nbr): slot -> its
    pillar's x, `big` where the slot is empty.  Pure gather through the
    rowpad_layout gidx map — zero scatters."""
    return jnp.where(gvalid, xcoord.astype(jnp.int32)[gidx], big)


@jax.custom_vjp
def rowpad_gather(values, gidx, gvalid, slot, keep):
    """Compact per-pillar rows (MP, D) -> transposed row-padded (ny, D, B)
    by GATHER (bit-identical to to_rowpad, which scatters the same
    bijection — XLA scatter costs ~90 ns/row on TPU, the gather ~4.5 ns).
    The custom VJP is also a gather (from_rowpad through slot/keep), so
    neither direction of the rowpad boundary touches a scatter."""
    return _rowpad_gather_impl(values, gidx, gvalid)


def _rowpad_gather_impl(values, gidx, gvalid):
    got = values[gidx]                      # (ny, B, D)
    got = jnp.where(gvalid[..., None], got, 0)
    return jnp.transpose(got, (0, 2, 1))


def _rowpad_gather_fwd(values, gidx, gvalid, slot, keep):
    return _rowpad_gather_impl(values, gidx, gvalid), (slot, keep)


def _rowpad_gather_bwd(res, g):
    slot, keep = res
    return from_rowpad(g, slot, keep), None, None, None, None


rowpad_gather.defvjp(_rowpad_gather_fwd, _rowpad_gather_bwd)


def to_rowpad(values, slot, keep, ny, row_budget):
    """Scatter per-pillar rows (MP, D) into the transposed row-padded
    layout (ny, D, B)."""
    b = row_budget
    d = values.shape[-1]
    flat = jnp.zeros((ny * b + 1, d), values.dtype).at[slot].set(
        jnp.where(keep[:, None], values, 0), unique_indices=True)[:-1]
    return jnp.transpose(flat.reshape(ny, b, d), (0, 2, 1))


def from_rowpad(rp, slot, keep, fill=0.0):
    """Gather the compact per-pillar rows (MP, D) back out of (ny, D, B)."""
    ny, d, b = rp.shape
    flat = jnp.transpose(rp, (0, 2, 1)).reshape(ny * b, d)
    got = flat[jnp.minimum(slot, ny * b - 1)]
    return jnp.where(keep[:, None], got, fill)


@jax.custom_vjp
def from_rowpad_g(rp, slot, keep, gidx, gvalid):
    """from_rowpad with a gather-only VJP: plain autodiff of the slot
    gather emits a scatter-add of the cotangent; the rowpad mapping is a
    bijection, so the cotangent is just rowpad_gather of the compact
    gradient (gidx/gvalid from rowpad_layout)."""
    return from_rowpad(rp, slot, keep)


def _from_rowpad_g_fwd(rp, slot, keep, gidx, gvalid):
    return from_rowpad(rp, slot, keep), (gidx, gvalid)


def _from_rowpad_g_bwd(res, g):
    gidx, gvalid = res
    return _rowpad_gather_impl(g, gidx, gvalid), None, None, None, None


from_rowpad_g.defvjp(_from_rowpad_g_fwd, _from_rowpad_g_bwd)


def _nbr_scatter(vals, slot, keep, ny_out, b_out, b_in, nbr_rows):
    """(MP, 9) per-pillar tap ranks -> (ny_out, NBR_ROWS, B) kernel input
    (b_in everywhere a tap is absent)."""
    mp = vals.shape[0]
    vals = jnp.where(keep[:, None], vals, b_in)
    pad = jnp.full((mp, nbr_rows - 9), b_in, jnp.int32)
    rows = jnp.concatenate([vals.astype(jnp.int32), pad], 1)
    flat = jnp.full((ny_out * b_out + 1, nbr_rows), b_in, jnp.int32)
    flat = flat.at[slot].set(rows, unique_indices=True)[:-1]
    return jnp.transpose(flat.reshape(ny_out, b_out, nbr_rows), (0, 2, 1))


def rowpad_nbr_rank(xq_rp, x_in, mode="subm", nbr_rows=16, big=1 << 28):
    """Neighbor-rank tensor from per-row sorted x-coords — pure XLA.

    Same contract (bit-identical output) as ops/pallas_pillar.rowpad_nbr:
    xq_rp (ny_out, B_out) / x_in (ny_in, B_in) int32 x-coords with `big`
    filling empty slots; returns (ny_out, nbr_rows, B_out) int32 tap ranks
    (>= B_in when absent).  The rank of neighbor x' inside its target row
    is the count of strictly-smaller x-coords (rows hold unique sorted x).

    The (ny, B_in, B_out) broadcast compare fuses into its row-sum on TPU
    (measured 1.0 ms vs the per-row pallas kernel's 1.36 at L0 — the
    kernel pays ~0.9 us/grid-step x ny rows x 10 invocations per plan),
    runs everywhere (no Mosaic/interpret path needed in the multichip
    dryrun), and replaces both the pallas kernel and the 16-wide-scatter
    XLA build on the FORCE_PALLAS=0 path."""
    ny_out, b_out = xq_rp.shape
    ny_in, b_in = x_in.shape
    i = jnp.arange(ny_out)
    qvalid = xq_rp < big
    rows = []
    for j in range(9):
        dy, dx = j // 3 - 1, j % 3 - 1
        pok = None
        if mode == "subm":
            xp = xq_rp + dx
            src = i + dy
        elif mode == "down":
            xp = 2 * xq_rp + dx
            src = 2 * i + dy
        elif mode == "up":
            num = xq_rp + dx + 2          # >= 1: trunc div == floor div
            xp = num // 2 - 1
            pok = (num % 2) == 0
            src = i + dy
        else:
            raise ValueError(mode)
        if mode == "up":
            rv = (src >= 0) & (src % 2 == 0) & (src // 2 < ny_in)
            xt = x_in[jnp.clip(src // 2, 0, ny_in - 1)]
        else:
            rv = (src >= 0) & (src < ny_in)
            xt = x_in[jnp.clip(src, 0, ny_in - 1)]
        lt = (xt[:, :, None] < xp[:, None, :]).sum(axis=1)       # (ny, B_out)
        fnd = (xt[:, :, None] == xp[:, None, :]).any(axis=1) & qvalid
        if pok is not None:
            fnd = fnd & pok
        fnd = fnd & rv[:, None]
        rows.append(jnp.where(fnd, lt, b_in).astype(jnp.int32))
    out = jnp.stack(rows, axis=1)
    pad = jnp.full((ny_out, nbr_rows - 9, b_out), b_in, jnp.int32)
    return jnp.concatenate([out, pad], axis=1)


def build_rowpad_nbr(coords2d, mask, slot, keep, in_rank_lut, in_bev_hw,
                     ny_out, b_out, b_in, mode="subm", nbr_rows=16):
    """Neighbor-rank tensor for ops/pallas_pillar.rowpad_conv.

    coords2d/mask/slot/keep describe the OUTPUT pillars ('up': the conv's
    input-level pillars, whose gradient is being built); in_rank_lut /
    in_bev_hw describe the table being gathered FROM ('up': the conv's
    output level).  mode: 'subm' target (y+dy, x+dx); 'down' target
    (2y+dy, 2x+dx); 'up' target ((y+dy)/2, (x+dx)/2) when divisible.
    """
    iny, inx = in_bev_hw
    yq, xq = coords2d[:, 0], coords2d[:, 1]
    cols = []
    for dy, dx in BEV_OFFSETS:
        if mode == "subm":
            ty, tx = yq + dy, xq + dx
            ok = mask
        elif mode == "down":
            ty, tx = 2 * yq + dy, 2 * xq + dx
            ok = mask
        elif mode == "up":
            sy, sx = yq + dy, xq + dx
            ok = mask & (sy % 2 == 0) & (sx % 2 == 0)
            ty, tx = sy // 2, sx // 2
        else:
            raise ValueError(mode)
        inb = ok & (ty >= 0) & (ty < iny) & (tx >= 0) & (tx < inx)
        v = in_rank_lut[jnp.clip(ty * inx + tx, 0, iny * inx - 1)]
        cols.append(jnp.where(inb & (v > 0), v - 1, b_in))
    vals = jnp.stack(cols, 1)
    return _nbr_scatter(vals, slot, keep, ny_out, b_out, b_in, nbr_rows)


def _densify_impl(feats, cells, mask, bev_hw):
    ny, nx = bev_hw
    safe = jnp.where(mask, cells, ny * nx)
    lut = jnp.zeros((ny * nx + 1,), jnp.int32)
    lut = lut.at[safe].max(
        jnp.arange(feats.shape[0], dtype=jnp.int32) + 1, unique_indices=True)
    padded = jnp.concatenate(
        [jnp.zeros((1, feats.shape[-1]), feats.dtype), feats], axis=0)
    return padded[lut[:-1]].reshape(ny, nx, -1)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def densify_pillars(feats, cells, mask, bev_hw):
    """(MP, D) pillar features -> dense (ny, nx, D) BEV map.

    Gather-based: TPU scatter cost scales with the payload width (measured
    11.3 ms for a 15k x 128 f32 row scatter vs 1.5 ms for one int column —
    tools/bisect_perf.py densify/scatter stages), so scatter only a rank LUT
    (1 int32 column) and lift the feature rows with a dense gather.  The VJP
    is a pure gather too (cells are unique per live pillar), so neither
    direction pays a wide scatter.

    PRECONDITION: live pillars have UNIQUE cells (build_pillar_table's
    sorted-dedup construction guarantees it). Unlike the old scatter-ADD,
    duplicate live cells would keep only the max-index row here (and the
    unique_indices=True scatter above is undefined behavior under
    duplicates) — pinned by tests/test_pillars.py round-trips (ADVICE r4)."""
    return _densify_impl(feats, cells, mask, bev_hw)


def _densify_fwd(feats, cells, mask, bev_hw):
    return _densify_impl(feats, cells, mask, bev_hw), (cells, mask)


def _densify_bwd(bev_hw, res, g):
    cells, mask = res
    ny, nx = bev_hw
    g2 = g.reshape(ny * nx, -1)
    safe = jnp.clip(jnp.where(mask, cells, 0), 0, ny * nx - 1)
    gf = jnp.where(mask[:, None], g2[safe], 0)
    return gf, None, None


densify_pillars.defvjp(_densify_fwd, _densify_bwd)
