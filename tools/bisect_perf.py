"""Scan-bisect performance harness (VERDICT r2 task 2).

jax.profiler hangs on the axon tunnel, so per-stage attribution is done by
timing each sub-graph at full Waymo scale with the serial-scan + scalar-fetch
methodology from bench.py: every stage runs SCAN iterations serially inside
ONE executable (the remote scheduler cannot overlap them), sync is a float()
fetch of the fused carry scalar (block_until_ready returns at dispatch-accept
on axon), and each iteration is data-perturbed by the carry so XLA cannot
hoist loop-invariant work out of the scan body.

Usage:
    python tools/bisect_perf.py micro          # op-level microbenches
    python tools/bisect_perf.py prefix         # voxelize/tables/forward/predict
    python tools/bisect_perf.py micro prefix   # both
    BISECT_ONLY=gather_l0,ss_l0 python tools/bisect_perf.py micro

Prints one JSON line per stage: {"stage", "ms", "per_iter_ms", ...}.
Results are recorded in COMPONENTS.md "Performance record".
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SCAN = int(os.environ.get("BISECT_SCAN", "4"))
N_ITER = int(os.environ.get("BISECT_ITER", "2"))

RESULTS = []


def _perturb(x, carry):
    """Make `x` depend on the loop carry so XLA cannot hoist the stage's
    computation out of the scan body. The perturbation is numerically zero
    at runtime but opaque to the compiler."""
    import jax.numpy as jnp

    eps = carry * 1e-38  # carry is f32; this underflows to 0 at runtime
    if jnp.issubdtype(x.dtype, jnp.floating):
        return x + eps.astype(x.dtype)
    if jnp.issubdtype(x.dtype, jnp.integer):
        return x + eps.astype(jnp.int32 if x.dtype != jnp.int64 else x.dtype).astype(x.dtype)
    return x  # bool: leave alone (fine as long as >=1 input is perturbed)


def time_stage(name, fn, args, scan=SCAN, n_iter=N_ITER, frames_per_iter=1.0,
               note=None):
    """fn(*args) -> pytree; timed as a serial scan of `scan` calls."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    args = tuple(jnp.asarray(a) for a in args)

    def fused(args):
        def body(carry, _):
            pargs = tuple(_perturb(a, carry) for a in args)
            out = fn(*pargs)
            leaves = [l for l in jax.tree.leaves(out)]
            s = sum(l.sum().astype(jnp.float32) for l in leaves[:2])
            return carry + s, ()

        c, _ = lax.scan(body, jnp.float32(0), None, length=scan)
        return c

    step = jax.jit(fused)
    t_c0 = time.perf_counter()
    float(step(args))  # compile + warm
    compile_s = time.perf_counter() - t_c0
    t0 = time.perf_counter()
    for _ in range(n_iter):
        float(step(args))
    dt = time.perf_counter() - t0
    per_iter_ms = dt / (n_iter * scan) * 1e3
    rec = {
        "stage": name,
        "per_iter_ms": round(per_iter_ms, 3),
        "per_frame_ms": round(per_iter_ms / frames_per_iter, 3),
        "scan": scan, "n_iter": n_iter,
        "compile_s": round(compile_s, 1),
    }
    if note:
        rec["note"] = note
    RESULTS.append(rec)
    print(json.dumps(rec), flush=True)
    return per_iter_ms


# ---------------------------------------------------------------------------
# Synthetic full-scale inputs (host-side numpy; no TPU dispatch needed)
# ---------------------------------------------------------------------------

P_FULL = 160_000
V_FULL = 120_000
GRID = (40, 1504, 1504)  # nz, ny, nx


def make_points(p=P_FULL, seed=0):
    rng = np.random.RandomState(seed)
    pts = rng.uniform(-70, 70, (p, 5)).astype(np.float32)
    pts[:, 2] = rng.uniform(-1.5, 3.5, p)
    return pts


def make_sorted_table(v=V_FULL, grid=GRID, seed=0):
    """Realistic sorted unique voxel ids: voxelize the synthetic cloud."""
    nz, ny, nx = grid
    pts = make_points(seed=seed)
    idx = np.floor((pts[:, :3] - np.array([-75.2, -75.2, -2.0])) /
                   np.array([0.1, 0.1, 0.15])).astype(np.int64)
    ok = ((idx >= 0) & (idx < np.array([nx, ny, nz]))).all(1)
    ids = (idx[ok, 2] * ny + idx[ok, 1]) * nx + idx[ok, 0]
    uids = np.unique(ids)[:v].astype(np.int64)
    n = len(uids)
    out = np.full(v, np.iinfo(np.int32).max, np.int64)
    out[:n] = uids
    mask = np.zeros(v, bool)
    mask[:n] = True
    z = out // (ny * nx)
    rem = out - z * (ny * nx)
    coords = np.stack([z, rem // nx, rem - (rem // nx) * nx], 1).astype(np.int32)
    coords[~mask] = 0
    return out.astype(np.int64), coords, mask, n


# ---------------------------------------------------------------------------
# Micro stages
# ---------------------------------------------------------------------------

def run_micro():
    import jax
    import jax.numpy as jnp

    from detzero_tpu.ops import sparse
    from detzero_tpu.ops.voxelize import INVALID_ID

    only = os.environ.get("BISECT_ONLY")
    only = set(only.split(",")) if only else None

    def want(name):
        return only is None or name in only

    ids64, coords, mask, n_real = make_sorted_table()
    ids = np.where(mask, ids64, np.iinfo(np.int32).max)
    # int32-safe? max id = 40*1504*1504 ≈ 90.5M < 2^31: yes
    ids32 = ids.astype(np.int32)
    rng = np.random.RandomState(1)
    feats16 = rng.randn(V_FULL, 16).astype(np.float32)
    w16 = rng.randn(27 * 16, 16).astype(np.float32) * 0.05
    pts = make_points()

    nz, ny, nx = GRID
    n_cells = nz * ny * nx

    # -- sorts ---------------------------------------------------------------
    if want("sort_points"):
        time_stage("sort_points_argsort160k",
                   lambda p: jnp.take(p, jnp.argsort(
                       (p[:, 0] * 1000).astype(jnp.int32)), axis=0),
                   (pts,), note="argsort 160k + row gather (voxelize pattern)")
    if want("sort_ids"):
        time_stage("sort_ids_120k", lambda i: jnp.sort(i), (ids32,))

    # -- searchsorted variants ----------------------------------------------
    offs = sparse.kernel_offsets_zyx((3, 3, 3))
    nb = coords[:, None, :] + offs[None, :, :]
    inb = ((nb[..., 0] >= 0) & (nb[..., 0] < nz)
           & (nb[..., 1] >= 0) & (nb[..., 1] < ny)
           & (nb[..., 2] >= 0) & (nb[..., 2] < nx)) & mask[:, None]
    nid = np.where(inb, (nb[..., 0].astype(np.int64) * ny + nb[..., 1]) * nx
                   + nb[..., 2], np.iinfo(np.int32).max).astype(np.int32)

    if want("ss_l0"):
        time_stage("ss_searchsorted_3.2M_in_120k",
                   lambda t, q: jnp.searchsorted(t, q),
                   (ids32, nid), note="current subm index build pattern")
    if want("ss_sort_method"):
        time_stage("ss_searchsorted_sortmethod",
                   lambda t, q: jnp.searchsorted(t, q.ravel(), method="sort"),
                   (ids32, nid), note="concat+sort searchsorted")
    if want("ss_9col"):
        # 9 searchsorteds of V queries (dx=0 planes only)
        nid9 = nid[:, 1::3]  # (V, 9)
        time_stage("ss_searchsorted_9x120k",
                   lambda t, q: jnp.searchsorted(t, q),
                   (ids32, nid9), note="dx=0 planes only (shift trick bound)")

    # -- dense LUT variant ---------------------------------------------------
    if want("lut_build"):
        def lut_build(i):
            lut = jnp.zeros(n_cells, jnp.int32)
            safe = jnp.clip(i, 0, n_cells - 1)
            return lut.at[safe].set(jnp.arange(V_FULL, dtype=jnp.int32) + 1,
                                    mode="drop", unique_indices=True)
        time_stage("lut_build_scatter120k_into_90M", lut_build, (ids32,),
                   note="dense LUT build: 120k unique scatter into 90M cells")
    if want("lut_lookup"):
        lut_np = np.zeros(n_cells, np.int32)
        lut_np[np.clip(ids32, 0, n_cells - 1)] = np.arange(V_FULL) + 1
        safe_q = np.clip(nid, 0, n_cells - 1)
        time_stage("lut_lookup_3.2M_from_90M",
                   lambda l, q: l[q], (lut_np, safe_q),
                   note="dense LUT lookup: one gather instead of 18")

    # -- conv gathers --------------------------------------------------------
    pos = np.minimum(np.searchsorted(ids, nid), V_FULL - 1).astype(np.int32)
    found = (ids[pos] == nid) & inb

    if want("gather_l0"):
        def conv_gather(f, i):
            g = f[i]
            g = jnp.where(jnp.asarray(found)[..., None], g, 0.0)
            return jnp.dot(g.reshape(V_FULL, 27 * 16), jnp.asarray(w16))
        time_stage("conv_gather_matmul_l0", conv_gather, (feats16, pos),
                   note="current sparse_conv_apply pattern (V=120k,K=27,C=16)")
    if want("gather_only"):
        time_stage("gather_only_3.2Mx16", lambda f, i: f[i], (feats16, pos),
                   note="the raw (V,27) row gather, no matmul")
    if want("gather_sorted"):
        # 27 per-column monotone gathers with the sorted hint
        def sorted_gathers(f, i):
            outs = []
            for k in range(27):
                outs.append(jax.lax.gather(
                    f, i[:, k:k + 1],
                    jax.lax.GatherDimensionNumbers(
                        offset_dims=(1,), collapsed_slice_dims=(0,),
                        start_index_map=(0,)),
                    slice_sizes=(1, 16), indices_are_sorted=True,
                    mode="clip"))
            return sum(outs)
        time_stage("gather_27x_sorted_hint", sorted_gathers, (feats16, pos),
                   note="per-offset monotone gathers w/ indices_are_sorted")
    if want("gather_bf16"):
        time_stage("gather_only_bf16",
                   lambda f, i: f[i], (feats16.astype(jnp.bfloat16), pos),
                   note="same gather, bf16 rows")
    if want("gather_c128"):
        feats128 = rng.randn(V_FULL, 128).astype(np.float32)
        time_stage("gather_only_3.2Mx128",
                   lambda f, i: f[i], (feats128, pos),
                   note="gather with 128-wide rows (lane-aligned)")
    if want("take_dense_bev"):
        # one-hot matmul alternative for C=16: dense scatter into z-planes?
        pass

    # -- pillar-architecture candidates (z-dense redesign) -------------------
    NP_, NZ_, NC_ = 65_536, 40, 16
    if want("gather_pillar"):
        ptab = rng.randn(NP_, NZ_ * NC_).astype(np.float32)
        pidx = rng.randint(0, NP_, 9 * 50_000).astype(np.int32)
        time_stage("gather_pillar_450kx640",
                   lambda t, i: t[i], (ptab, pidx),
                   note="pillar-row gather: 450k rows of 2.5KB (1.15GB out)")
    if want("gather_pillar_bf16"):
        ptab = rng.randn(NP_, NZ_ * NC_).astype(np.float32)
        pidx = rng.randint(0, NP_, 9 * 50_000).astype(np.int32)
        time_stage("gather_pillar_bf16",
                   lambda t, i: t.astype(jnp.bfloat16)[i], (ptab, pidx))
    if want("scatter_add_points"):
        pfeat = rng.randn(P_FULL, 5).astype(np.float32)
        slot = rng.randint(0, NP_ * NZ_, P_FULL).astype(np.int32)
        def scat(f, s):
            return jnp.zeros((NP_ * NZ_, 5), jnp.float32).at[s].add(f)
        time_stage("scatter_add_160k_into_2.6M", scat, (pfeat, slot),
                   note="pillar voxelize: point feature scatter-add")
    if want("cumsum_occ"):
        occ = (rng.rand(1504 * 1504) < 0.03).astype(np.int32)
        time_stage("cumsum_2.26M", lambda o: jnp.cumsum(o), (occ,),
                   note="pillar row compaction")
    if want("conv1d_z"):
        nb = rng.randn(50_000, NZ_, 48).astype(np.float32)
        wz = rng.randn(3, 48, NC_).astype(np.float32)
        def c1d(x, w):
            return jax.lax.conv_general_dilated(
                x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                window_strides=(1,), padding=((1, 1),),
                dimension_numbers=("NHC", "HIO", "NHC"),
                preferred_element_type=jnp.float32)
        time_stage("conv1d_z_50kx40x48", c1d, (nb, wz),
                   note="z-dense conv: one of 9 BEV-offset contributions")
    if want("gather3d"):
        t3 = rng.randn(NP_, NZ_, NC_).astype(np.float32)
        i1 = rng.randint(0, NP_, 120_000).astype(np.int32)
        time_stage("gather3d_120k_slices_40x16",
                   lambda t, i: t[i], (t3, i1),
                   note="one bev_gather column: (nz,C) slice per index")
    if want("gather3d_vmap"):
        t3 = rng.randn(1, NP_, NZ_, NC_).astype(np.float32)
        i1 = rng.randint(0, NP_, (1, 120_000)).astype(np.int32)
        time_stage("gather3d_vmap1",
                   lambda t, i: jax.vmap(lambda tt, ii: tt[ii])(t, i),
                   (t3, i1), note="same gather under vmap(batch=1)")
    if want("gather2d_flat"):
        t2 = rng.randn(NP_, NZ_ * NC_).astype(np.float32)
        i1 = rng.randint(0, NP_, 120_000).astype(np.int32)
        time_stage("gather2d_120k_rows_640",
                   lambda t, i: t[i], (t2, i1),
                   note="same bytes, flat (MP, nz*C) rows")
    if want("pillar_conv_l0"):
        from detzero_tpu.ops import pillars as _p
        t3 = rng.randn(120_000, NZ_, NC_).astype(np.float32)
        zm = rng.rand(120_000, NZ_) < 0.06
        idx9 = rng.randint(0, 120_000, (120_000, 9)).astype(np.int32)
        fnd9 = rng.rand(120_000, 9) < 0.5
        w27 = (rng.randn(27, NC_, NC_) * 0.05).astype(np.float32)
        def pconv(f, w):
            return _p.pillar_conv(f.astype(jnp.bfloat16), jnp.asarray(zm),
                                  jnp.asarray(idx9), jnp.asarray(fnd9),
                                  jnp.asarray(idx9[:, ::-1]),
                                  jnp.asarray(fnd9[:, ::-1]),
                                  w.astype(jnp.bfloat16))
        time_stage("pillar_conv_l0_full", pconv, (t3, w27),
                   note="one L0 pillar conv, unbatched, bf16")
    if want("pbev_gather"):
        from detzero_tpu.ops import pillars as _p
        t3 = rng.randn(120_000, NZ_, NC_).astype(np.float32)
        idx9 = rng.randint(0, 120_000, (120_000, 9)).astype(np.int32)
        fnd9 = rng.rand(120_000, 9) < 0.5
        def bg(f):
            return _p.bev_gather(f.astype(jnp.bfloat16), jnp.asarray(idx9),
                                 jnp.asarray(fnd9), jnp.asarray(idx9[:, ::-1]),
                                 jnp.asarray(fnd9[:, ::-1]))
        time_stage("pbev_gather_l0_bf16", bg, (t3,),
                   note="the 9-column flat bf16 gather alone (L0 scale)")
    if want("pzconv"):
        from detzero_tpu.ops import pillars as _p
        g = rng.randn(120_000, NZ_, 9 * NC_).astype(np.float32)
        w3 = (rng.randn(3, 9 * NC_, NC_) * 0.05).astype(np.float32)
        time_stage("pzconv_matmul_l0_f32acc",
                   lambda gg, ww: _p._zconv_matmul(
                       gg.astype(jnp.bfloat16), ww.astype(jnp.bfloat16),
                       1, None, jnp.float32), (g, w3),
                   note="overlap-add z matmul alone, f32 unf")
        time_stage("pzconv_matmul_l0_bf16acc",
                   lambda gg, ww: _p._zconv_matmul(
                       gg.astype(jnp.bfloat16), ww.astype(jnp.bfloat16),
                       1, None, jnp.bfloat16), (g, w3),
                   note="overlap-add z matmul alone, bf16 unf")
    def _pallas_fixture(ny, b, nz, cin, cout, seed=5):
        from detzero_tpu.ops import pallas_pillar as _pp
        r = np.random.RandomState(seed)
        tab = r.randn(ny, nz * cin, b).astype(np.float32)
        nbr = r.randint(0, b, (ny, _pp.NBR_ROWS, b)).astype(np.int32)
        nbr[r.rand(*nbr.shape) < 0.4] = b + 7
        w27 = (r.randn(27, cin, cout) * 0.05).astype(np.float32)
        w2 = np.asarray(_pp.weight_fwd(jnp.asarray(w27), cin, cout))
        return _pp, tab, nbr, w2

    if want("pallas_conv_l0"):
        _pp, tab, nbr, w2 = _pallas_fixture(1504, 128, NZ_, NC_, NC_)
        def pk(t, n, w):
            return _pp.rowpad_conv(t.astype(jnp.bfloat16), n, w,
                                   nz=NZ_, cin=NC_, cout=NC_)
        time_stage("pallas_conv_l0_rowpad", pk, (tab, nbr, w2),
                   note="fused pallas pillar conv, L0 (1504 rows x 128)")
    if want("pallas_conv_l0_sliding"):
        _pp, tab, nbr, w2 = _pallas_fixture(1504, 128, NZ_, NC_, NC_)
        def pks(t, n, w):
            return _pp.rowpad_conv_sliding(t.astype(jnp.bfloat16), n, w,
                                           nz=NZ_, cin=NC_, cout=NC_)
        time_stage("pallas_conv_l0_sliding", pks, (tab, nbr, w2),
                   note="sliding-window variant (1 input DMA/step)")
    if want("pallas_conv_l0_fusedbn"):
        _pp, tab, nbr, w2 = _pallas_fixture(1504, 128, NZ_, NC_, NC_)
        sc = np.ones(NC_, np.float32); bi = np.zeros(NC_, np.float32)
        zm = (np.random.RandomState(3).rand(1504, NZ_, 128) < 0.5)
        def pkf(t, n, w):
            return _pp.rowpad_conv_fused(t.astype(jnp.bfloat16), n, w,
                                         jnp.asarray(sc), jnp.asarray(bi),
                                         jnp.asarray(zm), None,
                                         nz=NZ_, cin=NC_, cout=NC_)
        time_stage("pallas_conv_l0_fusedbn", pkf, (tab, nbr, w2),
                   note="fused BN/ReLU/zmask epilogue variant")
    if want("pallas_conv_l0_down"):
        _pp, tab, _, _ = _pallas_fixture(1504, 128, NZ_, NC_, NC_)
        _, _, nbrd0, w2d = _pallas_fixture(752, 128, NZ_, NC_, 2 * NC_, seed=6)
        def pkd(t, n, w):
            return _pp.rowpad_conv(t.astype(jnp.bfloat16), n, w,
                                   nz=NZ_, cin=NC_, cout=2 * NC_, z_stride=2,
                                   out_nz=NZ_ // 2, mode="down")
        time_stage("pallas_conv_l0_down", pkd, (tab, nbrd0, w2d),
                   note="fused pallas down conv L0->L1")
    if want("pallas_conv_l1"):
        _pp, tab, nbr, w2 = _pallas_fixture(752, 128, NZ_ // 2, 2 * NC_,
                                            2 * NC_, seed=7)
        def pk1(t, n, w):
            return _pp.rowpad_conv(t.astype(jnp.bfloat16), n, w,
                                   nz=NZ_ // 2, cin=2 * NC_, cout=2 * NC_)
        time_stage("pallas_conv_l1_rowpad", pk1, (tab, nbr, w2),
                   note="L1 subm (752 rows x 128, nz 20, C 32)")
    if want("pallas_conv_l3"):
        _pp, tab, nbr, w2 = _pallas_fixture(188, 128, 5, 8 * NC_,
                                            8 * NC_, seed=8)
        def pk3(t, n, w):
            return _pp.rowpad_conv(t.astype(jnp.bfloat16), n, w,
                                   nz=5, cin=8 * NC_, cout=8 * NC_)
        time_stage("pallas_conv_l3_rowpad", pk3, (tab, nbr, w2),
                   note="L3 subm (188 rows x 128, nz 5, C 128)")
    if want("pallas_dw_l0"):
        _pp, tab, nbr, _ = _pallas_fixture(1504, 128, NZ_, NC_, NC_)
        ct = np.random.RandomState(9).randn(
            1504, NZ_ * NC_, 128).astype(np.float32)
        def pdw(t, n, c):
            return _pp.rowpad_conv_dw(t.astype(jnp.bfloat16), n,
                                      c.astype(jnp.bfloat16),
                                      nz=NZ_, cin=NC_, cout=NC_)
        time_stage("pallas_dw_l0", pdw, (tab, nbr, ct),
                   note="weight-grad kernel, L0 scale")
    if want("conv1d_big"):
        nb = rng.randn(120_000, NZ_, 9 * NC_).astype(np.float32)
        wz = (rng.randn(3, 9 * NC_, NC_) * 0.05).astype(np.float32)
        def c1d_big(x, w):
            return jax.lax.conv_general_dilated(
                x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                window_strides=(1,), padding=((1, 1),),
                dimension_numbers=("NHC", "HIO", "NHC"),
                preferred_element_type=jnp.float32)
        time_stage("conv1d_z_120kx40x144", c1d_big, (nb, wz),
                   note="the L0 z-conv alone (batch 120k)")
    if want("seg_sum_sorted"):
        pfeat = rng.randn(P_FULL, 8).astype(np.float32)
        slot_sorted = np.sort(rng.randint(0, NP_ * NZ_, P_FULL)).astype(np.int32)
        def seg(f, s):
            return jax.ops.segment_sum(f, s, num_segments=NP_ * NZ_,
                                       indices_are_sorted=True)
        time_stage("segsum_sorted_160k_into_2.6M", seg, (pfeat, slot_sorted),
                   note="pillar voxelize via sorted segment_sum")
    if want("scatter_rows"):
        vfeat = rng.randn(V_FULL, 16).astype(np.float32)
        vslot = np.sort(rng.choice(NP_ * NZ_, V_FULL, replace=False)).astype(np.int32)
        def scat_rows(f, s):
            return jnp.zeros((NP_ * NZ_, 16), jnp.float32).at[s].set(
                f, unique_indices=True, indices_are_sorted=True)
        time_stage("scatter_rows_120kx16_into_2.6M", scat_rows, (vfeat, vslot),
                   note="voxel table -> dense pillar tensor via row scatter")
    if want("lut_build_small"):
        cells = np.sort(rng.choice(1504 * 1504, 64_000, replace=False)).astype(np.int32)
        def lb(c):
            return jnp.zeros(1504 * 1504, jnp.int32).at[c].set(
                jnp.arange(64_000, dtype=jnp.int32) + 1,
                unique_indices=True, indices_are_sorted=True)
        time_stage("lut_build_64k_into_2.26M", lb, (cells,),
                   note="pillar row LUT build, per level")
    if want("topk_compact"):
        occ = (rng.rand(1504 * 1504) < 0.03).astype(np.float32)
        time_stage("topk_65536_of_2.26M",
                   lambda o: jax.lax.top_k(o, 65536)[1], (occ,),
                   note="stream compaction via top_k (alternative)")
    if want("lut_small"):
        lut_np2 = np.zeros(1504 * 1504, np.int32)
        cells = rng.choice(1504 * 1504, 50_000, replace=False)
        lut_np2[cells] = np.arange(50_000) + 1
        q = rng.randint(0, 1504 * 1504, 9 * 50_000).astype(np.int32)
        time_stage("lut_small_450k_from_2.26M",
                   lambda l, qq: l[qq], (lut_np2, q),
                   note="pillar neighbor lookup, per level")

    # -- plan-build primitive costs (r4: the fused forward spends ~68 ms on
    # the table/plan build — these decide a sort-free redesign) -------------
    if want("argsort160k"):
        keys = rng.randint(0, 90_000_000, P_FULL).astype(np.int32)
        time_stage("argsort_160k_i32", lambda k: jnp.argsort(k), (keys,),
                   note="the voxelizer's one argsort")
        time_stage("sort_160k_i32_unstable",
                   lambda k: jax.lax.sort((k,), is_stable=False)[0], (keys,),
                   note="keys only, unstable")
        time_stage("sortkv_160k_i32",
                   lambda k: jax.lax.sort(
                       (k, jnp.arange(P_FULL, dtype=jnp.int32)),
                       is_stable=False, num_keys=1)[1], (keys,),
                   note="key+payload, unstable (argsort equivalent)")
    if want("sort120k"):
        keys = rng.randint(0, 600_000, 120_000).astype(np.int32)
        time_stage("sort_120k_i32", lambda k: jnp.sort(k), (keys,),
                   note="downsample_pillars' unique-capped sort, per level")
    if want("cumsum_dense"):
        occ = (rng.rand(2_262_016) < 0.05).astype(np.int32)
        time_stage("cumsum_2.26M_i32", lambda o: jnp.cumsum(o), (occ,),
                   note="dense occupancy -> rank (compaction without sort)")
    if want("scatter_dups"):
        cell = rng.randint(0, 2_262_016, P_FULL).astype(np.int32)
        ones = np.ones(P_FULL, np.int32)
        time_stage("scatter_max_dups_160k_into_2.26M",
                   lambda c, o: jnp.zeros(2_262_016, jnp.int32).at[c].max(o),
                   (cell, ones), note="occupancy bitmap build, dup indices")
        yrow = rng.randint(0, 1504, P_FULL).astype(np.int32)
        time_stage("scatter_add_dups_160k_into_1504",
                   lambda c, o: jnp.zeros(1504, jnp.int32).at[c].add(o),
                   (yrow, ones), note="per-row pillar counts, dup indices")
        slot = rng.randint(0, 120_000 * NZ_, P_FULL).astype(np.int32)
        vals = rng.randn(P_FULL, 8).astype(np.float32)
        time_stage("scatter_add_dups_160kx8_into_4.8M",
                   lambda s, v: jnp.zeros((120_000 * NZ_, 8),
                                          jnp.float32).at[s].add(v),
                   (slot, vals), note="sort-free voxel feature accumulation")

    if want("segsum_sorted"):
        # build_pillar_table's actual pattern: segment_sum over a SORTED
        # slot stream (indices_are_sorted=True) — does XLA lower it better
        # than the random-index scatter micro?
        slot_s = np.sort(rng.randint(0, 120_000 * NZ_, P_FULL)
                         ).astype(np.int32)
        vals5 = rng.randn(P_FULL, 5).astype(np.float32)
        time_stage("segsum_sorted_160kx5_into_4.8M",
                   lambda s, v: jax.ops.segment_sum(
                       v, s, num_segments=120_000 * NZ_,
                       indices_are_sorted=True),
                   (slot_s, vals5), note="the feats accumulation")
        time_stage("segsum_sorted_160kx1_into_4.8M",
                   lambda s, v: jax.ops.segment_sum(
                       v[:, 0], s, num_segments=120_000 * NZ_,
                       indices_are_sorted=True),
                   (slot_s, vals5), note="the counts accumulation")
        seg_p = np.sort(rng.randint(0, 120_000, P_FULL)).astype(np.int32)
        time_stage("segmin_sorted_160k_into_120k",
                   lambda s, v: jax.ops.segment_min(
                       v, s, num_segments=120_000, indices_are_sorted=True),
                   (seg_p, np.abs(rng.randint(0, 2_262_016, P_FULL)
                                  ).astype(np.int32)),
                   note="the cells segment_min")
    if want("scatter_unique"):
        # unique-index scatter-SET costs (the alternative to dup scatter-add
        # for the dense voxel table: sorted stream -> compact segment sums
        # via cumsum-diff, then ONE unique set into the dense table)
        slot_u = np.sort(rng.choice(120_000 * NZ_, 100_000, replace=False)
                         ).astype(np.int32)
        vals8 = rng.randn(100_000, 8).astype(np.float32)
        time_stage("scatter_set_unique_100kx8_into_4.8M",
                   lambda s, v: jnp.zeros((120_000 * NZ_, 8), jnp.float32)
                   .at[s].set(v, unique_indices=True),
                   (slot_u, vals8), note="dense voxel table via unique set")
        time_stage("scatter_add_unique_100kx8_into_4.8M",
                   lambda s, v: jnp.zeros((120_000 * NZ_, 8), jnp.float32)
                   .at[s].add(v, unique_indices=True),
                   (slot_u, vals8), note="same but add")
        big = rng.randn(120_000 * NZ_, 8).astype(np.float32)
        gidx = rng.randint(0, 100_000, 120_000 * NZ_).astype(np.int32)
        time_stage("gather_4.8Mx8_from_100k",
                   lambda g, i: g[:100_000][i], (big, gidx),
                   note="dense voxel table via gather of compact sums")
    if want("cumsum_comp"):
        vals = rng.randn(P_FULL, 8).astype(np.float32)
        time_stage("cumsum_160kx8_f32", lambda v: jnp.cumsum(v, axis=0),
                   (vals,), note="plain prefix sums, 8 columns")

        def comp(v):
            def combine(a, b):
                s = a[0] + b[0]
                z = s - a[0]
                err = (a[0] - (s - z)) + (b[0] - z)
                return s, a[1] + b[1] + err
            s, e = jax.lax.associative_scan(combine, (v, jnp.zeros_like(v)),
                                            axis=0)
            return s + e
        time_stage("cumsum_comp_160kx8_f32", comp, (vals,),
                   note="TwoSum-compensated prefix sums (exact-ish means)")

    # -- unique / downsample -------------------------------------------------
    if want("unique"):
        time_stage("unique_capped_120k",
                   lambda i: sparse._unique_capped(i, 60_000)[0], (ids32,))

    # -- NMS / decode --------------------------------------------------------
    if want("nms"):
        from detzero_tpu.ops.nms import nms_bev
        boxes = rng.uniform(-60, 60, (1024, 7)).astype(np.float32)
        boxes[:, 3:6] = rng.uniform(1, 5, (1024, 3))
        scores = rng.uniform(0, 1, 1024).astype(np.float32)
        time_stage("nms_1024", lambda b, s: nms_bev(b, s, 0.7, 1024, 256)[0],
                   (boxes, scores))

    # -- dense 2D stack ------------------------------------------------------
    if want("bev2d"):
        from flax import linen as nn
        from detzero_tpu.models.detection.backbone2d import BaseBEVBackbone
        from detzero_tpu.models.detection.center_head import CenterHead
        bev = rng.randn(1, 188, 188, 384).astype(np.float32)

        class Stack(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = BaseBEVBackbone(layer_nums=(5, 5),
                                    num_filters=(128, 256),
                                    use_running_average=True,
                                    dtype=jnp.bfloat16)(x)
                return CenterHead(class_ids_each_head=((0,), (1, 2)),
                                  use_running_average=True,
                                  dtype=jnp.bfloat16)(x)

        m = Stack()
        vs = jax.jit(m.init)(jax.random.PRNGKey(0), jnp.asarray(bev))
        time_stage("bev2d_head_dense", lambda b: m.apply(vs, b), (bev,),
                   note="dense BEV backbone + center head, 188x188, bf16")

    if want("densify"):
        from detzero_tpu.ops.voxelize import scatter_to_dense_bev
        fids, fcoords, fmask, _ = make_sorted_table(v=15_000, grid=(3, 188, 188))
        f = rng.randn(15_000, 128).astype(np.float32)
        time_stage("densify_final_bev",
                   lambda ff: scatter_to_dense_bev(
                       ff, jnp.asarray(fcoords), jnp.asarray(fmask),
                       (3, 188, 188)),
                   (f,))


# ---------------------------------------------------------------------------
# Fused-graph gap attribution (VERDICT r3 weak #2: forward measured ~47 ms
# above tables + backbone+head). Hypotheses tested:
#   * plan-as-constant: the r3 backbone stage CLOSED OVER the plan, making
#     it a jit constant — XLA hoists every plan-derived transform out of the
#     scan; the fused forward pays them per iteration.  fg_net_arg passes
#     the plan as a (carry-perturbed) argument instead.
#   * cross-boundary fusion/layout: fg_forward_barrier keeps ONE jit but
#     puts lax.optimization_barrier between the table build and the net.
# ---------------------------------------------------------------------------


def run_fusegap():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g

    model, n_points = g._build_model(tiny=False)
    b = int(os.environ.get("GRAFT_BATCH", "1"))
    rng = np.random.RandomState(0)
    pts = rng.uniform(-70, 70, (b, n_points, 5)).astype(np.float32)
    pts[..., 2] = rng.uniform(-1.5, 3.5, (b, n_points))
    pv = np.ones((b, n_points), bool)
    n_init = min(n_points, 4096)
    variables = model.init(jax.random.PRNGKey(0), pts[:, :n_init],
                           pv[:, :n_init])

    only = os.environ.get("BISECT_ONLY")
    only = set(only.split(",")) if only else None

    def want(name):
        return only is None or name in only

    feats_key = ("feats" if model.backend.startswith("pillar")
                 else "voxel_features")

    def net_apply(feats, plan):
        return model.eval_net.apply(
            variables, feats, plan,
            method=model._vmapped_call())[1]["spatial_features"]

    table0, plan0 = jax.jit(model._tables)(jnp.asarray(pts), jnp.asarray(pv))
    feats0 = table0[feats_key]
    plan_leaves, plan_def = jax.tree.flatten(plan0)

    if want("fg_tables"):
        def touch(p, v):
            table, plan = model._tables(p, v)
            tot = table[feats_key].astype(jnp.float32).sum()
            for leaf in jax.tree.leaves(plan):
                tot = tot + leaf.astype(jnp.float32).sum()
            return tot
        time_stage("fg_tables", touch, (pts, pv), frames_per_iter=b)

    if want("fg_net_const"):
        # plan closed over (jit constant) — the r3 methodology
        time_stage("fg_net_const", lambda f: net_apply(f, plan0), (feats0,),
                   frames_per_iter=b, note="plan is a jit constant (r3 way)")

    if want("fg_net_arg"):
        # plan passed as perturbed args — what the fused forward pays
        def napply(f, *leaves):
            return net_apply(f, jax.tree.unflatten(plan_def, leaves))
        time_stage("fg_net_arg", napply, (feats0, *plan_leaves),
                   frames_per_iter=b,
                   note="plan leaves are scan-carried args")

    if want("fg_forward"):
        time_stage("fg_forward",
                   lambda p, v: model.apply(variables, p, v, train=False,
                                            mutable_stats=False)[0][0]["hm"],
                   (pts, pv), frames_per_iter=b)

    if want("fg_forward_barrier"):
        def fwd_barrier(p, v):
            table, plan = model._tables(p, v)
            feats, plan = jax.lax.optimization_barrier(
                (table[feats_key], plan))
            return net_apply(feats, plan)
        time_stage("fg_forward_barrier", fwd_barrier, (pts, pv),
                   frames_per_iter=b,
                   note="one jit, optimization_barrier at the plan boundary")

    # ---- table-build sub-attribution (the ~21 ms voxelize+plan item) ------
    if model.backend.startswith("pillar"):
        from detzero_tpu.models.detection.backbone3d_pallas import (
            augment_plan_rowpad,
        )
        from detzero_tpu.models.detection.backbone3d_pillar import (
            build_pillar_plan,
        )
        from detzero_tpu.ops.pillars import build_pillar_table

        def touch_tree(t):
            tot = jnp.float32(0)
            for leaf in jax.tree.leaves(t):
                tot = tot + leaf.astype(jnp.float32).sum()
            return tot

        def vox_one(p, v):
            return jax.vmap(lambda pp, vv: build_pillar_table(
                pp, vv, model.grid_zyx, model.voxel_size, model.pc_range,
                model.pillar_capacities[0]))(p, v)

        base_plan_fn = jax.vmap(lambda t: build_pillar_plan(
            t, model.grid_zyx, model.pillar_capacities,
            site_mode=model.site_mode, with_centroids=model.second_stage,
            with_gather_maps=False))
        table_c = jax.jit(vox_one)(jnp.asarray(pts), jnp.asarray(pv))
        base_plan_c = jax.jit(base_plan_fn)(table_c)

        if want("fg_vox_table"):
            time_stage("fg_vox_table", lambda p, v: touch_tree(vox_one(p, v)),
                       (pts, pv), frames_per_iter=b,
                       note="build_pillar_table only (argsort + segsums)")
        if want("fg_vox_baseplan"):
            time_stage("fg_vox_baseplan",
                       lambda *ls: touch_tree(base_plan_fn(
                           jax.tree.unflatten(
                               jax.tree.structure(table_c), ls))),
                       tuple(jax.tree.leaves(table_c)), frames_per_iter=b,
                       note="build_pillar_plan from prebuilt table")
        if want("fg_vox_rowpad"):
            pl_leaves, pl_def = jax.tree.flatten(base_plan_c)

            def rp(*ls):
                plan = jax.tree.unflatten(pl_def, ls)
                return touch_tree(jax.vmap(
                    lambda pp: augment_plan_rowpad(
                        pp, model.grid_zyx, model.row_budget))(plan))
            time_stage("fg_vox_rowpad", rp, tuple(pl_leaves),
                       frames_per_iter=b,
                       note="augment_plan_rowpad from prebuilt base plan")


# ---------------------------------------------------------------------------
# Prefix stages (cumulative pipeline)
# ---------------------------------------------------------------------------

def run_prefix():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g

    model, n_points = g._build_model(tiny=False)
    b = int(os.environ.get("GRAFT_BATCH", "1"))
    rng = np.random.RandomState(0)
    pts = rng.uniform(-70, 70, (b, n_points, 5)).astype(np.float32)
    pts[..., 2] = rng.uniform(-1.5, 3.5, (b, n_points))
    pv = np.ones((b, n_points), bool)

    n_init = min(n_points, 4096)
    variables = model.init(jax.random.PRNGKey(0), pts[:, :n_init],
                           pv[:, :n_init])

    only = os.environ.get("BISECT_ONLY")
    only = set(only.split(",")) if only else None

    def want(name):
        return only is None or name in only

    if want("voxelize"):
        if getattr(model, "backend", "sorted").startswith("pillar"):
            from detzero_tpu.ops.pillars import build_pillar_table

            def vox(p, v):
                return jax.vmap(lambda pp, vv: build_pillar_table(
                    pp, vv, model.grid_zyx, model.voxel_size, model.pc_range,
                    model.pillar_capacities[0]))(p, v)["feats"]
        else:
            def vox(p, v):
                return jax.vmap(model.voxelize)(p, v)["voxel_features"]
        time_stage("prefix_voxelize", vox, (pts, pv), frames_per_iter=b)
    def _touch_tables(model, p, v):
        # sum a leaf from EVERY plan product + the table feats so XLA
        # cannot dead-code-eliminate any of the build (an earlier version
        # returned one level-0 leaf and measured LESS than voxelize alone)
        import jax.numpy as _jnp

        table, plan = model._tables(p, v)
        feats = table["feats" if model.backend.startswith("pillar")
                      else "voxel_features"]
        tot = feats.astype(_jnp.float32).sum()
        for entry in jax.tree.leaves(plan):
            tot = tot + entry.astype(_jnp.float32).sum()
        return tot

    if want("tables"):
        time_stage("prefix_tables(voxelize+plan)",
                   lambda p, v: _touch_tables(model, p, v),
                   (pts, pv), frames_per_iter=b)
    if want("backbone"):
        # backbone alone: tables prebuilt OUTSIDE the timed region
        import jax as _jax
        table, plan = _jax.jit(model._tables)(jnp.asarray(pts),
                                              jnp.asarray(pv))
        feats = table["feats" if getattr(model, "backend", "").startswith("pillar")
                      else "voxel_features"]

        def bb(feats, plan):
            return model.eval_net.apply(
                variables, feats, plan,
                method=model._vmapped_call())[1]["spatial_features"]
        # plan is a pytree of arrays; pass as one arg
        time_stage("prefix_backbone+head(prebuilt_plan)",
                   lambda f: bb(f, plan), (feats,), frames_per_iter=b)
    if want("forward"):
        time_stage("prefix_forward",
                   lambda p, v: model.apply(variables, p, v, train=False,
                                            mutable_stats=False)[0][0]["hm"],
                   (pts, pv), frames_per_iter=b)
    if want("predict"):
        time_stage("prefix_predict(+decode+nms)",
                   lambda p, v: model.predict(variables, p, v)["scores"],
                   (pts, pv), frames_per_iter=b)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parent.parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    if os.environ.get("BISECT_CPU", "0") == "1":
        jax.config.update("jax_platforms", "cpu")

    groups = sys.argv[1:] or ["micro"]
    dev = jax.devices()[0]
    print(json.dumps({"device": getattr(dev, "device_kind", dev.platform),
                      "groups": groups}), flush=True)
    for grp in groups:
        {"micro": run_micro, "prefix": run_prefix,
         "fusegap": run_fusegap}[grp]()
    out = Path(__file__).resolve().parent.parent / "output" / "bisect_perf.json"
    out.parent.mkdir(exist_ok=True)
    existing = []
    if out.exists():
        try:
            existing = json.loads(out.read_text())
        except Exception:
            existing = []
    out.write_text(json.dumps(existing + RESULTS, indent=1))


if __name__ == "__main__":
    main()
