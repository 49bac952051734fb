"""Fused Pallas pillar-conv kernels on the row-padded BEV layout (r3).

Why: the XLA pillar conv (ops/pillars.pillar_conv) materializes a 9-offset
row gather to HBM — 1.38 GB per L0 conv — and XLA's gather tops out at
~70 GB/s on TPU (measured, tools/bisect_perf.py), so one L0 conv costs
~31 ms and the 18-conv backbone ~282 ms/frame.  This module removes the
gather from the HBM path entirely:

  * the pillar table is ROW-PADDED and TRANSPOSED: BEV row y owns a
    (nz*cin, B) tile (B = static per-row pillar budget, pillars in the
    LANE dim), so the 3x3 BEV neighborhood of every pillar in row y lives
    in exactly three STATIC tiles — rows y-1, y, y+1.  A Pallas grid over
    BEV rows streams those three slabs HBM->VMEM per step via plain
    BlockSpec halo index_maps (no dynamic DMA, which Mosaic handles badly
    on this toolchain);
  * neighbor selection happens IN VMEM as one (nz*cin, B) x (B, B)
    one-hot matmul per BEV tap on the MXU: oh[s, r] = (nbr[j, r] == s).
    A missing neighbor is encoded as rank >= B and selects nothing —
    masking is free;
  * the z-extent of the 3x3x3 conv is an unfold matmul per z-row plus a
    3-slice overlap-add, all on VMEM-resident data.

The transposed layout exists because Mosaic supports sublane-dim reshapes
((640, 128) -> (40, 16, 128)) but NOT lane-dim splits ((128, 640) ->
(128, 40, 16)) — probed empirically on this toolchain; see the r3 session
notes in COMPONENTS.md.

Per-conv HBM traffic drops from 9x to ~4x the table size (3 halo reads +
1 write) and the selection costs ~95 MFLOP of well-shaped MXU work per
BEV row.

Backward structure (no transpose maps needed for subm):
    d_in  = rowpad_conv(d_out, nbr, weight flipped in (t, j) + ci/co swap)
    because the neighbor-of relation is symmetric: q = p + off_j  <=>
    p = q + off_{8-j}, and the flipped weight pairs tap j with W[8-j].
    For the BEV-strided conv the input gradient is an 'up' conv: zero-
    stuffed z upsampling + flipped weights, reading output rows
    (y + dy) // 2.
    dW is a third kernel accumulating (9*cin, 3*cout) across grid steps.

Reference parity target: spconv SubMConv3d / SparseConv3d
(detection/detzero_det/models/centerpoint_modules/backbone3d.py:68-73);
numerics are pinned against ops/pillars.pillar_conv in
tests/test_pallas_pillar.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# nbr arrays are (ny, NBR_ROWS, B) int32: rows 0..8 = tap ranks, rest pad
NBR_ROWS = 16

# opt-in: sliding-window subm kernel (1 input DMA/step instead of 3; see
# rowpad_conv_sliding). Interpret-exact vs the halo kernel; flip the
# default after the compiled kernel is timed on a live TPU.
import os as _os

USE_SLIDING = _os.environ.get("DETZERO_SLIDING_CONV", "0") == "1"

# opt-out: rank-shift selection of the dy=0 taps in subm convs (see
# _select docstring). Bit-exact vs the one-hot path; kill switch for
# measurement only.
SHIFT_TAPS = _os.environ.get("DETZERO_SHIFT_TAPS", "1") == "1"


# ---------------------------------------------------------------------------
# Weight layouts
# ---------------------------------------------------------------------------

def weight_fwd(weight, cin, cout):
    """(27, Cin, Cout) spconv-order kernel (k = ((dz+1)*3+(dy+1))*3+(dx+1))
    -> (3*Cout, 9*Cin) unfold matmul weight: row (t, co), col (j, ci)."""
    w = weight.reshape(3, 9, cin, cout)           # (kz, bev_j, ci, co)
    return jnp.transpose(w, (0, 3, 1, 2)).reshape(3 * cout, 9 * cin)


def weight_bwd(weight, cin, cout):
    """Weight for the input-gradient conv: flip t and j, swap ci/co."""
    w = weight.reshape(3, 9, cin, cout)[::-1, ::-1]
    return jnp.transpose(w, (0, 2, 1, 3)).reshape(3 * cin, 9 * cout)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _select(nbr_ref, slabs, g_scr, *, nz, cin, z_up, shift_taps=False):
    """Fill g_scr (nz+2, 9*cin, B) with the 9 selected neighbor pillars
    (zeros at the z-pad rows and where nbr >= B_in).  With z_up, each slab
    holds nz//2 z-values that land on even z (zero-stuffed upsampling for
    the transposed strided conv).

    shift_taps (subm-only, B_in == B_out): within a BEV row pillars are
    RANK-ordered by x (cells sorted), so the dy=0 taps never need the
    one-hot matmul — tap (0,0) selects rank r (identity), and the (0,±1)
    neighbor, when present, is exactly rank r∓... r±1 (an x-adjacent cell
    is the adjacent rank).  A lane roll + found-mask multiply replaces 3 of
    the 9 MXU selections (the kernel is selection-compute-bound: 189 vs
    126 MFLOP/row at L0).  Bit-exact: the one-hot matmul also produced the
    unmodified bf16 source value."""
    b_in = slabs[0].shape[1]
    b_out = g_scr.shape[2]
    iota = jax.lax.broadcasted_iota(jnp.int32, (b_in, b_out), 0)
    g_scr[0] = jnp.zeros_like(g_scr[0])
    g_scr[nz + 1] = jnp.zeros_like(g_scr[0])
    for j in range(9):
        src = slabs[j // 3][:].astype(jnp.bfloat16)
        if shift_taps and j in (3, 4, 5) and not z_up:
            # found mask: nbr rank < B_in (absent taps encode >= B_in).
            # Lane 0 (j=3) / lane B-1 (j=5) can never be found — their
            # would-be neighbor rank is -1 / B — so the roll wraparound
            # is always masked.
            fnd = (nbr_ref[j:j + 1, :] < b_in).astype(jnp.bfloat16)
            if j != 4:
                # Mosaic's vector rotate is 32-bit only ("Rotate with
                # non-32-bit data" compile error on bf16) — roll in f32
                shift = 1 if j == 3 else b_in - 1  # b_in-1 == roll(-1)
                src = pltpu.roll(src.astype(jnp.float32), shift,
                                 1).astype(jnp.bfloat16)
            gj = src * fnd
            g_scr[1:nz + 1, j * cin:(j + 1) * cin, :] = (
                gj.reshape(nz, cin, b_out).astype(g_scr.dtype))
            continue
        # NOTE (r4): a lane-dim jnp.take_along_axis would make this selection
        # FLOP-free, but Mosaic on this toolchain fails to lower it (remote
        # compile: INTERNAL tpu_compile_helper exit 1) — probed 2026-08-18.
        oh = (nbr_ref[j:j + 1, :] == iota).astype(jnp.bfloat16)
        # Mosaic requires a 32-bit matmul accumulator; one-hot rows have at
        # most one term, so the f32->bf16 round-trip is exact
        gj = jax.lax.dot_general(src, oh, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if z_up:
            half = gj.reshape(nz // 2, 1, cin, b_out)
            even = jax.lax.broadcasted_iota(
                jnp.int32, (nz // 2, 2, cin, b_out), 1) == 0
            gj = jnp.where(even, jnp.broadcast_to(
                half, (nz // 2, 2, cin, b_out)), 0.0)
        g_scr[1:nz + 1, j * cin:(j + 1) * cin, :] = (
            gj.reshape(nz, cin, b_out).astype(g_scr.dtype))


def _epilogue_val(acc3, epi_refs, *, out_nz, cout, relu, dtype):
    """acc3 (out_nz, cout, B) f32 -> (out_nz*cout, B) `dtype`, optionally
    through the fused eval-mode epilogue:
    y = relu(acc * scale + bias [+ residual]) * zmask.
    epi_refs: (sc (1, cout), bi (1, cout), zm (out_nz, B),
    res (out_nz*cout, B) or None) — refs or arrays."""
    b_out = acc3.shape[-1]
    if epi_refs is None:
        return acc3.reshape(out_nz * cout, b_out).astype(dtype)
    sc_ref, bi_ref, zm_ref, res_ref = epi_refs
    sc = sc_ref[:].reshape(1, cout, 1)
    bi = bi_ref[:].reshape(1, cout, 1)
    y = acc3 * sc + bi
    if res_ref is not None:
        y = y + res_ref[:].reshape(out_nz, cout, b_out).astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    zm = zm_ref[:].reshape(out_nz, 1, b_out).astype(jnp.float32)
    y = y * zm
    return y.reshape(out_nz * cout, b_out).astype(dtype)


def _epilogue(acc3, out_ref, epi_refs, *, out_nz, cout, relu):
    out_ref[:] = _epilogue_val(acc3, epi_refs, out_nz=out_nz, cout=cout,
                               relu=relu, dtype=out_ref.dtype)


def _slab_index(mode, r, dy, rows):
    """Static index of the (local-row r, BEV offset dy) source row in the
    per-step slab list (see _table_specs: slab k holds input row
    base(i) + k, clamped; clamped slabs are only touched by taps that nbr
    marks absent)."""
    if mode == "subm":
        return r + dy + 1
    if mode == "down":
        return 2 * r + dy + 1
    if rows == 1:
        # 'up' rows==1 keeps the legacy three per-dy maps: the blocked
        # formula below needs the global row parity static (R*i even)
        return dy + 1
    return (r + dy) // 2 + 1


def _n_slabs(mode, rows):
    if mode == "up" and rows == 1:
        return 3
    return {"subm": rows + 2, "down": 2 * rows + 1,
            "up": rows // 2 + 2}[mode]


def _table_specs(mode, ny_in, w_in, b_in, rows):
    """Per-input-row BlockSpecs for a multi-row grid step: slab k holds
    input row base(i) + k (clamped to [0, ny_in)).  'up' with rows==1
    uses the legacy per-dy maps (_row_maps) instead."""
    if mode == "up" and rows == 1:
        return [pl.BlockSpec((None, w_in, b_in), m,
                             memory_space=pltpu.VMEM)
                for m in _row_maps("up", ny_in)]
    last = ny_in - 1
    if mode == "subm":
        base = lambda i: rows * i - 1
    elif mode == "down":
        base = lambda i: 2 * rows * i - 1
    else:
        assert rows % 2 == 0, "blocked 'up' conv needs even rows"
        base = lambda i: (rows * i) // 2 - 1
    specs = []
    for k in range(_n_slabs(mode, rows)):
        specs.append(pl.BlockSpec(
            (None, w_in, b_in),
            (lambda k: lambda i: (
                jnp.clip(base(i) + k, 0, last), 0, 0))(k),
            memory_space=pltpu.VMEM))
    return specs


def _conv_kernel(nbr_ref, w_ref, *rest, nz, cin, cout,
                 z_stride, out_nz, z_up, mode="subm", rows=1,
                 n_epi=0, relu=True, shift_taps=False):
    """`rows` BEV rows of outputs per grid step: for each local row,
    select 9 neighbor pillars from its three halo slabs, unfold-matmul
    each z row, overlap-add the 3 z taps, optionally apply the fused
    eval-mode BN/residual/ReLU/zmask epilogue (n_epi = number of epilogue
    input refs: 3 or 4).  rows > 1 amortizes the per-step grid/DMA
    latency (1504 L0 steps at ~2 us dominated the r3 kernel) and cuts the
    halo re-read from 3x to (rows+2)/rows.

    Positional refs: slab[0..K-1], [epi...], out, g_scr, unf_scr."""
    g_scr, unf_scr = rest[-2], rest[-1]
    out_ref = rest[-3]
    k_slabs = _n_slabs(mode, rows)
    slabs_all = rest[:k_slabs]
    if n_epi:
        epi = rest[k_slabs:k_slabs + n_epi]
        epi_refs_all = (epi[0], epi[1], epi[2],
                        epi[3] if n_epi == 4 else None)
    else:
        epi_refs_all = None
    b_out = out_ref.shape[-1]
    w = w_ref[:].astype(jnp.bfloat16)             # (3*cout, 9*cin)
    for r in range(rows):
        if rows == 1:
            nbr_r, out_r = nbr_ref, out_ref
            epi_refs = epi_refs_all
        else:
            nbr_r = nbr_ref[r]
            out_r = None
            if epi_refs_all is None:
                epi_refs = None
            else:
                sc, bi, zm, res = epi_refs_all
                epi_refs = (sc, bi, zm[r],
                            res[r] if res is not None else None)
        slabs = tuple(slabs_all[_slab_index(mode, r, dy, rows)]
                      for dy in (-1, 0, 1))
        _select(nbr_r, slabs, g_scr,
                nz=nz, cin=cin, z_up=z_up, shift_taps=shift_taps)
        for u in range(nz + 2):
            unf_scr[u] = jnp.dot(w, g_scr[u],
                                 preferred_element_type=jnp.float32)
        acc = None
        for t in range(3):
            span = z_stride * (out_nz - 1) + 1
            if z_stride == 1:
                part = unf_scr[t:t + span, t * cout:(t + 1) * cout, :]
            else:
                # even-length slice + leading-dim reshape drops odds
                part = unf_scr[t:t + span + 1, t * cout:(t + 1) * cout, :]
                part = part.reshape(out_nz, 2, cout, b_out)[:, 0]
            acc = part if acc is None else acc + part
        if rows == 1:
            _epilogue(acc, out_ref, epi_refs, out_nz=out_nz, cout=cout,
                      relu=relu)
        else:
            buf = _epilogue_val(acc, epi_refs, out_nz=out_nz, cout=cout,
                                relu=relu, dtype=out_ref.dtype)
            out_ref[r] = buf


def _dw_kernel(nbr_ref, dout_ref, *rest, nz, cin, cout, z_stride, out_nz,
               mode="subm", rows=1, shift_taps=False):
    """Accumulate the weight gradient over the grid: rebuild the gathered
    block g (as in forward), scatter d_out into the unfold layout (adjoint
    of the overlap-add), contract.  dw (3*cout, 9*cin) f32 with a constant
    out index_map, so grid steps accumulate."""
    i = pl.program_id(0)
    dw_ref, g_scr, ug_scr = rest[-3], rest[-2], rest[-1]
    slabs_all = rest[:_n_slabs(mode, rows)]
    b = dout_ref.shape[-1]

    @pl.when(i == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    acc = dw_ref[:]
    for r in range(rows):
        nbr_r = nbr_ref if rows == 1 else nbr_ref[r]
        dout_r = dout_ref[:] if rows == 1 else dout_ref[r]
        slabs = tuple(slabs_all[_slab_index(mode, r, dy, rows)]
                      for dy in (-1, 0, 1))
        _select(nbr_r, slabs, g_scr,
                nz=nz, cin=cin, z_up=False, shift_taps=shift_taps)
        dout = dout_r.reshape(out_nz, cout, b).astype(jnp.bfloat16)
        if z_stride == 2:
            half = dout.reshape(out_nz, 1, cout, b)
            even = jax.lax.broadcasted_iota(
                jnp.int32, (out_nz, 2, cout, b), 1) == 0
            dout = jnp.where(even, jnp.broadcast_to(
                half, (out_nz, 2, cout, b)), 0.0).reshape(
                    2 * out_nz, cout, b)
        span = dout.shape[0]
        # unf gradient: column block t holds d_out at z rows [t, t+span)
        for u in (0, 1, nz, nz + 1):
            ug_scr[u] = jnp.zeros((3 * cout, b), ug_scr.dtype)
        for t in range(3):
            ug_scr[t:t + span, t * cout:(t + 1) * cout, :] = dout
        for u in range(nz + 2):
            acc = acc + jax.lax.dot_general(
                ug_scr[u], g_scr[u],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
    dw_ref[:] = acc


def _conv_kernel_sliding(nbr_ref, w_ref, cur_ref, out_ref, ring0, ring1,
                         g_scr, unf_scr, *, nz, cin, cout, out_nz):
    """Sliding-window subm conv: grid step i DMAs ONLY table row i and
    computes OUTPUT row i-1 from the ring (rows i-2, i-1) + the current
    block — 1 input DMA per step instead of 3 (the three-halo variant
    re-reads every row three times; DMA is the kernel's measured floor).

    Ring parity: after step i, ring[i % 2] holds row i, so during step i
    ring[i % 2] holds row i-2 and ring[(i+1) % 2] holds row i-1.  The two
    parities duplicate the body under pl.when so ring indexing stays
    static.  Output row 0's buffer is written at steps 0 and 1 with the
    same out index — pallas flushes it after step 1 with the valid
    content."""
    i = pl.program_id(0)

    def body(slab_m, slab_0):
        _select(nbr_ref, (slab_m, slab_0, cur_ref), g_scr,
                nz=nz, cin=cin, z_up=False, shift_taps=SHIFT_TAPS)
        w = w_ref[:].astype(jnp.bfloat16)
        for u in range(nz + 2):
            unf_scr[u] = jnp.dot(w, g_scr[u],
                                 preferred_element_type=jnp.float32)
        acc = None
        for t in range(3):
            part = unf_scr[t:t + out_nz, t * cout:(t + 1) * cout, :]
            acc = part if acc is None else acc + part
        out_ref[:] = acc.reshape(out_nz * cout, out_ref.shape[1]).astype(
            out_ref.dtype)

    even = (i % 2) == 0

    @pl.when((i > 0) & even)
    def _():
        body(ring0, ring1)   # i-2 at ring[0], i-1 at ring[1]

    @pl.when((i > 0) & jnp.logical_not(even))
    def _():
        body(ring1, ring0)

    # rotate: the current row replaces row i-2
    @pl.when(even)
    def _():
        ring0[:] = cur_ref[:]

    @pl.when(jnp.logical_not(even))
    def _():
        ring1[:] = cur_ref[:]

    # step 0 also seeds the OTHER buffer: output row 0's dy=-1 taps are
    # invalid in nbr (select nothing), but an uninitialized ring could
    # hold NaN bit patterns and 0 * NaN poisons the selection matmul
    @pl.when(i == 0)
    def _():
        ring1[:] = cur_ref[:]


@partial(jax.jit, static_argnames=("nz", "cin", "cout", "interpret"))
def rowpad_conv_sliding(table, nbr, w2, *, nz, cin, cout, interpret=False):
    """Sliding-window variant of rowpad_conv (subm mode, z_stride 1).
    Grid has ny+1 steps; step i computes output row i-1.  Numerics are
    identical to rowpad_conv (boundary taps are invalid in nbr, so the
    clamped/garbage edge slabs select nothing)."""
    ny, w_in, b = table.shape
    last = ny - 1
    kern = partial(_conv_kernel_sliding, nz=nz, cin=cin, cout=cout,
                   out_nz=nz)
    return pl.pallas_call(
        kern,
        grid=(ny + 1,),
        in_specs=[
            pl.BlockSpec((None, NBR_ROWS, b),
                         lambda i: (jnp.maximum(i - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * cout, 9 * cin), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, w_in, b),
                         lambda i: (jnp.minimum(i, last), 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, nz * cout, b),
                               lambda i: (jnp.maximum(i - 1, 0), 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ny, nz * cout, b), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((w_in, b), jnp.bfloat16),
            pltpu.VMEM((w_in, b), jnp.bfloat16),
            pltpu.VMEM((nz + 2, 9 * cin, b), jnp.bfloat16),
            pltpu.VMEM((nz + 2, 3 * cout, b), jnp.float32),
        ],
        interpret=interpret,
    )(nbr, w2.astype(jnp.bfloat16), table.astype(jnp.bfloat16))


# ---------------------------------------------------------------------------
# Neighbor-map kernel (r4): builds the rowpad nbr tensors row-locally
# ---------------------------------------------------------------------------

# sentinel for "no pillar in this rowpad slot" in the x-coordinate tables;
# small enough that 2*BIG+1 (the mode='down' query transform) stays in i32
NBR_BIG = 1 << 28


def _nbr_kernel(xq_ref, xtm_ref, xt0_ref, xtp_ref, out_ref, *,
                mode, ny_in, b_in):
    """One output BEV row of nbr ranks.  The XLA build (ops/pillars.
    build_rowpad_nbr) is scatter-bound: its 16-wide _nbr_scatter costs
    ~90 ns/row on TPU and the 10 calls per plan cost ~49 ms/frame (measured,
    BISECT fg_vox_rowpad).  Here the rank of neighbor x' inside its target
    row is just the count of smaller x-coords — row-local VPU compares on
    VMEM-resident (B_in, B_out) tiles, no scatter, no rank LUT, no gathers.

    xq_ref (1, B_out): query x-coords in the OUTPUT rowpad layout (NBR_BIG =
    empty slot).  xt*_ref (B_in, 1): target-row x-coords (targets in
    sublanes), the dy = -1/0/+1 halo rows of the INPUT level."""
    i = pl.program_id(0)
    xq = xq_ref[:]                       # (1, B_out)
    qvalid = xq < NBR_BIG
    slabs = (xtm_ref, xt0_ref, xtp_ref)
    rows = []
    for j in range(9):
        dy, dx = j // 3 - 1, j % 3 - 1
        xt = slabs[dy + 1][:]            # (B_in, 1)
        pok = None
        if mode == "subm":
            xp = xq + dx
            src = i + dy
            rv = (src >= 0) & (src < ny_in)
        elif mode == "down":
            xp = 2 * xq + dx
            src = 2 * i + dy
            rv = (src >= 0) & (src < ny_in)
        else:                            # 'up': x' = (x+dx)/2 when even
            num = xq + dx + 2            # >= 1, so trunc div == floor div
            xp = num // 2 - 1
            pok = (num % 2) == 0
            src = i + dy
            rv = (src >= 0) & (src % 2 == 0) & (src // 2 < ny_in)
        lt = (xt < xp).astype(jnp.int32)            # (B_in, B_out)
        rank = jnp.sum(lt, axis=0, keepdims=True)
        eq = (xt == xp).astype(jnp.int32)
        fnd = (jnp.sum(eq, axis=0, keepdims=True) > 0) & qvalid
        if pok is not None:
            fnd = fnd & pok
        fnd = fnd & rv
        rows.append(jnp.where(fnd, rank, b_in))
    pad = jnp.full((NBR_ROWS - 9, xq.shape[1]), b_in, jnp.int32)
    out_ref[:] = jnp.concatenate(rows + [pad], axis=0)


@partial(jax.jit, static_argnames=("mode", "interpret"))
def rowpad_nbr(xq_rp, x_in, *, mode="subm", interpret=False):
    """Build a (ny_out, NBR_ROWS, B_out) neighbor-rank tensor for
    rowpad_conv from per-row sorted x-coordinates.

    xq_rp: (ny_out, B_out) int32 — x-coord of each OUTPUT pillar in its
        rowpad slot, NBR_BIG where the slot is empty.
    x_in:  (ny_in, B_in) int32 — the INPUT level's x-coords (same NBR_BIG
        fill; 'up': the conv's OUTPUT level, which the gradient gathers
        from).
    mode: as rowpad_conv ('subm'/'down'/'up').

    Bit-identical to ops/pillars.build_rowpad_nbr (tests/test_pallas_pillar
    pins it) because rank == count of strictly-smaller x-coords in the
    target row — cells within a row are unique and x-sorted.

    Layout note: queries ride lanes ((ny_out, 1, B) blocks), targets ride
    sublanes ((ny_in, B, 1) blocks) so the 9 halo compares broadcast to
    (B_in, B_out) and reduce over sublanes — Mosaic only accepts (8,128)-
    divisible or full-dim blocks, hence the unit axes."""
    ny_out, b_out = xq_rp.shape
    ny_in, b_in = x_in.shape
    m_m, m_0, m_p = _row_maps(mode, ny_in)
    xq3 = xq_rp[:, None, :]
    xt3 = x_in[:, :, None]

    kern = partial(_nbr_kernel, mode=mode, ny_in=ny_in, b_in=b_in)
    return pl.pallas_call(
        kern,
        grid=(ny_out,),
        in_specs=[
            pl.BlockSpec((None, 1, b_out), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, b_in, 1), m_m, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, b_in, 1), m_0, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, b_in, 1), m_p, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, NBR_ROWS, b_out), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ny_out, NBR_ROWS, b_out), jnp.int32),
        interpret=interpret,
    )(xq3, xt3, xt3, xt3)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _row_maps(mode, ny_in):
    """Three halo index_maps: block row of the input table per grid step."""
    last = ny_in - 1
    if mode == "subm":
        return (lambda i: (jnp.maximum(i - 1, 0), 0, 0),
                lambda i: (i, 0, 0),
                lambda i: (jnp.minimum(i + 1, last), 0, 0))
    if mode == "down":   # output row i reads input rows 2i-1, 2i, 2i+1
        return (lambda i: (jnp.maximum(2 * i - 1, 0), 0, 0),
                lambda i: (jnp.minimum(2 * i, last), 0, 0),
                lambda i: (jnp.minimum(2 * i + 1, last), 0, 0))
    if mode == "up":     # input row i reads output rows (i+dy)//2
        return (lambda i: (jnp.maximum((i - 1) // 2, 0), 0, 0),
                lambda i: (jnp.minimum(i // 2, last), 0, 0),
                lambda i: (jnp.minimum((i + 1) // 2, last), 0, 0))
    raise ValueError(mode)


_ROWS_WARNED = set()


def _pick_rows(ny_out, rows):
    """Largest power-of-two divisor of ny_out that is <= rows.

    Silently lowering a requested rows= (or DETZERO_CONV_ROWS) would make
    the perf knob a no-op without signal (ADVICE r4), so the first
    downgrade per (ny_out, rows) warns once; 'up' mode additionally falls
    back to the legacy 3-slab path at rows == 1."""
    r = max(1, rows)
    while r > 1 and (ny_out % r or r & (r - 1)):
        r -= 1
    if r != max(1, rows) and (ny_out, rows) not in _ROWS_WARNED:
        _ROWS_WARNED.add((ny_out, rows))
        import warnings

        warnings.warn(
            f"rowpad conv: requested rows={rows} downgraded to {r} for "
            f"ny_out={ny_out} (needs a power-of-two divisor)",
            stacklevel=3)
    return r


CONV_ROWS = int(_os.environ.get("DETZERO_CONV_ROWS", "4"))


@partial(jax.jit, static_argnames=("nz", "cin", "cout", "z_stride", "out_nz",
                                   "mode", "interpret", "rows"))
def rowpad_conv(table, nbr, w2, *, nz, cin, cout, z_stride=1, out_nz=None,
                mode="subm", interpret=False, rows=None):
    """One sparse 3x3x3 conv over a transposed row-padded pillar table.

    table: (ny_in, nz*cin, B_in) — per-BEV-row feature tiles, pillars in
        the lane dim (any float dtype; computed in bf16).
    nbr:   (ny_out, NBR_ROWS, B_out) int32 — rows 0..8 hold the RANK of
        the tap-j neighbor inside its source BEV row (>= B_in if absent).
        CONTRACT (subm): nbr must come from build_rowpad_nbr — ranks are
        x-sorted within a row, so tap 4 is the identity and taps 3/5 are
        rank-adjacent; the kernel's shift-tap selection relies on it.
    w2:    weight_fwd / weight_bwd output.
    mode:  'subm' (source row y+dy), 'down' (BEV stride 2: source 2y+dy;
        pair with z_stride=2), 'up' (transposed strided conv for the
        input gradient: source (y+dy)//2, z zero-stuffed — pass the
        FORWARD nz as `nz` and the d_out table as `table`).

    Returns (ny_out, out_nz*cout, B_out) bf16.  Outputs at invalid slots /
    unoccupied z sites must be masked by the caller (zmask), as with
    ops/pillars.pillar_conv.
    """
    ny_in, w_in, b_in = table.shape
    ny_out, _, b_out = nbr.shape
    z_up = mode == "up"
    out_nz = out_nz if out_nz is not None else (nz - 1) // z_stride + 1
    if (z_stride == 2 or z_up) and nz % 2:
        raise ValueError("z_stride=2 requires even nz")
    rows = _pick_rows(ny_out, CONV_ROWS if rows is None else rows)
    tspecs = _table_specs(mode, ny_in, w_in, b_in, rows)
    kern = partial(_conv_kernel, nz=nz, cin=cin, cout=cout,
                   z_stride=z_stride, out_nz=out_nz, z_up=z_up,
                   mode=mode, rows=rows,
                   shift_taps=SHIFT_TAPS and mode == "subm"
                   and b_in == b_out)
    rblk = None if rows == 1 else rows
    return pl.pallas_call(
        kern,
        grid=(ny_out // rows,),
        in_specs=[
            pl.BlockSpec((rblk, NBR_ROWS, b_out), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * cout, 9 * cin), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            *tspecs,
        ],
        out_specs=pl.BlockSpec((rblk, out_nz * cout, b_out),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ny_out, out_nz * cout, b_out),
                                       jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((nz + 2, 9 * cin, b_out), jnp.bfloat16),
            pltpu.VMEM((nz + 2, 3 * cout, b_out), jnp.float32),
        ],
        interpret=interpret,
    )(nbr, w2.astype(jnp.bfloat16),
      *((table.astype(jnp.bfloat16),) * len(tspecs)))


@partial(jax.jit, static_argnames=("nz", "cin", "cout", "z_stride", "out_nz",
                                   "mode", "relu", "interpret", "rows"))
def rowpad_conv_fused(table, nbr, w2, scale, bias, zmask, residual=None, *,
                      nz, cin, cout, z_stride=1, out_nz=None, mode="subm",
                      relu=True, interpret=False, rows=None):
    """rowpad_conv + fused EVAL-mode epilogue in one kernel:
        out = relu(conv * scale + bias [+ residual]) * zmask
    scale/bias: (cout,) folded BN affine (scale * rsqrt(var + eps) and
    bias - mean * that); zmask: (ny_out, out_nz, B) bool/int8; residual:
    optional (ny_out, out_nz*cout, B) (the basic-block skip), subm only.
    Removes the separate 2x-table-size elementwise HBM pass XLA otherwise
    runs after every conv during inference."""
    ny_in, w_in, b_in = table.shape
    ny_out, _, b_out = nbr.shape
    out_nz = out_nz if out_nz is not None else (nz - 1) // z_stride + 1
    if z_stride == 2 and nz % 2:
        raise ValueError("z_stride=2 requires even nz")
    rows = _pick_rows(ny_out, CONV_ROWS if rows is None else rows)
    tspecs = _table_specs(mode, ny_in, w_in, b_in, rows)
    n_epi = 4 if residual is not None else 3
    kern = partial(_conv_kernel, nz=nz, cin=cin, cout=cout,
                   z_stride=z_stride, out_nz=out_nz, z_up=False,
                   mode=mode, rows=rows, n_epi=n_epi, relu=relu,
                   shift_taps=SHIFT_TAPS and mode == "subm"
                   and b_in == b_out)
    rblk = None if rows == 1 else rows
    in_specs = [
        pl.BlockSpec((rblk, NBR_ROWS, b_out), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3 * cout, 9 * cin), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        *tspecs,
        pl.BlockSpec((1, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((rblk, out_nz, b_out), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [nbr, w2.astype(jnp.bfloat16)] \
        + [table.astype(jnp.bfloat16)] * len(tspecs) \
        + [scale.reshape(1, cout).astype(jnp.float32),
           bias.reshape(1, cout).astype(jnp.float32),
           zmask.astype(jnp.int8)]
    if residual is not None:
        in_specs.append(pl.BlockSpec((rblk, out_nz * cout, b_out),
                                     lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(residual.astype(jnp.bfloat16))
    return pl.pallas_call(
        kern,
        grid=(ny_out // rows,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rblk, out_nz * cout, b_out),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ny_out, out_nz * cout, b_out),
                                       jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((nz + 2, 9 * cin, b_out), jnp.bfloat16),
            pltpu.VMEM((nz + 2, 3 * cout, b_out), jnp.float32),
        ],
        interpret=interpret,
    )(*args)


@partial(jax.jit, static_argnames=("nz", "cin", "cout", "z_stride", "out_nz",
                                   "mode", "interpret", "rows"))
def rowpad_conv_dw(table, nbr, d_out, *, nz, cin, cout, z_stride=1,
                   out_nz=None, mode="subm", interpret=False, rows=None):
    """Weight gradient of rowpad_conv: returns (3*cout, 9*cin) f32 (the
    weight_fwd layout; map back with dw_to_spconv)."""
    ny_in, w_in, b_in = table.shape
    ny_out, _, b_out = nbr.shape
    out_nz = out_nz if out_nz is not None else (nz - 1) // z_stride + 1
    rows = _pick_rows(ny_out, CONV_ROWS if rows is None else rows)
    tspecs = _table_specs(mode, ny_in, w_in, b_in, rows)
    kern = partial(_dw_kernel, nz=nz, cin=cin, cout=cout,
                   z_stride=z_stride, out_nz=out_nz, mode=mode, rows=rows,
                   shift_taps=SHIFT_TAPS and mode == "subm"
                   and b_in == b_out)
    rblk = None if rows == 1 else rows
    return pl.pallas_call(
        kern,
        grid=(ny_out // rows,),
        in_specs=[
            pl.BlockSpec((rblk, NBR_ROWS, b_out), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rblk, out_nz * cout, b_out), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            *tspecs,
        ],
        out_specs=pl.BlockSpec((3 * cout, 9 * cin), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3 * cout, 9 * cin), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((nz + 2, 9 * cin, b_out), jnp.bfloat16),
            pltpu.VMEM((nz + 2, 3 * cout, b_out), jnp.bfloat16),
        ],
        interpret=interpret,
    )(nbr, d_out, *((table,) * len(tspecs)))


def dw_to_spconv(dw2, cin, cout):
    """(3*cout, 9*cin) weight_fwd-layout gradient -> (27, cin, cout)."""
    return jnp.transpose(dw2.reshape(3, cout, 9, cin),
                         (0, 2, 3, 1)).reshape(27, cin, cout)


# ---------------------------------------------------------------------------
# Differentiable conv op (the backbone's entry point)
# ---------------------------------------------------------------------------

def _on_tpu():
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def resolve_use_pallas(use_pallas=None):
    """Backend decision for the conv path, resolved at TRACE time.

    Priority: explicit use_pallas arg > DETZERO_FORCE_PALLAS env ("1"
    forces the pallas kernels even off-TPU — they run in interpret mode —
    so CPU multichip dryruns exercise the real kernel code; "0" forces the
    XLA reference — bench._flops_cpu uses this to cost-analyze the graph
    on the cpu backend, where Mosaic kernels cannot lower) > platform."""
    if use_pallas is not None:
        return use_pallas
    forced = _os.environ.get("DETZERO_FORCE_PALLAS")
    if forced is not None:
        return forced == "1"
    return _on_tpu()


def make_conv_op(*, nz, cin, cout, z_stride=1, out_nz=None, mode="subm",
                 use_pallas=None, dtype=jnp.bfloat16):
    """Returns conv(table, weight, nbr, nbr_up) -> (ny_out, out_nz*cout, B)
    with a scatter-free custom VJP:

        d_table = rowpad_conv(d_out, nbr | nbr_up, weight_bwd(W))
        dW      = rowpad_conv_dw(table, nbr, d_out)

    nbr_up is the transpose map for mode='down' (pass nbr again for subm —
    it is its own transpose under the weight flip).  On non-TPU backends
    the XLA reference implements both passes (same math, gather-based)."""
    out_nz_ = out_nz if out_nz is not None else (nz - 1) // z_stride + 1
    pallas = resolve_use_pallas(use_pallas)
    interp = not _on_tpu()  # pallas off-TPU (forced) runs in interpret mode

    @jax.custom_vjp
    def conv(table, weight, nbr, nbr_up):
        if pallas:
            # the kernel computes in bf16 (MXU-native); `dtype` only
            # affects the XLA reference path used on CPU/test backends
            if USE_SLIDING and mode == "subm" and z_stride == 1:
                return rowpad_conv_sliding(
                    table, nbr, weight_fwd(weight, cin, cout),
                    nz=nz, cin=cin, cout=cout, interpret=interp)
            return rowpad_conv(table, nbr, weight_fwd(weight, cin, cout),
                               nz=nz, cin=cin, cout=cout, z_stride=z_stride,
                               out_nz=out_nz_, mode=mode, interpret=interp)
        return rowpad_conv_reference(table, nbr, weight, nz=nz, cin=cin,
                                     cout=cout, z_stride=z_stride,
                                     out_nz=out_nz_, mode=mode, dtype=dtype)

    def fwd(table, weight, nbr, nbr_up):
        return conv(table, weight, nbr, nbr_up), (table, weight, nbr, nbr_up)

    def bwd(res, ct):
        table, weight, nbr, nbr_up = res
        ct = ct.astype(jnp.bfloat16)
        bwd_mode = "subm" if mode == "subm" else "up"
        bwd_nbr = nbr if mode == "subm" else nbr_up
        if pallas:
            wb = weight_bwd(weight, cin, cout)
            d_t = rowpad_conv(ct.astype(jnp.bfloat16), bwd_nbr, wb,
                              nz=nz, cin=cout, cout=cin,
                              out_nz=nz, mode=bwd_mode, interpret=interp)
            dw = dw_to_spconv(
                rowpad_conv_dw(table.astype(jnp.bfloat16), nbr, ct, nz=nz,
                               cin=cin, cout=cout, z_stride=z_stride,
                               out_nz=out_nz_, mode=mode,
                               interpret=interp), cin, cout)
        else:
            # reference path: flip-weight conv for d_in, vjp for dW
            wflip = jnp.transpose(
                weight.reshape(3, 9, cin, cout)[::-1, ::-1],
                (0, 1, 3, 2)).reshape(27, cout, cin)
            d_t = rowpad_conv_reference(ct, bwd_nbr, wflip, nz=nz, cin=cout,
                                        cout=cin, out_nz=nz, mode=bwd_mode,
                                        dtype=dtype)
            _, vjpw = jax.vjp(
                lambda w: rowpad_conv_reference(
                    table, nbr, w, nz=nz, cin=cin, cout=cout,
                    z_stride=z_stride, out_nz=out_nz_,
                    mode=mode).astype(jnp.float32), weight)
            (dw,) = vjpw(ct.astype(jnp.float32))
        return d_t.astype(table.dtype), dw.astype(weight.dtype), None, None

    conv.defvjp(fwd, bwd)
    return conv


# ---------------------------------------------------------------------------
# XLA reference (testing / CPU path): same transposed row-padded contract
# ---------------------------------------------------------------------------

def rowpad_conv_reference(table, nbr, weight, *, nz, cin, cout, z_stride=1,
                          out_nz=None, mode="subm", dtype=jnp.bfloat16):
    """Pure-XLA implementation of rowpad_conv for parity tests: converts
    nbr ranks to global row indices and uses ops/pillars.bev_gather +
    _zconv_matmul on the untransposed layout."""
    from detzero_tpu.ops import pillars

    ny_in, w_in, b_in = table.shape
    ny_out, _, b_out = nbr.shape
    out_nz = out_nz if out_nz is not None else (nz - 1) // z_stride + 1
    flat = jnp.transpose(table, (0, 2, 1)).reshape(ny_in * b_in, w_in)
    out_row = jnp.arange(ny_out * b_out) // b_out
    nbr_flat = jnp.transpose(nbr, (0, 2, 1)).reshape(ny_out * b_out, -1)
    idx_cols, fnd_cols = [], []
    for j in range(9):
        dy = j // 3 - 1
        if mode == "subm":
            src = out_row + dy
        elif mode == "down":
            src = 2 * out_row + dy
        else:                      # up
            src = (out_row + dy) // 2
        src = jnp.clip(src, 0, ny_in - 1)
        rank = nbr_flat[:, j]
        fnd = rank < b_in
        idx_cols.append(jnp.where(fnd, src * b_in + rank, 0))
        fnd_cols.append(fnd)
    idx = jnp.stack(idx_cols, 1).astype(jnp.int32)
    fnd = jnp.stack(fnd_cols, 1)
    if mode == "up":
        # zero-stuff z: slab rows carry nz//2 values on even z
        f3 = flat.reshape(ny_in * b_in, nz // 2, cin)
        f3 = jnp.stack([f3, jnp.zeros_like(f3)], 2).reshape(
            ny_in * b_in, nz, cin)
        flat = f3.reshape(ny_in * b_in, nz * cin)
    # plain gather (not pillars.bev_gather): its custom VJP needs transpose
    # maps, and this reference must stay jax.vjp-differentiable as-is
    f16 = flat.astype(dtype)
    g = jnp.concatenate(
        [jnp.where(fnd[:, j][:, None, None],
                   f16[idx[:, j]].reshape(-1, nz, cin), 0)
         for j in range(9)], axis=-1)
    w = weight.reshape(3, 9, cin, cout).reshape(3, 9 * cin, cout)
    out = pillars._zconv_matmul(g.astype(dtype), w.astype(dtype),
                                1 if mode == "up" else z_stride,
                                out_nz, jnp.float32)
    out = out.reshape(ny_out, b_out, out_nz * cout)
    return jnp.transpose(out, (0, 2, 1)).astype(dtype)


# ---------------------------------------------------------------------------
# Stream -> rowpad VFE kernel (r4)
# ---------------------------------------------------------------------------

def _stream_feats_kernel(ws_ref, payload_ref, meta_ref, out_ref, *,
                         nz, f, b, out_dtype):
    """One BEV row of the rowpad table, reduced straight from the sorted
    point stream.

    The XLA table build pays a WIDE segment scatter for the per-voxel
    means — 14.2 ms for 160k x 5 f32 rows into the dense (MP*nz) slot
    space (tools/bisect_perf.py segsum_sorted_160kx5), ~7 GB/s effective
    on a 96 MB mostly-empty write — and the backbone then re-gathers that
    table into the rowpad layout.  But the stream is sorted by
    (cell, z) = BEV-row-major, so each rowpad OUTPUT ROW is a contiguous
    INPUT WINDOW: this kernel keeps the whole stream VMEM-resident
    (~6 MB), walks each row's window in 128-point lane blocks, and
    reduces every block with ONE (nz*C, 128) x (128, B) MXU matmul —
    z-onehot-expanded payload against the lane one-hot.  Output is
    written dense-linearly; neither direction touches a scatter.

    payload_ref: (NQ*C, 128) f32 — point block q, channel c at sublane
        q*C + c; channels = [point feats..., in_budget weight].
    meta_ref:    (NQ*2, 128) i32 — rows q*2 / q*2+1 = lane-in-row (>= b
        selects nothing) / z.
    ws_ref:      (ny+1,) i32 scalar-prefetch — per-row window starts into
        the point stream (points of BEV row y = [ws[y], ws[y+1]))."""
    y = pl.program_id(0)
    c = f + 1
    s0 = ws_ref[y]
    s1 = ws_ref[y + 1]
    q0 = s0 // 128
    q1 = (s1 + 127) // 128
    eye = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0) \
        == jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    eye = eye.astype(jnp.float32)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (128, b), 1)
    z_iota = jax.lax.broadcasted_iota(jnp.int32, (nz, 128), 0)

    def body(q, acc):
        pc = payload_ref[pl.ds(q * c, c), :]                # (C, 128) f32
        mt = meta_ref[pl.ds(q * 2, 2), :]                   # (2, 128) i32
        lane = mt[0:1, :]                                   # (1, 128)
        zz = mt[1:2, :]
        t = q * 128 + jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        inwin = ((t >= s0) & (t < s1)).astype(jnp.float32)
        # lanes -> sublanes without a transpose: contract the lane dim of
        # (1, 128) against identity columns on the MXU (exact for ids < 2^24)
        lane_s = jax.lax.dot_general(
            eye, lane.astype(jnp.float32) + (1.0 - inwin) * (b + 1),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # (128, 1)
        r = (lane_s.astype(jnp.int32) == lane_iota).astype(jnp.float32)
        oz = (z_iota == zz).astype(jnp.float32)             # (nz, 128)
        qz = (oz[:, None, :] * pc[None, :, :]).reshape(nz * c, 128)
        # HIGHEST: Mosaic's default f32 dot runs a single bf16 MXU pass
        # (measured 0.25 abs error on +-75 coords); the one-hot contraction
        # must keep full f32 mantissas for the means to match the segsum
        return acc + jax.lax.dot_general(
            qz, r, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)             # (nz*C, B)

    acc = jax.lax.fori_loop(
        q0, q1, body, jnp.zeros((nz * c, b), jnp.float32))
    acc = acc.reshape(nz, c, b)
    counts = acc[:, f:f + 1, :]
    feats = acc[:, :f, :] / jnp.maximum(counts, 1.0)
    out_ref[:] = feats.reshape(nz * f, b).astype(out_dtype)


@partial(jax.jit, static_argnames=("nz", "ny", "row_budget", "out_dtype",
                                   "interpret"))
def stream_rowpad_feats(payload, meta, wstart, *, nz, ny, row_budget,
                        out_dtype=jnp.float32, interpret=False):
    """Sorted point stream -> row-padded transposed VFE table
    (ny, nz*F, B): per-voxel segment MEANS laid out exactly as
    pillars.rowpad_gather(feats.reshape(MP, -1), ...) would produce from
    the dense table (parity: tests/test_pallas_pillar.py).

    payload: (NQ*C, 128) f32 (see _stream_feats_kernel; C = F + 1).
    meta:    (NQ*2, 128) int32.
    wstart:  (ny + 1,) int32 row windows (monotone; wstart[ny] may stop
        short of the padded stream — the tail never enters a window).
    """
    cq, lanes = payload.shape
    assert lanes == 128 and meta.shape[1] == 128
    f = cq // (meta.shape[0] // 2) - 1
    kern = partial(_stream_feats_kernel, nz=nz, f=f, b=row_budget,
                   out_dtype=out_dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ny,),
        in_specs=[
            pl.BlockSpec(payload.shape, lambda i, ws: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(meta.shape, lambda i, ws: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, nz * f, row_budget),
                               lambda i, ws: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ny, nz * f, row_budget), out_dtype),
        interpret=interpret,
    )(wstart.astype(jnp.int32), payload, meta)
