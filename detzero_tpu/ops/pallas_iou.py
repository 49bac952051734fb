"""Pallas TPU kernel: rotated BEV box overlap / IoU over an NxM pair grid.

This is the hot op of the whole framework — NMS decode, WBF fusion and IoU
training targets all sit on it (reference CUDA: iou3d_nms_kernel.cu
box_overlap/iou_bev). The XLA formulation (ops/iou3d) is numerically exact
but its cumsum+one-hot compaction breaks fusion and round-trips HBM ~1000x;
this kernel keeps the whole Sutherland–Hodgman clip in VMEM:

  * each grid program owns a (TN, TM) tile of box pairs;
  * the polygon buffer is 8 slots x (x, y, valid), each slot a (TN, TM)
    array — every operation is an elementwise VPU op over the tile;
  * clip by the 4 half-planes of box B, re-compacting the <=8 surviving
    vertices to the front with unrolled rank-match selects (no sort, no
    gather, no matmul — exact fp32);
  * shoelace area, then IoU against the analytic rectangle areas.

HBM traffic: read (5,N)+(5,M) box columns, write (N,M) IoU — speed of light
for this op.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CAP = 8          # max vertices of (quad clipped by 4 half-planes)
_EPS = 1e-8
_TOL = 1e-3       # on-edge tolerance (m^2 cross-product units) for f32 noise


def _corners(cx, cy, dx, dy, heading):
    """Box params (each (..., )) -> 4 ccw corners [(x, y)] as arrays."""
    c = jnp.cos(heading)
    s = jnp.sin(heading)
    hx, hy = dx * 0.5, dy * 0.5
    template = [(1.0, 1.0), (-1.0, 1.0), (-1.0, -1.0), (1.0, -1.0)]
    out = []
    for tx, ty in template:
        lx, ly = tx * hx, ty * hy
        out.append((cx + lx * c - ly * s, cy + lx * s + ly * c))
    return out


def _overlap_tile(a_ref, b_ref):
    """Compute the (TN, TM) all-pairs rotated intersection-area tile."""
    ax = a_ref[0, :][:, None]  # (TN, 1)
    ay = a_ref[1, :][:, None]
    adx = a_ref[2, :][:, None]
    ady = a_ref[3, :][:, None]
    ah = a_ref[4, :][:, None]
    bx = b_ref[0, :][None, :]  # (1, TM)
    by = b_ref[1, :][None, :]
    bdx = b_ref[2, :][None, :]
    bdy = b_ref[3, :][None, :]
    bh = b_ref[4, :][None, :]

    shape = (ax.shape[0], bx.shape[1])
    ca = _corners(ax, ay, adx, ady, ah)   # 4 x ((TN,1), (TN,1))
    cb = _corners(bx, by, bdx, bdy, bh)   # 4 x ((1,TM), (1,TM))
    return _clip_area(ca, cb, shape)


def _clip_area(ca, cb, shape):
    """Sutherland–Hodgman area over a tile; ca/cb are 4-corner lists whose
    entries broadcast to `shape`."""
    # All masks are float32 0/1 — Mosaic rejects some stored-bool select
    # patterns ("unsupported target bitwidth for truncation"), and f32
    # arithmetic masks vectorize cleanly on the VPU anyway.
    zero = jnp.zeros(shape, jnp.float32)
    one = jnp.ones(shape, jnp.float32)
    px = [jnp.broadcast_to(ca[k][0], shape) if k < 4 else zero for k in range(_CAP)]
    py = [jnp.broadcast_to(ca[k][1], shape) if k < 4 else zero for k in range(_CAP)]
    pv = [one if k < 4 else zero for k in range(_CAP)]
    n = jnp.full(shape, 4.0, jnp.float32)

    for e in range(4):
        x1, y1 = cb[e]
        x2, y2 = cb[(e + 1) % 4]
        ex = jnp.broadcast_to(x2 - x1, shape)
        ey = jnp.broadcast_to(y2 - y1, shape)
        d = [ex * (py[k] - y1) - ey * (px[k] - x1) for k in range(_CAP)]
        # tolerance: coincident edges (e.g. a box against itself) land at
        # d ~ -1e-4 in f32 at scene scale; treat on-edge as inside
        inside = [jnp.where(d[k] >= -_TOL, pv[k], 0.0) for k in range(_CAP)]

        # next vertex in the compacted ring: k+1, wrapping n-1 -> 0
        def nxt(arr, k):
            return jnp.where(n == float(k + 1), arr[0], arr[(k + 1) % _CAP])

        ex_px, ex_py, ex_v = [], [], []
        for k in range(_CAP):
            nx_ = nxt(px, k)
            ny_ = nxt(py, k)
            nd_ = nxt(d, k)
            nin = nxt(inside, k) * pv[k]
            crossing = pv[k] * jnp.abs(inside[k] - nin)
            denom = d[k] - nd_
            safe = jnp.where(jnp.abs(denom) > _EPS, denom, 1.0)
            t = d[k] / safe
            ix = px[k] + t * (nx_ - px[k])
            iy = py[k] + t * (ny_ - py[k])
            ex_px += [px[k], ix]
            ex_py += [py[k], iy]
            ex_v += [inside[k], crossing]

        # running rank (exclusive prefix count of valid slots)
        rank = []
        run = zero
        for i in range(2 * _CAP):
            rank.append(run)
            run = run + ex_v[i]
        # compact: slot j <- the emit entry whose rank == j
        new_px, new_py, new_pv = [], [], []
        for j in range(_CAP):
            ox, oy, ov = zero, zero, zero
            for i in range(2 * _CAP):
                if i < j:  # entry i can never land at slot j > i
                    continue
                sel = ex_v[i] * jnp.where(rank[i] == float(j), 1.0, 0.0)
                ox = jnp.where(sel > 0, ex_px[i], ox)
                oy = jnp.where(sel > 0, ex_py[i], oy)
                ov = jnp.maximum(ov, sel)
            new_px.append(ox)
            new_py.append(oy)
            new_pv.append(ov)
        px, py, pv = new_px, new_py, new_pv
        n = run

    # shoelace over the compacted ring
    area2 = zero
    for k in range(_CAP):
        nx_ = jnp.where(n == float(k + 1), px[0], px[(k + 1) % _CAP])
        ny_ = jnp.where(n == float(k + 1), py[0], py[(k + 1) % _CAP])
        area2 = area2 + pv[k] * (px[k] * ny_ - nx_ * py[k])
    area = jnp.abs(area2) * 0.5
    return jnp.where(n >= 3.0, area, 0.0)


def _overlap_kernel(a_ref, b_ref, out_ref):
    out_ref[:, :] = _overlap_tile(a_ref, b_ref)


def _overlap_tile_pairwise(a_ref, b_ref):
    """Matched pairs: lane (i, j) of the (8, 128) tile computes pair
    i*128+j — a and b share the lane grid, so every op is elementwise."""
    def col(ref, c):
        return ref[c, :].reshape(8, 128)

    ca = _corners(col(a_ref, 0), col(a_ref, 1), col(a_ref, 2), col(a_ref, 3),
                  col(a_ref, 4))
    cb = _corners(col(b_ref, 0), col(b_ref, 1), col(b_ref, 2), col(b_ref, 3),
                  col(b_ref, 4))
    return _clip_area(ca, cb, (8, 128))


def _pairwise_iou_kernel(a_ref, b_ref, out_ref):
    inter = _overlap_tile_pairwise(a_ref, b_ref)
    area_a = (a_ref[2, :] * a_ref[3, :]).reshape(8, 128)
    area_b = (b_ref[2, :] * b_ref[3, :]).reshape(8, 128)
    union = jnp.maximum(area_a + area_b - inter, 1e-6)
    out_ref[:, :] = inter / union


def _iou_kernel(a_ref, b_ref, out_ref):
    inter = _overlap_tile(a_ref, b_ref)
    area_a = (a_ref[2, :] * a_ref[3, :])[:, None]
    area_b = (b_ref[2, :] * b_ref[3, :])[None, :]
    union = jnp.maximum(area_a + area_b - inter, 1e-6)
    out_ref[:, :] = inter / union


def _pad_to(x, n, axis=0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("kernel", "tn", "tm", "interpret"))
def _launch(boxes_a, boxes_b, kernel: str, tn: int, tm: int, interpret: bool):
    n, m = boxes_a.shape[0], boxes_b.shape[0]
    np_, mp_ = -(-n // tn) * tn, -(-m // tm) * tm
    a = _pad_to(boxes_a[:, :5].astype(jnp.float32), np_).T  # (5, Np)
    b = _pad_to(boxes_b[:, :5].astype(jnp.float32), mp_).T
    kfn = _overlap_kernel if kernel == "overlap" else _iou_kernel
    out = pl.pallas_call(
        kfn,
        grid=(np_ // tn, mp_ // tm),
        in_specs=[
            pl.BlockSpec((5, tn), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((5, tm), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn, tm), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, mp_), jnp.float32),
        interpret=interpret,
    )(a, b)
    return out[:n, :m]


@functools.partial(jax.jit, static_argnames=("kernel", "interpret"))
def _launch_pairwise(boxes_a, boxes_b, kernel: str, interpret: bool):
    n = boxes_a.shape[0]
    tile = 8 * 128
    np_ = -(-n // tile) * tile
    a = _pad_to(boxes_a[:, :5].astype(jnp.float32), np_).T  # (5, Np)
    b = _pad_to(boxes_b[:, :5].astype(jnp.float32), np_).T
    kfn = (_pairwise_iou_kernel if kernel == "iou"
           else (lambda ar, br, o: o.__setitem__(
               (slice(None), slice(None)), _overlap_tile_pairwise(ar, br))))
    out = pl.pallas_call(
        kfn,
        grid=(np_ // tile,),
        in_specs=[
            pl.BlockSpec((5, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((5, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_ // 128, 128), jnp.float32),
        interpret=interpret,
    )(a, b)
    return out.reshape(np_)[:n]


def boxes_overlap_bev_pairwise(boxes_a, boxes_b):
    """(N,5) x (N,5) -> (N,) matched-pair intersection areas."""
    return _launch_pairwise(boxes_a, boxes_b, "overlap", not _on_tpu())


def boxes_iou_bev_pairwise(boxes_a, boxes_b):
    """(N,5) x (N,5) -> (N,) matched-pair rotated BEV IoU."""
    return _launch_pairwise(boxes_a, boxes_b, "iou", not _on_tpu())


_NMS_N = 512  # fused-NMS candidate budget (score-sorted, padded):
# post_max is <=256 in every config, so the top-512 candidates are
# decision-equivalent; 16 unrolled IoU tiles keep Mosaic compile ~4 min


def _nms_kernel_factory(thresh: float, n: int):
    n_tiles = n // 128

    def kernel(boxes_ref, valid_ref, keep_ref, iou_scratch):
        # 1) full NxN rotated-IoU into VMEM scratch, unrolled 128x128 tiles
        # (unrolled clip bodies vectorize best; budget 512 keeps the Mosaic
        # statement count — and compile time — bounded)
        for i in range(n_tiles):
            a = boxes_ref[:, i * 128:(i + 1) * 128]
            area_a = (a[2, :] * a[3, :])[:, None]
            for j in range(n_tiles):
                b = boxes_ref[:, j * 128:(j + 1) * 128]
                inter = _overlap_tile(a, b)
                area_b = (b[2, :] * b[3, :])[None, :]
                union = jnp.maximum(area_a + area_b - inter, 1e-6)
                iou_scratch[i * 128:(i + 1) * 128,
                            j * 128:(j + 1) * 128] = inter / union
        # 2) greedy score-order suppression (boxes pre-sorted by score)
        valid = valid_ref[0, :][None, :]  # (1, N) f32
        col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

        def body(i, supp):
            onehot = (col == i).astype(jnp.float32)
            supp_i = jnp.sum(supp * onehot)
            valid_i = jnp.sum(valid * onehot)
            keep_i = valid_i * (1.0 - supp_i)
            row = iou_scratch[pl.ds(i, 1), :]  # (1, N)
            new = keep_i * jnp.where((row > thresh) & (col > i), 1.0, 0.0)
            return jnp.maximum(supp, new)

        supp = jax.lax.fori_loop(0, n, body, jnp.zeros((1, n), jnp.float32))
        keep_ref[:, :] = (valid * (1.0 - supp)).reshape(n // 128, 128)

    return kernel


@functools.partial(jax.jit, static_argnames=("thresh", "interpret", "budget"))
def _launch_nms(boxes_sorted, valid, thresh: float, interpret: bool,
                budget: int = _NMS_N):
    """boxes_sorted (N, 5) score-DESC; valid (N,). Returns keep mask (N,)."""
    n = boxes_sorted.shape[0]
    np_ = -(-n // budget) * budget if n > budget else budget
    b = _pad_to(boxes_sorted[:, :5].astype(jnp.float32), np_).T  # (5, Np)
    v = _pad_to(valid.astype(jnp.float32), np_)[None, :]
    out = pl.pallas_call(
        _nms_kernel_factory(float(thresh), np_),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_ // 128, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((np_, np_), jnp.float32)],
        interpret=interpret,
    )(b, v)
    return out.reshape(np_)[:n] > 0.5


def nms_keep_mask(boxes_sorted, valid, thresh: float, budget: int = _NMS_N):
    """Pallas rotated NMS: gridded IoU matrix + in-VMEM greedy walk.
    boxes_sorted (N, 5) BEV boxes in score-descending order."""
    return _launch_nms(boxes_sorted, valid, thresh, not _on_tpu(),
                       budget=budget)


def _on_tpu():
    return jax.devices()[0].platform in ("tpu", "axon")


def boxes_overlap_bev(boxes_a, boxes_b, tn: int = 128, tm: int = 128):
    """(N,5) x (M,5) -> (N,M) rotated intersection areas (Pallas on TPU,
    interpreter elsewhere)."""
    return _launch(boxes_a, boxes_b, "overlap", tn, tm, not _on_tpu())


def boxes_iou_bev(boxes_a, boxes_b, tn: int = 128, tm: int = 128):
    """(N,5) x (M,5) -> (N,M) rotated BEV IoU."""
    return _launch(boxes_a, boxes_b, "iou", tn, tm, not _on_tpu())
