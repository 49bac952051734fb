"""Fused Pallas pillar-conv kernels (ops/pallas_pillar): interpret-mode
parity against the XLA reference + jax.vjp gradient oracles, on a
geometrically consistent synthetic BEV occupancy (the weight-flip backward
identity only holds when the neighbor map is the real symmetric BEV
structure)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from detzero_tpu.ops import pallas_pillar as pp

NY, NX, B, NZ, CIN, COUT = 8, 300, 128, 8, 16, 24


@pytest.fixture(scope="module")
def geom():
    rng = np.random.RandomState(0)
    occ = rng.rand(NY, NX) < 0.3
    rank = np.full((NY, NX), -1, np.int64)
    nocc = np.zeros(NY, np.int64)
    for y in range(NY):
        xs = np.flatnonzero(occ[y])[:B]
        occ[y] = False
        occ[y, xs] = True
        rank[y, xs] = np.arange(len(xs))
        nocc[y] = len(xs)

    nbr = np.full((NY, pp.NBR_ROWS, B), B + 9, np.int32)
    for y in range(NY):
        for x in np.flatnonzero(occ[y]):
            for j in range(9):
                dy, dx = j // 3 - 1, j % 3 - 1
                yy, xx = y + dy, x + dx
                if 0 <= yy < NY and 0 <= xx < NX and occ[yy, xx]:
                    nbr[y, j, rank[y, x]] = rank[yy, xx]

    # stride-2 output grid
    nyo, nxo = NY // 2, NX // 2
    occ_o = np.zeros((nyo, nxo), bool)
    for y in range(NY):
        for x in np.flatnonzero(occ[y]):
            occ_o[y // 2, x // 2] = True
    rank_o = np.full((nyo, nxo), -1, np.int64)
    nocc_o = np.zeros(nyo, np.int64)
    for y in range(nyo):
        xs = np.flatnonzero(occ_o[y])[:B]
        occ_o[y] = False
        occ_o[y, xs] = True
        rank_o[y, xs] = np.arange(len(xs))
        nocc_o[y] = len(xs)

    nbr_d = np.full((nyo, pp.NBR_ROWS, B), B + 9, np.int32)
    for yo in range(nyo):
        for xo in np.flatnonzero(occ_o[yo]):
            for j in range(9):
                dy, dx = j // 3 - 1, j % 3 - 1
                yy, xx = 2 * yo + dy, 2 * xo + dx
                if 0 <= yy < NY and 0 <= xx < NX and occ[yy, xx]:
                    nbr_d[yo, j, rank_o[yo, xo]] = rank[yy, xx]

    nbr_up = np.full((NY, pp.NBR_ROWS, B), B + 9, np.int32)
    for y in range(NY):
        for x in np.flatnonzero(occ[y]):
            for jp in range(9):
                dy, dx = jp // 3 - 1, jp % 3 - 1
                ty, tx = y + dy, x + dx
                if ty % 2 or tx % 2 or not (0 <= ty < NY and 0 <= tx < NX):
                    continue
                yo, xo = ty // 2, tx // 2
                if 0 <= yo < nyo and 0 <= xo < nxo and occ_o[yo, xo]:
                    nbr_up[y, jp, rank[y, x]] = rank_o[yo, xo]

    table = rng.randn(NY, NZ * CIN, B).astype(np.float32)
    for y in range(NY):
        table[y, :, nocc[y]:] = 0
    weight = (rng.randn(27, CIN, COUT) * 0.1).astype(np.float32)
    ct = rng.randn(NY, NZ * COUT, B).astype(np.float32)
    for y in range(NY):
        ct[y, :, nocc[y]:] = 0
    ctd = rng.randn(nyo, (NZ // 2) * COUT, B).astype(np.float32)
    for y in range(nyo):
        ctd[y, :, nocc_o[y]:] = 0
    return dict(nbr=nbr, nbr_d=nbr_d, nbr_up=nbr_up, table=table,
                weight=weight, ct=ct, ctd=ctd)


def _ref_subm(g):
    return lambda tab: pp.rowpad_conv_reference(
        tab, jnp.asarray(g["nbr"]), jnp.asarray(g["weight"]),
        nz=NZ, cin=CIN, cout=COUT).astype(jnp.float32)


def _ref_down(g):
    return lambda tab: pp.rowpad_conv_reference(
        tab, jnp.asarray(g["nbr_d"]), jnp.asarray(g["weight"]),
        nz=NZ, cin=CIN, cout=COUT, z_stride=2, out_nz=NZ // 2,
        mode="down").astype(jnp.float32)


def test_fwd_subm(geom):
    w2 = pp.weight_fwd(jnp.asarray(geom["weight"]), CIN, COUT)
    out = pp.rowpad_conv(jnp.asarray(geom["table"]), jnp.asarray(geom["nbr"]),
                         w2, nz=NZ, cin=CIN, cout=COUT, interpret=True)
    ref = _ref_subm(geom)(jnp.asarray(geom["table"]))
    assert np.abs(np.float32(out) - np.float32(ref)).max() < 1e-2


def test_fwd_down(geom):
    w2 = pp.weight_fwd(jnp.asarray(geom["weight"]), CIN, COUT)
    out = pp.rowpad_conv(jnp.asarray(geom["table"]),
                         jnp.asarray(geom["nbr_d"]), w2, nz=NZ, cin=CIN,
                         cout=COUT, z_stride=2, out_nz=NZ // 2, mode="down",
                         interpret=True)
    ref = _ref_down(geom)(jnp.asarray(geom["table"]))
    assert np.abs(np.float32(out) - np.float32(ref)).max() < 1e-2


def test_bwd_subm_din(geom):
    _, vjp = jax.vjp(_ref_subm(geom), jnp.asarray(geom["table"]))
    (dref,) = vjp(jnp.asarray(geom["ct"]))
    wb = pp.weight_bwd(jnp.asarray(geom["weight"]), CIN, COUT)
    dk = pp.rowpad_conv(jnp.asarray(geom["ct"]), jnp.asarray(geom["nbr"]),
                        wb, nz=NZ, cin=COUT, cout=CIN, interpret=True)
    rel = (np.abs(np.float32(dk) - np.float32(dref)).max()
           / np.abs(np.float32(dref)).max())
    assert rel < 0.03, rel


def test_bwd_down_din_up_mode(geom):
    _, vjp = jax.vjp(_ref_down(geom), jnp.asarray(geom["table"]))
    (dref,) = vjp(jnp.asarray(geom["ctd"]))
    wb = pp.weight_bwd(jnp.asarray(geom["weight"]), CIN, COUT)
    dk = pp.rowpad_conv(jnp.asarray(geom["ctd"]), jnp.asarray(geom["nbr_up"]),
                        wb, nz=NZ, cin=COUT, cout=CIN, out_nz=NZ, mode="up",
                        interpret=True)
    rel = (np.abs(np.float32(dk) - np.float32(dref)).max()
           / np.abs(np.float32(dref)).max())
    assert rel < 0.03, rel


def test_dw_subm(geom):
    _, vjpw = jax.vjp(lambda w: pp.rowpad_conv_reference(
        jnp.asarray(geom["table"]), jnp.asarray(geom["nbr"]), w,
        nz=NZ, cin=CIN, cout=COUT).astype(jnp.float32),
        jnp.asarray(geom["weight"]))
    (dwref,) = vjpw(jnp.asarray(geom["ct"]))
    dwk = pp.dw_to_spconv(pp.rowpad_conv_dw(
        jnp.asarray(geom["table"]), jnp.asarray(geom["nbr"]),
        jnp.asarray(geom["ct"]).astype(jnp.bfloat16),
        nz=NZ, cin=CIN, cout=COUT, interpret=True), CIN, COUT)
    rel = (np.abs(np.float32(dwk) - np.float32(dwref)).max()
           / np.abs(np.float32(dwref)).max())
    assert rel < 0.03, rel


def test_dw_down(geom):
    _, vjpw = jax.vjp(lambda w: pp.rowpad_conv_reference(
        jnp.asarray(geom["table"]), jnp.asarray(geom["nbr_d"]), w,
        nz=NZ, cin=CIN, cout=COUT, z_stride=2, out_nz=NZ // 2,
        mode="down").astype(jnp.float32), jnp.asarray(geom["weight"]))
    (dwref,) = vjpw(jnp.asarray(geom["ctd"]))
    dwk = pp.dw_to_spconv(pp.rowpad_conv_dw(
        jnp.asarray(geom["table"]), jnp.asarray(geom["nbr_d"]),
        jnp.asarray(geom["ctd"]).astype(jnp.bfloat16),
        nz=NZ, cin=CIN, cout=COUT, z_stride=2, out_nz=NZ // 2, mode="down",
        interpret=True), CIN, COUT)
    rel = (np.abs(np.float32(dwk) - np.float32(dwref)).max()
           / np.abs(np.float32(dwref)).max())
    assert rel < 0.03, rel


def test_sliding_matches_halo(geom):
    """The sliding-window subm kernel (1 DMA/step) must match the 3-halo
    kernel exactly; boundary taps are invalid in real nbr maps, which is
    what makes the clamped edge slabs safe."""
    from detzero_tpu.ops.pallas_pillar import (rowpad_conv,
                                               rowpad_conv_sliding,
                                               weight_fwd)
    w2 = weight_fwd(jnp.asarray(geom["weight"]), CIN, COUT)
    base = rowpad_conv(jnp.asarray(geom["table"]), jnp.asarray(geom["nbr"]),
                       w2, nz=NZ, cin=CIN, cout=COUT, interpret=True)
    slid = rowpad_conv_sliding(jnp.asarray(geom["table"]),
                               jnp.asarray(geom["nbr"]), w2,
                               nz=NZ, cin=CIN, cout=COUT, interpret=True)
    assert np.abs(np.float32(base) - np.float32(slid)).max() < 1e-3


# ---------------------------------------------------------------------------
# rowpad_nbr: the Pallas neighbor-map build vs the XLA build_rowpad_nbr
# ---------------------------------------------------------------------------


def test_rowpad_nbr_parity():
    """All 10 neighbor maps of a real plan, bit-identical across THREE
    builders: the scatter-based XLA build (build_rowpad_nbr), the row-local
    Pallas kernel (rowpad_nbr, interpret), and the fused-XLA rank-by-count
    (rowpad_nbr_rank — the production path since r5)."""
    from detzero_tpu.models.detection.backbone3d_pallas import (
        augment_plan_rowpad,
    )
    from detzero_tpu.models.detection.backbone3d_pillar import (
        build_pillar_plan,
    )
    from detzero_tpu.models.detection.backbone3d import plan_grids
    from detzero_tpu.ops import pallas_pillar as ppk
    from detzero_tpu.ops import pillars

    rng = np.random.RandomState(3)
    grid = (8, 64, 64)
    pts = rng.uniform(-6.4, 6.4, (2048, 4)).astype(np.float32)
    pts[:, 2] = rng.uniform(-2, 2, 2048)
    valid = rng.rand(2048) < 0.9
    table = pillars.build_pillar_table(
        jnp.asarray(pts), jnp.asarray(valid), grid, (0.2, 0.2, 0.5),
        (-6.4, -6.4, -2.0, 6.4, 6.4, 2.0), 512)
    plan = build_pillar_plan(table, grid, (512, 256, 128, 64),
                             with_centroids=False, with_gather_maps=False)
    grids = plan_grids(grid)
    # row_budget 8 << row occupancy so the drop-overflow branch is hit too
    for b in (8, 128):
        prod = augment_plan_rowpad(plan, grid, b)
        aux = []
        for lvl in range(4):
            nz, ny, nx = grids[lvl]
            e = plan[lvl]
            lay = pillars.rowpad_layout(e["cells"], e["mask"], (ny, nx), b,
                                        with_rank_lut=True)
            xq = pillars.rowpad_xcoords(e["coords2d"][:, 1], lay["gidx"],
                                        lay["gvalid"], ppk.NBR_BIG)
            aux.append((e, lay, xq, (ny, nx)))

        def check(prod_arr, kern_arr, scat_arr, tag):
            p_, k_, s_ = (np.minimum(np.asarray(a), b)
                          for a in (prod_arr, kern_arr, scat_arr))
            assert (p_ == k_).all(), (tag, "rank vs kernel",
                                      np.argwhere(p_ != k_)[:5])
            assert (p_ == s_).all(), (tag, "rank vs scatter",
                                      np.argwhere(p_ != s_)[:5])

        for lvl in range(4):
            e, lay, xq, (ny, nx) = aux[lvl]
            kern = ppk.rowpad_nbr(xq, xq, mode="subm", interpret=True)
            scat = pillars.build_rowpad_nbr(
                e["coords2d"], e["mask"], lay["slot"], lay["keep"],
                lay["rank_lut"], (ny, nx), ny, b, b, mode="subm")
            check(prod[lvl]["rp_nbr"], kern, scat, ("subm", lvl, b))
        for lvl in range(3):
            e_i, lay_i, xq_i, (ny, nx) = aux[lvl]
            e_o, lay_o, xq_o, (ony, onx) = aux[lvl + 1]
            kern = ppk.rowpad_nbr(xq_o, xq_i, mode="down", interpret=True)
            scat = pillars.build_rowpad_nbr(
                e_o["coords2d"], e_o["mask"], lay_o["slot"], lay_o["keep"],
                lay_i["rank_lut"], (ny, nx), ony, b, b, mode="down")
            check(prod[lvl]["rp_down_nbr"], kern, scat, ("down", lvl, b))
            kern = ppk.rowpad_nbr(xq_i, xq_o, mode="up", interpret=True)
            scat = pillars.build_rowpad_nbr(
                e_i["coords2d"], e_i["mask"], lay_i["slot"], lay_i["keep"],
                lay_o["rank_lut"], (ony, onx), ny, b, b, mode="up")
            check(prod[lvl]["rp_up_nbr"], kern, scat, ("up", lvl, b))


def test_rowpad_gather_parity():
    """rowpad_gather (gather both ways) is bit-identical to the scatter
    to_rowpad, including the custom-VJP cotangents and from_rowpad_g."""
    from detzero_tpu.ops import pillars

    rng = np.random.RandomState(1)
    ny, nx, b, mp, d = 16, 50, 8, 200, 12
    cells = np.sort(rng.choice(ny * nx, mp, replace=False)).astype(np.int32)
    mask = np.arange(mp) < 150
    cells = np.where(mask, cells, np.iinfo(np.int32).max)
    vals = jnp.asarray(rng.randn(mp, d).astype(np.float32))

    lay = pillars.rowpad_layout(jnp.asarray(cells), jnp.asarray(mask),
                                (ny, nx), b)
    old = pillars.to_rowpad(vals, lay["slot"], lay["keep"], ny, b)
    new = pillars.rowpad_gather(vals, lay["gidx"], lay["gvalid"],
                                lay["slot"], lay["keep"])
    assert np.array_equal(np.asarray(old), np.asarray(new))

    co = jnp.asarray(rng.randn(*old.shape).astype(np.float32))
    g_old = jax.grad(lambda v: jnp.vdot(
        pillars.to_rowpad(v, lay["slot"], lay["keep"], ny, b), co))(vals)
    g_new = jax.grad(lambda v: jnp.vdot(
        pillars.rowpad_gather(v, lay["gidx"], lay["gvalid"], lay["slot"],
                              lay["keep"]), co))(vals)
    assert np.allclose(np.asarray(g_old), np.asarray(g_new))

    rp = jnp.asarray(rng.randn(ny, d, b).astype(np.float32))
    cc = jnp.asarray(rng.randn(mp, d).astype(np.float32))
    f1 = pillars.from_rowpad(rp, lay["slot"], lay["keep"])
    f2 = pillars.from_rowpad_g(rp, lay["slot"], lay["keep"],
                               lay["gidx"], lay["gvalid"])
    assert np.array_equal(np.asarray(f1), np.asarray(f2))
    g1 = jax.grad(lambda r: jnp.vdot(
        pillars.from_rowpad(r, lay["slot"], lay["keep"]), cc))(rp)
    g2 = jax.grad(lambda r: jnp.vdot(
        pillars.from_rowpad_g(r, lay["slot"], lay["keep"], lay["gidx"],
                              lay["gvalid"]), cc))(rp)
    assert np.allclose(np.asarray(g1), np.asarray(g2))
