"""Pallas forward+backward decision replay — differentiable rendering as
two kernel launches.

Context (measured, tools/fbprof*.py + /tmp optest): on the tunneled TPU
platform every XLA op costs ~80 µs to dispatch regardless of fusion, so
the pure-XLA replay (diff/replay_fast.py, ~250 ops/bounce × 20 bounces)
is dispatch-bound at ~80 ms forward / ~107 ms fwd+bwd per 131k-ray
chunk. The only way to wavefront-speed gradients is to put the bounce
math — forward AND backward — inside Pallas kernels:

* **Forward kernel**: the replay bounce chain (winner-t from the
  recorded id, hit attributes, checker texture, scatter) statically
  unrolled over ``max_depth``, with per-bounce table fields fetched by
  the lane-gather trick (ops/table_gather.py). One launch per chunk.
* **Backward kernel**: re-runs the forward stashing each bounce's entry
  state (o, d, throughput, active) in VMEM scratch, then sweeps the
  bounces in reverse applying the hand-derived VJP of the bounce chain
  (quadratic-root, plane-hit, normal, reflect/refract/normalize, Schlick
  branch masks, checker selects — each mirroring the guarded forms in
  core/vecmath.py so masked lanes stay NaN-free). It emits per-(bounce,
  lane) cotangents for the 19 differentiable table fields.
* **Reduction**: per-bounce one-hot MXU matmuls (the scatter-free
  pattern from ops/table_gather.py) fold the per-lane cotangents into
  the packed table's rows; ``build_replay_table``'s own VJP (plain XLA,
  once per chunk) carries them back to scene parameters.

Scope: gradients flow to SCENE parameters (sphere center/velocity/
radius, quad plane, material fuzz/ior, texture rgbs) — the production
optimization path. Camera-parameter gradients (o/d/time cotangents) are
not emitted; use diff/replay_fast.py (exact, slower) when you need
them. Radiance is bit-identical to replay_trace / replay_trace_fast
(same scalar op order); gradients agree to f32 reassociation
(tests/test_replay_kernel.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import rng as rng_mod
from ..ops.intersect import PARALLEL_EPS, T_MIN
from ..ops.megakernel_block import _pcg4d, _u01
from ..core.vecmath import NEAR_ZERO_EPS
from ..scene.types import MAT_DIELECTRIC, MAT_DIFFUSE_LIGHT, MAT_METAL
from . import replay_fast as rf

TILE = 128
# one-hot table-gradient reduction matmul precision: HIGH (3-pass bf16)
# reconstructs f32 products to ~2^-21 relative — far inside the grad
# tests' 1e-5 tolerances — while HIGHEST (6-pass) ran the bounce-0 dot
# at only 8.4 TFLOP/s (device trace, round 5); the one-hot operand is
# exactly representable in bf16 so only the cotangent side is split
_OH_PRECISION = jax.lax.Precision.HIGH
# ray rows per grid step: 8 keeps take_along_axis on the (8, 128) tile
# shape Mosaic gathers fastest (16-sublane gathers measured ~5x slower)
ROWS = 8
BIG = 3.0e38

# gradient output field order (NG rows per bounce per ray-row)
_G_C = 0      # center / q           (3)
_G_V = 3     # velocity / u edge — u edge unused, velocity only (3)
_G_R = 6     # radius
_G_QN = 7    # quad unit normal     (3)
_G_QD = 10   # quad plane D
_G_FUZZ = 11
_G_IOR = 12
_G_ER = 13   # even rgb (3)
_G_OR = 16   # odd rgb  (3)
NG = 19

# packed-table → gradient-field column mapping (table col, grad slot)
_TABLE_GRAD_COLS = (
    (rf._F_G0, _G_C), (rf._F_G0 + 1, _G_C + 1), (rf._F_G0 + 2, _G_C + 2),
    (rf._F_G1, _G_V), (rf._F_G1 + 1, _G_V + 1), (rf._F_G1 + 2, _G_V + 2),
    (rf._F_RAD, _G_R),
    (rf._F_QN, _G_QN), (rf._F_QN + 1, _G_QN + 1), (rf._F_QN + 2, _G_QN + 2),
    (rf._F_QD, _G_QD),
    (rf._F_FUZZ, _G_FUZZ), (rf._F_IOR, _G_IOR),
    (rf._F_RGB_E, _G_ER), (rf._F_RGB_E + 1, _G_ER + 1),
    (rf._F_RGB_E + 2, _G_ER + 2),
    (rf._F_RGB_O, _G_OR), (rf._F_RGB_O + 1, _G_OR + 1),
    (rf._F_RGB_O + 2, _G_OR + 2),
)


def _resolve(tab_ref, idx, F, n_chunks, const_fields=None, zero=None):
    """All F packed fields for an (R, T) id tile: chunked lane gathers
    from the R-sublane-replicated table (the resolve() trick).

    ``const_fields`` maps field index → scalar for fields the scene
    makes constant (e.g. the quad plane columns of a sphere-only scene):
    those skip the gather entirely — the gathers are ~95% of a replay
    bounce's kernel time (measured), so dropping dead fields is the
    cheapest speedup available. The replicated table rows for skipped
    fields are still present (layout unchanged); they are just unread."""
    vals = []
    for f in range(F):
        if const_fields is not None and f in const_fields:
            vals.append(zero + jnp.float32(const_fields[f]))
            continue
        rows = None
        for c in range(n_chunks):
            local = jnp.clip(idx - c * TILE, 0, TILE - 1)
            g = jnp.take_along_axis(
                tab_ref[f * ROWS:(f + 1) * ROWS,
                        c * TILE:(c + 1) * TILE], local, axis=1)
            if rows is None:
                rows = g
            else:
                use = (idx >= c * TILE) & (idx < (c + 1) * TILE)
                rows = jnp.where(use, g, rows)
        vals.append(rows)
    return vals


def scene_const_fields(scene) -> dict:
    """Packed-table fields that are structurally constant for this scene
    (from scene *structure* only, never traced values, so the dict is a
    compile-time constant). Values must equal what build_replay_table
    writes for every row the recorded ids can reference."""
    const = {}
    if scene.n_quads == 0:
        # quad columns are all-zero for sphere rows (build_replay_table
        # rows_s); the bounce math only reads them under is_quad, which
        # is False for every sphere id, but the values still flow through
        # masked arithmetic — zeros keep sden/t_q finite exactly like the
        # real table's zeros do.
        const[rf._F_ISQUAD] = 0.0
        const[rf._F_QN] = 0.0
        const[rf._F_QN + 1] = 0.0
        const[rf._F_QN + 2] = 0.0
        const[rf._F_QD] = 0.0
    if not scene.flags.has_moving:
        const[rf._F_G1] = 0.0
        const[rf._F_G1 + 1] = 0.0
        const[rf._F_G1 + 2] = 0.0
    if not scene.flags.has_checker:
        # no checker textures anywhere: is_chk == 0 for all rows, odd rgb
        # mirrors even rgb but is never selected (use_even all-True), and
        # scale packs as 0
        const[rf._F_ISCHK] = 0.0
        const[rf._F_INVSC] = 0.0
        # with is_chk == 0 everywhere use_even is all-True, so the odd
        # rgb is never selected forward and its cotangent w_(~ue, ·) is
        # identically zero — constants are safe
        const[rf._F_RGB_O] = 0.0
        const[rf._F_RGB_O + 1] = 0.0
        const[rf._F_RGB_O + 2] = 0.0
    return const


def make_replay_kernels(L, max_depth, background, n_sph, has_moving,
                        interpret=False, tmin=T_MIN, const_fields=None):
    """Build (fwd_run, bwd_run) for a packed replay table of L rows.

    ``const_fields`` (see scene_const_fields): fields resolved as
    compile-time constants instead of lane gathers; the backward kernel
    also drops them from its per-bounce field stash."""
    F = rf.N_FIELDS
    n_chunks = L // TILE
    gather_fields = [f for f in range(F)
                     if not (const_fields and f in const_fields)]
    NF_g = len(gather_fields)
    gslot = {f: k for k, f in enumerate(gather_fields)}
    bg_r, bg_g, bg_b = (float(background[0]), float(background[1]),
                        float(background[2]))
    D = max_depth
    two_pi = 2.0 * jnp.pi
    MT_M, MT_D, MT_L = float(MAT_METAL), float(MAT_DIELECTRIC), \
        float(MAT_DIFFUSE_LIGHT)

    def bounce_fwd(v, ids_b, st, tm, pixu, smpu, seed, b):
        """Forward bounce on (R, T) tiles; returns (new_state, inter)
        where inter holds everything the backward recomputation needs."""
        (ox, oy, oz, dx, dy, dz, rr, rg, rb, tr, tg, tb, act) = st
        i = {}
        has_id = ids_b >= 0
        pid = jnp.where(has_id, ids_b, 0)
        is_quad = pid >= n_sph

        cx, cy, cz = v[rf._F_G0], v[rf._F_G0 + 1], v[rf._F_G0 + 2]
        if has_moving:
            cx = cx + tm * v[rf._F_G1]
            cy = cy + tm * v[rf._F_G1 + 1]
            cz = cz + tm * v[rf._F_G1 + 2]
        ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
        a = dx * dx + dy * dy + dz * dz
        hb = ocx * dx + ocy * dy + ocz * dz
        r = v[rf._F_RAD]
        cq = (ocx * ocx + ocy * ocy + ocz * ocz) - r * r
        disc = hb * hb - a * cq
        pos = disc > 0.0
        sq = jnp.where(pos, jnp.sqrt(jnp.where(pos, disc, 1.0)), 0.0)
        root0 = (-hb - sq) / a
        root1 = (-hb + sq) / a
        use0 = root0 > tmin
        t_s = jnp.where(use0, root0, root1)

        qnx, qny, qnz = v[rf._F_QN], v[rf._F_QN + 1], v[rf._F_QN + 2]
        den = qnx * dx + qny * dy + qnz * dz
        par = jnp.abs(den) < PARALLEL_EPS
        sden = jnp.where(par, 1.0, den)
        t_q = (v[rf._F_QD] - (qnx * ox + qny * oy + qnz * oz)) / sden

        # valid == has_id: both branches' t are finite (a > 0, sden != 0)
        t0 = jnp.where(is_quad, t_q, t_s)
        ts_ = jnp.where(has_id, t0, 0.0)
        px = ox + ts_ * dx
        py = oy + ts_ * dy
        pz = oz + ts_ * dz
        inv_r = 1.0 / jnp.where(r > 0, r, 1.0)
        owx = jnp.where(is_quad, qnx, (px - cx) * inv_r)
        owy = jnp.where(is_quad, qny, (py - cy) * inv_r)
        owz = jnp.where(is_quad, qnz, (pz - cz) * inv_r)
        front = (dx * owx + dy * owy + dz * owz) < 0.0
        sgn = jnp.where(front, 1.0, -1.0)
        nx, ny, nz = sgn * owx, sgn * owy, sgn * owz

        inv_sc = v[rf._F_INVSC]
        cells = (jnp.floor(inv_sc * px).astype(jnp.int32)
                 + jnp.floor(inv_sc * py).astype(jnp.int32)
                 + jnp.floor(inv_sc * pz).astype(jnp.int32))
        use_even = ((cells % 2) == 0) | (v[rf._F_ISCHK] == 0.0)
        tex_r = jnp.where(use_even, v[rf._F_RGB_E], v[rf._F_RGB_O])
        tex_g = jnp.where(use_even, v[rf._F_RGB_E + 1], v[rf._F_RGB_O + 1])
        tex_b = jnp.where(use_even, v[rf._F_RGB_E + 2], v[rf._F_RGB_O + 2])

        ctr = jnp.full(ox.shape, jnp.uint32(0)) + (
            jnp.uint32(b) * jnp.uint32(rng_mod.N_STREAMS)
            + jnp.uint32(rng_mod.STREAM_SCATTER))
        w0, w1, w2, _ = _pcg4d(pixu, smpu, ctr, seed)
        u0, u1, u2 = _u01(w0), _u01(w1), _u01(w2)

        zdir = 1.0 - 2.0 * u0
        rho = jnp.sqrt(jnp.maximum(0.0, 1.0 - zdir * zdir))
        phi = two_pi * u1
        rux = rho * jnp.cos(phi)
        ruy = rho * jnp.sin(phi)
        ruz = zdir

        ldx0, ldy0, ldz0 = nx + rux, ny + ruy, nz + ruz
        degen = ((jnp.abs(ldx0) < NEAR_ZERO_EPS)
                 & (jnp.abs(ldy0) < NEAR_ZERO_EPS)
                 & (jnp.abs(ldz0) < NEAR_ZERO_EPS))
        ldx = jnp.where(degen, nx, ldx0)
        ldy = jnp.where(degen, ny, ldy0)
        ldz = jnp.where(degen, nz, ldz0)

        ddn = dx * nx + dy * ny + dz * nz
        rfx = dx - 2.0 * ddn * nx
        rfy = dy - 2.0 * ddn * ny
        rfz = dz - 2.0 * ddn * nz
        rlen = jnp.sqrt(rfx * rfx + rfy * rfy + rfz * rfz)
        fuzz = v[rf._F_FUZZ]
        mdx = rfx / rlen + fuzz * rux
        mdy = rfy / rlen + fuzz * ruy
        mdz = rfz / rlen + fuzz * ruz
        metal_ok = (mdx * nx + mdy * ny + mdz * nz) > 0.0

        ior = v[rf._F_IOR]
        ri = jnp.where(front, 1.0 / ior, ior)
        dlen = jnp.sqrt(dx * dx + dy * dy + dz * dz)
        udx, udy, udz = dx / dlen, dy / dlen, dz / dlen
        inner = -(udx * nx + udy * ny + udz * nz)
        clip1 = inner < 1.0
        cost = jnp.where(clip1, inner, 1.0)
        sint = jnp.sqrt(jnp.maximum(0.0, 1.0 - cost * cost))
        cannot = ri * sint > 1.0
        r0s = (1.0 - ri) / (1.0 + ri)
        r0 = r0s * r0s
        refl = r0 + (1.0 - r0) * (1.0 - cost) ** 5
        usef = cannot | (refl > u2)
        ppx = ri * (udx + cost * nx)
        ppy = ri * (udy + cost * ny)
        ppz = ri * (udz + cost * nz)
        w = 1.0 - (ppx * ppx + ppy * ppy + ppz * ppz)
        k = jnp.abs(w)
        kpos = k > 0.0
        kroot = jnp.where(kpos, jnp.sqrt(jnp.where(kpos, k, 1.0)), 0.0)
        fdx = ppx - kroot * nx
        fdy = ppy - kroot * ny
        fdz = ppz - kroot * nz
        udn = udx * nx + udy * ny + udz * nz
        xrx = udx - 2.0 * udn * nx
        xry = udy - 2.0 * udn * ny
        xrz = udz - 2.0 * udn * nz
        gdx = jnp.where(usef, xrx, fdx)
        gdy = jnp.where(usef, xry, fdy)
        gdz = jnp.where(usef, xrz, fdz)

        mtype = v[rf._F_MTYPE]
        is_metal = mtype == MT_M
        is_diel = mtype == MT_D
        is_light = mtype == MT_L

        ndx = jnp.where(is_metal, mdx, ldx)
        ndy = jnp.where(is_metal, mdy, ldy)
        ndz = jnp.where(is_metal, mdz, ldz)
        ndx = jnp.where(is_diel, gdx, ndx)
        ndy = jnp.where(is_diel, gdy, ndy)
        ndz = jnp.where(is_diel, gdz, ndz)

        att_r = jnp.where(is_diel, 1.0, tex_r)
        att_g = jnp.where(is_diel, 1.0, tex_g)
        att_b = jnp.where(is_diel, 1.0, tex_b)
        # no select on bool operands (Mosaic portability rule) — the
        # boolean-identical form ops/megakernel_block.py uses
        did_scatter = ((is_metal & metal_ok) | (~is_metal & ~is_light)) \
            & ~is_light

        actb = act > 0.5
        miss = actb & ~has_id
        rr = rr + jnp.where(miss, tr * bg_r, 0.0)
        rg = rg + jnp.where(miss, tg * bg_g, 0.0)
        rb = rb + jnp.where(miss, tb * bg_b, 0.0)
        hit_mask = actb & has_id
        emit = hit_mask & is_light
        rr = rr + jnp.where(emit, tr * tex_r, 0.0)
        rg = rg + jnp.where(emit, tg * tex_g, 0.0)
        rb = rb + jnp.where(emit, tb * tex_b, 0.0)
        live = hit_mask & did_scatter
        tr2 = jnp.where(live, tr * att_r, tr)
        tg2 = jnp.where(live, tg * att_g, tg)
        tb2 = jnp.where(live, tb * att_b, tb)
        ox2 = jnp.where(live, px, ox)
        oy2 = jnp.where(live, py, oy)
        oz2 = jnp.where(live, pz, oz)
        dx2 = jnp.where(live, ndx, dx)
        dy2 = jnp.where(live, ndy, dy)
        dz2 = jnp.where(live, ndz, dz)
        new_state = (ox2, oy2, oz2, dx2, dy2, dz2, rr, rg, rb,
                     tr2, tg2, tb2, jnp.where(live, 1.0, 0.0))

        i.update(
            has_id=has_id, is_quad=is_quad, miss=miss, emit=emit, live=live,
            cx=cx, cy=cy, cz=cz, ocx=ocx, ocy=ocy, ocz=ocz,
            a=a, hb=hb, r=r, cq=cq, pos=pos, sq=sq, use0=use0,
            qnx=qnx, qny=qny, qnz=qnz, par=par, sden=sden, t_q=t_q,
            ts_=ts_, px=px, py=py, pz=pz, inv_r=inv_r,
            owx=owx, owy=owy, owz=owz, sgn=sgn, nx=nx, ny=ny, nz=nz,
            use_even=use_even, tex_r=tex_r, tex_g=tex_g, tex_b=tex_b,
            rux=rux, ruy=ruy, ruz=ruz,
            ddn=ddn, rfx=rfx, rfy=rfy, rfz=rfz, rlen=rlen,
            ri=ri, dlen=dlen, udx=udx, udy=udy, udz=udz,
            clip1=clip1, cost=cost, usef=usef,
            ppx=ppx, ppy=ppy, ppz=ppz, w=w, kpos=kpos, kroot=kroot,
            udn=udn,
            is_metal=is_metal, is_diel=is_diel, is_light=is_light,
            att_r=att_r, att_g=att_g, att_b=att_b,
            tr=tr, tg=tg, tb=tb,
        )
        return new_state, i

    def bounce_bwd(i, st_entry, adj, rad_bar, tm):
        """Hand-derived VJP of bounce_fwd. ``adj`` = cotangents of the
        bounce's OUTPUT (thr, o, d); returns input-side cotangents plus
        the per-lane table-field gradients (NG arrays)."""
        (ox, oy, oz, dx, dy, dz, _rr, _rg, _rb, tr, tg, tb, act) = st_entry
        (TRr, TRg, TRb, Ox, Oy, Oz, Dx, Dy, Dz) = adj
        RRr, RRg, RRb = rad_bar
        live = i["live"]
        miss = i["miss"]
        emit = i["emit"]
        z = jnp.zeros_like(ox)

        def w_(m, x):
            return jnp.where(m, x, 0.0)

        # o' = live ? p : o ; d' = live ? nd : d ; tr' = live ? tr·att : tr
        pbx, pby, pbz = w_(live, Ox), w_(live, Oy), w_(live, Oz)
        obx, oby, obz = w_(~live, Ox), w_(~live, Oy), w_(~live, Oz)
        ndbx, ndby, ndbz = w_(live, Dx), w_(live, Dy), w_(live, Dz)
        dbx, dby, dbz = w_(~live, Dx), w_(~live, Dy), w_(~live, Dz)
        attbr = w_(live, tr * TRr)
        attbg = w_(live, tg * TRg)
        attbb = w_(live, tb * TRb)
        trb = jnp.where(live, i["att_r"] * TRr, TRr)
        tgb = jnp.where(live, i["att_g"] * TRg, TRg)
        tbb = jnp.where(live, i["att_b"] * TRb, TRb)
        # emit adds tr·tex ; miss adds tr·bg
        trb = trb + w_(emit, i["tex_r"] * RRr) + w_(miss, bg_r * RRr)
        tgb = tgb + w_(emit, i["tex_g"] * RRg) + w_(miss, bg_g * RRg)
        tbb = tbb + w_(emit, i["tex_b"] * RRb) + w_(miss, bg_b * RRb)
        texbr = w_(emit, tr * RRr) + w_(~i["is_diel"], attbr)
        texbg = w_(emit, tg * RRg) + w_(~i["is_diel"], attbg)
        texbb = w_(emit, tb * RRb) + w_(~i["is_diel"], attbb)
        ue = i["use_even"]
        erb_r, erb_g, erb_b = w_(ue, texbr), w_(ue, texbg), w_(ue, texbb)
        orb_r, orb_g, orb_b = w_(~ue, texbr), w_(~ue, texbg), w_(~ue, texbb)

        # direction selects
        imet, idie = i["is_metal"], i["is_diel"]
        gdbx, gdby, gdbz = w_(idie, ndbx), w_(idie, ndby), w_(idie, ndbz)
        mm = ~idie & imet
        mdbx, mdby, mdbz = w_(mm, ndbx), w_(mm, ndby), w_(mm, ndbz)
        ll = ~idie & ~imet
        ldbx, ldby, ldbz = w_(ll, ndbx), w_(ll, ndby), w_(ll, ndbz)

        nbx, nby, nbz = ldbx, ldby, ldbz  # lambert: d(ld)/dn = 1 both arms

        # metal: md = rf/rlen + fuzz·ru
        rlen = i["rlen"]
        fuzzb = mdbx * i["rux"] + mdby * i["ruy"] + mdbz * i["ruz"]
        s_md_rf = (mdbx * i["rfx"] + mdby * i["rfy"] + mdbz * i["rfz"])
        inv_rl = 1.0 / rlen
        inv_rl3 = inv_rl * inv_rl * inv_rl
        rfbx = mdbx * inv_rl - s_md_rf * i["rfx"] * inv_rl3
        rfby = mdby * inv_rl - s_md_rf * i["rfy"] * inv_rl3
        rfbz = mdbz * inv_rl - s_md_rf * i["rfz"] * inv_rl3
        # rf = d - 2 ddn n
        S_rf_n = rfbx * i["nx"] + rfby * i["ny"] + rfbz * i["nz"]
        dbx = dbx + rfbx - 2.0 * S_rf_n * i["nx"]
        dby = dby + rfby - 2.0 * S_rf_n * i["ny"]
        dbz = dbz + rfbz - 2.0 * S_rf_n * i["nz"]
        nbx = nbx - 2.0 * (dx * S_rf_n + i["ddn"] * rfbx)
        nby = nby - 2.0 * (dy * S_rf_n + i["ddn"] * rfby)
        nbz = nbz - 2.0 * (dz * S_rf_n + i["ddn"] * rfbz)

        # dielectric: gd = usef ? xr : fd
        usef = i["usef"]
        xrbx, xrby, xrbz = w_(usef, gdbx), w_(usef, gdby), w_(usef, gdbz)
        fdbx, fdby, fdbz = w_(~usef, gdbx), w_(~usef, gdby), w_(~usef, gdbz)
        udbx, udby, udbz = z, z, z
        # xr = ud - 2 udn n
        S_xr_n = xrbx * i["nx"] + xrby * i["ny"] + xrbz * i["nz"]
        udbx = udbx + xrbx - 2.0 * S_xr_n * i["nx"]
        udby = udby + xrby - 2.0 * S_xr_n * i["ny"]
        udbz = udbz + xrbz - 2.0 * S_xr_n * i["nz"]
        nbx = nbx - 2.0 * (i["udx"] * S_xr_n + i["udn"] * xrbx)
        nby = nby - 2.0 * (i["udy"] * S_xr_n + i["udn"] * xrby)
        nbz = nbz - 2.0 * (i["udz"] * S_xr_n + i["udn"] * xrbz)
        # fd = pp - kroot n
        ppbx, ppby, ppbz = fdbx, fdby, fdbz
        krootb = -(fdbx * i["nx"] + fdby * i["ny"] + fdbz * i["nz"])
        nbx = nbx - i["kroot"] * fdbx
        nby = nby - i["kroot"] * fdby
        nbz = nbz - i["kroot"] * fdbz
        # kroot = kpos ? sqrt|w| : 0
        kb = jnp.where(i["kpos"],
                       krootb / (2.0 * jnp.where(i["kpos"], i["kroot"], 1.0)),
                       0.0)
        wb = kb * jnp.where(i["w"] >= 0.0, 1.0, -1.0)
        ppbx = ppbx - 2.0 * wb * i["ppx"]
        ppby = ppby - 2.0 * wb * i["ppy"]
        ppbz = ppbz - 2.0 * wb * i["ppz"]
        # pp = ri (ud + cost n)
        ri, cost = i["ri"], i["cost"]
        rib = (ppbx * (i["udx"] + cost * i["nx"])
               + ppby * (i["udy"] + cost * i["ny"])
               + ppbz * (i["udz"] + cost * i["nz"]))
        udbx = udbx + ri * ppbx
        udby = udby + ri * ppby
        udbz = udbz + ri * ppbz
        costb = ri * (ppbx * i["nx"] + ppby * i["ny"] + ppbz * i["nz"])
        nbx = nbx + ri * cost * ppbx
        nby = nby + ri * cost * ppby
        nbz = nbz + ri * cost * ppbz
        # cost = clip1 ? -(ud·n) : 1
        cib = jnp.where(i["clip1"], costb, 0.0)
        udbx = udbx - cib * i["nx"]
        udby = udby - cib * i["ny"]
        udbz = udbz - cib * i["nz"]
        nbx = nbx - cib * i["udx"]
        nby = nby - cib * i["udy"]
        nbz = nbz - cib * i["udz"]
        # ud = d / dlen
        dlen = i["dlen"]
        s_ud_d = udbx * dx + udby * dy + udbz * dz
        inv_dl = 1.0 / dlen
        inv_dl3 = inv_dl * inv_dl * inv_dl
        dbx = dbx + udbx * inv_dl - s_ud_d * dx * inv_dl3
        dby = dby + udby * inv_dl - s_ud_d * dy * inv_dl3
        dbz = dbz + udbz * inv_dl - s_ud_d * dz * inv_dl3
        # ri = front ? 1/ior : ior  (front == sgn > 0)
        front = i["sgn"] > 0.0
        iorv = jnp.where(front, 1.0, 0.0)  # marker only
        del iorv
        ior_from_tab = jnp.where(front, -(ri * ri), 1.0)
        # d(1/ior)/dior = -1/ior² = -(ri²) when front
        iorb = rib * ior_from_tab

        # n = sgn · ow
        sgn = i["sgn"]
        owbx, owby, owbz = sgn * nbx, sgn * nby, sgn * nbz
        # ow = is_quad ? qn : (p - c)·inv_r
        isq = i["is_quad"]
        qnbx, qnby, qnbz = w_(isq, owbx), w_(isq, owby), w_(isq, owbz)
        inv_r = i["inv_r"]
        pbx = pbx + w_(~isq, owbx * inv_r)
        pby = pby + w_(~isq, owby * inv_r)
        pbz = pbz + w_(~isq, owbz * inv_r)
        cbx = -w_(~isq, owbx * inv_r)
        cby = -w_(~isq, owby * inv_r)
        cbz = -w_(~isq, owbz * inv_r)
        rpos = i["r"] > 0.0
        rb_ = jnp.where(
            rpos & ~isq,
            -(owbx * i["owx"] + owby * i["owy"] + owbz * i["owz"]) * inv_r,
            0.0)

        # p = o + ts d  (checker floor has zero gradient)
        obx = obx + pbx
        oby = oby + pby
        obz = obz + pbz
        dbx = dbx + i["ts_"] * pbx
        dby = dby + i["ts_"] * pby
        dbz = dbz + i["ts_"] * pbz
        tsb = pbx * dx + pby * dy + pbz * dz
        # ts_ = valid(has_id) ? t : 0 ; t = is_quad ? t_q : t_s
        tb_ = w_(i["has_id"], tsb)
        tqb = w_(isq, tb_)
        tsb2 = w_(~isq, tb_)
        # t_q = (qd - qn·o) / sden  (den grads only off the parallel mask)
        sden = i["sden"]
        inv_sd = 1.0 / sden
        qdb = tqb * inv_sd
        not_par = ~i["par"]
        qnbx = qnbx + tqb * (-ox * inv_sd) + jnp.where(
            not_par, tqb * (-i["t_q"] * inv_sd) * dx, 0.0)
        qnby = qnby + tqb * (-oy * inv_sd) + jnp.where(
            not_par, tqb * (-i["t_q"] * inv_sd) * dy, 0.0)
        qnbz = qnbz + tqb * (-oz * inv_sd) + jnp.where(
            not_par, tqb * (-i["t_q"] * inv_sd) * dz, 0.0)
        obx = obx + tqb * (-i["qnx"] * inv_sd)
        oby = oby + tqb * (-i["qny"] * inv_sd)
        obz = obz + tqb * (-i["qnz"] * inv_sd)
        dbx = dbx + jnp.where(not_par,
                              tqb * (-i["t_q"] * inv_sd) * i["qnx"], 0.0)
        dby = dby + jnp.where(not_par,
                              tqb * (-i["t_q"] * inv_sd) * i["qny"], 0.0)
        dbz = dbz + jnp.where(not_par,
                              tqb * (-i["t_q"] * inv_sd) * i["qnz"], 0.0)
        # t_s = (-hb + sg·sq)/a with sg = use0 ? -1 : +1
        a = i["a"]
        inv_a = 1.0 / a
        sg = jnp.where(i["use0"], -1.0, 1.0)
        t_s = jnp.where(i["use0"], (-i["hb"] - i["sq"]) * inv_a,
                        (-i["hb"] + i["sq"]) * inv_a)
        sqb = tsb2 * sg * inv_a
        hbb = -tsb2 * inv_a
        ab = -tsb2 * t_s * inv_a
        # sq = pos ? sqrt(disc) : 0
        discb = jnp.where(i["pos"],
                          sqb / (2.0 * jnp.where(i["pos"], i["sq"], 1.0)),
                          0.0)
        # disc = hb² - a·cq
        hbb = hbb + 2.0 * i["hb"] * discb
        ab = ab - i["cq"] * discb
        cqb = -a * discb
        # cq = oc·oc - r²
        ocbx = 2.0 * cqb * i["ocx"]
        ocby = 2.0 * cqb * i["ocy"]
        ocbz = 2.0 * cqb * i["ocz"]
        rb_ = rb_ - 2.0 * i["r"] * cqb
        # hb = oc·d
        ocbx = ocbx + hbb * dx
        ocby = ocby + hbb * dy
        ocbz = ocbz + hbb * dz
        dbx = dbx + hbb * i["ocx"]
        dby = dby + hbb * i["ocy"]
        dbz = dbz + hbb * i["ocz"]
        # a = d·d
        dbx = dbx + 2.0 * ab * dx
        dby = dby + 2.0 * ab * dy
        dbz = dbz + 2.0 * ab * dz
        # oc = o - c(tm)
        obx = obx + ocbx
        oby = oby + ocby
        obz = obz + ocbz
        cbx = cbx - ocbx
        cby = cby - ocby
        cbz = cbz - ocbz

        grads = [None] * NG
        grads[_G_C], grads[_G_C + 1], grads[_G_C + 2] = cbx, cby, cbz
        if has_moving:
            # c = c0 + tm·v
            grads[_G_V] = tm * cbx
            grads[_G_V + 1] = tm * cby
            grads[_G_V + 2] = tm * cbz
        else:
            grads[_G_V] = grads[_G_V + 1] = grads[_G_V + 2] = z
        grads[_G_R] = rb_
        grads[_G_QN], grads[_G_QN + 1], grads[_G_QN + 2] = qnbx, qnby, qnbz
        grads[_G_QD] = qdb
        grads[_G_FUZZ] = fuzzb
        grads[_G_IOR] = iorb
        grads[_G_ER], grads[_G_ER + 1], grads[_G_ER + 2] = erb_r, erb_g, erb_b
        grads[_G_OR], grads[_G_OR + 1], grads[_G_OR + 2] = orb_r, orb_g, orb_b
        return (trb, tgb, tbb, obx, oby, obz, dbx, dby, dbz), grads

    def fwd_kernel(tab_ref, ids_ref, ox_ref, oy_ref, oz_ref,
                   dx_ref, dy_ref, dz_ref, tm_ref, pix_ref, smp_ref,
                   act_ref, seed_ref, ml_ref, rr_ref, rg_ref, rb_ref,
                   bc_ref, cur):
        """Per-tile path-length gating: ``ml_ref`` holds this grid step's
        max recorded bounce count; bounces ``b >= ml`` have every lane
        dead (bounce_fwd is the identity there), so the whole unrolled
        bounce — table gathers included — is skipped under ``pl.when``.
        State lives in the ``cur`` scratch so it persists across the
        conditional regions (values cannot escape a pl.when body)."""
        seed = seed_ref[0]
        ml = ml_ref[pl.program_id(0)]
        z = jnp.zeros((ROWS, TILE), jnp.float32)
        pixu = pix_ref[...].astype(jnp.uint32)
        smpu = smp_ref[...].astype(jnp.uint32)
        seed_t = jnp.full((ROWS, TILE), jnp.uint32(0)) + seed
        tm = tm_ref[...]
        init = (ox_ref[...], oy_ref[...], oz_ref[...],
                dx_ref[...], dy_ref[...], dz_ref[...],
                z, z, z,
                z + 1.0, z + 1.0, z + 1.0, act_ref[...], z)
        for q, val in enumerate(init):
            cur[q * ROWS:(q + 1) * ROWS, :] = val
        for b in range(D):
            @pl.when(b < ml)
            def _(b=b):
                st = tuple(cur[q * ROWS:(q + 1) * ROWS, :]
                           for q in range(13))
                bc = cur[13 * ROWS:14 * ROWS, :]
                ids_b = ids_ref[b]
                pid = jnp.where(ids_b >= 0, ids_b, 0)
                v = _resolve(tab_ref, pid, F, n_chunks, const_fields, z)
                cur[13 * ROWS:14 * ROWS, :] = bc + jnp.where(
                    st[12] > 0.5, 1.0, 0.0)
                st2, _ = bounce_fwd(v, ids_b, st, tm, pixu, smpu,
                                    seed_t, b)
                for q in range(13):
                    cur[q * ROWS:(q + 1) * ROWS, :] = st2[q]
        rr_ref[...] = cur[6 * ROWS:7 * ROWS, :]
        rg_ref[...] = cur[7 * ROWS:8 * ROWS, :]
        rb_ref[...] = cur[8 * ROWS:9 * ROWS, :]
        bc_ref[...] = cur[13 * ROWS:14 * ROWS, :].astype(jnp.int32)

    def bwd_kernel(tab_ref, ids_ref, ox_ref, oy_ref, oz_ref,
                   dx_ref, dy_ref, dz_ref, tm_ref, pix_ref, smp_ref,
                   act_ref, rbr_ref, rbg_ref, rbb_ref, seed_ref, ml_ref,
                   g_ref, stash, fstash, cur, adjr):
        """Both sweeps are gated per tile like fwd_kernel: a bounce with
        every lane dead is the identity on state forward and on the
        adjoints backward, and contributes zero table gradients — so it
        is skipped in both directions and its g_ref rows are zeroed."""
        seed = seed_ref[0]
        ml = ml_ref[pl.program_id(0)]
        z = jnp.zeros((ROWS, TILE), jnp.float32)
        pixu = pix_ref[...].astype(jnp.uint32)
        smpu = smp_ref[...].astype(jnp.uint32)
        seed_t = jnp.full((ROWS, TILE), jnp.uint32(0)) + seed
        tm = tm_ref[...]
        init = (ox_ref[...], oy_ref[...], oz_ref[...],
                dx_ref[...], dy_ref[...], dz_ref[...],
                z, z, z,
                z + 1.0, z + 1.0, z + 1.0, act_ref[...])
        for q, val in enumerate(init):
            cur[q * ROWS:(q + 1) * ROWS, :] = val
        # forward sweep, stashing each bounce's entry state
        for b in range(D):
            @pl.when(b < ml)
            def _(b=b):
                st = tuple(cur[q * ROWS:(q + 1) * ROWS, :]
                           for q in range(13))
                for q, val in enumerate((st[0], st[1], st[2], st[3], st[4],
                                         st[5], st[9], st[10], st[11],
                                         st[12])):
                    stash[(b * 10 + q) * ROWS:
                          (b * 10 + q + 1) * ROWS, :] = val
                ids_b = ids_ref[b]
                pid = jnp.where(ids_b >= 0, ids_b, 0)
                v = _resolve(tab_ref, pid, F, n_chunks, const_fields, z)
                # stash the resolved (non-constant) fields too: the table
                # gathers are ~95% of a bounce's kernel time (measured);
                # re-reading beats re-gathering in the reverse sweep
                for f in gather_fields:
                    k = gslot[f]
                    fstash[(b * NF_g + k) * ROWS:
                           (b * NF_g + k + 1) * ROWS, :] = v[f]
                st2, _ = bounce_fwd(v, ids_b, st, tm, pixu, smpu,
                                    seed_t, b)
                for q in range(13):
                    cur[q * ROWS:(q + 1) * ROWS, :] = st2[q]
        # backward sweep
        rad_bar = (rbr_ref[...], rbg_ref[...], rbb_ref[...])
        for q in range(9):  # thr(3), o(3), d(3)
            adjr[q * ROWS:(q + 1) * ROWS, :] = z
        for b in range(D - 1, -1, -1):
            @pl.when(b >= ml)
            def _(b=b):
                g_ref[b * NG * ROWS:(b + 1) * NG * ROWS, :] = jnp.zeros(
                    (NG * ROWS, TILE), jnp.float32)

            @pl.when(b < ml)
            def _(b=b):
                def ld(q):
                    return stash[(b * 10 + q) * ROWS:
                                 (b * 10 + q + 1) * ROWS, :]
                st_e = (ld(0), ld(1), ld(2), ld(3), ld(4), ld(5),
                        z, z, z, ld(6), ld(7), ld(8), ld(9))
                ids_b = ids_ref[b]
                v = [
                    (z + jnp.float32(const_fields[f]))
                    if (const_fields and f in const_fields) else
                    fstash[(b * NF_g + gslot[f]) * ROWS:
                           (b * NF_g + gslot[f] + 1) * ROWS, :]
                    for f in range(F)
                ]
                _, inter = bounce_fwd(v, ids_b, st_e, tm, pixu, smpu,
                                      seed_t, b)
                adj = tuple(adjr[q * ROWS:(q + 1) * ROWS, :]
                            for q in range(9))
                adj2, grads = bounce_bwd(inter, st_e, adj, rad_bar, tm)
                for q in range(9):
                    adjr[q * ROWS:(q + 1) * ROWS, :] = adj2[q]
                for g in range(NG):
                    g_ref[(b * NG + g) * ROWS:(b * NG + g + 1) * ROWS,
                          :] = grads[g]

    # per-grid-step tile maxlen, indexed by program_id in-kernel (Mosaic
    # requires rank-1 SMEM blocks to be whole-array or 128-multiples)
    mlspec = pl.BlockSpec(memory_space=pltpu.SMEM)

    def fwd_run(table_rep, ids3, ox, oy, oz, dx, dy, dz, tm, pix, smp,
                act, seed_arr, maxlen):
        n_rows = ox.shape[0]
        assert n_rows % ROWS == 0
        grid = (n_rows // ROWS,)
        rspec = pl.BlockSpec((ROWS, TILE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            fwd_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(table_rep.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((D, ROWS, TILE), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
            ] + [rspec] * 10 + [pl.BlockSpec(memory_space=pltpu.SMEM),
                                mlspec],
            out_specs=[rspec] * 3 + [rspec],
            out_shape=[jax.ShapeDtypeStruct((n_rows, TILE), jnp.float32)] * 3
            + [jax.ShapeDtypeStruct((n_rows, TILE), jnp.int32)],
            scratch_shapes=[pltpu.VMEM((14 * ROWS, TILE), jnp.float32)],
            interpret=interpret,
        )(table_rep, ids3, ox, oy, oz, dx, dy, dz, tm, pix, smp, act,
          seed_arr, maxlen)

    def bwd_run(table_rep, ids3, ox, oy, oz, dx, dy, dz, tm, pix, smp,
                act, rbr, rbg, rbb, seed_arr, maxlen):
        n_rows = ox.shape[0]
        grid = (n_rows // ROWS,)
        rspec = pl.BlockSpec((ROWS, TILE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            bwd_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(table_rep.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((D, ROWS, TILE), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
            ] + [rspec] * 13 + [pl.BlockSpec(memory_space=pltpu.SMEM),
                                mlspec],
            out_specs=pl.BlockSpec((D * NG * ROWS, TILE), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_rows * D * NG, TILE),
                                           jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((D * 10 * ROWS, TILE), jnp.float32),
                pltpu.VMEM((D * NF_g * ROWS, TILE), jnp.float32),
                pltpu.VMEM((13 * ROWS, TILE), jnp.float32),
                pltpu.VMEM((9 * ROWS, TILE), jnp.float32),
            ],
            interpret=interpret,
        )(table_rep, ids3, ox, oy, oz, dx, dy, dz, tm, pix, smp, act,
          rbr, rbg, rbb, seed_arr, maxlen)

    return fwd_run, bwd_run


def _float0(x):
    import numpy as np

    return np.zeros(x.shape, jax.dtypes.float0)


def replay_trace_kernel(
    scene,
    ids: jnp.ndarray,        # (max_depth, B) i32 recorded global ids
    o: jnp.ndarray,
    d: jnp.ndarray,
    time: jnp.ndarray,
    pixel_ids: jnp.ndarray,
    sample_ids: jnp.ndarray,
    background,
    max_depth: int,
    seed,
    active0=None,
    interpret: bool | None = None,
    lengths=None,
    radiance_in=None,
):
    """Drop-in for replay_trace/replay_trace_fast on the kernel path:
    bit-identical radiance/segments, gradients w.r.t. SCENE parameters
    only (rays/camera are stop-gradiented here — use replay_trace_fast
    for camera grads). B must be a multiple of ROWS·TILE (2048).

    ``lengths``: optional (B,) i32 exact per-ray bounce counts from the
    decision pass (``trace_megakernel(want_counts=True)``). Each kernel
    grid step then skips bounces past its 1024-ray tile's max count —
    bit-identical output, and with the final scene's ~2.7 mean path
    length at depth 20 most of the unrolled bounces never execute
    (camera tiles are spatially coherent, so tile maxima stay low).
    ``radiance_in``: optional precomputed (B, 3) radiance — normally the
    decision pass's own output. When given with ``lengths`` the forward
    kernel is skipped entirely: radiance and segments come from the
    decision pass, the custom VJP still runs the backward kernel. Note
    the megakernel's radiance can differ from the replay's on rare rays
    (~1/2048 observed): the block kernel computes unit vectors with
    ``rsqrt(x+1e-30)`` where the replay mirrors the integrator's
    ``sqrt``+divide, and an ulp difference can flip a Schlick or
    metal-absorb *decision* the recorded ids do not capture. The
    megakernel value is the renderer's actual output, so it is the more
    faithful forward value; the replay VJP at such rays is approximate
    either way (decision boundaries are nondifferentiable)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B = o.shape[0]
    rows = B // TILE
    assert rows % ROWS == 0, f"batch must be a multiple of {ROWS * TILE}"
    D = max_depth
    table = rf.build_replay_table(scene)
    L = table.shape[0]
    F = rf.N_FIELDS
    import numpy as np

    if isinstance(background, jax.core.Tracer):
        raise TypeError(
            "replay_trace_kernel bakes the background into the kernel — "
            "pass a static value (e.g. cfg.background), not a traced array")
    bg_np = np.asarray(background, np.float32)
    fwd_run, bwd_run = make_replay_kernels(
        L, D, bg_np, scene.n_spheres,
        scene.flags.has_moving, interpret=interpret,
        const_fields=scene_const_fields(scene))

    sg = jax.lax.stop_gradient
    o, d, time = sg(o), sg(d), sg(time)

    def r2(x):
        return x.reshape(rows, TILE)

    ids3 = ids.reshape(D, rows, TILE)
    ox, oy, oz = r2(o[:, 0]), r2(o[:, 1]), r2(o[:, 2])
    dx, dy, dz = r2(d[:, 0]), r2(d[:, 1]), r2(d[:, 2])
    tm = r2(time)
    pix = r2(pixel_ids.astype(jnp.int32))
    smp = r2(sample_ids.astype(jnp.int32))
    act = (jnp.ones((rows, TILE), jnp.float32) if active0 is None
           else r2(active0.astype(jnp.float32)))
    seed_arr = jnp.asarray([seed], jnp.uint32)
    n_steps = rows // ROWS
    if lengths is None:
        maxlen = jnp.full((n_steps,), D, jnp.int32)
        seg_pre = None
    else:
        lengths = sg(lengths).astype(jnp.int32)
        maxlen = jnp.minimum(
            lengths.reshape(n_steps, ROWS * TILE).max(axis=1), D)
        seg_pre = jnp.sum(lengths)
    use_pre = radiance_in is not None
    if use_pre:
        assert seg_pre is not None, "radiance_in requires lengths"
        rad_pre = sg(radiance_in)
    else:
        # dummy operands so the custom_vjp signature is uniform
        rad_pre = jnp.zeros((1, 3), jnp.float32)
        seg_pre = jnp.zeros((), jnp.int32)

    def _impl(table, ids3, ox, oy, oz, dx, dy, dz, tm, pix, smp, act,
              seed_arr, maxlen, rad_pre, seg_pre):
        if use_pre:
            return rad_pre, seg_pre
        rep = jnp.repeat(table.T, ROWS, axis=0)
        rr, rg, rb, bc = fwd_run(rep, ids3, ox, oy, oz, dx, dy, dz, tm,
                                 pix, smp, act, seed_arr, maxlen)
        radiance = jnp.stack(
            [rr.reshape(B), rg.reshape(B), rb.reshape(B)], axis=-1)
        return radiance, jnp.sum(bc)

    @jax.custom_vjp
    def run(table, ids3, ox, oy, oz, dx, dy, dz, tm, pix, smp, act,
            seed_arr, maxlen, rad_pre, seg_pre):
        return _impl(table, ids3, ox, oy, oz, dx, dy, dz, tm, pix, smp,
                     act, seed_arr, maxlen, rad_pre, seg_pre)

    def run_fwd(table, ids3, ox, oy, oz, dx, dy, dz, tm, pix, smp, act,
                seed_arr, maxlen, rad_pre, seg_pre):
        out = _impl(table, ids3, ox, oy, oz, dx, dy, dz, tm, pix, smp,
                    act, seed_arr, maxlen, rad_pre, seg_pre)
        return out, (table, ids3, ox, oy, oz, dx, dy, dz, tm, pix, smp,
                     act, seed_arr, maxlen)

    def run_bwd(res, cot):
        (table, ids3, ox, oy, oz, dx, dy, dz, tm, pix, smp, act,
         seed_arr, maxlen) = res
        rad_bar, _seg_bar = cot
        rep = jnp.repeat(table.T, ROWS, axis=0)
        g = bwd_run(rep, ids3, ox, oy, oz, dx, dy, dz, tm, pix, smp, act,
                    r2(rad_bar[:, 0]), r2(rad_bar[:, 1]),
                    r2(rad_bar[:, 2]), seed_arr, maxlen)
        steps = rows // ROWS
        g5 = g.reshape(steps, D, NG, ROWS, TILE)
        ids_flat = ids3.reshape(D, B)
        acc = jnp.zeros((L, NG), jnp.float32)
        arangeL = jnp.arange(L, dtype=jnp.int32)
        for b in range(D):
            gm = g5[:, b].transpose(0, 2, 3, 1).reshape(B, NG)
            idb = jnp.clip(jnp.where(ids_flat[b] >= 0, ids_flat[b], 0),
                           0, L - 1)
            oh = (idb[:, None] == arangeL[None, :]).astype(jnp.float32)
            acc = acc + jax.lax.dot_general(
                oh, gm, dimension_numbers=(((0,), (0,)), ((), ())),
                precision=_OH_PRECISION)
        cols = [jnp.zeros((L,), jnp.float32)] * F
        for tc, gs in _TABLE_GRAD_COLS:
            cols[tc] = acc[:, gs]
        tbar = jnp.stack(cols, axis=1)
        zf = jnp.zeros_like
        return (tbar, _float0(ids3), zf(ox), zf(oy), zf(oz), zf(dx),
                zf(dy), zf(dz), zf(tm), _float0(pix), _float0(smp),
                zf(act), _float0(seed_arr), _float0(maxlen),
                jnp.zeros((B, 3) if use_pre else (1, 3), jnp.float32),
                _float0(jnp.zeros((), jnp.int32)))

    run.defvjp(run_fwd, run_bwd)
    return run(table, ids3, ox, oy, oz, dx, dy, dz, tm, pix, smp, act,
               seed_arr, maxlen, rad_pre, seg_pre)


_IDS_PER_WORD = 3  # 10-bit biased ids, 3 per int32 (sort-operand slimming)


def _pack_ids(ids, D):
    """(D, B) int32 ids in [-1, 1022] → ceil(D/3) packed int32 columns.

    Each id is biased by +1 into [0, 1023] and three ids occupy bits
    [0:10), [10:20), [20:30) of one non-negative word — lossless, and
    cheap VPU shifts versus moving 20 4-byte columns through a sort."""
    words = []
    for w in range(0, D, _IDS_PER_WORD):
        acc = None
        for k in range(min(_IDS_PER_WORD, D - w)):
            v = (ids[w + k] + 1) << (10 * k)
            acc = v if acc is None else acc | v
        words.append(acc)
    return words


def _unpack_ids(words, D):
    """Inverse of _pack_ids → (D, B) int32 stacked ids."""
    rows = []
    for b in range(D):
        word = words[b // _IDS_PER_WORD]
        rows.append(((word >> (10 * (b % _IDS_PER_WORD))) & 0x3FF) - 1)
    return jnp.stack(rows, axis=0)


def plan_prefixes(length_hist, B, max_depth, margin=1.15):
    """Static per-bounce ray-prefix plan for replay_grads_sorted.

    ``length_hist``: (max_depth + 1,) counts of recorded path lengths
    (host ints or array), typically ``jnp.bincount(lengths, length=D+1)``
    pulled to host from an untimed warm-up pass. Bounce ``b`` touches
    exactly the rays with length > b — with rays length-sorted those are
    a prefix of size ``n_b = sum(hist[b+1:])``. Returns a tuple of D
    ints, each ``ceil(margin · n_b)`` rounded up to the 1024-ray kernel
    step (so the prefix covers whole grid steps), clamped to B. The
    margin absorbs count drift when scene parameters move between
    optimizer steps; replay_grads_sorted returns an ``ok`` flag that is
    False iff any bounce's real count exceeded its prefix (grads would
    silently drop contributions — callers must check it)."""
    import numpy as np

    hist = np.asarray(length_hist, np.int64)
    step = ROWS * TILE
    prefixes = []
    for b in range(max_depth):
        n_b = int(hist[b + 1:].sum())
        p = min(B, -(-int(np.ceil(n_b * margin)) // step) * step)
        prefixes.append(p)
    return tuple(prefixes)


def replay_grads_sorted(
    scene,
    table: jnp.ndarray,      # (L, N_FIELDS) from rf.build_replay_table —
                             # pass the *traced* table so its VJP carries
                             # tbar back to scene parameters
    ids: jnp.ndarray,        # (max_depth, B) i32 recorded global ids
    o: jnp.ndarray,
    d: jnp.ndarray,
    time: jnp.ndarray,
    pixel_ids: jnp.ndarray,
    sample_ids: jnp.ndarray,
    background,
    max_depth: int,
    seed,
    rad_bar: jnp.ndarray,    # (B, 3) per-ray radiance cotangent
    lengths: jnp.ndarray,    # (B,) i32 exact per-ray bounce counts
    prefixes=None,           # optional plan from plan_prefixes
    interpret: bool | None = None,
    ray_regen=None,          # optional orig_idx -> (o, d, t, pix, smp)
    compacted=None,          # optional decide-pass compacted-id bundle
):
    """Scene-parameter gradient pass over recorded decisions, with the
    rays sorted by recorded path length.

    This is the explicit-cotangent fast path for production optimization
    loops (and bench.py): the caller computes the loss value and the
    per-ray radiance cotangent analytically from the decision pass's own
    radiance (megakernel ``want_ids``/``want_counts``), so no forward
    replay ever runs — only the backward kernel and the table-gradient
    reduction. Two structural savings over replay_trace_kernel's VJP:

    * **Length sorting** (one fused unstable ``lax.sort`` on a unique
      descending-length key): the backward kernel's per-1024-ray-tile
      bounce gating then skips almost everything past each ray's death —
      tile maxima collapse from the batch max (~depth) to ~the sorted
      ray's own length, cutting slot-bounces to ~(1 + 1/tile) · segments.
      Sort cost is operand-count bound: ids ride packed 3-per-int32, and
      with ``ray_regen`` (``orig_idx -> (o, d, t, pix, smp)``, the
      camera-ray regeneration hook — rays are pure functions of the
      original ray index) only key + rad_bar + packed ids move through
      the sort; everything else is recomputed bit-identically from the
      sorted key.
    * **Prefix-sliced one-hot reduction**: bounce b's gradient rows are
      all within the sorted prefix of rays with length > b, so each
      per-bounce one-hot MXU matmul shrinks from B rows to the planned
      static prefix (plan_prefixes). Exact, not approximate — the
      returned ``ok`` is False iff a prefix was exceeded (then a
      contribution was dropped and the caller must replan).

    ``compacted`` (round-5 sort diet, requires ``ray_regen``): a dict
    bundling trace_megakernel's ``want_ids="compacted"`` extras —
    ``ids0`` (pd0, B) camera-order phase-1 ids, ``later`` (W, B)
    later-phase packed id words in compacted order, ``perm`` (B,)
    camera index per compacted lane, ``counts_c`` (B,) compacted-order
    lengths, plus static ``phase_depths`` and ``pack``. The later-phase
    words then move compacted→length-order in one sort (the camera-order
    unpermute detour is skipped entirely) while the cotangent + phase-1
    words ride a second sort from camera order; both sorts share the
    same unique key set so the columns align bit-exactly
    (tests/test_replay_kernel.py asserts bit-equality with the unified
    path). ``ids`` is ignored (pass None). Measured: 57.6 → 59.5M
    rays/s fwd+bwd on the v5e bench workload.

    Returns ``(tbar, ok)``: the packed-table cotangent (L, N_FIELDS) —
    feed it to ``jax.vjp(build_replay_table ∘ params)`` — and the plan
    validity flag (scalar bool, True when prefixes is None).

    Gradients equal replay_trace_kernel's up to f32 reassociation (the
    one-hot sums reduce in sorted ray order; tests/test_replay_kernel.py
    asserts agreement)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B = o.shape[0]
    rows = B // TILE
    assert rows % ROWS == 0, f"batch must be a multiple of {ROWS * TILE}"
    D = max_depth
    L = table.shape[0]
    F = rf.N_FIELDS
    import numpy as np

    if isinstance(background, jax.core.Tracer):
        raise TypeError(
            "replay_grads_sorted bakes the background into the kernel — "
            "pass a static value (e.g. cfg.background), not a traced array")
    bg_np = np.asarray(background, np.float32)
    _, bwd_run = make_replay_kernels(
        L, D, bg_np, scene.n_spheres, scene.flags.has_moving,
        interpret=interpret, const_fields=scene_const_fields(scene))

    sg = jax.lax.stop_gradient
    lengths = sg(lengths).astype(jnp.int32)
    rad_bar = sg(rad_bar)

    # one fused sort moves every per-ray column to descending-length
    # order; the key is unique (len · B + lane) so the unstable
    # single-compare sort is deterministic (see trace_megakernel's
    # compaction notes on TPU sort cost). TPU sort cost is operand-count
    # bound (data movement), so the D recorded-id columns are packed
    # three 10-bit ids per int32 word for the ride (ids are in
    # [-1, n_prims-1] and the packed tables cap L at 1023 rows —
    # lossless) — D=20 moves as 7 columns instead of 20.
    iota = jnp.arange(B, dtype=jnp.int32)
    key = (D - lengths) * B + iota
    pack = L <= 1023  # ids must fit 10 bits after the +1 bias
    if compacted is not None:
        # Round-5 sort diet (requires ray_regen): the decide pass kept
        # the later-phase id words in COMPACTED lane order
        # (trace_megakernel want_ids="compacted"), so they skip the
        # camera-order detour and move straight to length order here.
        # Two sorts over the SAME unique key set — key encodes
        # (D - length)·B + original index, computed from compacted-order
        # counts+perm on one side and camera-order counts+iota on the
        # other — produce bit-aligned columns: sort A carries the
        # later-phase words from compacted order, sort B carries the
        # cotangent + phase-1 words (phase 1 is recorded under the
        # identity permutation) from camera order. Net at the bench
        # shape: 5+8+5 full-B sort operands versus 12+11 for the
        # unpermute + single length sort it replaces.
        assert ray_regen is not None, "compacted ids require ray_regen"
        pdep = tuple(compacted["phase_depths"])
        assert sum(pdep) == D, (pdep, D)
        pack_c = bool(compacted["pack"])
        ids0 = compacted["ids0"]
        pd0 = pdep[0]
        assert ids0.shape[0] == pd0, (ids0.shape, pdep)
        key_c = (D - sg(compacted["counts_c"]).astype(jnp.int32)) * B \
            + compacted["perm"].astype(jnp.int32)
        later = compacted["later"]
        outA = jax.lax.sort(
            [key_c] + [later[w] for w in range(later.shape[0])],
            num_keys=1, is_stable=False)
        key_s, later_s = outA[0], outA[1:]
        ids0_cols = (_pack_ids(ids0, pd0) if pack_c
                     else [ids0[b] for b in range(pd0)])
        nw0 = len(ids0_cols)
        outB = jax.lax.sort(
            [key, rad_bar[:, 0], rad_bar[:, 1], rad_bar[:, 2]] + ids0_cols,
            num_keys=1, is_stable=False)
        rbr, rbg, rbb = outB[1:4]
        rows_list = [(_unpack_ids(list(outB[4:4 + nw0]), pd0) if pack_c
                      else jnp.stack(outB[4:4 + nw0], axis=0))]
        w0 = 0
        for pd_n in pdep[1:]:
            nw = -(-pd_n // _IDS_PER_WORD) if pack_c else pd_n
            grp = list(later_s[w0:w0 + nw])
            w0 += nw
            rows_list.append(_unpack_ids(grp, pd_n) if pack_c
                             else jnp.stack(grp, axis=0))
        assert w0 == len(later_s), (w0, len(later_s))
        ids_s = jnp.concatenate(rows_list, axis=0)
        len_s = D - key_s // B
        orig = key_s % B
        o_s, d_s, t_s, pix_s, smp_s = ray_regen(orig)
        oxf, oyf, ozf = sg(o_s[:, 0]), sg(o_s[:, 1]), sg(o_s[:, 2])
        dxf, dyf, dzf = sg(d_s[:, 0]), sg(d_s[:, 1]), sg(d_s[:, 2])
        tmf = sg(t_s)
        pix_s = pix_s.astype(jnp.int32)
        smp_s = smp_s.astype(jnp.int32)
    elif ray_regen is not None:
        # The unique key encodes BOTH the length (key // B) and the
        # original ray index (key % B), and camera rays are pure
        # functions of that index — so only key + rad_bar + packed ids
        # ride the sort; o/d/t/pix/smp are regenerated bit-identically
        # from the sorted key (the make_regen trick, one level up).
        ops = [key, rad_bar[:, 0], rad_bar[:, 1], rad_bar[:, 2]]
        n_fixed = len(ops)
        ops += _pack_ids(ids, D) if pack else [ids[b] for b in range(D)]
        out = jax.lax.sort(ops, num_keys=1, is_stable=False)
        rbr, rbg, rbb = out[1:n_fixed]
        key_s = out[0]
        len_s = D - key_s // B
        orig = key_s % B
        o_s, d_s, t_s, pix_s, smp_s = ray_regen(orig)
        oxf, oyf, ozf = sg(o_s[:, 0]), sg(o_s[:, 1]), sg(o_s[:, 2])
        dxf, dyf, dzf = sg(d_s[:, 0]), sg(d_s[:, 1]), sg(d_s[:, 2])
        tmf = sg(t_s)
        pix_s = pix_s.astype(jnp.int32)
        smp_s = smp_s.astype(jnp.int32)
    else:
        ops = [key,
               pixel_ids.astype(jnp.int32), sample_ids.astype(jnp.int32),
               rad_bar[:, 0], rad_bar[:, 1], rad_bar[:, 2], lengths,
               sg(o[:, 0]), sg(o[:, 1]), sg(o[:, 2]),
               sg(d[:, 0]), sg(d[:, 1]), sg(d[:, 2]), sg(time)]
        n_fixed = len(ops)
        ops += _pack_ids(ids, D) if pack else [ids[b] for b in range(D)]
        out = jax.lax.sort(ops, num_keys=1, is_stable=False)
        (pix_s, smp_s, rbr, rbg, rbb, len_s,
         oxf, oyf, ozf, dxf, dyf, dzf, tmf) = out[1:n_fixed]
    if compacted is None:
        ids_s = (_unpack_ids(out[n_fixed:], D) if pack
                 else jnp.stack(out[n_fixed:], axis=0))  # (D, B) sorted

    def r2(x):
        return x.reshape(rows, TILE)

    n_steps = rows // ROWS
    step = ROWS * TILE
    maxlen = jnp.minimum(len_s.reshape(n_steps, step).max(axis=1), D)
    act = (len_s > 0).astype(jnp.float32)  # active0 ⟺ traced ≥ 1 segment

    g = bwd_run(jnp.repeat(table.T, ROWS, axis=0),
                ids_s.reshape(D, rows, TILE),
                r2(oxf), r2(oyf), r2(ozf), r2(dxf), r2(dyf), r2(dzf),
                r2(tmf), r2(pix_s), r2(smp_s), r2(act),
                r2(rbr), r2(rbg), r2(rbb),
                jnp.asarray([seed], jnp.uint32), maxlen)
    g5 = g.reshape(n_steps, D, NG, ROWS, TILE)

    if prefixes is None:
        prefixes = (B,) * D
    assert len(prefixes) == D
    ok = jnp.bool_(True)
    acc = jnp.zeros((L, NG), jnp.float32)
    arangeL = jnp.arange(L, dtype=jnp.int32)
    for b in range(D):
        P = min(B, -(-int(prefixes[b]) // step) * step)
        if P <= 0:
            # plan says no ray reaches bounce b: validate, contribute 0
            ok = ok & (len_s[0] <= b)
            continue
        if P < B:
            # first excluded ray must already be dead at bounce b; sorted
            # descending, so then every excluded ray is
            ok = ok & (len_s[P] <= b)
        S = P // step
        gm = g5[:S, b].transpose(0, 2, 3, 1).reshape(P, NG)
        idb = ids_s[b, :P]
        idb = jnp.clip(jnp.where(idb >= 0, idb, 0), 0, L - 1)
        oh = (idb[:, None] == arangeL[None, :]).astype(jnp.float32)
        acc = acc + jax.lax.dot_general(
            oh, gm, dimension_numbers=(((0,), (0,)), ((), ())),
            precision=_OH_PRECISION)
    cols = [jnp.zeros((L,), jnp.float32)] * F
    for tc, gs in _TABLE_GRAD_COLS:
        cols[tc] = acc[:, gs]
    tbar = jnp.stack(cols, axis=1)
    return tbar, ok
