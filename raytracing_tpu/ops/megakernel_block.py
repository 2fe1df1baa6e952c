"""Block-layout Pallas megakernel (v4): 1024 rays per grid step as one
native (8, 128) tile, primitives streamed as SMEM scalars.

This is the default TPU fast path for dense (non-BVH) scenes. It differs
from the group-layout kernel (ops/megakernel.py) in one structural idea:
**rays fill the whole vreg**. The group kernel keeps rays in (1, 128)
rows — 8 row groups per block — so every op outside its pairwise chunk
blocks wastes 7/8 of the vector unit and the whole bounce pipeline runs
8x per block. Here every stage (sweep, resolve, textures, shade, RNG)
operates on (8, 128) = 1024 rays at once:

* **Sweep**: a ``fori_loop`` over primitives; each step reads one
  primitive's fields from SMEM on the scalar core (which runs ahead of
  the vector core in Mosaic's software pipeline) and issues ~30
  vector-scalar ops against the full ray tile. Measured (v5e, 488
  spheres): 17.0 ns/segment vs 23.0 for the pairwise-chunk sweep — at
  ~1 op/cycle this is the VPU issue limit for brute force — and it
  compiles in ~2 s vs ~130 s (no unrolled chunk bodies), which matters
  on the remote-compiler setup (see CLAUDE.md).
* **Resolve**: winner attributes come from ``take_along_axis`` gathers
  over *field-replicated* tables (scene/flatten.py resolve_table_rep):
  for each field, 8 identical sublane rows let one gather serve all
  1024 per-ray indices.
* **Textures**: same replication trick for the Perlin permutation/
  gradient tables (noise_tables_rep) and the image atlas channels
  (atlas_table_rep); the texture math itself is a direct port of the
  group kernel's (texture.hpp:91-156, perlin.hpp:94-254 semantics).
* **Bounce loop**: ``while_loop`` with a block-level all-dead early
  exit by default (the ~2 µs Mosaic while-iteration floor is ~15% of
  the ~13 µs body at final-scene size); static unroll available.

Parity: winner *semantics* match the group kernel and the XLA
integrator — nearest root in (tmin, closest), lowest index winning ties
via strict < (sphere.hpp hit semantics; tests/test_megakernel.py
equality suite) — up to f32 rounding: the sphere root search runs in
``a·t`` space (roots kept as ``-half_b ∓ √disc``, every comparison
scaled by ``a > 0``, only the winner divided back), the motion offset
is folded into ``oc``, and r² seeds the ``oc·oc`` accumulation, which
together drop ~6 of ~28 VPU ops per sphere but reassociate a few f32
sums. Razor-edge winners (two roots within 1 ulp of each other or of
tmin) can differ from the XLA path; the suite's tolerances cover this.

Mosaic portability rules are listed in ops/megakernel.py's docstring —
read them before editing. One addition learned here: per-primitive
*scalar* SMEM reads are cheap (they pipeline on the scalar core); the
round-1 warning about SMEM stalls applied to per-*lane* scalar loads.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene import flatten as fl

TILE = 128
GROUPS = 8
BLOCK = TILE * GROUPS

BIG = 3.0e38
T_MIN = 1e-3

MT_METAL = 1.0
MT_DIELECTRIC = 2.0
MT_LIGHT = 3.0

# fori_loop unroll for the primitive sweeps: enough independent per-prim
# dependency chains in flight to cover VPU ALU latency. Measured on the
# final scene (v5e, round 3): 2 → 45.0M, 4 → 57.0M, 8 → 64.6M rays/s
# end-to-end. Each table uses the largest divisor of its row count ≤
# this (spheres pad to CLUSTER_SIZE=16 rows, quads to 8 —
# scene/flatten.py sweep_tables). RT_SWEEP_UNROLL env overrides for
# perf-matrix sweeps.
import os as _os

SWEEP_UNROLL = int(_os.environ.get("RT_SWEEP_UNROLL", "8"))


def _exact_unroll(n_rows: int, cap: int) -> int:
    u = 1
    for cand in (16, 8, 4, 2):
        if cand <= cap and n_rows % cand == 0:
            u = cand
            break
    return u


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _pcg4d(a, b, c, d):
    mul = jnp.uint32(1664525)
    add = jnp.uint32(1013904223)
    v0 = a * mul + add
    v1 = b * mul + add
    v2 = c * mul + add
    v3 = d * mul + add
    v0 = v0 + v1 * v3
    v1 = v1 + v2 * v0
    v2 = v2 + v0 * v1
    v3 = v3 + v1 * v2
    v0 = v0 ^ (v0 >> 16)
    v1 = v1 ^ (v1 >> 16)
    v2 = v2 ^ (v2 >> 16)
    v3 = v3 ^ (v3 >> 16)
    v0 = v0 + v1 * v3
    v1 = v1 + v2 * v0
    v2 = v2 + v0 * v1
    v3 = v3 + v1 * v2
    return v0, v1, v2, v3


def _u01(x):
    return (x >> jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32) * jnp.float32(
        1.0 / (1 << 24)
    )


def _atan2f(y, x):
    """f32 atan2 from elementwise primitives only (~2e-7 rad max error).

    Mosaic TC has no ``arctan2`` lowering (NotImplementedError on real
    TPU hardware — found when the earth scene first ran on-chip), so the
    kernels carry their own: octant reduction to t = min/max ∈ [0, 1],
    the tan(π/8) sub-reduction t → (t−1)/(t+1), the 4-term Cephes atanf
    minimax polynomial, then quadrant reconstruction. Matches
    jnp.arctan2 to ≲2e-7 rad (texture UV use: ≲1e-7 texel coordinate).

    Signed-zero caveat: the final sign select uses ``y < 0.0``, so
    atan2(-0.0, -1.0) returns +pi where jnp.arctan2 returns -pi (and
    likewise ±0 on the +x axis both map to +0). Harmless for sphere-UV
    (both boundary values hit the same texel); use jnp.signbit(y) in the
    last select if exact arctan2 parity is ever needed.
    """
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    swap = ay > ax
    mx = jnp.maximum(ax, ay)
    mn = jnp.minimum(ax, ay)
    t = mn / jnp.where(mx > 0.0, mx, 1.0)
    red = t > 0.4142135623730951  # tan(pi/8)
    tr = (t - 1.0) / (t + 1.0)
    tt = jnp.where(red, tr, t)
    z = tt * tt
    p = ((((8.05374449538e-2 * z - 1.38776856032e-1) * z
           + 1.99777106478e-1) * z - 3.33329491539e-1) * z * tt + tt)
    p = jnp.where(red, p + 0.7853981633974483, p)
    p = jnp.where(swap, 1.5707963267948966 - p, p)
    p = jnp.where(x < 0.0, jnp.pi - p, p)
    return jnp.where(y < 0.0, -p, p)


def make_megakernel_block(mega, *, max_depth: int, background,
                          tmin: float = T_MIN, interpret: bool = False,
                          unroll: bool = False, ablate: tuple = (),
                          want_state: bool = True, want_ids: bool = False,
                          use_clusters: bool | None = None,
                          depth_cap: int | None = None,
                          n_sub_max: int | None = None):
    """Build the block-layout megakernel for one phase.

    ``depth_cap`` (the pool/regeneration mode, render/pool.py): rays in
    one launch no longer share a bounce index — ``run`` takes an extra
    per-ray ``dep`` array (i32: segments already traced by the ray
    before this launch). The RNG stream index becomes
    ``dep + b`` per ray (bit-identical streams to the phased path, which
    passes the shared offset through ``seed_and_offset[1]``) and a ray
    dies — state kept, like the XLA integrator's depth exhaustion — once
    it has traced ``depth_cap`` total segments. ``max_depth`` stays the
    per-launch bounce budget.

    Returns ``run(sph_sweep, quad_sweep, tabt_rep, noise_rep, atlas_rep,
    ox..dz, tm, pix, smp, thr_r..act, seed_and_offset) -> 14 outputs`` —
    the same output tuple as the group kernel's ``run`` so
    ``trace_megakernel`` can drive either interchangeably. With
    ``want_state=False`` only the first 4 (rad_r, rad_g, rad_b, bounces)
    are produced — use for the final (or only) phase.

    ``use_clusters`` (auto: scenes with ≥ 64 spheres) switches the sphere
    sweep to *clustered culling*: a static ``fori_loop`` over
    CLUSTER_SIZE-sphere groups slab-tests each group's swept AABB (SMEM
    scalars, scene/flatten.py sphere_cluster_boxes) against the whole
    (8, 128) ray tile and executes the group's sweep under ``pl.when``
    only if any lane can beat its current best t — the bvh_node.hpp:80-95
    reject-and-clip idea at tile granularity, with the running best (t,
    idx) in VMEM scratch instead of loop carries so the skip branch moves
    no vector state (no while_loop, so none of its ~2 µs/iteration floor).
    Winner semantics are unchanged (same per-primitive math in the same
    index order; skipped groups provably cannot win).

    ``want_ids`` appends one more output: the winning *kernel* primitive
    index per (bounce, ray) — ``(n_rows·max_depth, TILE) i32``, ``-1`` for
    miss and for bounces past a sub-block's all-dead early exit. This is
    the TPU decision pass for replay-based differentiation
    (diff/replay.py): grid step ``i`` owns rows ``[i·D·S, (i+1)·D·S)``
    (D = max_depth, S = step rows), bounce ``b`` of sub-block ``s`` at row
    ``b·S + s·8`` — an 8-aligned dynamic sublane store, which Mosaic
    supports inside the bounce ``while_loop``.
    """
    import numpy as np

    n_sph = mega.n_sph
    n_quad = mega.n_quad
    # static-scene fast path: skip the per-sphere motion ops entirely
    moving = bool(np.any(np.asarray(mega.sph_sweep)[:, 3:6] != 0.0))
    n_sph_rows = mega.sph_sweep.shape[0]
    n_quad_rows = mega.quad_sweep.shape[0]
    ns_pad = mega.n_sph_pad
    fields = mega.resolve_fields
    fslot = {f: i for i, f in enumerate(fields)}
    p_lanes = mega.tabt_rep.shape[1]
    n_lane_chunks = p_lanes // TILE
    has_noise = mega.has_noise
    has_image = mega.has_image
    atlas_lanes = mega.atlas_rep.shape[1]
    atlas_packed = mega.atlas_rep.dtype == jnp.int32  # big-image tier
    bg_r, bg_g, bg_b = (float(background[0]), float(background[1]),
                        float(background[2]))
    U = fl
    if n_sub_max is None:
        # measured (v5e, final scene): raising n_sub past 8 does NOT pay —
        # phased unchanged (56.4M), pool −7% (51.9 vs 55.7M rays/s);
        # bigger steps hurt the software pipeline more than the ~21 µs
        # per-step fixed cost they amortize. Kept as a knob for bigger
        # scenes/kernels.
        n_sub_max = 8
    cbox = mega.sph_cluster_boxes
    if use_clusters is None:
        # measured (v5e, final scene end-to-end): 49.4M rays/s clustered
        # (vector slab tests) vs 55.4M plain — per-cluster vector slab
        # tests + scratch traffic cost more than the skips save. The
        # scalar-core cone test ("frustum") moves the whole cull off the
        # vector unit; see trace_megakernel for the default policy.
        use_clusters = False
    if not (cbox is not None and n_sph > 0):
        use_clusters = False
    n_clusters = int(cbox.shape[0]) if use_clusters else 0
    if use_clusters:
        assert n_sph_rows == n_clusters * fl.CLUSTER_SIZE

    def make_kernel(n_sub, want_state, want_ids):
        """``n_sub`` (8,128) ray sub-blocks are processed per grid step —
        per-step fixed costs (input/output DMA issue for ~30 buffers +
        pipeline machinery, measured ~21 µs against a ~6 µs final-scene
        sweep) amortize across sub-blocks while the bounce while_loop's
        all-dead early exit keeps its 1024-ray granularity. ``want_state``
        False (single-phase traces) drops the 10 carried-state outputs
        and their store DMAs entirely."""

        def kernel(*refs):
            (sph_ref, quad_ref, cbox_ref, tabt_ref, noise_ref, atlas_ref,
             ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tm_ref,
             pix_ref, smp_ref,
             tr_ref, tg_ref, tb2_ref, ra_ref, ga_ref, ba_ref,
             act_ref) = refs[:22]
            if depth_cap is not None:
                dep_ref, seed_ref = refs[22:24]
                outs = refs[24:-4]
            else:
                dep_ref, seed_ref = None, refs[22]
                outs = refs[23:-4]
            zref, tbs_ref, ibs_ref, clist_ref = refs[-4:]
            rr_ref, rg_ref, rb_ref, bc_ref = outs[0:4]
            k = 4
            state_outs = None
            if want_state:
                state_outs = outs[k:k + 10]
                k += 10
            ids_ref = outs[k] if want_ids else None

            seed = seed_ref[0]
            b_off = seed_ref[1]

            zref[:] = jnp.zeros((GROUPS, TILE), jnp.float32)
            zero = zref[:]

            if ids_ref is not None:
                # deterministic -1 for bounces past a sub-block's early exit
                ids_ref[:] = jnp.full(
                    (max_depth * GROUPS * n_sub, TILE), -1, jnp.int32)

            for s in range(n_sub):
                _trace_sub(
                    s, n_sub, zero, seed, b_off,
                    sph_ref, quad_ref, cbox_ref, tabt_ref, noise_ref,
                    atlas_ref,
                    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                    tm_ref, pix_ref, smp_ref,
                    tr_ref, tg_ref, tb2_ref, ra_ref, ga_ref, ba_ref,
                    act_ref, dep_ref, rr_ref, rg_ref, rb_ref, bc_ref,
                    state_outs, ids_ref, tbs_ref, ibs_ref, clist_ref)

        return kernel

    def _trace_sub(s, n_sub, zero, seed, b_off,
                   sph_ref, quad_ref, cbox_ref, tabt_ref, noise_ref,
                   atlas_ref,
                   ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                   tm_ref, pix_ref, smp_ref,
                   tr_ref, tg_ref, tb2_ref, ra_ref, ga_ref, ba_ref,
                   act_ref, dep_ref, rr_ref, rg_ref, rb_ref, bc_ref,
                   state_refs,
                   ids_ref, tbs_ref, ibs_ref, clist_ref):
        sl = slice(s * GROUPS, (s + 1) * GROUPS)
        ox0 = ox_ref[sl, :]
        oy0 = oy_ref[sl, :]
        oz0 = oz_ref[sl, :]
        dx0 = dx_ref[sl, :]
        dy0 = dy_ref[sl, :]
        dz0 = dz_ref[sl, :]
        tmv = tm_ref[sl, :]
        pix = pix_ref[sl, :].astype(jnp.uint32)
        smp = smp_ref[sl, :].astype(jnp.uint32)
        seed_t = jnp.full((GROUPS, TILE), jnp.uint32(0)) + seed
        if dep_ref is not None:
            dep_i = dep_ref[sl, :]                       # i32 segments already traced
            # i32 → u32 like pix/smp above (Mosaic has no f32→u32 cast)
            dep4 = dep_i.astype(jnp.uint32) * jnp.uint32(4)  # RNG stream offset
        else:
            dep_i = dep4 = None

        def intersect(ox, oy, oz, dx, dy, dz):
            """Closest hit over every primitive: SMEM-scalar fori sweeps.
            Returns (t (8,128), idx (8,128) f32; idx<0 = miss). Winner
            semantics match the pairwise kernel (nearest root in
            (tmin, t_best), lowest index winning ties via strict <) up to
            rounding: the sphere root search runs in ``a·t`` space (see
            ``sph_body``), so root ordering and the tmin test use the
            undivided ``-half_b ∓ sq`` values and only the winner is
            divided by ``a`` — same reference semantics (sphere.hpp
            nearest-root-in-range), ±1-ulp t at phase boundaries."""
            a = _dot3(dx, dy, dz, dx, dy, dz)
            inv_a = 1.0 / a
            ta = tmin * a  # tmin in a·t space (a > 0)

            def sph_body(j, carry):
                """One sphere against the tile. The carry's best-t is kept
                in a·t space (sb = a·t_best, BIG = miss): the roots of
                a·t² + 2b·t + c are s/a for s = -b ∓ √disc, and a > 0
                makes every (tmin, closest) comparison monotone under the
                scaling — so the two per-root ``* inv_a`` and the separate
                root>tmin re-test fold away (~5 of ~27 VPU ops/sphere).
                ``_sb_to_t`` converts the single winner back once."""
                sb, ib = carry
                if moving:
                    # motion folded into oc: (o - c0) - t·v, one op/axis
                    # fewer than o - (c0 + t·v)
                    ocx = (ox - sph_ref[j, 0]) - tmv * sph_ref[j, 3]
                    ocy = (oy - sph_ref[j, 1]) - tmv * sph_ref[j, 4]
                    ocz = (oz - sph_ref[j, 2]) - tmv * sph_ref[j, 5]
                else:
                    # no moving spheres in this scene: skip the 3 motion
                    # ops; the scalar SMEM operand broadcasts for free
                    ocx = ox - sph_ref[j, 0]
                    ocy = oy - sph_ref[j, 1]
                    ocz = oz - sph_ref[j, 2]
                half_b = _dot3(ocx, ocy, ocz, dx, dy, dz)
                # r² folded into the accumulation as the addend's seed
                cq = ocx * ocx + ocy * ocy + (ocz * ocz - sph_ref[j, 6])
                disc = half_b * half_b - a * cq
                # no max(disc, 0) / disc >= 0 guard: sqrt(negative) = NaN,
                # NaN roots compare false below (IEEE), so misses reject
                # themselves — identical winners, 3 fewer vector ops
                sq = jnp.sqrt(disc)
                nhb = -half_b
                s0 = nhb - sq
                s1 = nhb + sq
                s = jnp.where(s0 > ta, s0, s1)
                imp = (s > ta) & (s < sb)
                sb = jnp.where(imp, s, sb)
                ib = jnp.where(imp, zero + j.astype(jnp.float32), ib)
                return sb, ib

            def _sb_to_t(carry):
                """a·t-space winner → t-space (misses stay exactly BIG:
                BIG·inv_a would under/overflow the t < BIG miss test)."""
                sb, ib = carry
                return jnp.where(ib >= 0.0, sb * inv_a, zero + BIG), ib

            def quad_body(j, carry):
                tb, ib = carry
                nx = quad_ref[j, 0]
                ny = quad_ref[j, 1]
                nz = quad_ref[j, 2]
                denom = nx * dx + ny * dy + nz * dz
                safe = jnp.where(jnp.abs(denom) < 1e-8, 1.0, denom)
                tq = (quad_ref[j, 3] - (nx * ox + ny * oy + nz * oz)) / safe
                px = ox + tq * dx - quad_ref[j, 4]
                py = oy + tq * dy - quad_ref[j, 5]
                pz = oz + tq * dz - quad_ref[j, 6]
                wx = quad_ref[j, 7]
                wy = quad_ref[j, 8]
                wz = quad_ref[j, 9]
                ux = quad_ref[j, 10]
                uy = quad_ref[j, 11]
                uz = quad_ref[j, 12]
                vx = quad_ref[j, 13]
                vy = quad_ref[j, 14]
                vz = quad_ref[j, 15]
                alpha = (wx * (py * vz - pz * vy) + wy * (pz * vx - px * vz)
                         + wz * (px * vy - py * vx))
                beta = (wx * (uy * pz - uz * py) + wy * (uz * px - ux * pz)
                        + wz * (ux * py - uy * px))
                imp = (
                    (jnp.abs(denom) >= 1e-8)
                    & (tq > tmin) & (tq < tb)
                    & (alpha >= 0.0) & (alpha <= 1.0)
                    & (beta >= 0.0) & (beta <= 1.0)
                )
                tb = jnp.where(imp, tq, tb)
                ib = jnp.where(
                    imp, zero + (j + ns_pad).astype(jnp.float32), ib
                )
                return tb, ib

            # manual unroll (Mosaic's fori only lowers unroll=1/full):
            # tables are row-padded with never-hit primitives
            # (flatten.sweep_tables: spheres to CLUSTER_SIZE=16, quads to
            # 8), so the blocked loop is exact at the largest divisor ≤
            # SWEEP_UNROLL and each iteration carries that many
            # independent dependency chains to cover ALU latency
            su_s = _exact_unroll(n_sph_rows, SWEEP_UNROLL)
            su_q = _exact_unroll(n_quad_rows, SWEEP_UNROLL)

            def sph_block(k, carry):
                for u in range(su_s):
                    carry = sph_body(k * su_s + u, carry)
                return carry

            def quad_block(k, carry):
                for u in range(su_q):
                    carry = quad_body(k * su_q + u, carry)
                return carry

            if use_clusters == "list":
                # branchless survivor-list sweep: the scalar core runs the
                # same conservative cone-vs-bounding-sphere test as the
                # "frustum" variant, but instead of a pl.when per cluster
                # (measured ~12% whole-render overhead from 31 taken-or-
                # not branches per bounce) it compacts the ids of clusters
                # that might contain a hit into an SMEM list — an
                # UNCONDITIONAL store at position cnt plus a conditional
                # increment, so a rejected cluster's slot is simply
                # overwritten — and then one dynamic-trip loop sweeps
                # exactly those clusters with zero branches in the vector
                # stream. Best (t, idx) lives in VMEM scratch so the loop
                # carries only the index.
                ws = 1.0 / 1024.0
                oxm = jnp.sum(ox) * ws
                oym = jnp.sum(oy) * ws
                ozm = jnp.sum(oz) * ws
                r_o = jnp.sqrt(jnp.max(
                    (ox - oxm) ** 2 + (oy - oym) ** 2 + (oz - ozm) ** 2))
                uxm = jnp.sum(dx) * ws
                uym = jnp.sum(dy) * ws
                uzm = jnp.sum(dz) * ws
                ulen = jnp.sqrt(uxm * uxm + uym * uym + uzm * uzm)
                uinv = 1.0 / jnp.maximum(ulen, 1e-30)
                ux = uxm * uinv
                uy = uym * uinv
                uz = uzm * uinv
                dn = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz + 1e-30)
                cmin = jnp.min((dx * ux + dy * uy + dz * uz) * dn)
                wide = cmin <= 0.05
                cmin_c = jnp.maximum(cmin, 0.05)
                smax = jnp.sqrt(jnp.maximum(1.0 - cmin_c * cmin_c, 0.0))

                def build(c, cnt):
                    ccx = (cbox_ref[c, 0] + cbox_ref[c, 3]) * 0.5
                    ccy = (cbox_ref[c, 1] + cbox_ref[c, 4]) * 0.5
                    ccz = (cbox_ref[c, 2] + cbox_ref[c, 5]) * 0.5
                    ex = (cbox_ref[c, 3] - cbox_ref[c, 0]) * 0.5
                    ey = (cbox_ref[c, 4] - cbox_ref[c, 1]) * 0.5
                    ez = (cbox_ref[c, 5] - cbox_ref[c, 2]) * 0.5
                    rad = jnp.sqrt(ex * ex + ey * ey + ez * ez) + r_o
                    wx = ccx - oxm
                    wy = ccy - oym
                    wz = ccz - ozm
                    sx = wx * ux + wy * uy + wz * uz
                    q2 = jnp.maximum(
                        wx * wx + wy * wy + wz * wz - sx * sx, 0.0)
                    lhs = jnp.sqrt(q2) * cmin_c - sx * smax
                    maybe = wide | (lhs <= rad)
                    clist_ref[cnt] = c
                    return cnt + maybe.astype(jnp.int32)

                n_exec = jax.lax.fori_loop(
                    0, n_clusters, build, jnp.int32(0))
                tbs_ref[:] = zero + BIG
                ibs_ref[:] = zero - 1.0

                def sweep_one(i, _):
                    j = clist_ref[i]
                    cc = (tbs_ref[:], ibs_ref[:])
                    for u in range(fl.CLUSTER_SIZE):
                        cc = sph_body(j * fl.CLUSTER_SIZE + u, cc)
                    tbs_ref[:] = cc[0]
                    ibs_ref[:] = cc[1]
                    return jnp.int32(0)

                jax.lax.fori_loop(0, n_exec, sweep_one, jnp.int32(0))
                carry = _sb_to_t((tbs_ref[:], ibs_ref[:]))
            elif use_clusters == "frustum":
                # scalar-core cone culling: bound the tile's 1024 rays by
                # one cone (apex = origin-box center inflated by its
                # half-diagonal r_o, axis u = mean direction, aperture
                # from the min lane cosine) and test each cluster's
                # bounding sphere against it ON THE SCALAR CORE, which
                # runs ahead of the VPU in Mosaic's software pipeline —
                # a culled cluster costs ~34 scalar ops and zero vector
                # work. Conservative: q·cosθ − s·sinθ is the dot of
                # (q, s) with the unit vector (cosθ, −sinθ), hence a
                # lower bound on the center's distance to the cone
                # (exact on the lateral surface, ≤ √(q²+s²) at the
                # apex), so "lhs > R+r_o ⇒ cull" can never drop a hit;
                # executed clusters keep the exact per-sphere math and
                # index order (same argument as the slab variant below).
                ws = 1.0 / 1024.0
                oxm = jnp.sum(ox) * ws
                oym = jnp.sum(oy) * ws
                ozm = jnp.sum(oz) * ws
                r_o = jnp.sqrt(jnp.max(
                    (ox - oxm) ** 2 + (oy - oym) ** 2 + (oz - ozm) ** 2))
                uxm = jnp.sum(dx) * ws
                uym = jnp.sum(dy) * ws
                uzm = jnp.sum(dz) * ws
                ulen = jnp.sqrt(uxm * uxm + uym * uym + uzm * uzm)
                uinv = 1.0 / jnp.maximum(ulen, 1e-30)
                ux = uxm * uinv
                uy = uym * uinv
                uz = uzm * uinv
                dn = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz + 1e-30)
                cmin = jnp.min((dx * ux + dy * uy + dz * uz) * dn)
                wide = cmin <= 0.05  # cone ≳87°: culling can't pay
                cmin_c = jnp.maximum(cmin, 0.05)
                smax = jnp.sqrt(jnp.maximum(1.0 - cmin_c * cmin_c, 0.0))
                tbs_ref[:] = zero + BIG
                ibs_ref[:] = zero - 1.0

                def cl_body(c, carry_i):
                    ccx = (cbox_ref[c, 0] + cbox_ref[c, 3]) * 0.5
                    ccy = (cbox_ref[c, 1] + cbox_ref[c, 4]) * 0.5
                    ccz = (cbox_ref[c, 2] + cbox_ref[c, 5]) * 0.5
                    ex = (cbox_ref[c, 3] - cbox_ref[c, 0]) * 0.5
                    ey = (cbox_ref[c, 4] - cbox_ref[c, 1]) * 0.5
                    ez = (cbox_ref[c, 5] - cbox_ref[c, 2]) * 0.5
                    rad = jnp.sqrt(ex * ex + ey * ey + ez * ez) + r_o
                    wx = ccx - oxm
                    wy = ccy - oym
                    wz = ccz - ozm
                    s = wx * ux + wy * uy + wz * uz
                    q2 = jnp.maximum(
                        wx * wx + wy * wy + wz * wz - s * s, 0.0)
                    lhs = jnp.sqrt(q2) * cmin_c - s * smax
                    maybe = wide | (lhs <= rad)

                    @pl.when(maybe)
                    def _():
                        cc = (tbs_ref[:], ibs_ref[:])
                        for u in range(fl.CLUSTER_SIZE):
                            cc = sph_body(c * fl.CLUSTER_SIZE + u, cc)
                        tbs_ref[:] = cc[0]
                        ibs_ref[:] = cc[1]

                    return carry_i

                jax.lax.fori_loop(0, n_clusters, cl_body, jnp.int32(0))
                carry = _sb_to_t((tbs_ref[:], ibs_ref[:]))
            elif use_clusters:
                # clustered culling sweep: slab-test each cluster's swept
                # AABB (aabb.hpp:61-112 semantics, conservative) against
                # the whole tile; sweep the 16 spheres only when some lane
                # can still beat its best t. Best (t, idx) lives in VMEM
                # scratch so pl.when moves no vector state.
                tiny = jnp.float32(1e-30)
                sdx = jnp.where(jnp.abs(dx) < tiny, tiny, dx)
                sdy = jnp.where(jnp.abs(dy) < tiny, tiny, dy)
                sdz = jnp.where(jnp.abs(dz) < tiny, tiny, dz)
                idxr = 1.0 / sdx
                idyr = 1.0 / sdy
                idzr = 1.0 / sdz
                tbs_ref[:] = zero + BIG
                ibs_ref[:] = zero - 1.0

                def cl_body(c, carry_i):
                    t0 = (cbox_ref[c, 0] - ox) * idxr
                    t1 = (cbox_ref[c, 3] - ox) * idxr
                    lo = jnp.minimum(t0, t1)
                    hi = jnp.maximum(t0, t1)
                    t0 = (cbox_ref[c, 1] - oy) * idyr
                    t1 = (cbox_ref[c, 4] - oy) * idyr
                    lo = jnp.maximum(lo, jnp.minimum(t0, t1))
                    hi = jnp.minimum(hi, jnp.maximum(t0, t1))
                    t0 = (cbox_ref[c, 2] - oz) * idzr
                    t1 = (cbox_ref[c, 5] - oz) * idzr
                    lo = jnp.maximum(lo, jnp.minimum(t0, t1))
                    hi = jnp.minimum(hi, jnp.maximum(t0, t1))
                    tb_cur = tbs_ref[:]
                    # tb_cur is in a·t space (see sph_body): compare the
                    # cluster's t-space entry distance scaled by a
                    hitm = (lo <= hi) & (hi > tmin) & (lo * a < tb_cur)
                    any_hit = jnp.max(jnp.where(hitm, 1.0, 0.0)) > 0.0

                    @pl.when(any_hit)
                    def _():
                        cc = (tb_cur, ibs_ref[:])
                        for u in range(fl.CLUSTER_SIZE):
                            cc = sph_body(c * fl.CLUSTER_SIZE + u, cc)
                        tbs_ref[:] = cc[0]
                        ibs_ref[:] = cc[1]

                    return carry_i

                jax.lax.fori_loop(0, n_clusters, cl_body, jnp.int32(0))
                carry = _sb_to_t((tbs_ref[:], ibs_ref[:]))
            else:
                carry = (zero + BIG, zero - 1.0)
                if n_sph > 0:
                    carry = _sb_to_t(jax.lax.fori_loop(
                        0, n_sph_rows // su_s, sph_block, carry))
            if n_quad > 0:
                carry = jax.lax.fori_loop(
                    0, n_quad_rows // su_q, quad_block, carry)
            return carry

        def resolve(ib):
            """Winner-attribute fetch: one per-ray lane gather per field
            per 128-lane table chunk from the field-replicated table.
            Misses (ib < 0) read primitive 0 — masked out downstream."""
            ibi = ib.astype(jnp.int32)
            vals = [None] * len(fields)
            for c in range(n_lane_chunks):
                local = jnp.clip(ibi - c * TILE, 0, TILE - 1)
                if n_lane_chunks > 1:
                    use = (ibi >= c * TILE) & (ibi < (c + 1) * TILE)
                for fi in range(len(fields)):
                    rows = tabt_ref[fi * GROUPS:(fi + 1) * GROUPS,
                                    c * TILE:(c + 1) * TILE]
                    g = jnp.take_along_axis(rows, local, axis=1)
                    if vals[fi] is None:
                        vals[fi] = g
                    else:
                        vals[fi] = jnp.where(use, g, vals[fi])
            return vals

        def gather256(row0, idx):
            """(8,128) per-ray gather from a row-replicated (8, 256) block
            of noise_ref (rows [row0, row0+8)); idx int in [0, 256)."""
            g0 = jnp.take_along_axis(
                noise_ref[row0:row0 + GROUPS, 0:TILE],
                jnp.clip(idx, 0, TILE - 1), axis=1)
            g1 = jnp.take_along_axis(
                noise_ref[row0:row0 + GROUPS, TILE:2 * TILE],
                jnp.clip(idx - TILE, 0, TILE - 1), axis=1)
            return jnp.where(idx >= TILE, g1, g0)

        def gather_atlas(row0, idx):
            out = None
            for c in range(atlas_lanes // TILE):
                local = jnp.clip(idx - c * TILE, 0, TILE - 1)
                g = jnp.take_along_axis(
                    atlas_ref[row0:row0 + GROUPS, c * TILE:(c + 1) * TILE],
                    local, axis=1)
                if out is None:
                    out = g
                else:
                    use = (idx >= c * TILE) & (idx < (c + 1) * TILE)
                    out = jnp.where(use, g, out)
            return out

        def gather_atlas_packed(idx, valid, zero):
            """Big-image tier: per-lane gather of the RGB-packed int32
            word from the (S, 128) texels-on-sublanes atlas (flatten
            atlas_table_packed). A while_loop walks ONLY the 8-row
            (1024-texel) windows spanned by this tile's live indices —
            coherent primary tiles touch 1-2 windows, image-free tiles
            zero — via dynamic 8-aligned sublane loads, so the code size
            is O(1) in atlas size (a full unroll of a 524k-texel atlas
            would be ~20k Mosaic ops per fetch site and uncompilable).
            ``valid`` masks the lanes whose index is meaningful; invalid
            lanes return unspecified (finite) words."""
            safe = jnp.where(valid, idx, 0)
            sel = jnp.where(valid, idx, jnp.int32(2 ** 30))
            lo = jnp.min(sel) >> 10          # first 1024-texel window
            hiv = jnp.where(valid, idx, -1)
            hi = jnp.max(hiv) >> 10          # last window (hi < lo: none)
            row_g = safe >> 7                # global 128-texel row
            lane_g = safe & 127
            acc0 = zero.astype(jnp.int32)    # VMEM-initialized (layout
                                             # gotcha: see module doc)

            def body(carry):
                cb, acc = carry
                win = atlas_ref[pl.ds(cb * GROUPS, GROUPS), :]
                for r in range(GROUPS):
                    blk = jnp.broadcast_to(win[r:r + 1, :], (GROUPS, TILE))
                    cand = jnp.take_along_axis(blk, lane_g, axis=1)
                    acc = jnp.where(row_g == cb * GROUPS + r, cand, acc)
                return cb + 1, acc

            _, out = jax.lax.while_loop(
                lambda c: c[0] <= hi, body, (lo, acc0))
            return out

        def bounce_body(carry):
            (b, ox, oy, oz, dx, dy, dz, thr_r, thr_g, thr_b,
             rad_r, rad_g, rad_b, active_f, bounces) = carry
            active = active_f > 0.5

            if "sweep" in ablate:
                t, ib = zero + 0.5, zero + 1.0
            else:
                t, ib = intersect(ox, oy, oz, dx, dy, dz)
            if ids_ref is not None:
                # record the GLOBAL scene id: gather the kid-map pseudo-
                # field appended after the resolve fields (one lane gather
                # per table chunk — the XLA-side jnp.take alternative is
                # an element-serial gather that cost 59 ms/chunk)
                gbase = len(fields) * GROUPS
                ibi0 = ib.astype(jnp.int32)
                gidv = None
                for c in range(n_lane_chunks):
                    local = jnp.clip(ibi0 - c * TILE, 0, TILE - 1)
                    g = jnp.take_along_axis(
                        tabt_ref[gbase:gbase + GROUPS,
                                 c * TILE:(c + 1) * TILE], local, axis=1)
                    if gidv is None:
                        gidv = g
                    else:
                        use = (ibi0 >= c * TILE) & (ibi0 < (c + 1) * TILE)
                        gidv = jnp.where(use, g, gidv)
                rec = jnp.where(t < BIG, gidv, zero - 1.0).astype(jnp.int32)
                row = b * (GROUPS * n_sub) + s * GROUPS
                ids_ref[pl.ds(row, GROUPS), :] = rec
            if "resolve" in ablate:
                attrs = [zero + 0.5] * len(fields)
            else:
                attrs = resolve(ib)

            def at(f):
                return attrs[fslot[f]]

            hit = t < BIG
            miss = active & ~hit
            rad_r = rad_r + jnp.where(miss, thr_r * bg_r, 0.0)
            rad_g = rad_g + jnp.where(miss, thr_g * bg_g, 0.0)
            rad_b = rad_b + jnp.where(miss, thr_b * bg_b, 0.0)

            px = ox + t * dx
            py = oy + t * dy
            pz = oz + t * dz

            is_quad = ib >= float(ns_pad)
            cxt = at(U.U_G0) + tmv * at(U.U_G3)
            cyt = at(U.U_G1) + tmv * at(U.U_G4)
            czt = at(U.U_G2) + tmv * at(U.U_G5)
            r_att = at(U.U_G6)
            inv_r = 1.0 / jnp.where(r_att != 0.0, r_att, 1.0)
            own_x = jnp.where(is_quad, at(U.U_G0), (px - cxt) * inv_r)
            own_y = jnp.where(is_quad, at(U.U_G1), (py - cyt) * inv_r)
            own_z = jnp.where(is_quad, at(U.U_G2), (pz - czt) * inv_r)
            d_dot_n = _dot3(dx, dy, dz, own_x, own_y, own_z)
            front = d_dot_n < 0.0
            sgn = jnp.where(front, 1.0, -1.0)
            nx = own_x * sgn
            ny = own_y * sgn
            nz = own_z * sgn

            mt = at(U.U_MTYPE)
            prm = at(U.U_PARAM)
            ar = at(U.U_AR)
            ag = at(U.U_AG)
            ab = at(U.U_AB)
            ts = at(U.U_TSCALE)
            cells = (
                jnp.floor(ts * px).astype(jnp.int32)
                + jnp.floor(ts * py).astype(jnp.int32)
                + jnp.floor(ts * pz).astype(jnp.int32)
            )
            use2 = (at(U.U_TKIND) == fl.TK_CHECKER) & ((cells % 2) != 0)
            ar = jnp.where(use2, at(U.U_A2R), ar)
            ag = jnp.where(use2, at(U.U_A2G), ag)
            ab = jnp.where(use2, at(U.U_A2B), ab)

            if has_noise:
                # marble noise (texture.hpp:150 via perlin.hpp:94-254),
                # same op order as scene/perlin.py for parity
                accum_t = zero
                weight = 1.0
                tpx, tpy, tpz = px, py, pz
                for _oct in range(7):
                    pfx = jnp.floor(tpx)
                    pfy = jnp.floor(tpy)
                    pfz = jnp.floor(tpz)
                    uu = tpx - pfx
                    vv = tpy - pfy
                    ww = tpz - pfz
                    ixx = pfx.astype(jnp.int32)
                    iyy = pfy.astype(jnp.int32)
                    izz = pfz.astype(jnp.int32)
                    hx_h = uu * uu * (3.0 - 2.0 * uu)
                    hy_h = vv * vv * (3.0 - 2.0 * vv)
                    hz_h = ww * ww * (3.0 - 2.0 * ww)
                    acc = zero
                    for di in (0, 1):
                        for dj in (0, 1):
                            for dk in (0, 1):
                                hx = gather256(0, (ixx + di) & 255)
                                hy = gather256(8, (iyy + dj) & 255)
                                hz = gather256(16, (izz + dk) & 255)
                                hashv = (
                                    hx.astype(jnp.int32)
                                    ^ hy.astype(jnp.int32)
                                    ^ hz.astype(jnp.int32)
                                )
                                gx = gather256(24, hashv)
                                gy = gather256(32, hashv)
                                gz = gather256(40, hashv)
                                offx = uu - float(di)
                                offy = vv - float(dj)
                                offz = ww - float(dk)
                                wx = hx_h if di else 1.0 - hx_h
                                wy = hy_h if dj else 1.0 - hy_h
                                wz = hz_h if dk else 1.0 - hz_h
                                dotg = gx * offx + gy * offy + gz * offz
                                acc = acc + wx * wy * wz * dotg
                    accum_t = accum_t + weight * acc
                    weight *= 0.5
                    tpx = tpx * 2.0
                    tpy = tpy * 2.0
                    tpz = tpz * 2.0
                turb = jnp.abs(accum_t)
                marble = 0.5 * (1.0 + jnp.sin(ts * pz + 10.0 * turb))
                use_n = at(U.U_TKIND) == fl.TK_NOISE
                ar = jnp.where(use_n, marble, ar)
                ag = jnp.where(use_n, marble, ag)
                ab = jnp.where(use_n, marble, ab)

            if has_image:
                # nearest-texel image lookup (texture.hpp:91-122); sphere
                # UV from the outward normal (sphere.hpp:100-111), quad
                # UV = (alpha, beta) (quad.hpp:97-114). atan2 via
                # _atan2f: Mosaic TC has no arctan2 lowering (raises
                # NotImplementedError on real TPU hardware; interpret
                # mode hid this), so the kernel carries its own
                # range-reduced polynomial (~2e-7 rad).
                rxz = jnp.sqrt(
                    jnp.maximum(own_x * own_x + own_z * own_z, 0.0)
                )
                theta = _atan2f(rxz, -own_y)
                x_safe = jnp.where(rxz > 0.0, own_x, 1.0)
                phi = _atan2f(-own_z, x_safe) + jnp.pi
                u_tex = phi * (1.0 / (2.0 * jnp.pi))
                v_tex = theta * (1.0 / jnp.pi)
                if n_quad > 0:
                    pqx = px - at(U.U_QX)
                    pqy = py - at(U.U_QY)
                    pqz = pz - at(U.U_QZ)
                    uxq = at(U.U_UX)
                    uyq = at(U.U_UY)
                    uzq = at(U.U_UZ)
                    vxq = at(U.U_VX)
                    vyq = at(U.U_VY)
                    vzq = at(U.U_VZ)
                    wxq = at(U.U_G4)
                    wyq = at(U.U_G5)
                    wzq = at(U.U_G6)
                    alpha_q = (wxq * (pqy * vzq - pqz * vyq)
                               + wyq * (pqz * vxq - pqx * vzq)
                               + wzq * (pqx * vyq - pqy * vxq))
                    beta_q = (wxq * (uyq * pqz - uzq * pqy)
                              + wyq * (uzq * pqx - uxq * pqz)
                              + wzq * (uxq * pqy - uyq * pqx))
                    u_tex = jnp.where(is_quad, alpha_q, u_tex)
                    v_tex = jnp.where(is_quad, beta_q, v_tex)
                base_i = at(U.U_A2R).astype(jnp.int32)
                w_img = at(U.U_A2G)
                h_img = at(U.U_A2B)
                uu_c = jnp.clip(u_tex, 0.0, 1.0)
                vv_c = 1.0 - jnp.clip(v_tex, 0.0, 1.0)
                w_i = w_img.astype(jnp.int32)
                h_i = h_img.astype(jnp.int32)
                ti = jnp.clip((uu_c * w_img).astype(jnp.int32), 0,
                              jnp.maximum(w_i - 1, 0))
                tj = jnp.clip((vv_c * h_img).astype(jnp.int32), 0,
                              jnp.maximum(h_i - 1, 0))
                flat = base_i + tj * w_i + ti
                use_i = at(U.U_TKIND) == fl.TK_IMAGE
                if atlas_packed:
                    word = gather_atlas_packed(
                        flat, active & hit & use_i, zero)
                    # channel = f32(u8) / 255.0 — identical rounding to
                    # the loader's u8→f32 conversion, so this tier is
                    # bit-exact vs the replicated tier / XLA path
                    inv = jnp.float32(255.0)
                    tex_r = ((word >> 16) & 255).astype(jnp.float32) / inv
                    tex_g = ((word >> 8) & 255).astype(jnp.float32) / inv
                    tex_b = (word & 255).astype(jnp.float32) / inv
                else:
                    tex_r = gather_atlas(0, flat)
                    tex_g = gather_atlas(8, flat)
                    tex_b = gather_atlas(16, flat)
                ar = jnp.where(use_i, tex_r, ar)
                ag = jnp.where(use_i, tex_g, ag)
                ab = jnp.where(use_i, tex_b, ab)

            # RNG for this bounce (core/rng.py stream layout)
            if "rng" in ablate:
                u0 = zero + 0.25
                u1 = zero + 0.5
                u2 = zero + 0.75
            else:
                ctr = jnp.full(ox.shape, jnp.uint32(0)) + (
                    (b.astype(jnp.uint32) + b_off) * jnp.uint32(4)
                    + jnp.uint32(2)
                )
                if dep4 is not None:
                    ctr = ctr + dep4  # per-ray stream: bounce index dep + b
                v0, v1, v2, _ = _pcg4d(pix, smp, ctr, seed_t)
                u0 = _u01(v0)
                u1 = _u01(v1)
                u2 = _u01(v2)

            if "shade" in ablate:
                is_metal = mt == MT_METAL
                is_diel = mt == MT_DIELECTRIC
                is_light = mt == MT_LIGHT
                metal_ok = u0 > -1.0
                ndx, ndy, ndz = dx, dy, dz
                att_r, att_g, att_b = ar, ag, ab
                hit_mask = active & hit
                emit = hit_mask & is_light
                rad_r = rad_r + jnp.where(emit, thr_r * ar, 0.0)
                rad_g = rad_g + jnp.where(emit, thr_g * ag, 0.0)
                rad_b = rad_b + jnp.where(emit, thr_b * ab, 0.0)
                did_scatter = ((is_metal & metal_ok)
                               | (~is_metal & ~is_light))
                live = hit_mask & did_scatter
                if depth_cap is not None:
                    live = live & (dep_i + (b + 1) < depth_cap)
                thr_r = jnp.where(live, thr_r * att_r, thr_r)
                thr_g = jnp.where(live, thr_g * att_g, thr_g)
                thr_b = jnp.where(live, thr_b * att_b, thr_b)
                ox = jnp.where(live, px, ox)
                oy = jnp.where(live, py, oy)
                oz = jnp.where(live, pz, oz)
                dx = jnp.where(live, ndx, dx)
                dy = jnp.where(live, ndy, dy)
                dz = jnp.where(live, ndz, dz)
                bounces = bounces + jnp.where(active, 1.0, 0.0)
                return (b + 1, ox, oy, oz, dx, dy, dz,
                        thr_r, thr_g, thr_b, rad_r, rad_g, rad_b,
                        jnp.where(live, 1.0, 0.0), bounces)

            zdir = 1.0 - 2.0 * u0
            rho = jnp.sqrt(jnp.maximum(0.0, 1.0 - zdir * zdir))
            phi_s = (2.0 * jnp.pi) * u1
            rux = rho * jnp.cos(phi_s)
            ruy = rho * jnp.sin(phi_s)
            ruz = zdir

            # lambertian (material.hpp:54-60)
            ldx = nx + rux
            ldy = ny + ruy
            ldz = nz + ruz
            degen = ((jnp.abs(ldx) < 1e-8) & (jnp.abs(ldy) < 1e-8)
                     & (jnp.abs(ldz) < 1e-8))
            ldx = jnp.where(degen, nx, ldx)
            ldy = jnp.where(degen, ny, ldy)
            ldz = jnp.where(degen, nz, ldz)

            # metal (material.hpp:89-105)
            d_dot_on = _dot3(dx, dy, dz, nx, ny, nz)
            rdx = dx - 2.0 * d_dot_on * nx
            rdy = dy - 2.0 * d_dot_on * ny
            rdz = dz - 2.0 * d_dot_on * nz
            rlen = jax.lax.rsqrt(_dot3(rdx, rdy, rdz, rdx, rdy, rdz) + 1e-30)
            mdx = rdx * rlen + prm * rux
            mdy = rdy * rlen + prm * ruy
            mdz = rdz * rlen + prm * ruz
            metal_ok = _dot3(mdx, mdy, mdz, nx, ny, nz) > 0.0

            # dielectric (material.hpp:128-174)
            dinv = jax.lax.rsqrt(_dot3(dx, dy, dz, dx, dy, dz) + 1e-30)
            udx = dx * dinv
            udy = dy * dinv
            udz = dz * dinv
            ri = jnp.where(front, 1.0 / prm, prm)
            cos_t = jnp.minimum(-_dot3(udx, udy, udz, nx, ny, nz), 1.0)
            sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
            cannot = ri * sin_t > 1.0
            r0 = (1.0 - ri) / (1.0 + ri)
            r0 = r0 * r0
            reflectance = r0 + (1.0 - r0) * (1.0 - cos_t) ** 5
            use_reflect = cannot | (reflectance > u2)
            rpx = ri * (udx + cos_t * nx)
            rpy = ri * (udy + cos_t * ny)
            rpz = ri * (udz + cos_t * nz)
            k2 = jnp.abs(1.0 - _dot3(rpx, rpy, rpz, rpx, rpy, rpz))
            par = -jnp.sqrt(k2)
            fdx = rpx + par * nx
            fdy = rpy + par * ny
            fdz = rpz + par * nz
            u_dot_n = _dot3(udx, udy, udz, nx, ny, nz)
            xdx = udx - 2.0 * u_dot_n * nx
            xdy = udy - 2.0 * u_dot_n * ny
            xdz = udz - 2.0 * u_dot_n * nz
            gdx = jnp.where(use_reflect, xdx, fdx)
            gdy = jnp.where(use_reflect, xdy, fdy)
            gdz = jnp.where(use_reflect, xdz, fdz)

            is_metal = mt == MT_METAL
            is_diel = mt == MT_DIELECTRIC
            is_light = mt == MT_LIGHT
            ndx = jnp.where(is_metal, mdx, ldx)
            ndy = jnp.where(is_metal, mdy, ldy)
            ndz = jnp.where(is_metal, mdz, ldz)
            ndx = jnp.where(is_diel, gdx, ndx)
            ndy = jnp.where(is_diel, gdy, ndy)
            ndz = jnp.where(is_diel, gdz, ndz)

            att_r = jnp.where(is_diel, 1.0, ar)
            att_g = jnp.where(is_diel, 1.0, ag)
            att_b = jnp.where(is_diel, 1.0, ab)

            hit_mask = active & hit
            emit = hit_mask & is_light
            rad_r = rad_r + jnp.where(emit, thr_r * ar, 0.0)
            rad_g = rad_g + jnp.where(emit, thr_g * ag, 0.0)
            rad_b = rad_b + jnp.where(emit, thr_b * ab, 0.0)

            did_scatter = (is_metal & metal_ok) | (~is_metal & ~is_light)
            live = hit_mask & did_scatter
            if depth_cap is not None:
                # depth exhaustion: the ray dies with its radiance as-is
                # (the XLA integrator just stops iterating; here the lane
                # must free up for regeneration). State updates below are
                # masked off — parity is unaffected (the phased path never
                # reads a capped ray's post-cap state either).
                live = live & (dep_i + (b + 1) < depth_cap)
            thr_r = jnp.where(live, thr_r * att_r, thr_r)
            thr_g = jnp.where(live, thr_g * att_g, thr_g)
            thr_b = jnp.where(live, thr_b * att_b, thr_b)
            ox = jnp.where(live, px, ox)
            oy = jnp.where(live, py, oy)
            oz = jnp.where(live, pz, oz)
            dx = jnp.where(live, ndx, dx)
            dy = jnp.where(live, ndy, dy)
            dz = jnp.where(live, ndz, dz)

            bounces = bounces + jnp.where(active, 1.0, 0.0)
            return (b + 1, ox, oy, oz, dx, dy, dz, thr_r, thr_g, thr_b,
                    rad_r, rad_g, rad_b, jnp.where(live, 1.0, 0.0), bounces)

        def cond(carry):
            b = carry[0]
            active_f = carry[13]
            return (b < max_depth) & (jnp.max(active_f) > 0.5)

        init = (jnp.int32(0), ox0, oy0, oz0, dx0, dy0, dz0,
                tr_ref[sl, :] + zero, tg_ref[sl, :] + zero,
                tb2_ref[sl, :] + zero,
                ra_ref[sl, :] + zero, ga_ref[sl, :] + zero,
                ba_ref[sl, :] + zero,
                act_ref[sl, :] + zero, zero)
        if unroll:
            out = init
            for _ in range(max_depth):
                out = bounce_body(out)
        else:
            out = jax.lax.while_loop(cond, bounce_body, init)

        (_, f_ox, f_oy, f_oz, f_dx, f_dy, f_dz,
         f_tr, f_tg, f_tb, f_rr, f_rg, f_rb, f_act, f_bc) = out
        rr_ref[sl, :] = f_rr
        rg_ref[sl, :] = f_rg
        rb_ref[sl, :] = f_rb
        bc_ref[sl, :] = f_bc.astype(jnp.int32)
        if state_refs is not None:
            (oox_ref, ooy_ref, ooz_ref, odx_ref, ody_ref, odz_ref,
             otr_ref, otg_ref, otb_ref, oact_ref) = state_refs
            oox_ref[sl, :] = f_ox
            ooy_ref[sl, :] = f_oy
            ooz_ref[sl, :] = f_oz
            odx_ref[sl, :] = f_dx
            ody_ref[sl, :] = f_dy
            odz_ref[sl, :] = f_dz
            otr_ref[sl, :] = f_tr
            otg_ref[sl, :] = f_tg
            otb_ref[sl, :] = f_tb
            oact_ref[sl, :] = f_act

    def run(sph_sweep, quad_sweep, tabt_rep, noise_rep, atlas_rep,
            ox, oy, oz, dx, dy, dz, tmv, pix, smp,
            thr_r, thr_g, thr_b, rad_r, rad_g, rad_b, act,
            seed_and_offset, dep=None):
        assert (dep is not None) == (depth_cap is not None), \
            "pass dep exactly when depth_cap is set"
        n_rows = ox.shape[0]
        assert n_rows % GROUPS == 0
        n_sub = 1
        for cand in (32, 16, 8, 4, 2):
            if cand <= n_sub_max and (n_rows // GROUPS) % cand == 0:
                n_sub = cand
                break
        step_rows = GROUPS * n_sub
        grid = (n_rows // step_rows,)
        ray_spec = pl.BlockSpec((step_rows, TILE), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        f32 = jnp.float32
        n_out = 14 if want_state else 4
        out_shape = (
            [jax.ShapeDtypeStruct((n_rows, TILE), f32)] * 3
            + [jax.ShapeDtypeStruct((n_rows, TILE), jnp.int32)]
            + [jax.ShapeDtypeStruct((n_rows, TILE), f32)] * (n_out - 4)
        )
        out_specs = [ray_spec] * n_out
        if want_ids:
            # grid step i owns rows [i·D·S, (i+1)·D·S): bounce-major within
            # the step (see make_megakernel_block docstring / ids_order)
            out_shape = out_shape + [
                jax.ShapeDtypeStruct((n_rows * max_depth, TILE), jnp.int32)
            ]
            out_specs = out_specs + [
                pl.BlockSpec((step_rows * max_depth, TILE),
                             lambda i: (i, 0), memory_space=pltpu.VMEM)
            ]

        def whole(arr):
            return pl.BlockSpec(arr.shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM)

        cbox_arr = (cbox if use_clusters
                    else jnp.zeros((1, 8), jnp.float32))
        ray_ins = [ox, oy, oz, dx, dy, dz, tmv, pix, smp,
                   thr_r, thr_g, thr_b, rad_r, rad_g, rad_b, act]
        if dep is not None:
            ray_ins.append(dep)
        outs = pl.pallas_call(
            make_kernel(n_sub, want_state, want_ids),
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                whole(tabt_rep), whole(noise_rep), whole(atlas_rep),
            ] + [ray_spec] * len(ray_ins) + [
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((GROUPS, TILE), jnp.float32),
                pltpu.VMEM((GROUPS, TILE), jnp.float32),
                pltpu.VMEM((GROUPS, TILE), jnp.float32),
                pltpu.SMEM((max(n_clusters, 1),), jnp.int32),
            ],
            interpret=interpret,
        )(sph_sweep, quad_sweep, cbox_arr, tabt_rep, noise_rep, atlas_rep,
          *ray_ins, seed_and_offset)
        if want_ids:
            outs = list(outs)
            ids = outs.pop()
            n_steps = n_rows // step_rows
            # step-major/bounce-major → (bounce, ray row) in input order
            ids = (ids.reshape(n_steps, max_depth, step_rows, TILE)
                   .transpose(1, 0, 2, 3)
                   .reshape(max_depth, n_rows, TILE))
            outs.append(ids)
            return tuple(outs)
        return outs

    return run
