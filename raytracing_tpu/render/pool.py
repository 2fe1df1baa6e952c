"""Persistent-wavefront pool renderer: ray regeneration at full occupancy.

The phased renderer (renderer.py + ops/megakernel.py trace_megakernel)
launches fixed (pixel-block × sample-chunk) batches; within a launch,
lane occupancy decays as paths terminate (final scene: mean path length
~2.7 of depth 20), and compaction can only pack the survivors.

Round-5 verdict (device traces, tools/pooltrace.py): the pool's kernel
time IS ~2x better than the phased path's (113 vs 209 ms on the bench
workload — the occupancy thesis holds), but per-iteration boundary
sorts, the 10M-row final gid fold sort, and the log-carry turnaround
give the win back: pool ≈ 62-64M rays/s vs phased 64-89M (with the
round-5 prefix-sliced sorts). The pool remains the better schedule only
when phases can't be planned (unknown live distributions); the phased
path with phase_prefixes is production. Numbers: CLAUDE.md round-5
results; A/B harness: tools/poolbench.py.

This module replaces the batch structure with one persistent ray pool
(classic wavefront path-tracer regeneration, re-designed around what a
TPU does fast — dense vector ops, one fused multi-operand sort, and
contiguous DMA; no scatters in the hot loop):

* The pool holds P rays. Each iteration runs the block megakernel for
  K bounces (``k_bounces``), with a per-ray depth column so every ray
  keeps its own RNG stream index and depth cap
  (ops/megakernel_block.py ``depth_cap`` mode) — paths are bit-identical
  to the phased path's.
* One fused ``lax.sort`` per boundary partitions lanes into
  [dead-by-gid | expired-sentinels | alive]: key = gid for dead rays
  (gid = sample·n_pix + pixel < 2^24), 2^24+lane / 2^25+lane for
  sentinel / alive lanes. Only 15 operands move (tm/pix/smp are
  recomputed from gid, as the phased path's ``regen`` hook does).
* Dead rays' (gid, radiance) are banked by ONE dynamic_update_slice of
  the full sorted pool into a death-order log at write-pointer ``wp``
  (advanced by the dead count, so later writes overwrite the non-dead
  tail — every real ray is logged exactly once). No scatter: TPU
  scatters serialize (~26M updates/s measured); a contiguous 2 MB DMA
  is ~free.
* The freed prefix is refilled with fresh camera rays for the next
  gids in the stream (render/camera.py generate_rays — same
  (pixel, sample)-keyed streams, so regenerated rays are bit-identical
  to the batch path's), keeping the kernel at ~full occupancy for the
  whole render. Rays past the stream get sentinel gid = total and stay
  dead.
* After the pool drains, one sort of the log by gid restores
  (sample-major) ray order; the per-pixel sample sum is a dense
  reshape-reduce.

Radiance per (pixel, sample) path is bit-identical to the phased
renderer; the per-pixel sum re-associates (different addition order),
so images match to ~1 ulp — same equivalence class as the existing
``ray_order`` / phase-compaction options (see tests/test_pool.py).

Reference parity: this implements camera.hpp:40-67's triple loop
(pixel × sample × bounce recursion) as a single regenerating wavefront;
per-path semantics are unchanged.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import rng as rng_mod
from ..ops.megakernel_block import BLOCK, GROUPS, TILE, make_megakernel_block
from . import camera as cam_mod
from .camera import CameraConfig, CameraParams

# gids must fit the sort key below 2^24 (total = n_pix · spp); larger
# workloads must be outer-chunked by the caller (Renderer does this).
MAX_POOL_STREAM = 1 << 24


def trace_pool(
    mega,
    cfg: CameraConfig,
    params: CameraParams,
    seed,
    *,
    pool_size: int = 1 << 18,
    k_bounces: int = 2,
    interpret: bool = False,
    unroll: bool | None = None,
    fold: str = "sort",  # "sort" (log + one final sort) | "scatter"
    sample_start: int = 0,
    n_samples: int | None = None,
    motion_blur: bool | None = None,
):
    """Render ``cfg.n_pixels × n_samples`` paths through the regenerating
    pool. Returns ``(radiance_sum (n_pix, 3) f32 — summed over samples,
    segments () i64-as-2xu32 tuple)``.

    ``sample_start``/``n_samples`` select a sample window (outer chunking
    for workloads past MAX_POOL_STREAM or device memory; disjoint windows
    sum to the full render exactly, same as the phased path's chunks).
    """
    P = pool_size
    assert P % BLOCK == 0, f"pool size must be a multiple of {BLOCK}"
    n_pix = cfg.n_pixels
    spp = n_samples if n_samples is not None else cfg.samples_per_pixel
    total = n_pix * spp
    assert total < MAX_POOL_STREAM, (
        "pool stream too large for the 24-bit gid sort key; chunk samples")
    assert cfg.max_depth < 64, (
        "per-ray depth is packed above the 24-bit gid in one i32 sort "
        "operand; depths >= 64 would overflow it")
    if motion_blur is None:
        motion_blur = True
    rows = P // TILE
    f32 = jnp.float32
    i32 = jnp.int32
    GSENT = jnp.int32(total)  # sentinel gid (== radiance_all OOB → drops)
    seed_u = jnp.uint32(seed)
    s0 = jnp.int32(sample_start)

    derived = cam_mod.derive(cfg, params)
    runp = make_megakernel_block(
        mega, max_depth=k_bounces, background=cfg.background,
        interpret=interpret, want_state=True,
        unroll=(not interpret) if unroll is None else unroll,
        depth_cap=cfg.max_depth)
    so = jnp.asarray([seed, 0], jnp.uint32)
    lane = jnp.arange(P, dtype=i32)

    def gen_rays(gid):
        """Camera rays + tm/pix/smp for every lane from its gid (pure
        function of gid — bit-identical to the batch path's streams)."""
        g = jnp.minimum(gid, total - 1)  # sentinel-safe; masked by act
        pix = g % n_pix
        smp = s0 + g // n_pix
        o, d, tm = cam_mod.generate_rays(
            cfg, derived, pix, smp, seed_u, motion_blur=motion_blur)
        return o, d, tm, pix, smp

    def r2(x):
        return x.reshape(rows, TILE)

    # --- initial fill: the first P gids of the stream ---
    gid0 = jnp.where(lane < total, lane, GSENT)
    o0, d0, tm0, pix0, smp0 = gen_rays(gid0)
    act0 = (lane < total).astype(f32)
    ones = jnp.ones((P,), f32)
    zeros = jnp.zeros((P,), f32)

    log_len = total + P
    if fold == "sort":
        # packed (gid-as-f32, r, g, b) rows: gid < 2^24 is exact in f32,
        # so one contiguous (P, 4) DMA banks a boundary (4 separate
        # column writes measured ~4x the cost) and the final fold sorts
        # on the f32 gid key directly
        init = jnp.zeros((log_len, 4), f32).at[:, 0].set(float(total))
        bank0 = (init,)
    else:
        bank0 = (jnp.zeros((total, 3), f32),)

    carry0 = dict(
        ox=o0[:, 0], oy=o0[:, 1], oz=o0[:, 2],
        dx=d0[:, 0], dy=d0[:, 1], dz=d0[:, 2], tm=tm0,
        pix=pix0, smp=smp0,
        tr=ones, tg=ones, tb=ones, rr=zeros, rg=zeros, rb=zeros,
        act=act0, gid=gid0, dep=jnp.zeros((P,), i32),
        next_gid=jnp.int32(jnp.minimum(P, total)),
        wp=jnp.int32(0),
        seg_lo=jnp.uint32(0), seg_hi=jnp.uint32(0),
        bank=bank0,
    )

    def cond(c):
        return (c["next_gid"] < total) | (jnp.max(c["act"]) > 0.0)

    def body(c):
        out = runp(mega.sph_sweep, mega.quad_sweep, mega.tabt_rep,
                   mega.noise_rep, mega.atlas_rep,
                   r2(c["ox"]), r2(c["oy"]), r2(c["oz"]),
                   r2(c["dx"]), r2(c["dy"]), r2(c["dz"]), r2(c["tm"]),
                   r2(c["pix"]), r2(c["smp"]),
                   r2(c["tr"]), r2(c["tg"]), r2(c["tb"]),
                   r2(c["rr"]), r2(c["rg"]), r2(c["rb"]),
                   r2(c["act"]), so, dep=r2(c["dep"]))
        (rr, rg, rb, bc, ox, oy, oz, dx, dy, dz, tr, tg, tb, act) = out
        dep = c["dep"] + bc.reshape(P)
        seg = jnp.sum(bc).astype(jnp.uint32)
        seg_lo = c["seg_lo"] + seg
        seg_hi = c["seg_hi"] + (seg_lo < c["seg_lo"]).astype(jnp.uint32)

        actf = act.reshape(P)
        gid = c["gid"]
        alive = actf > 0.0
        is_sent = gid >= total
        # partition key: dead rays sorted by gid (banked in gid order so
        # the final fold's sort sees presorted runs), then sentinels,
        # then alive. (gid, dep) travel as ONE packed i32 — dep < 128 and
        # gid < 2^24 (asserted via MAX_POOL_STREAM). Radiance and
        # throughput share 3 overlay columns: an ALIVE ray's radiance is
        # identically 0 (for this material set every path has exactly one
        # terminal contribution — lambertian/metal/dielectric emit
        # nothing, diffuse_light and background terminate the path), and
        # a dead ray's throughput is never read again, so
        # vr = alive ? throughput : radiance loses nothing and the sort
        # moves 11 operands instead of 15 (device-trace round 5: the
        # per-boundary sort was ~1.05 ms/iter at 15 operands, 262k rows).
        key = jnp.where(
            alive, jnp.int32(1 << 25) + lane,
            jnp.where(is_sent, jnp.int32(1 << 24) + lane, gid))
        packed = dep * jnp.int32(1 << 24) + gid
        vr = jnp.where(alive, tr.reshape(P), rr.reshape(P))
        vg = jnp.where(alive, tg.reshape(P), rg.reshape(P))
        vb = jnp.where(alive, tb.reshape(P), rb.reshape(P))
        ops = [key,
               ox.reshape(P), oy.reshape(P), oz.reshape(P),
               dx.reshape(P), dy.reshape(P), dz.reshape(P),
               vr, vg, vb,
               packed]
        skey, sox, soy, soz, sdx, sdy, sdz, svr, svg, svb, \
            spacked = jax.lax.sort(ops, num_keys=1, is_stable=False)
        salive = skey >= (1 << 25)
        str_ = jnp.where(salive, svr, 1.0)
        stg = jnp.where(salive, svg, 1.0)
        stb = jnp.where(salive, svb, 1.0)
        srr = jnp.where(salive, 0.0, svr)
        srg = jnp.where(salive, 0.0, svg)
        srb = jnp.where(salive, 0.0, svb)
        sgid = spacked & jnp.int32((1 << 24) - 1)
        sdep = spacked >> 24
        n_dead = jnp.sum((skey < (1 << 24)).astype(i32))
        n_notalive = jnp.sum((skey < (1 << 25)).astype(i32))

        # --- bank the dead prefix ---
        bank = c["bank"]
        if fold == "sort":
            (log,) = bank
            wp = c["wp"]
            # one contiguous write; rows past n_dead are overwritten by
            # later banks (wp only advances by n_dead) or are sentinels
            blk = jnp.stack(
                [sgid.astype(f32), srr, srg, srb], axis=-1)
            log = jax.lax.dynamic_update_slice(log, blk, (wp, jnp.int32(0)))
            bank = (log,)
            wp = wp + n_dead
        else:
            (acc,) = bank
            # ascending unique indices; alive/sentinel lanes map to
            # total (out of bounds) and drop
            idx = jnp.where(skey < (1 << 24), sgid, GSENT)
            acc = acc.at[idx].set(
                jnp.stack([srr, srg, srb], axis=-1),
                mode="drop", indices_are_sorted=True)
            bank = (acc,)
            wp = c["wp"] + n_dead

        # --- refill the freed prefix with the next stream gids ---
        n_refill = jnp.minimum(n_notalive, total - c["next_gid"])
        fresh = lane < n_refill
        pooled = lane < n_notalive
        gid2 = jnp.where(fresh, c["next_gid"] + lane,
                         jnp.where(pooled, GSENT, sgid))
        o_n, d_n, tm_n, pix2, smp2 = gen_rays(gid2)
        zf = jnp.float32(0.0)
        of = jnp.float32(1.0)
        return dict(
            ox=jnp.where(fresh, o_n[:, 0], sox),
            oy=jnp.where(fresh, o_n[:, 1], soy),
            oz=jnp.where(fresh, o_n[:, 2], soz),
            dx=jnp.where(fresh, d_n[:, 0], sdx),
            dy=jnp.where(fresh, d_n[:, 1], sdy),
            dz=jnp.where(fresh, d_n[:, 2], sdz),
            tm=tm_n, pix=pix2, smp=smp2,
            tr=jnp.where(fresh, of, str_),
            tg=jnp.where(fresh, of, stg),
            tb=jnp.where(fresh, of, stb),
            rr=jnp.where(fresh, zf, srr),
            rg=jnp.where(fresh, zf, srg),
            rb=jnp.where(fresh, zf, srb),
            act=jnp.where(fresh, of, jnp.where(pooled, zf, of)),
            gid=gid2,
            dep=jnp.where(fresh, jnp.int32(0), sdep),
            next_gid=c["next_gid"] + n_refill,
            wp=wp,
            seg_lo=seg_lo, seg_hi=seg_hi,
            bank=bank,
        )

    final = jax.lax.while_loop(cond, body, carry0)

    if fold == "sort":
        (log,) = final["bank"]
        _, fr, fg, fb = jax.lax.sort(
            [log[:, 0], log[:, 1], log[:, 2], log[:, 3]], num_keys=1,
            is_stable=False)
        rad = jnp.stack([fr[:total], fg[:total], fb[:total]], axis=-1)
    else:
        rad = final["bank"][0]
    # gid = smp·n_pix + pix → (spp, n_pix, 3); sum the sample axis
    rad_sum = rad.reshape(spp, n_pix, 3).sum(axis=0)
    return rad_sum, (final["seg_lo"], final["seg_hi"])
