"""Clean, serialized measurements to settle the fwd+bwd cost model:

  sortR      bare 1-key lax.sort at 131072 / 262144 / 360448 rows,
             random-permutation key vs nearly-sorted key
  decideP    the bench decide (want_ids+counts) under phase_depths
             None / [2,3,15] / [3,17]
  replayRG   replay_grads_sorted with vs without ray_regen

Run ALONE on the chip (everything else drained).

    python tools/fbprof7.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    def timeit(name, fn, *fargs, reps=5):
        c = jax.jit(fn).lower(*fargs).compile()
        val = c(*fargs)
        float(np.asarray(jax.tree_util.tree_leaves(val)[0]).ravel()[0])
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            val = c(*fargs)
            float(np.asarray(jax.tree_util.tree_leaves(val)[0]).ravel()[0])
            times.append(time.perf_counter() - t0)
        print(f"{name:24s} best {min(times)*1e3:7.1f} ms  "
              f"all {[round(t*1e3,1) for t in times]}", flush=True)

    rng = np.random.default_rng(0)
    for n in (131072, 262144, 360448):
        kperm = jnp.asarray(rng.permutation(n).astype(np.int32))
        ksorted = jnp.asarray(
            (np.arange(n) + rng.integers(0, 8, n)).astype(np.int32))

        def s1(k):
            return jax.lax.sort([k], num_keys=1, is_stable=False)[0][0]

        timeit(f"sort1 perm   n={n}", s1, kperm)
        timeit(f"sort1 nearly n={n}", s1, ksorted)

    # payload scaling at 360448, clean
    n = 360448
    kperm = jnp.asarray(rng.permutation(n).astype(np.int32))
    cols = [jnp.asarray(rng.standard_normal(n), jnp.float32)
            for _ in range(20)]
    for p in (3, 10, 20):
        def sp(k, p=p):
            return jax.lax.sort([k] + cols[:p], num_keys=1,
                                is_stable=False)[0][0]

        timeit(f"sort payload={p}", sp, kperm)

    # ---- decide under different phase schedules ----
    from raytracing_tpu.models.scenes import build
    from raytracing_tpu.ops.megakernel import (
        BLOCK, build_mega_scene, make_regen, trace_megakernel,
    )
    from raytracing_tpu.render import camera as cam_mod
    from raytracing_tpu.render.camera import CameraParams

    width, spp, max_depth, seed = 400, 100, 20, 7
    spp_chunk = 4
    scene, cfg = build("bouncing_spheres", image_width=width,
                       samples_per_pixel=spp, max_depth=max_depth)
    mega = build_mega_scene(scene)
    n_pix = cfg.n_pixels
    npix_pad = -(-n_pix // BLOCK) * BLOCK
    B = npix_pad * spp_chunk
    pix = jnp.tile(jnp.minimum(jnp.arange(npix_pad, dtype=jnp.int32),
                               n_pix - 1), spp_chunk)
    act0 = jnp.tile(jnp.arange(npix_pad) < n_pix, spp_chunk)
    derived = cam_mod.derive(cfg, CameraParams.from_config(cfg))
    interpret = jax.default_backend() == "cpu"

    def make_rays(sample0):
        smp = sample0 + jnp.repeat(
            jnp.arange(spp_chunk, dtype=jnp.int32), npix_pad)
        o, d, t = cam_mod.generate_rays(
            cfg, derived, pix, smp, jnp.uint32(seed),
            motion_blur=scene.flags.has_moving)
        return o, d, t, smp

    def decide(sample0, phases):
        o, d, t, smp = make_rays(sample0)
        rad, seg, ids, cnt = trace_megakernel(
            mega, o, d, t, pix, smp, cfg.background, max_depth,
            jnp.uint32(seed), phase_depths=phases, active0=act0,
            want_ids=True, want_counts=True, interpret=interpret,
            regen=(make_regen(n_pix, npix_pad, spp_chunk, jnp.int32(0),
                              sample0, jnp.uint32(seed),
                              scene.flags.has_moving)
                   if phases else None))
        return rad, ids, cnt, seg

    s0 = jnp.int32(0)
    for label, ph in (("none", None), ("2-3-15", [2, 3, 15]),
                      ("3-17", [3, 17])):
        timeit(f"decide phases={label}",
               lambda s, ph=ph: decide(s, ph)[3], s0)

    # ---- replay with vs without ray_regen ----
    from raytracing_tpu.diff import replay_fast as rfm
    from raytracing_tpu.diff import replay_kernel as rk

    rad, ids, cnt, _ = decide(s0, [2, 3, 15])
    rad, ids, cnt = map(jnp.asarray, (rad, ids, cnt))
    o, d, t, smp = make_rays(s0)
    table = rfm.build_replay_table(scene)
    rad_bar = rad * (1.0 / B)
    D = max_depth
    hist = np.bincount(np.clip(np.asarray(cnt), 0, D), minlength=D + 1)
    prefixes = rk.plan_prefixes(hist, B, D)

    def ray_regen(orig):
        p = jnp.minimum(orig % npix_pad, n_pix - 1)
        s = jnp.int32(0) + orig // npix_pad
        ro, rd, rt = cam_mod.generate_rays(
            cfg, derived, p, s, jnp.uint32(seed),
            motion_blur=scene.flags.has_moving)
        return ro, rd, rt, p, s

    def rep(tab, rb, use_rg):
        tbar, ok = rk.replay_grads_sorted(
            scene, tab, ids, o, d, t, pix, smp, cfg.background, D,
            jnp.uint32(seed), rb, cnt, prefixes=prefixes,
            interpret=interpret,
            ray_regen=ray_regen if use_rg else None)
        return tbar.sum() + jnp.where(ok, 0.0, jnp.nan)

    timeit("replay no-regen", lambda t_, r: rep(t_, r, False),
           table, rad_bar)
    timeit("replay ray_regen", lambda t_, r: rep(t_, r, True),
           table, rad_bar)
    print(f"B={B} segments={int(np.asarray(cnt).sum())}", flush=True)


if __name__ == "__main__":
    main()
