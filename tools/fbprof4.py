"""Stage split of the fwd+bwd bench pipeline at the real bench shape
(one 4-spp chunk of the final-scene workload, B = npix_pad * 4 rays):

  decide     megakernel decision pass (radiance + ids + counts)
  sort       the descending-length sort of replay_grads_sorted
  bwd        the backward replay kernel alone
  reduce     the per-bounce prefix-sliced one-hot MXU reduction
  chunk      the full grads_chunk (everything + loss + table VJP)

All fenced through 4-byte host materialization (the tunnel's
block_until_ready is unreliable; large-array fences add 10s of ms).

    python tools/fbprof4.py [--depth 20] [--spp-chunk 4]
"""
from __future__ import annotations

import argparse
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

    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=20)
    ap.add_argument("--spp-chunk", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from raytracing_tpu.diff import replay_fast as rfm
    from raytracing_tpu.diff import replay_kernel as rk
    from raytracing_tpu.models.scenes import build
    from raytracing_tpu.ops.megakernel import (
        BLOCK, build_mega_scene, make_regen, trace_megakernel,
    )
    from raytracing_tpu.render import camera as cam_mod
    from raytracing_tpu.render.camera import CameraParams

    width, spp, max_depth, seed = 400, 100, args.depth, 7
    spp_chunk = args.spp_chunk
    scene, cfg = build("bouncing_spheres", image_width=width,
                       samples_per_pixel=spp, max_depth=max_depth)
    mega = build_mega_scene(scene)
    n_pix = cfg.n_pixels
    npix_pad = -(-n_pix // BLOCK) * BLOCK
    B = npix_pad * spp_chunk
    pix = jnp.tile(jnp.minimum(jnp.arange(npix_pad, dtype=jnp.int32),
                               n_pix - 1), spp_chunk)
    act0 = jnp.tile(jnp.arange(npix_pad) < n_pix, spp_chunk)
    params0 = CameraParams.from_config(cfg)
    derived = cam_mod.derive(cfg, params0)
    phases = [2, 3, max_depth - 5] if max_depth >= 8 else None
    interpret = jax.default_backend() == "cpu"

    def make_rays(sample0):
        smp = sample0 + jnp.repeat(
            jnp.arange(spp_chunk, dtype=jnp.int32), npix_pad)
        o, d, t = cam_mod.generate_rays(
            cfg, derived, pix, smp, jnp.uint32(seed),
            motion_blur=scene.flags.has_moving)
        return o, d, t, smp

    def decide(sample0):
        o, d, t, smp = make_rays(sample0)
        rad, _, ids, cnt = trace_megakernel(
            mega, o, d, t, pix, smp, cfg.background, max_depth,
            jnp.uint32(seed), phase_depths=phases, active0=act0,
            want_ids=True, want_counts=True, interpret=interpret,
            regen=make_regen(n_pix, npix_pad, spp_chunk, jnp.int32(0),
                             sample0, jnp.uint32(seed),
                             scene.flags.has_moving))
        return rad, ids, cnt

    def timeit(name, fn, *fargs, reps=args.reps):
        c = jax.jit(fn).lower(*fargs).compile()
        val = c(*fargs)
        float(np.asarray(jax.tree_util.tree_leaves(val)[0]).ravel()[0])
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            val = c(*fargs)
            float(np.asarray(jax.tree_util.tree_leaves(val)[0]).ravel()[0])
            times.append(time.perf_counter() - t0)
        print(f"{name:8s} best {min(times)*1e3:7.1f} ms  "
              f"all {[round(t*1e3,1) for t in times]}", flush=True)
        return val

    s0 = jnp.int32(0)
    rad, ids, cnt = decide(s0)
    rad, ids, cnt = map(jnp.asarray, (rad, ids, cnt))

    # honest per-stage fences
    timeit("decide", lambda s: decide(s)[2].sum(), s0)

    D = max_depth
    o, d, t, smp = make_rays(s0)
    table = rfm.build_replay_table(scene)
    L = table.shape[0]
    rad_bar = rad * (1.0 / B)

    def sort_only(lengths, rb):
        iota = jnp.arange(B, dtype=jnp.int32)
        key = (D - lengths) * B + iota
        ops = [key, pix.astype(jnp.int32), smp.astype(jnp.int32),
               rb[:, 0], rb[:, 1], rb[:, 2], lengths,
               o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], t]
        ops += rk._pack_ids(ids, D) if L <= 1023 else [ids[b]
                                                       for b in range(D)]
        out = jax.lax.sort(ops, num_keys=1, is_stable=False)
        return out[0].sum()

    timeit("sort", sort_only, cnt, rad_bar)

    # bwd kernel alone (unsorted order, full maxlen gating from counts)
    bg_np = np.asarray(cfg.background, np.float32)
    _, bwd_run = rk.make_replay_kernels(
        L, D, bg_np, scene.n_spheres, scene.flags.has_moving,
        interpret=interpret, const_fields=rk.scene_const_fields(scene))
    rows = B // rk.TILE
    n_steps = rows // rk.ROWS

    def r2(x):
        return x.reshape(rows, rk.TILE)

    def bwd_only(tab, lengths, rb):
        maxlen = jnp.minimum(
            lengths.reshape(n_steps, rk.ROWS * rk.TILE).max(axis=1), D)
        act = (lengths > 0).astype(jnp.float32)
        g = bwd_run(jnp.repeat(tab.T, rk.ROWS, axis=0),
                    ids.reshape(D, rows, rk.TILE),
                    r2(o[:, 0]), r2(o[:, 1]), r2(o[:, 2]),
                    r2(d[:, 0]), r2(d[:, 1]), r2(d[:, 2]),
                    r2(t), r2(pix), r2(smp), r2(act),
                    r2(rb[:, 0]), r2(rb[:, 1]), r2(rb[:, 2]),
                    jnp.asarray([seed], jnp.uint32), maxlen)
        return g.reshape(-1)[0]

    timeit("bwd", bwd_only, table, cnt, rad_bar)

    # full replay_grads_sorted (sort + gated bwd + sliced reduction)
    hist = np.bincount(np.clip(np.asarray(cnt), 0, D), minlength=D + 1)
    prefixes = rk.plan_prefixes(hist, B, D)

    def full(tab, lengths, rb):
        tbar, ok = rk.replay_grads_sorted(
            scene, tab, ids, o, d, t, pix, smp, cfg.background, D,
            jnp.uint32(seed), rb, lengths, prefixes=prefixes,
            interpret=interpret)
        return tbar.sum() + jnp.where(ok, 0.0, jnp.nan)

    timeit("replay", full, table, cnt, rad_bar)

    # reduction cost ~= replay - sort - bwd(sorted); print for reference
    print(f"B={B} segments={int(np.asarray(cnt).sum())} L={L} D={D} "
          f"prefix_rows={sum(prefixes)}", flush=True)


if __name__ == "__main__":
    main()
