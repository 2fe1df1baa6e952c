"""Ablations for the fwd+bwd decide pass and TPU sort scaling at the
bench chunk shape (B = 360448):

  decide0   trace_megakernel, no extras (renderer-equivalent)
  decide_c  + want_counts
  decide_i  + want_ids
  decide_ic + both (the bench decide)
  sortN     lax.sort with N payload operands (unique i32 key), N in
            {0, 3, 10, 20} — is sort cost really operand-count linear?

    python tools/fbprof5.py
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
    params0 = CameraParams.from_config(cfg)
    derived = cam_mod.derive(cfg, params0)
    phases = [2, 3, max_depth - 5]
    interpret = jax.default_backend() == "cpu"

    def make_rays(sample0):
        smp = sample0 + jnp.repeat(
            jnp.arange(spp_chunk, dtype=jnp.int32), npix_pad)
        o, d, t = cam_mod.generate_rays(
            cfg, derived, pix, smp, jnp.uint32(seed),
            motion_blur=scene.flags.has_moving)
        return o, d, t, smp

    def decide(sample0, want_ids, want_counts):
        o, d, t, smp = make_rays(sample0)
        out = trace_megakernel(
            mega, o, d, t, pix, smp, cfg.background, max_depth,
            jnp.uint32(seed), phase_depths=phases, active0=act0,
            want_ids=want_ids, want_counts=want_counts,
            interpret=interpret,
            regen=make_regen(n_pix, npix_pad, spp_chunk, jnp.int32(0),
                             sample0, jnp.uint32(seed),
                             scene.flags.has_moving))
        return sum(jnp.sum(x[..., 0]) if x.ndim > 1 else jnp.sum(x)
                   for x in out[1:2])  # fence on segments only

    def timeit(name, fn, *fargs, reps=3):
        c = jax.jit(fn).lower(*fargs).compile()
        val = c(*fargs)
        float(np.asarray(jax.tree_util.tree_leaves(val)[0]).ravel()[0])
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            val = c(*fargs)
            float(np.asarray(jax.tree_util.tree_leaves(val)[0]).ravel()[0])
            times.append(time.perf_counter() - t0)
        print(f"{name:10s} best {min(times)*1e3:7.1f} ms  "
              f"all {[round(t*1e3,1) for t in times]}", flush=True)

    s0 = jnp.int32(0)
    timeit("decide0", lambda s: decide(s, False, False), s0)
    timeit("decide_c", lambda s: decide(s, False, True), s0)
    timeit("decide_i", lambda s: decide(s, True, False), s0)
    timeit("decide_ic", lambda s: decide(s, True, True), s0)

    rng = np.random.default_rng(0)
    cols = [jnp.asarray(rng.standard_normal(B), jnp.float32)
            for _ in range(20)]
    keyv = jnp.asarray(rng.permutation(B).astype(np.int32))

    for n in (0, 3, 10, 20):
        def sortn(key, n=n):
            out = jax.lax.sort([key] + cols[:n], num_keys=1,
                               is_stable=False)
            return out[0][0]

        timeit(f"sort{n}", sortn, keyv)


if __name__ == "__main__":
    main()
