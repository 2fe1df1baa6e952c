"""Profile the fwd+bwd replay path's pieces on the real chip.

Answers: where do bench_fwd_bwd's 52 s go, and is a one-hot MXU matmul
a faster primitive-table lookup than XLA gather?

    python tools/fbprof.py
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

    def timeit(name, fn, *args, reps=3):
        val = fn(*args)
        jax.tree_util.tree_map(np.asarray, val)
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            val = fn(*args)
            jax.tree_util.tree_map(np.asarray, val)
            times.append(time.perf_counter() - t0)
        print(f"{name}: best {min(times)*1e3:.1f} ms  "
              f"all {[round(t*1e3,1) for t in times]}", flush=True)
        return min(times)

    from raytracing_tpu.diff.replay import record_decisions, replay_trace
    from raytracing_tpu.models.scenes import build
    from raytracing_tpu.render import camera as cam_mod
    from raytracing_tpu.render.camera import CameraParams

    B = 131072
    DEPTH = 20
    scene, cfg = build("bouncing_spheres", image_width=400,
                       samples_per_pixel=100, max_depth=DEPTH)
    n_pix = cfg.n_pixels
    pix = jnp.arange(B, dtype=jnp.int32) % n_pix
    smp = jnp.arange(B, dtype=jnp.int32) // n_pix
    params = CameraParams.from_config(cfg)
    derived = cam_mod.derive(cfg, params)
    o, d, t = cam_mod.generate_rays(cfg, derived, pix, smp, jnp.uint32(7),
                                    motion_blur=True)
    bg = jnp.asarray(cfg.background, jnp.float32)

    # 0. micro: one row-gather (B,) from the sphere table vs one-hot matmul
    key = jax.random.PRNGKey(0)
    n_p = scene.n_spheres
    idx = jax.random.randint(key, (B,), 0, n_p, dtype=jnp.int32)
    table = jnp.asarray(np.random.rand(n_p, 16), jnp.float32)
    ITERS = 20

    @jax.jit
    def g_rows(idx, table):
        def body(i, acc):
            return acc + table[(idx + i) % n_p].sum(-1)
        return jax.lax.fori_loop(0, ITERS, body,
                                 jnp.zeros((B,), jnp.float32)).sum()

    timeit(f"gather_{B//1024}k_rows_from_{n_p}x16 (x{ITERS})", g_rows, idx,
           table)

    npad = 512

    @jax.jit
    def onehot_mm(idx, table):
        tpad = jnp.zeros((npad, 16), jnp.float32).at[:n_p].set(table)

        def body(i, acc):
            oh = ((idx + i) % n_p)[:, None] == jnp.arange(npad)[None, :]
            vals = jnp.dot(oh.astype(jnp.bfloat16),
                           tpad.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            return acc + vals.sum(-1)
        return jax.lax.fori_loop(0, ITERS, body,
                                 jnp.zeros((B,), jnp.float32)).sum()

    timeit(f"onehot_bf16_mm_{B//1024}k_x512x16 (x{ITERS})", onehot_mm, idx,
           table)

    # 1. decision pass cost (XLA brute hit fn — for scale only)
    # (skipped: bench uses the megakernel; its cost is known ~forward)

    # 2. replay forward
    fwd = jax.jit(lambda s: replay_trace(
        s, ids, o, d, t, pix, smp, bg, DEPTH, jnp.uint32(7), remat=False))
    ids = record_decisions(scene, o, d, t, pix, smp, bg, DEPTH,
                           jnp.uint32(7))
    ids = jax.block_until_ready(ids)
    timeit("replay_fwd_131k_d20", fwd, scene)

    # 3. replay value_and_grad w.r.t. centers+albedos
    def loss(center, rgb):
        s = scene.replace(
            spheres=scene.spheres.replace(center=center),
            textures=scene.textures.replace(rgb=rgb),
        )
        rad, seg = replay_trace(s, ids, o, d, t, pix, smp, bg, DEPTH,
                                jnp.uint32(7))
        return rad.sum(), seg

    g = jax.jit(jax.value_and_grad(loss, argnums=(0, 1), has_aux=True))
    timeit("replay_fwd_bwd_131k_d20", g, scene.spheres.center,
           scene.textures.rgb)

    # 4. packed-table fast replay (diff/replay_fast.py)
    from raytracing_tpu.diff.replay_fast import replay_trace_fast

    ffwd = jax.jit(lambda s: replay_trace_fast(
        s, ids, o, d, t, pix, smp, bg, DEPTH, jnp.uint32(7), remat=False))
    timeit("replay_FAST_fwd_131k_d20", ffwd, scene)

    def loss_f(center, rgb):
        s = scene.replace(
            spheres=scene.spheres.replace(center=center),
            textures=scene.textures.replace(rgb=rgb),
        )
        rad, seg = replay_trace_fast(s, ids, o, d, t, pix, smp, bg, DEPTH,
                                     jnp.uint32(7))
        return rad.sum(), seg

    gf = jax.jit(jax.value_and_grad(loss_f, argnums=(0, 1), has_aux=True))
    timeit("replay_FAST_fwd_bwd_131k_d20", gf, scene.spheres.center,
           scene.textures.rgb)

    # 5. Pallas fwd+bwd replay kernels (diff/replay_kernel.py)
    from raytracing_tpu.diff.replay_kernel import replay_trace_kernel

    kfwd = jax.jit(lambda s: replay_trace_kernel(
        s, ids, o, d, t, pix, smp, cfg.background, DEPTH, jnp.uint32(7)))
    timeit("replay_KERNEL_fwd_131k_d20", kfwd, scene)

    def loss_k(center, rgb):
        s = scene.replace(
            spheres=scene.spheres.replace(center=center),
            textures=scene.textures.replace(rgb=rgb),
        )
        rad, seg = replay_trace_kernel(s, ids, o, d, t, pix, smp,
                                       cfg.background, DEPTH, jnp.uint32(7))
        return rad.sum(), seg

    gk = jax.jit(jax.value_and_grad(loss_k, argnums=(0, 1), has_aux=True))
    timeit("replay_KERNEL_fwd_bwd_131k_d20", gk, scene.spheres.center,
           scene.textures.rgb)


if __name__ == "__main__":
    main()
