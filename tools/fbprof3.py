"""Component split of the Pallas replay kernels on the chip, with 4-byte
scalar fences (the (B,3) radiance transfer costs ~30-60 ms on the tunnel
and was masking the real kernel costs in fbprof.py).

    python tools/fbprof3.py
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
        float(np.asarray(val))
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            val = fn(*args)
            float(np.asarray(val))
            times.append(time.perf_counter() - t0)
        print(f"{name}: best {min(times)*1e3:.1f} ms  "
              f"all {[round(t*1e3,1) for t in times]}", flush=True)

    from raytracing_tpu.diff import replay_fast as rf
    from raytracing_tpu.diff import replay_kernel as rk
    from raytracing_tpu.diff.replay import record_decisions
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
    ids = record_decisions(scene, o, d, t, pix, smp, bg, DEPTH,
                           jnp.uint32(7))
    ids = jax.block_until_ready(ids)

    # scalar-fenced kernel forward
    @jax.jit
    def kfwd_scalar(s):
        rad, seg = rk.replay_trace_kernel(
            s, ids, o, d, t, pix, smp, cfg.background, DEPTH,
            jnp.uint32(7))
        return rad.sum()

    timeit("KERNEL_fwd_scalar", kfwd_scalar, scene)

    # backward kernel alone (scalar fence)
    table = rf.build_replay_table(scene)
    L = table.shape[0]
    fwd_run, bwd_run = rk.make_replay_kernels(
        L, DEPTH, np.asarray(cfg.background, np.float32), scene.n_spheres,
        True)
    rows = B // rk.TILE

    def r2(x):
        return x.reshape(rows, rk.TILE)

    ids3 = ids.reshape(DEPTH, rows, rk.TILE)
    packed = (ids3, r2(o[:, 0]), r2(o[:, 1]), r2(o[:, 2]),
              r2(d[:, 0]), r2(d[:, 1]), r2(d[:, 2]), r2(t),
              r2(pix), r2(smp), jnp.ones((rows, rk.TILE), jnp.float32))
    seed_arr = jnp.asarray([7], jnp.uint32)
    ones2 = jnp.ones((rows, rk.TILE), jnp.float32)

    @jax.jit
    def bwd_only(table):
        rep = jnp.repeat(table.T, rk.ROWS, axis=0)
        g = bwd_run(rep, *packed, ones2, ones2, ones2, seed_arr)
        return g.sum()

    timeit("KERNEL_bwd_only", bwd_only, table)

    # one-hot matmul reduction alone (20 bounces)
    gdummy = jnp.ones((rows * DEPTH * rk.NG, rk.TILE), jnp.float32)

    @jax.jit
    def reduction(g, table):
        steps = rows // rk.ROWS
        g5 = g.reshape(steps, DEPTH, rk.NG, rk.ROWS, rk.TILE)
        ids_flat = ids3.reshape(DEPTH, B)
        acc = jnp.zeros((L, rk.NG), jnp.float32)
        arangeL = jnp.arange(L, dtype=jnp.int32)
        for b in range(DEPTH):
            gm = g5[:, b].transpose(0, 2, 3, 1).reshape(B, rk.NG)
            idb = jnp.clip(ids_flat[b], 0, L - 1)
            oh = (idb[:, None] == arangeL[None, :]).astype(jnp.float32)
            acc = acc + jax.lax.dot_general(
                oh, gm, dimension_numbers=(((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST)
        return acc.sum()

    timeit("onehot_reduction_20b", reduction, gdummy, table)


if __name__ == "__main__":
    main()
