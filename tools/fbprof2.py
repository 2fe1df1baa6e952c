"""Ablate the fast replay's per-bounce cost: lookup vs bounce math vs
scan overhead.

    python tools/fbprof2.py
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
        print(f"{name}: best {min(times)*1e3:.1f} ms", flush=True)

    from raytracing_tpu.diff.replay import record_decisions
    from raytracing_tpu.diff import replay_fast as rf
    from raytracing_tpu.models.scenes import build
    from raytracing_tpu.ops.table_gather import table_lookup
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

    # a. 20 bare lookups in a scan (no bounce math)
    table = rf.build_replay_table(scene)

    @jax.jit
    def bare_lookups(table):
        def body(acc, ids_b):
            vals = table_lookup(table, jnp.where(ids_b >= 0, ids_b, 0))
            return acc + vals.sum(axis=1), None
        out, _ = jax.lax.scan(body, jnp.zeros((B,), jnp.float32), ids)
        return out.sum()

    timeit("scan_20_lookups_only", bare_lookups, table)

    # b. full fast replay, remat off (reference point)
    ffwd = jax.jit(lambda s: rf.replay_trace_fast(
        s, ids, o, d, t, pix, smp, bg, DEPTH, jnp.uint32(7), remat=False))
    timeit("fast_fwd (again)", ffwd, scene)

    # c. full fast replay with the lookup stubbed to a broadcast row 0
    orig = rf.table_lookup
    rf.table_lookup = lambda tb, ids: jnp.broadcast_to(
        tb[0][None, :], (ids.shape[0], tb.shape[1]))
    stub = jax.jit(lambda s: rf.replay_trace_fast(
        s, ids, o, d, t, pix, smp, bg, DEPTH, jnp.uint32(7), remat=False))
    timeit("fast_fwd_lookup_stubbed", stub, scene)
    rf.table_lookup = orig


if __name__ == "__main__":
    main()
