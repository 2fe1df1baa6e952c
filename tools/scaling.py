"""Scaling-efficiency harness (VERDICT r4 item 8; BASELINE.md target:
>= 85% rays/s efficiency 1 chip -> N chips).

Measures dp-sharded render throughput across mesh sizes and reports
efficiency = rate_N / (N * rate_1) per size. Two modes:

* default: CPU backend with N virtual devices — validates the sharding
  mechanism and collective structure end-to-end (absolute CPU rates are
  not meaningful; the efficiency column still smoke-tests that the
  sharded program has no serialization pathology).
* --tpu: runs on the real attached TPU devices (hardware-ready for when
  a multi-chip slice appears; with one chip it degenerates to the
  1-device row). Uses the megakernel fast path under shard_map when the
  scene supports it.

Prints one JSON line per mesh size plus a summary line.

Usage:
  python tools/scaling.py [--sizes 1 2 4 8] [--width 200] [--spp 16]
  python tools/scaling.py --tpu --sizes 1   # real hardware
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def run(sizes, width, spp, depth, seed, hit_method, reps):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from raytracing_tpu.models.scenes import build
    from raytracing_tpu.parallel.mesh import make_mesh
    from raytracing_tpu.parallel.shard import build_sharded_renderer
    from raytracing_tpu.render.camera import CameraParams

    devs = jax.devices()
    scene, cfg = build("bouncing_spheres", image_width=width,
                       samples_per_pixel=spp, max_depth=depth)

    def rate(n):
        mesh = make_mesh((n,), ("dp",), devices=devs[:n])
        fn, scene_prep, n_pix_pad = build_sharded_renderer(
            scene, cfg, mesh, hit_method=hit_method, mode="scan")
        params = CameraParams.from_config(cfg)
        pix = jnp.arange(n_pix_pad, dtype=jnp.int32)
        part, seg = fn(scene_prep, params, pix, jnp.uint32(seed))  # compile
        np.asarray(part)  # honest fence (render/renderer.py rationale)
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            part, seg = fn(scene_prep, params, pix, jnp.uint32(seed))
            np.asarray(part)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return int(seg) / best

    results = []
    r1 = None
    for n in sizes:
        if n > len(devs):
            print(json.dumps(dict(devices=n, skipped=f"only {len(devs)} "
                                  "devices attached")), flush=True)
            continue
        r = rate(n)
        if n == 1:
            r1 = r
        eff = round(r / (n * r1), 4) if r1 else None
        results.append(dict(devices=n, rays_per_s=round(r), efficiency=eff))
        print(json.dumps(results[-1]), flush=True)
    # the >=85% verdict only means something on real separate chips: the
    # virtual CPU "devices" all share the host's cores, so a fixed
    # workload split N ways cannot scale and efficiency trends to 1/N by
    # construction — that mode only smoke-tests the collective structure
    on_hw = jax.default_backend() != "cpu"
    summary = dict(metric="scaling_efficiency_dp",
                   backend=jax.default_backend(),
                   target=0.85, rows=results,
                   ok=(all(r["efficiency"] is None or r["efficiency"] >= 0.85
                           for r in results) if on_hw else None))
    print(json.dumps(summary), flush=True)
    return summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="*", default=[1, 2, 4, 8])
    ap.add_argument("--width", type=int, default=200)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--hit", default="bvh")
    ap.add_argument("--tpu", action="store_true",
                    help="run on the real attached devices instead of the "
                         "virtual CPU mesh")
    args = ap.parse_args()

    if not args.tpu and "XLA_FLAGS" not in os.environ:
        # re-exec with the virtual-device CPU backend (XLA_FLAGS must be
        # set before backend init; the axon platform pin is overridden via
        # jax.config inside the child)
        n = max(args.sizes)
        env = dict(os.environ,
                   XLA_FLAGS=f"--xla_force_host_platform_device_count={n}",
                   RT_SCALING_CPU="1")
        os.execve(sys.executable, [sys.executable] + sys.argv, env)
    if os.environ.get("RT_SCALING_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    run(args.sizes, args.width, args.spp, args.depth, args.seed, args.hit,
        args.reps)


if __name__ == "__main__":
    main()
