"""Pool (persistent-wavefront) vs phased schedule A/B on the exact bench
workload (VERDICT r4 item 1).

The phased schedule's measured slot efficiency is ~45% of the 8.35
ns/slot kernel floor (render/pool.py docstring); the regenerating pool
keeps the megakernel at ~full occupancy for the whole render. This
harness times both schedules on the BASELINE final-scene workload
(bouncing_spheres 400x225 @ 100 spp, depth 20 — main.cpp:23-85) with the
same honest fences as bench.py (np.asarray materialization, best-of-3)
and checks the segment counts match (the pool traces the identical path
set; radiance differs only by per-pixel sum re-association).

Run on the TPU:  timeout 550 python tools/poolbench.py [--variants ...]
Each variant is printed as one JSON line as soon as it finishes, so a
compile hang on a later variant doesn't lose earlier numbers.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=400)
    ap.add_argument("--spp", type=int, default=100)
    ap.add_argument("--depth", type=int, default=20)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--variants", nargs="*",
        default=["phased", "pool:262144:2", "pool:262144:4", "pool:131072:2"],
        help="'phased' or 'pool:<pool_size>:<k_bounces>[:<fold>]'")
    args = ap.parse_args()

    import bench

    bench._enable_compile_cache()
    import jax

    from raytracing_tpu.models.scenes import build
    from raytracing_tpu.render.renderer import Renderer

    scene, cfg = build("bouncing_spheres", image_width=args.width,
                       samples_per_pixel=args.spp, max_depth=args.depth)

    for v in args.variants:
        t_start = time.perf_counter()
        try:
            if v == "phased":
                r = Renderer(cfg, hit_method="mega", mode="while",
                             max_rays_per_launch=1 << 18, transfer="u8")
            else:
                parts = v.split(":")
                fold = parts[3] if len(parts) > 3 else "sort"
                r = Renderer(cfg, schedule="pool", pool_size=int(parts[1]),
                             k_bounces=int(parts[2]), pool_fold=fold,
                             transfer="u8")
            res = min((r.render(scene, seed=args.seed)
                       for _ in range(args.reps)), key=lambda x: x.seconds)
            print(json.dumps(dict(
                variant=v, rays_per_s=round(res.segments / res.seconds),
                segments=res.segments, seconds=round(res.seconds, 4),
                compile_s=round(time.perf_counter() - t_start -
                                args.reps * res.seconds, 1),
                backend=jax.default_backend())), flush=True)
        except Exception as e:
            print(json.dumps(dict(variant=v, error=repr(e)[:300])),
                  flush=True)


if __name__ == "__main__":
    main()
