"""Device-trace the pool schedule's render program (round-5 pool A/B
follow-up): where do the pool's non-kernel milliseconds go — sort, log
DUS, refill regen, or scheduling gaps?

  timeout 550 python tools/pooltrace.py [--pool 262144] [--k 2]
  python tools/traceparse.py /tmp/pool_trace --bucket
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pool", type=int, default=262144)
    ap.add_argument("--k", type=int, default=2)
    ap.add_argument("--dir", default="/tmp/pool_trace")
    ap.add_argument("--phased", action="store_true",
                    help="trace the phased schedule instead")
    args = ap.parse_args()

    import bench

    bench._enable_compile_cache()
    import jax

    from raytracing_tpu.models.scenes import build
    from raytracing_tpu.render.renderer import Renderer

    scene, cfg = build("bouncing_spheres", image_width=400,
                       samples_per_pixel=100, max_depth=20)
    if args.phased:
        r = Renderer(cfg, hit_method="mega", mode="while",
                     max_rays_per_launch=1 << 18, transfer="u8")
    else:
        r = Renderer(cfg, schedule="pool", pool_size=args.pool,
                     k_bounces=args.k, transfer="u8")
    res = r.render(scene, seed=7)
    print("warm", res.seconds, res.segments, flush=True)
    os.makedirs(args.dir, exist_ok=True)
    with jax.profiler.trace(args.dir):
        res = r.render(scene, seed=7)
    print("traced", res.seconds, flush=True)


if __name__ == "__main__":
    main()
