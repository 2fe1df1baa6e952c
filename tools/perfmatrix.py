"""On-TPU perf matrix for the megakernel render path.

Replaces the /tmp/micro scripts referenced in CLAUDE.md (lost to /tmp
cleanup): each row renders the benchmark workload through the public
Renderer with one knob combination and reports honest rays/s (timing
includes the host materialization — see render/renderer.py on the
remote platform's unreliable block_until_ready).

Usage:
    python tools/perfmatrix.py                 # default matrix
    python tools/perfmatrix.py --rows '[{"phase_depths":[2,3,15]},{}]'
    python tools/perfmatrix.py --width 400 --spp 100 --depth 20

Each row dict holds Renderer kwargs (phase_depths, sort_mode,
sort_regions, ray_order, spp_chunk, use_clusters, max_rays_per_launch,
hit_method). Rows run twice; the second (warm) timing is reported.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


DEFAULT_ROWS = [
    {},  # renderer defaults (the bench configuration)
    {"phase_depths": [2, 3, 15], "sort_mode": "coherent"},
    {"phase_depths": [1, 2, 2, 15], "sort_mode": "coherent"},
    {"phase_depths": [2, 18]},
]


def run_row(scene, cfg, seed, kw, reps=3):
    from raytracing_tpu.render.renderer import Renderer

    kw = dict(kw)
    kw.setdefault("hit_method", "mega")
    kw.setdefault("mode", "while")
    kw.setdefault("max_rays_per_launch", 1 << 18)
    r = Renderer(cfg, **kw)
    res = r.render(scene, seed=seed)  # compile + warm
    times = []
    for _ in range(reps):  # tunnel timing jitter is real: report best+all
        res = r.render(scene, seed=seed)
        times.append(res.seconds)
    best = min(times)
    return dict(
        rays_per_s=round(res.segments / max(best, 1e-9)),
        segments=res.segments,
        seconds=[round(t, 4) for t in times],
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="bouncing_spheres")
    ap.add_argument("--width", type=int, default=400)
    ap.add_argument("--spp", type=int, default=100)
    ap.add_argument("--depth", type=int, default=20)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--rows", default=None,
                    help="JSON list of Renderer-kwarg dicts")
    args = ap.parse_args()

    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from raytracing_tpu.models.scenes import build

    scene, cfg = build(args.scene, image_width=args.width,
                       samples_per_pixel=args.spp, max_depth=args.depth)
    rows = json.loads(args.rows) if args.rows else DEFAULT_ROWS
    for kw in rows:
        t0 = time.perf_counter()
        try:
            out = run_row(scene, cfg, args.seed, kw)
            out["wall_incl_compile"] = round(time.perf_counter() - t0, 1)
            print("ROW", json.dumps(kw, sort_keys=True), "->",
                  json.dumps(out), flush=True)
        except Exception as e:  # keep the matrix going past one bad row
            print("ROW", json.dumps(kw, sort_keys=True), "-> FAILED:",
                  repr(e), flush=True)


if __name__ == "__main__":
    main()
