"""Benchmark harness: rays/s on the final-scene BVH workload
(BASELINE.md: bouncing_spheres ~500 spheres, 400×225 @ 100 spp, depth 20;
target ≥ 5e8 rays/s/chip).

Prints ONE JSON line:
  {"metric": "rays_per_s_fwd_final_scene", "value": N, "unit": "rays/s",
   "vs_baseline": N / 5e8, ...extras}

"rays" = ray-scene intersection queries actually traced (path segments),
counted exactly by the integrator's active-mask sum — the standard
wavefront-path-tracer throughput unit.

Runs on whatever backend JAX picks (the real TPU chip under the driver).
"""
from __future__ import annotations

import json
import os
import sys
import time

BASELINE_RAYS_PER_S = 5e8


def _enable_compile_cache():
    """Persistent compilation cache: the remote TPU compiler on this setup
    has multi-minute latency spikes; cached programs load in seconds."""
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def bench_forward(width=400, spp=100, max_depth=20, seed=7, methods=("mega",)):
    import jax
    import jax.numpy as jnp

    from raytracing_tpu.models.scenes import build
    from raytracing_tpu.render.renderer import Renderer

    scene, cfg = build(
        "bouncing_spheres", image_width=width, samples_per_pixel=spp, max_depth=max_depth
    )

    best = None
    for method in methods:
        try:
            r = Renderer(
                cfg,
                hit_method=method,
                mode="while",
                # ~1.9x faster than 1<<20 launches: the inter-phase
                # compaction argsort scales superlinearly with batch size
                max_rays_per_launch=1 << 17,
            )
            # Warm-up + compile happens inside; `seconds` excludes compile.
            res = r.render(scene, seed=seed)
            rays_per_s = res.segments / max(res.seconds, 1e-9)
            entry = dict(method=method, rays_per_s=rays_per_s,
                         segments=res.segments, seconds=res.seconds)
            if best is None or rays_per_s > best["rays_per_s"]:
                best = entry
        except Exception as e:  # pragma: no cover - report partial results
            print(f"bench[{method}] failed: {e}", file=sys.stderr)
    return best


def bench_fwd_bwd(width=200, spp=8, max_depth=20, seed=7):
    """Forward+backward throughput: grad of MSE w.r.t. scene params."""
    import jax
    import jax.numpy as jnp

    from raytracing_tpu.diff.gradients import render_once
    from raytracing_tpu.models.scenes import build

    scene, cfg = build(
        "bouncing_spheres", image_width=width, samples_per_pixel=spp, max_depth=max_depth
    )
    target = jnp.zeros((cfg.image_height, cfg.image_width, 3), jnp.float32)

    def loss(center, rgb):
        s = scene.replace(
            spheres=scene.spheres.replace(center=center),
            textures=scene.textures.replace(rgb=rgb),
        )
        img = render_once(s, cfg, seed=seed, remat=True)
        return jnp.mean((img - target) ** 2)

    g = jax.jit(jax.grad(loss, argnums=(0, 1)))
    args = (scene.spheres.center, scene.textures.rgb)
    g(*args)[0].block_until_ready()  # compile
    n_rays = cfg.n_pixels * cfg.samples_per_pixel * max_depth  # upper bound on segments
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = g(*args)
    out[0].block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    # Conservative: count primary×depth as segments for fwd+bwd (no early-out
    # counting available through grad). Report as its own extra.
    return dict(seconds=dt, rays_upper_bound=n_rays, rays_per_s_bound=n_rays / dt)


def _bench_fwd_bwd_subprocess(timeout_s: int = 240):
    """Run the fwd+bwd benchmark in a subprocess with a hard timeout: the
    remote TPU compiler occasionally hangs for >10 minutes on the XLA grad
    program, and a hang here must not prevent the forward metric line from
    printing."""
    import subprocess

    code = (
        "import sys; sys.path.insert(0, %r);"
        "import bench; bench._enable_compile_cache();"
        "r = bench.bench_fwd_bwd();"
        "print('FWD_BWD_RESULT', r['rays_per_s_bound'])"
    ) % os.path.dirname(os.path.abspath(__file__))
    try:
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout_s,
        )
        for line in out.stdout.splitlines():
            if line.startswith("FWD_BWD_RESULT"):
                return float(line.split()[1])
    except subprocess.TimeoutExpired:
        print("bench[fwd_bwd] timed out (remote compiler hang); omitting",
              file=sys.stderr)
    return None


def _bench_forward_subprocess(timeout_s: int = 420, retries: int = 3):
    """Run the forward benchmark in subprocesses with timeouts and retries:
    each fresh process re-rolls the remote compiler's latency lottery
    (observed: the same program compiles in ~40 s or hangs >10 min,
    independently per process). A retry that succeeds prints the metric."""
    import subprocess

    code = (
        "import sys, json; sys.path.insert(0, %r);"
        "import bench; bench._enable_compile_cache();"
        "r = bench.bench_forward();"
        "print('FWD_RESULT', json.dumps(r))"
    ) % os.path.dirname(os.path.abspath(__file__))
    for attempt in range(retries):
        try:
            out = subprocess.run(
                [sys.executable, "-c", code], capture_output=True, text=True,
                timeout=timeout_s,
            )
            for line in out.stdout.splitlines():
                if line.startswith("FWD_RESULT"):
                    return json.loads(line[len("FWD_RESULT"):])
            print(f"bench[fwd] attempt {attempt}: no result "
                  f"(stderr tail: {out.stderr[-300:]})", file=sys.stderr)
        except subprocess.TimeoutExpired:
            print(f"bench[fwd] attempt {attempt} timed out "
                  "(remote compiler hang); retrying", file=sys.stderr)
        # A killed client can wedge the TPU tunnel for several minutes;
        # give it time to recover before the next roll of the dice.
        if attempt + 1 < retries:
            time.sleep(90)
    return None


def main():
    _enable_compile_cache()
    fwd = _bench_forward_subprocess()
    if fwd is None:
        # last resort: in-process (no timeout protection)
        fwd = bench_forward()
    extras = {}
    try:
        bwd_rate = _bench_fwd_bwd_subprocess()
        if bwd_rate is not None:
            extras["fwd_bwd_rays_per_s_bound"] = round(bwd_rate)
    except Exception as e:  # pragma: no cover
        print(f"bench[fwd_bwd] failed: {e}", file=sys.stderr)
    import jax

    result = {
        "metric": "rays_per_s_fwd_final_scene",
        "value": round(fwd["rays_per_s"]),
        "unit": "rays/s",
        "vs_baseline": round(fwd["rays_per_s"] / BASELINE_RAYS_PER_S, 4),
        "method": fwd["method"],
        "segments": int(fwd["segments"]),
        "seconds": round(fwd["seconds"], 4),
        "backend": jax.default_backend(),
        **extras,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
