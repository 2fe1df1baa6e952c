"""Profiling hooks (SURVEY.md §5 tracing/profiling): jax.profiler traces
around render stages, rays/s counters, per-bounce wavefront occupancy."""
from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace_to(logdir: Optional[str]) -> Iterator[None]:
    """Capture a device trace (view with TensorBoard/Perfetto). No-op when
    logdir is None."""
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace span for host-side phases."""
    return jax.profiler.TraceAnnotation(name)


def occupancy_histogram(scene, cfg, seed: int = 0, batch: int = 1 << 14):
    """Per-bounce active-ray occupancy — the wavefront analog of a path-depth
    histogram. Returns an (max_depth,) array of live fractions."""
    from ..render import camera as cam_mod
    from ..render.camera import CameraParams
    from ..render.integrator import _bounce_once
    from ..ops.intersect import closest_hit_brute
    from functools import partial

    params = CameraParams.from_config(cfg)
    derived = cam_mod.derive(cfg, params)
    n = min(batch, cfg.n_pixels)
    pix = jnp.arange(n, dtype=jnp.int32)
    samp = jnp.zeros(n, jnp.int32)
    o, d, t = cam_mod.generate_rays(cfg, derived, pix, samp, jnp.uint32(seed),
                                    motion_blur=scene.flags.has_moving)
    body = partial(_bounce_once, scene, jnp.asarray(cfg.background, jnp.float32),
                   jnp.uint32(seed), closest_hit_brute)
    state = (o, d, t, pix, samp, jnp.zeros((n, 3)), jnp.ones((n, 3)),
             jnp.ones(n, bool), jnp.zeros((), jnp.int32))
    fracs = []
    for bounce in range(cfg.max_depth):
        fracs.append(float(jnp.mean(state[7].astype(jnp.float32))))
        state = body(state, jnp.int32(bounce))
    return jnp.asarray(fracs)
