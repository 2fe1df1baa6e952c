"""Inverse-rendering optimization loops (optax) over scene/camera params.

Demonstrates the differentiable path end-to-end: fit sphere positions/
albedos (or camera pose) to a target image by gradient descent. Optimizer
state checkpointing goes through utils/checkpoint.py (orbax-compatible
pytrees).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..render.camera import CameraConfig, CameraParams
from ..scene.types import Scene
from .gradients import mse_loss


def fit_scene(
    scene: Scene,
    target: jnp.ndarray,
    cfg: CameraConfig,
    param_filter: Callable[[Scene], Any],
    apply_update: Callable[[Scene, Any], Scene],
    steps: int = 100,
    lr: float = 1e-2,
    seed: int = 0,
    reseed_every_step: bool = True,
    optimizer: Optional[optax.GradientTransformation] = None,
    **render_kwargs,
) -> Tuple[Scene, jnp.ndarray]:
    """Generic scene-fitting loop.

    ``param_filter(scene)`` extracts the optimized sub-pytree;
    ``apply_update(scene, new_params)`` writes it back. Returns the fitted
    scene and the loss history.

    ``reseed_every_step`` decorrelates the Monte Carlo noise across steps
    (stochastic optimization; loss floor = MC variance). Disable it to fit
    against a target rendered with the *same* seed — the loss then goes to
    ~0 (useful for validation).
    """
    opt = optimizer or optax.adam(lr)
    params0 = param_filter(scene)
    opt_state = opt.init(params0)

    @jax.jit
    def step(params, opt_state, k):
        def loss_fn(p):
            s = seed + k if reseed_every_step else seed
            return mse_loss(apply_update(scene, p), target, cfg, seed=s, **render_kwargs)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params = params0
    losses = []
    for k in range(steps):
        params, opt_state, loss = step(params, opt_state, jnp.int32(k))
        losses.append(float(loss))
    return apply_update(scene, params), jnp.asarray(losses)


def fit_sphere_params(scene: Scene, target, cfg, steps=100, lr=1e-2, **kw):
    """Convenience: optimize sphere centers + radii."""
    def get(s):
        return (s.spheres.center, s.spheres.radius)

    def put(s, p):
        return s.replace(spheres=s.spheres.replace(center=p[0], radius=p[1]))

    return fit_scene(scene, target, cfg, get, put, steps=steps, lr=lr, **kw)


def fit_albedo(scene: Scene, target, cfg, steps=100, lr=5e-2, **kw):
    """Convenience: optimize the texture RGB table (albedos/emission)."""
    def get(s):
        return s.textures.rgb

    def put(s, p):
        return s.replace(textures=s.textures.replace(rgb=p))

    return fit_scene(scene, target, cfg, get, put, steps=steps, lr=lr, **kw)
