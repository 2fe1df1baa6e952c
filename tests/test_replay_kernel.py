"""Pallas fwd+bwd replay kernel vs the XLA replay paths.

Forward must be BIT-identical to replay_trace_fast (same scalar op
order); the hand-derived backward must match jax.grad of the XLA replay
to f32 reassociation tolerance. Runs the kernels in interpret mode on
the CPU CI backend.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracing_tpu.diff.replay import record_decisions, replay_trace
from raytracing_tpu.diff.replay_fast import replay_trace_fast, supported_fast
from raytracing_tpu.diff.replay_kernel import replay_trace_kernel
from raytracing_tpu.models.scenes import build
from raytracing_tpu.render import camera as cam_mod
from raytracing_tpu.render.camera import CameraParams

B_ALIGN = 2048


def _setup(name, depth=8, seed=5):
    # batch must be a 2048 multiple: pad pixels, padding lanes start dead
    scene, cfg = build(name, image_width=32, samples_per_pixel=1,
                       max_depth=depth)
    n_pix = cfg.n_pixels
    B = -(-n_pix // B_ALIGN) * B_ALIGN
    pix = jnp.minimum(jnp.arange(B, dtype=jnp.int32), n_pix - 1)
    smp = jnp.zeros((B,), jnp.int32)
    act0 = jnp.arange(B) < n_pix
    params = CameraParams.from_config(cfg)
    derived = cam_mod.derive(cfg, params)
    o, d, t = cam_mod.generate_rays(cfg, derived, pix, smp,
                                    jnp.uint32(seed),
                                    motion_blur=scene.flags.has_moving)
    bg = jnp.asarray(cfg.background, jnp.float32)
    ids = record_decisions(scene, o, d, t, pix, smp, bg, depth,
                           jnp.uint32(seed), active0=act0)
    return scene, ids, o, d, t, pix, smp, bg, depth, seed, act0


class TestReplayKernel:
    @pytest.mark.parametrize("name", [
        "three_spheres", "bouncing_spheres", "quads", "cornell_box",
    ])
    def test_forward_bit_identical(self, name):
        (scene, ids, o, d, t, pix, smp, bg, depth, seed,
         act0) = _setup(name)
        assert supported_fast(scene)
        want, wseg = replay_trace_fast(scene, ids, o, d, t, pix, smp, bg,
                                       depth, jnp.uint32(seed),
                                       active0=act0)
        got, gseg = replay_trace_kernel(scene, ids, o, d, t, pix, smp, bg,
                                        depth, jnp.uint32(seed),
                                        active0=act0)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        assert int(gseg) == int(wseg)

    @pytest.mark.parametrize("name", [
        "three_spheres", "bouncing_spheres", "cornell_box",
    ])
    def test_backward_matches_autodiff(self, name):
        (scene, ids, o, d, t, pix, smp, bg, depth, seed,
         act0) = _setup(name, depth=6)

        def loss(fn, center, vel, rad, rgb, qq):
            s = scene.replace(
                spheres=scene.spheres.replace(center=center, velocity=vel,
                                              radius=rad),
                textures=scene.textures.replace(rgb=rgb),
                quads=scene.quads.replace(q=qq),
            )
            out, _ = fn(s, ids, o, d, t, pix, smp, bg, depth,
                        jnp.uint32(seed), active0=act0)
            return jnp.sum(out * out)

        args = (scene.spheres.center, scene.spheres.velocity,
                scene.spheres.radius, scene.textures.rgb, scene.quads.q)
        g_ref = jax.grad(lambda *a: loss(replay_trace, *a),
                         argnums=(0, 1, 2, 3, 4))(*args)
        g_k = jax.grad(lambda *a: loss(replay_trace_kernel, *a),
                       argnums=(0, 1, 2, 3, 4))(*args)
        for gr, gk in zip(g_ref, g_k):
            np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                                       rtol=3e-5, atol=3e-6)

    def test_material_param_grads(self):
        """fuzz (metal) and ior (dielectric) gradients through the
        kernel's hand-written normalize/reflect/refract VJPs."""
        (scene, ids, o, d, t, pix, smp, bg, depth, seed,
         act0) = _setup("three_spheres", depth=6)

        def loss(fn, fuzz, ior):
            s = scene.replace(
                materials=scene.materials.replace(fuzz=fuzz, ior=ior))
            out, _ = fn(s, ids, o, d, t, pix, smp, bg, depth,
                        jnp.uint32(seed), active0=act0)
            return jnp.sum(out * out)

        args = (scene.materials.fuzz, scene.materials.ior)
        g_ref = jax.grad(lambda *a: loss(replay_trace, *a),
                         argnums=(0, 1))(*args)
        g_k = jax.grad(lambda *a: loss(replay_trace_kernel, *a),
                       argnums=(0, 1))(*args)
        for gr, gk in zip(g_ref, g_k):
            np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                                       rtol=3e-5, atol=3e-6)
