"""Pipeline-parallel (bounce-staged) rendering vs the single-device
integrator: bit-identical per-path radiance and equal segment counts
(parallel/pp.py; SURVEY.md §2.9 PP row)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracing_tpu.models.scenes import build
from raytracing_tpu.parallel.mesh import make_mesh
from raytracing_tpu.parallel.pp import build_pp_renderer
from raytracing_tpu.render import camera as cam_mod
from raytracing_tpu.render.camera import CameraParams
from raytracing_tpu.render.integrator import trace


def _reference_stream(scene, cfg, seed):
    """The same sample-major padded ray stream pp renders, traced on one
    device."""
    B = -(-cfg.n_pixels // 1024) * 1024
    spp = cfg.samples_per_pixel
    lane = jnp.arange(B * spp, dtype=jnp.int32)
    pix = jnp.minimum(lane % B, cfg.n_pixels - 1)
    smp = lane // B
    derived = cam_mod.derive(cfg, CameraParams.from_config(cfg))
    o, d, t = cam_mod.generate_rays(
        cfg, derived, pix, smp, jnp.uint32(seed),
        motion_blur=scene.flags.has_moving)
    act = (lane % B) < cfg.n_pixels
    return trace(scene, o, d, t, pix, smp,
                 jnp.asarray(cfg.background, jnp.float32),
                 cfg.max_depth, jnp.uint32(seed), active0=act)


@pytest.mark.parametrize("n_stages,depth", [(2, 6), (4, 7)])
def test_pp_matches_single_device(n_stages, depth):
    devs = jax.devices()
    if len(devs) < n_stages:
        pytest.skip(f"need {n_stages} devices")
    scene, cfg = build("three_spheres", image_width=16,
                       samples_per_pixel=4, max_depth=depth)
    mesh = make_mesh((n_stages,), ("pp",), devices=devs[:n_stages])
    fn, n_rays_pad, n_micro = build_pp_renderer(scene, cfg, mesh)
    params = CameraParams.from_config(cfg)
    rad, segs = fn(scene, params, 5)
    rad_ref, segs_ref = _reference_stream(scene, cfg, 5)
    assert int(segs) == int(segs_ref)
    np.testing.assert_array_equal(np.asarray(rad),
                                  np.asarray(rad_ref))
    assert n_micro > 1  # the pipe actually streamed microbatches


def test_pp_emissive_scene():
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("need 2 devices")
    scene, cfg = build("simple_light", image_width=16,
                       samples_per_pixel=2, max_depth=5)
    mesh = make_mesh((2,), ("pp",), devices=devs[:2])
    fn, _, _ = build_pp_renderer(scene, cfg, mesh)
    rad, segs = fn(scene, CameraParams.from_config(cfg), 3)
    rad_ref, segs_ref = _reference_stream(scene, cfg, 3)
    assert int(segs) == int(segs_ref)
    # marble noise tolerance: the traced (vs constant) bounce index under
    # shard_map lets XLA fuse the 7-octave turbulence differently (FMA
    # contraction), and the 10x turb factor amplifies the last-ulp
    # differences through sin — geometry/paths are identical (equal
    # segment counts); three_spheres above matches bit-for-bit.
    np.testing.assert_allclose(np.asarray(rad), np.asarray(rad_ref),
                               atol=5e-4)
