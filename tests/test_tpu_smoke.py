"""TPU-only smoke tests (skipped on CPU CI; run manually on hardware).

The key canary guards MXU-precision regressions: if any hot dot product
lowers to the MXU at bf16 default precision, Cornell-box light transport
collapses (fraction of lit pixels drops ~5x) — see ops/intersect.py quad_ts.
"""
import numpy as np
import jax
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu",) and "axon" not in str(jax.devices()[0]).lower(),
    reason="TPU-only smoke test",
)


def test_cornell_light_transport_canary():
    from raytracing_tpu.diff.gradients import render_once
    from raytracing_tpu.models.scenes import build

    scene, cfg = build("cornell_box", image_width=64, samples_per_pixel=16, max_depth=16)
    img = np.asarray(jax.jit(lambda: render_once(scene, cfg, seed=0, remat=False))())
    lit = (img.max(-1) > 0).mean()
    assert 0.25 < lit < 0.6, f"lit-pixel fraction {lit}: TPU precision regression?"


@pytest.mark.parametrize("name", [
    "three_spheres", "cornell_box", "quads", "checkered_spheres",
    "bouncing_spheres", "perlin_sphere", "earth", "simple_light",
])
def test_megakernel_matches_xla_on_hardware(name):
    """Compiled (Mosaic) megakernel vs the XLA integrator on the real chip,
    per scene — catches Mosaic-specific miscompiles that interpret-mode CI
    cannot (the exact bug class catalogued in ops/megakernel.py's
    docstring). Tolerance-level: the two paths order float ops differently,
    so rare stochastic-decision flips are expected."""
    import jax.numpy as jnp

    from raytracing_tpu.models.scenes import build
    from raytracing_tpu.ops.intersect import closest_hit_brute
    from raytracing_tpu.ops.megakernel import BLOCK, build_mega_scene, trace_megakernel
    from raytracing_tpu.render import camera as cam_mod
    from raytracing_tpu.render.camera import CameraParams
    from raytracing_tpu.render.integrator import trace

    depth = 6
    scene, cfg = build(name, image_width=32, samples_per_pixel=1, max_depth=depth)
    mega = build_mega_scene(scene)
    assert mega.supported, name
    params = CameraParams.from_config(cfg)
    derived = cam_mod.derive(cfg, params)
    pix = jnp.minimum(jnp.arange(BLOCK, dtype=jnp.int32), cfg.n_pixels - 1)
    smp = jnp.zeros(BLOCK, jnp.int32)
    o, d, t = cam_mod.generate_rays(
        cfg, derived, pix, smp, jnp.uint32(3), motion_blur=scene.flags.has_moving
    )
    r_ref, s_ref = jax.jit(lambda: trace(
        scene, o, d, t, pix, smp, jnp.asarray(cfg.background), depth,
        jnp.uint32(3), hit_fn=closest_hit_brute,
    ))()
    r_mk, s_mk = jax.jit(lambda: trace_megakernel(
        mega, o, d, t, pix, smp, cfg.background, depth, jnp.uint32(3)
    ))()
    diff = np.abs(np.asarray(r_ref) - np.asarray(r_mk))
    assert diff.mean() < 2e-3, f"{name}: mean diff {diff.mean()}"
    assert abs(int(s_ref) - int(s_mk)) <= max(4, int(s_ref) // 200), name


@pytest.mark.parametrize("kw", [
    dict(phase_depths=[2, 3, 3]),
    dict(phase_depths=[2, 3, 3], sort_regions=2),
    dict(phase_depths=[2, 6], sort_mode="coherent"),
    dict(use_clusters="list"),
])
def test_phased_compaction_on_hardware(kw):
    """Compiled phased compaction (slimmed TPU sorts, regional variant,
    coherent keys, survivor-list sweep) vs the single-phase kernel on the
    real chip: segments must match exactly, radiance to fp re-association.
    The compaction path is pure XLA so CPU CI covers its semantics; this
    guards the TPU sort/Mosaic lowering specifically."""
    import jax.numpy as jnp

    from raytracing_tpu.models.scenes import build
    from raytracing_tpu.ops.megakernel import BLOCK, build_mega_scene, trace_megakernel
    from raytracing_tpu.render import camera as cam_mod
    from raytracing_tpu.render.camera import CameraParams

    depth = 8
    scene, cfg = build("bouncing_spheres", image_width=32,
                       samples_per_pixel=1, max_depth=depth)
    mega = build_mega_scene(scene)
    params = CameraParams.from_config(cfg)
    derived = cam_mod.derive(cfg, params)
    B = 2 * BLOCK
    pix = jnp.minimum(jnp.arange(B, dtype=jnp.int32), cfg.n_pixels - 1)
    smp = jnp.zeros(B, jnp.int32)
    o, d, t = cam_mod.generate_rays(
        cfg, derived, pix, smp, jnp.uint32(3),
        motion_blur=scene.flags.has_moving,
    )
    args = (mega, o, d, t, pix, smp, cfg.background, depth, jnp.uint32(3))
    r_one, s_one = jax.jit(lambda: trace_megakernel(*args))()
    r_ph, s_ph = jax.jit(lambda: trace_megakernel(*args, **kw))()
    assert int(s_one) == int(s_ph), kw
    diff = np.abs(np.asarray(r_one) - np.asarray(r_ph))
    assert diff.max() < 1e-5, f"{kw}: max diff {diff.max()}"
