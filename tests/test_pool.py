"""Pool (regenerating wavefront) renderer vs the phased megakernel path.

Per-path radiance must be BIT-identical (same kernel math, same RNG
streams via the per-ray depth column); per-pixel sums re-associate, so
multi-sample images compare with a tight tolerance while 1-spp images
compare exactly. Segment counts are exact in all cases.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracing_tpu.models.scenes import build
from raytracing_tpu.ops.megakernel import build_mega_scene, trace_megakernel
from raytracing_tpu.render import camera as cam_mod
from raytracing_tpu.render import pool as pool_mod
from raytracing_tpu.render.camera import CameraParams
from raytracing_tpu.render.renderer import Renderer


def _phased_reference(scene, cfg, seed=3):
    """Per-pixel radiance sums + segments via the block megakernel in
    its phased form (the established, oracle-verified path)."""
    mega = build_mega_scene(scene)
    n_pix = cfg.n_pixels
    spp = cfg.samples_per_pixel
    npad = -(-n_pix // 1024) * 1024
    pix = jnp.tile(jnp.minimum(jnp.arange(npad, dtype=jnp.int32), n_pix - 1),
                   spp)
    smp = jnp.repeat(jnp.arange(spp, dtype=jnp.int32), npad)
    act0 = jnp.tile(jnp.arange(npad) < n_pix, spp)
    params = CameraParams.from_config(cfg)
    derived = cam_mod.derive(cfg, params)
    o, d, t = cam_mod.generate_rays(cfg, derived, pix, smp, jnp.uint32(seed),
                                    motion_blur=scene.flags.has_moving)
    rad, seg = trace_megakernel(
        mega, o, d, t, pix, smp, cfg.background, cfg.max_depth,
        jnp.uint32(seed), interpret=True, active0=act0, layout="block")
    rad = np.asarray(rad * act0[:, None].astype(jnp.float32))
    per_pix = rad.reshape(spp, npad, 3)[:, :n_pix].sum(axis=0)
    return per_pix, int(seg)


def _pool(scene, cfg, seed=3, **kw):
    mega = build_mega_scene(scene)
    params = CameraParams.from_config(cfg)
    kw.setdefault("pool_size", 2048)
    kw.setdefault("k_bounces", 2)
    rad, (lo, hi) = pool_mod.trace_pool(
        mega, cfg, params, jnp.uint32(seed), interpret=True,
        motion_blur=scene.flags.has_moving, **kw)
    seg = int(np.uint32(hi)) * (1 << 32) + int(np.uint32(lo))
    return np.asarray(rad), seg


class TestPool:
    def test_bit_identical_at_1spp(self):
        """spp=1: per-pixel sum == the single path — no re-association,
        so the pool must match the phased kernel bit for bit."""
        scene, cfg = build("three_spheres", image_width=32,
                           samples_per_pixel=1, max_depth=8)
        want, wseg = _phased_reference(scene, cfg)
        got, gseg = _pool(scene, cfg)
        np.testing.assert_array_equal(got, want)
        assert gseg == wseg

    def test_multi_sample_close_and_segments_exact(self):
        scene, cfg = build("three_spheres", image_width=24,
                           samples_per_pixel=4, max_depth=6)
        want, wseg = _phased_reference(scene, cfg)
        got, gseg = _pool(scene, cfg, k_bounces=3)
        assert gseg == wseg
        np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)

    def test_depth_cap_paths(self):
        """Enclosed scene at a low cap: many rays hit the per-ray depth
        cap inside the kernel (the pool-only code path)."""
        scene, cfg = build("cornell_box", image_width=16,
                           samples_per_pixel=2, max_depth=5)
        want, wseg = _phased_reference(scene, cfg)
        got, gseg = _pool(scene, cfg, k_bounces=2, pool_size=1024)
        assert gseg == wseg
        np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)

    def test_scatter_fold_matches_sort_fold(self):
        scene, cfg = build("quads", image_width=16, samples_per_pixel=2,
                           max_depth=4)
        a, sa = _pool(scene, cfg, fold="sort")
        b, sb = _pool(scene, cfg, fold="scatter")
        assert sa == sb
        np.testing.assert_array_equal(a, b)

    def test_moving_and_textured_scene(self):
        """bouncing_spheres: motion blur (time regen) + checker texture,
        the benchmark scene's feature set."""
        scene, cfg = build("bouncing_spheres", image_width=16,
                           samples_per_pixel=2, max_depth=6)
        want, wseg = _phased_reference(scene, cfg)
        got, gseg = _pool(scene, cfg, pool_size=1024, k_bounces=2)
        assert gseg == wseg
        np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)

    def test_renderer_pool_schedule(self, monkeypatch):
        """Renderer(schedule='pool') end-to-end on CPU (interpret), with
        a sample-window split forced via a tiny MAX_POOL_STREAM."""
        scene, cfg = build("three_spheres", image_width=16,
                           samples_per_pixel=4, max_depth=4)
        base = Renderer(cfg, hit_method="brute", mode="scan",
                        fused=False).render(scene, seed=3)
        monkeypatch.setattr(pool_mod, "MAX_POOL_STREAM",
                            cfg.n_pixels * 2 + 1)
        r = Renderer(cfg, schedule="pool", pool_size=1024)
        res = r.render(scene, seed=3)
        assert res.launches == 2
        assert res.segments == base.segments
        np.testing.assert_allclose(res.radiance, base.radiance,
                                   rtol=3e-6, atol=3e-6)

    def test_pool_u8_transfer_matches(self):
        """Pool transfer='u8' (single-window device quantize) produces
        the same u8 image and segment count as the f32 pool path."""
        scene, cfg = build("three_spheres", image_width=16,
                           samples_per_pixel=2, max_depth=4)
        rf = Renderer(cfg, schedule="pool", pool_size=1024).render(
            scene, seed=3)
        ru = Renderer(cfg, schedule="pool", pool_size=1024,
                      transfer="u8").render(scene, seed=3)
        assert ru.radiance is None and ru.u8 is not None
        assert ru.segments == rf.segments
        np.testing.assert_array_equal(ru.image_u8, rf.image_u8)
