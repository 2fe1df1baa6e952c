"""Pallas megakernel correctness (interpret mode on CPU): the in-kernel
bounce pipeline must reproduce the XLA wavefront integrator ray-for-ray
(identical RNG streams → identical sampling decisions)."""
import numpy as np
import jax.numpy as jnp
import pytest

from raytracing_tpu.models.scenes import build
from raytracing_tpu.ops.intersect import closest_hit_brute
from raytracing_tpu.ops.megakernel import BLOCK, build_mega_scene, trace_megakernel
from raytracing_tpu.render import camera as cam_mod
from raytracing_tpu.render.camera import CameraParams
from raytracing_tpu.render.integrator import trace


def _compare(name, depth=6, width=32, seed=3, mean_tol=1e-3, **scene_kwargs):
    scene, cfg = build(name, image_width=width, samples_per_pixel=1,
                       max_depth=depth, **scene_kwargs)
    mega = build_mega_scene(scene)
    assert mega.supported
    params = CameraParams.from_config(cfg)
    derived = cam_mod.derive(cfg, params)
    B = -(-cfg.n_pixels // BLOCK) * BLOCK
    pix = jnp.minimum(jnp.arange(B, dtype=jnp.int32), cfg.n_pixels - 1)
    smp = jnp.zeros(B, jnp.int32)
    o, d, t = cam_mod.generate_rays(
        cfg, derived, pix, smp, jnp.uint32(seed), motion_blur=scene.flags.has_moving
    )
    rad_ref, s_ref = trace(
        scene, o, d, t, pix, smp, jnp.asarray(cfg.background), depth,
        jnp.uint32(seed), hit_fn=closest_hit_brute,
    )
    rad_mk, s_mk = trace_megakernel(
        mega, o, d, t, pix, smp, cfg.background, depth, jnp.uint32(seed),
        interpret=True,
    )
    diff = np.abs(np.asarray(rad_ref) - np.asarray(rad_mk))
    assert diff.mean() < mean_tol, f"mean diff {diff.mean()}"
    # segment counts agree except rare f32 coin flips
    assert abs(int(s_ref) - int(s_mk)) <= max(4, int(s_ref) // 200)
    return diff


class TestMegakernel:
    def test_three_spheres_exact(self):
        diff = _compare("three_spheres", depth=8)
        assert diff.max() < 1e-5  # pure-sphere path is bit-stable

    def test_cornell_box_exact(self):
        diff = _compare("cornell_box", depth=6)
        assert diff.max() < 1e-5  # quads + emission + black bg

    def test_quads(self):
        _compare("quads", depth=4)

    def test_checkered_spheres(self):
        _compare("checkered_spheres", depth=4)

    def test_bouncing_spheres_full_stack(self):
        # checker + motion blur + metal + dielectric + BVH-scale scene
        _compare("bouncing_spheres", depth=5, mean_tol=2e-3)

    @pytest.mark.parametrize("mode", [True, "frustum", "list"])
    def test_clustered_sweep_bitmatches_plain(self, mode):
        """The cluster-culling sweeps (use_clusters: vector slab test and
        scalar cone test) must be invisible: same per-primitive math in
        the same order, skipped clusters provably cannot win →
        bit-identical radiance and segments."""
        from raytracing_tpu.render import camera as cam_mod

        scene, cfg = build("bouncing_spheres", image_width=16,
                           samples_per_pixel=1, max_depth=5)
        mega = build_mega_scene(scene)
        assert mega.sph_cluster_boxes is not None
        params = CameraParams.from_config(cfg)
        derived = cam_mod.derive(cfg, params)
        B = -(-cfg.n_pixels // BLOCK) * BLOCK
        pix = jnp.minimum(jnp.arange(B, dtype=jnp.int32), cfg.n_pixels - 1)
        smp = jnp.zeros(B, jnp.int32)
        o, d, t = cam_mod.generate_rays(
            cfg, derived, pix, smp, jnp.uint32(3),
            motion_blur=scene.flags.has_moving,
        )
        args = (mega, o, d, t, pix, smp, cfg.background, 5, jnp.uint32(3))
        r_pl, s_pl = trace_megakernel(*args, interpret=True,
                                      use_clusters=False)
        r_cl, s_cl = trace_megakernel(*args, interpret=True,
                                      use_clusters=mode)
        np.testing.assert_array_equal(np.asarray(r_pl), np.asarray(r_cl))
        assert int(s_pl) == int(s_cl)

    @pytest.mark.parametrize("name,phases,sort_mode", [
        ("cornell_box", [2, 2, 2], "alive"),      # emissive: exercises the
        ("cornell_box", [3, 3], "coherent"),      # radiance set-aside sum
        ("bouncing_spheres", [2, 2, 2], "alive"),
        ("bouncing_spheres", [2, 4], "coherent"),
    ])
    def test_phase_compaction_matches_single_phase(self, name, phases,
                                                   sort_mode):
        """Inter-phase compaction (slimmed unique-key sort, act re-derived
        from the key, phase-1 radiance set aside and re-added after the
        final unpermute) must be invisible: same decisions → same segments
        exactly; radiance equal up to fp re-association of per-phase
        partial sums."""
        depth = sum(phases)
        scene, cfg = build(name, image_width=16, samples_per_pixel=1,
                           max_depth=depth)
        mega = build_mega_scene(scene)
        B = -(-cfg.n_pixels // BLOCK) * BLOCK
        pix = jnp.minimum(jnp.arange(B, dtype=jnp.int32), cfg.n_pixels - 1)
        smp = jnp.zeros(B, jnp.int32)
        params = CameraParams.from_config(cfg)
        derived = cam_mod.derive(cfg, params)
        o, d, t = cam_mod.generate_rays(
            cfg, derived, pix, smp, jnp.uint32(5),
            motion_blur=scene.flags.has_moving,
        )
        args = (mega, o, d, t, pix, smp, cfg.background, depth,
                jnp.uint32(5))
        r_one, s_one = trace_megakernel(*args, interpret=True)
        r_ph, s_ph = trace_megakernel(*args, interpret=True,
                                      phase_depths=phases,
                                      sort_mode=sort_mode)
        assert int(s_one) == int(s_ph)
        diff = np.abs(np.asarray(r_one) - np.asarray(r_ph))
        assert diff.max() < 1e-5, f"max diff {diff.max()}"

    def test_regional_compaction_matches_global(self):
        """sort_regions=R compacts within R independent lane regions;
        rays are independent, so per-ray radiance and segment counts are
        bit-identical to the global sort."""
        scene, cfg = build("bouncing_spheres", image_width=16,
                           samples_per_pixel=1, max_depth=8)
        mega = build_mega_scene(scene)
        B = -(-cfg.n_pixels // BLOCK) * BLOCK
        pix = jnp.minimum(jnp.arange(B, dtype=jnp.int32), cfg.n_pixels - 1)
        smp = jnp.zeros(B, jnp.int32)
        params = CameraParams.from_config(cfg)
        derived = cam_mod.derive(cfg, params)
        o, d, t = cam_mod.generate_rays(
            cfg, derived, pix, smp, jnp.uint32(5),
            motion_blur=scene.flags.has_moving,
        )
        args = (mega, o, d, t, pix, smp, cfg.background, 8, jnp.uint32(5))
        r_g, s_g = trace_megakernel(*args, interpret=True,
                                    phase_depths=[2, 3, 3])
        r_r, s_r = trace_megakernel(*args, interpret=True,
                                    phase_depths=[2, 3, 3],
                                    sort_regions=B // BLOCK)
        assert int(s_g) == int(s_r)
        np.testing.assert_array_equal(np.asarray(r_g), np.asarray(r_r))

    def test_phase_prefixes_exact_and_flagged(self):
        """Static live-prefix tail phases: with prefixes covering every
        live ray the render is bit-identical (radiance, segments, ids,
        counts) and ok=True; an undersized prefix flips ok to False."""
        scene, cfg = build("bouncing_spheres", image_width=32,
                           samples_per_pixel=2, max_depth=8)
        mega = build_mega_scene(scene)
        n_pix = cfg.n_pixels
        npad = -(-n_pix // BLOCK) * BLOCK
        B = npad * 2
        pix = jnp.tile(jnp.minimum(jnp.arange(npad, dtype=jnp.int32),
                                   n_pix - 1), 2)
        smp = jnp.repeat(jnp.arange(2, dtype=jnp.int32), npad)
        act0 = jnp.tile(jnp.arange(npad) < n_pix, 2)
        params = CameraParams.from_config(cfg)
        derived = cam_mod.derive(cfg, params)
        o, d, t = cam_mod.generate_rays(
            cfg, derived, pix, smp, jnp.uint32(5),
            motion_blur=scene.flags.has_moving,
        )
        args = (mega, o, d, t, pix, smp, cfg.background, 8, jnp.uint32(5))
        kw = dict(interpret=True, phase_depths=[2, 3, 3], active0=act0,
                  want_ids=True, want_counts=True)
        r0, s0, ids0, cnt0 = trace_megakernel(*args, **kw)
        # exact live counts after 2 and 5 bounces -> minimal valid prefixes
        live2 = int((np.asarray(cnt0) > 2).sum())
        live5 = int((np.asarray(cnt0) > 5).sum())
        p2 = max(BLOCK, -(-live2 // BLOCK) * BLOCK)
        p5 = max(BLOCK, -(-live5 // BLOCK) * BLOCK)
        assert p2 < B, "test needs a shrinking live set"
        r1, s1, ids1, cnt1, ok = trace_megakernel(
            *args, **kw, phase_prefixes=(None, p2, p5))
        assert bool(ok)
        assert int(s0) == int(s1)
        np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))
        np.testing.assert_array_equal(np.asarray(ids0), np.asarray(ids1))
        np.testing.assert_array_equal(np.asarray(cnt0), np.asarray(cnt1))
        # undersized prefix must be flagged
        if p2 > BLOCK:
            *_, ok_bad = trace_megakernel(
                *args, **kw, phase_prefixes=(None, p2 - BLOCK, p5))
            assert not bool(ok_bad)

    def test_atan2f_polynomial_accuracy(self):
        """The in-kernel atan2 (Mosaic TC has no arctan2 lowering) must
        match numpy to <5e-7 rad over random inputs and be exact on the
        axes/zero cases the sphere-UV computation hits."""
        from raytracing_tpu.ops.megakernel_block import _atan2f

        rng = np.random.default_rng(0)
        y = jnp.asarray(rng.normal(size=100000).astype(np.float32)) * 10
        x = jnp.asarray(rng.normal(size=100000).astype(np.float32)) * 10
        err = np.abs(np.asarray(_atan2f(y, x))
                     - np.arctan2(np.asarray(y), np.asarray(x)))
        assert err.max() < 5e-7, err.max()
        for yy, xx in [(0.0, 1.0), (0.0, -1.0), (1.0, 0.0), (-1.0, 0.0),
                       (0.0, 0.0)]:
            got = float(_atan2f(jnp.float32(yy), jnp.float32(xx)))
            assert abs(got - float(np.arctan2(yy, xx))) < 1e-6, (yy, xx)

    def test_renderer_phase_prefixes(self):
        """Renderer(phase_prefixes=...) must render bit-identically to the
        plain renderer and surface the validity flag as RenderResult.ok."""
        from raytracing_tpu.render.renderer import Renderer

        scene, cfg = build("bouncing_spheres", image_width=32,
                           samples_per_pixel=2, max_depth=8)
        mega = build_mega_scene(scene)
        # replicate the renderer's single-launch sample-major ray stream
        # to get exact per-ray lengths for a minimal valid prefix plan
        n_pix = cfg.n_pixels
        npad = -(-n_pix // BLOCK) * BLOCK
        pix = jnp.tile(jnp.minimum(jnp.arange(npad, dtype=jnp.int32),
                                   n_pix - 1), 2)
        smp = jnp.repeat(jnp.arange(2, dtype=jnp.int32), npad)
        act0 = jnp.tile(jnp.arange(npad) < n_pix, 2)
        derived = cam_mod.derive(cfg, CameraParams.from_config(cfg))
        o, d, t = cam_mod.generate_rays(
            cfg, derived, pix, smp, jnp.uint32(3),
            motion_blur=scene.flags.has_moving)
        _, _, cnt = trace_megakernel(
            mega, o, d, t, pix, smp, cfg.background, 8, jnp.uint32(3),
            interpret=True, phase_depths=[2, 3, 3], active0=act0,
            want_counts=True)
        B = npad * 2
        p2 = max(BLOCK, -(-int((np.asarray(cnt) > 2).sum()) // BLOCK) * BLOCK)
        p5 = max(BLOCK, -(-int((np.asarray(cnt) > 5).sum()) // BLOCK) * BLOCK)

        kw = dict(hit_method="mega", mode="while",
                  phase_depths=[2, 3, 3], max_rays_per_launch=B)
        r_plain = Renderer(cfg, **kw).render(scene, seed=3)
        r_pref = Renderer(cfg, **kw, phase_prefixes=(None, p2, p5)).render(
            scene, seed=3)
        assert r_plain.ok is None and r_pref.ok is True
        assert r_plain.segments == r_pref.segments
        np.testing.assert_array_equal(np.asarray(r_plain.radiance),
                                      np.asarray(r_pref.radiance))

        # an undersized prefix must RAISE by default (strict_prefixes):
        # RenderResult.ok=False means paths were silently dropped
        if p2 > BLOCK:
            import pytest

            bad = (None, p2 - BLOCK, p5)
            with pytest.raises(RuntimeError, match="phase_prefixes"):
                Renderer(cfg, **kw, phase_prefixes=bad).render(scene, seed=3)
            # ... and be surfaced, not raised, under the explicit opt-out
            r_bad = Renderer(cfg, **kw, phase_prefixes=bad,
                             strict_prefixes=False).render(scene, seed=3)
            assert r_bad.ok is False


class TestInKernelBVH:
    """The stackless chunked-BVH walk inside the megakernel
    (ops/mega_bvh.py + intersect_bvh) against both the in-kernel dense
    sweep and the XLA skip-link traversal (ops/traverse.py)."""

    def _rays(self, name, depth, seed=3, width=32, **kw):
        scene, cfg = build(name, image_width=width, samples_per_pixel=1,
                           max_depth=depth, **kw)
        mega = build_mega_scene(scene)
        params = CameraParams.from_config(cfg)
        derived = cam_mod.derive(cfg, params)
        B = BLOCK
        pix = jnp.minimum(jnp.arange(B, dtype=jnp.int32), cfg.n_pixels - 1)
        smp = jnp.zeros(B, jnp.int32)
        o, d, t = cam_mod.generate_rays(
            cfg, derived, pix, smp, jnp.uint32(seed),
            motion_blur=scene.flags.has_moving,
        )
        return scene, cfg, mega, o, d, t, pix, smp

    def test_bvh_bitmatches_brute_bouncing_spheres(self):
        """Same kernel, walk vs dense sweep: identical math order per
        candidate → bit-identical radiance and segment counts."""
        scene, cfg, mega, o, d, t, pix, smp = self._rays("bouncing_spheres", 8)
        args = (mega, o, d, t, pix, smp, cfg.background, 8, jnp.uint32(3))
        r_bvh, s_bvh = trace_megakernel(*args, interpret=True, use_bvh=True)
        # layout="group": the brute side must run the SAME kernel as the
        # walk (the block kernel's a·t-space sweep is rounding-different)
        r_brt, s_brt = trace_megakernel(*args, interpret=True, use_bvh=False,
                                        layout="group")
        np.testing.assert_array_equal(np.asarray(r_bvh), np.asarray(r_brt))
        assert int(s_bvh) == int(s_brt)

    def test_bvh_matches_xla_traversal(self):
        """Against the independent XLA lockstep skip-link walk
        (closest_hit_bvh) driving the XLA integrator — different code path
        and op order, so tolerance-level (stochastic coin flips possible)."""
        from raytracing_tpu.ops.traverse import closest_hit_bvh

        scene, cfg, mega, o, d, t, pix, smp = self._rays("bouncing_spheres", 6)
        r_mk, s_mk = trace_megakernel(
            mega, o, d, t, pix, smp, cfg.background, 6, jnp.uint32(3),
            interpret=True, use_bvh=True,
        )
        r_ref, s_ref = trace(
            scene, o, d, t, pix, smp, jnp.asarray(cfg.background), 6,
            jnp.uint32(3), hit_fn=closest_hit_bvh,
        )
        diff = np.abs(np.asarray(r_mk) - np.asarray(r_ref))
        assert diff.mean() < 2e-3
        assert abs(int(s_mk) - int(s_ref)) <= max(4, int(s_ref) // 200)

    def test_bvh_quad_scene(self):
        """Quad leaf chunks: cornell forced through the walk (it defaults
        to the dense sweep at 3 chunks)."""
        scene, cfg, mega, o, d, t, pix, smp = self._rays("cornell_box", 5)
        args = (mega, o, d, t, pix, smp, cfg.background, 5, jnp.uint32(3))
        r_bvh, s_bvh = trace_megakernel(*args, interpret=True, use_bvh=True)
        r_brt, s_brt = trace_megakernel(*args, interpret=True, use_bvh=False,
                                        layout="group")
        np.testing.assert_array_equal(np.asarray(r_bvh), np.asarray(r_brt))
        assert int(s_bvh) == int(s_brt)

    def test_bvh_mixed_scene(self):
        """Spheres + quads + emissive (simple-light geometry but with solid
        textures so the megakernel supports it)."""
        from raytracing_tpu.scene.builder import SceneBuilder
        from raytracing_tpu.render.camera import CameraConfig

        b = SceneBuilder()
        ground = b.lambertian((0.6, 0.6, 0.2))
        b.sphere((0, -1000, 0), 1000.0, ground)
        for i in range(24):
            b.sphere((i % 6 * 2 - 5, 0.5, i // 6 * 2 - 3), 0.5,
                     b.lambertian((0.2 + 0.03 * i, 0.4, 0.6)))
        light = b.diffuse_light((4.0, 4.0, 4.0))
        b.quad((3, 1, -2), (2, 0, 0), (0, 2, 0), light)
        b.sphere((0, 7, 0), 2.0, light)
        scene = b.compile()
        cfg = CameraConfig(image_width=32, aspect_ratio=1.0,
                           samples_per_pixel=1, max_depth=6,
                           vfov=20.0, lookfrom=(26.0, 3.0, 6.0),
                           lookat=(0.0, 2.0, 0.0),
                           background=(0.0, 0.0, 0.0))
        mega = build_mega_scene(scene)
        assert mega.n_sph_chunks > 0 and mega.n_quad_chunks > 0
        params = CameraParams.from_config(cfg)
        derived = cam_mod.derive(cfg, params)
        pix = jnp.minimum(jnp.arange(BLOCK, dtype=jnp.int32), cfg.n_pixels - 1)
        smp = jnp.zeros(BLOCK, jnp.int32)
        o, d, t = cam_mod.generate_rays(cfg, derived, pix, smp, jnp.uint32(5),
                                        motion_blur=False)
        args = (mega, o, d, t, pix, smp, cfg.background, 6, jnp.uint32(5))
        r_bvh, s_bvh = trace_megakernel(*args, interpret=True, use_bvh=True)
        r_brt, s_brt = trace_megakernel(*args, interpret=True, use_bvh=False,
                                        layout="group")
        np.testing.assert_array_equal(np.asarray(r_bvh), np.asarray(r_brt))
        assert int(s_bvh) == int(s_brt)

    def test_perlin_sphere_marble(self):
        # In-kernel 7-octave marble vs the XLA perlin path. A handful of
        # rays hit lattice-cell flips from last-ulp hit-point differences
        # (floor() at octave-7 frequencies), so only the mean is tight.
        _compare("perlin_sphere", depth=3, mean_tol=1e-3)

    def test_earth_image_texture(self):
        # Packed-atlas nearest-texel fetch: bit-exact vs the XLA gather.
        diff = _compare("earth", depth=3)
        assert diff.max() < 1e-5

    def test_simple_light_noise_plus_emission(self):
        _compare("simple_light", depth=4, mean_tol=1e-3)

    def test_all_registry_scenes_supported(self):
        """VERDICT r1 item 3: every reference scene runs the fast path —
        noise (marble) and image textures are now evaluated in-kernel."""
        from raytracing_tpu.models.scenes import SCENES

        for name in SCENES:
            scene, _ = build(name, image_width=16, samples_per_pixel=1)
            assert build_mega_scene(scene).supported, name

    def _earth_like_scene(self, h, w, quantize=True):
        from raytracing_tpu.scene import assets
        from raytracing_tpu.scene.builder import SceneBuilder
        from raytracing_tpu.render.camera import CameraConfig

        img = assets.generate_earthlike(h, w)
        if not quantize:
            img = img + np.float32(1e-4)  # not u8/255-representable
        b = SceneBuilder()
        b.sphere((0.0, 0.0, 0.0), 2.0, b.lambertian(b.image(img)))
        cfg = CameraConfig(aspect_ratio=16 / 9, image_width=32,
                           samples_per_pixel=1, max_depth=3,
                           background=(0.7, 0.8, 1.0), vfov=20,
                           lookfrom=(0, 0, 12), lookat=(0, 0, 0))
        return b.compile(), cfg

    def test_packed_atlas_tier_bit_exact(self):
        """Images past MAX_KERNEL_TEXELS now run the u8-PACKED kernel
        tier ((1, T) int32 atlas, round 5) instead of falling back to
        the XLA integrator — bit-exact vs the XLA gather since the
        in-kernel u8→f32 reconstruction matches the loader's."""
        from raytracing_tpu.scene import flatten as fl

        scene, cfg = self._earth_like_scene(144, 160)  # 23040 > 16384
        mega = build_mega_scene(scene)
        assert mega.supported
        assert mega.atlas_rep.dtype == jnp.int32  # packed tier chosen
        params = CameraParams.from_config(cfg)
        derived = cam_mod.derive(cfg, params)
        B = -(-cfg.n_pixels // BLOCK) * BLOCK
        pix = jnp.minimum(jnp.arange(B, dtype=jnp.int32), cfg.n_pixels - 1)
        smp = jnp.zeros(B, jnp.int32)
        o, d, t = cam_mod.generate_rays(cfg, derived, pix, smp,
                                        jnp.uint32(3), motion_blur=False)
        rad_ref, s_ref = trace(
            scene, o, d, t, pix, smp, jnp.asarray(cfg.background), 3,
            jnp.uint32(3), hit_fn=closest_hit_brute)
        rad_mk, s_mk = trace_megakernel(
            mega, o, d, t, pix, smp, cfg.background, 3, jnp.uint32(3),
            interpret=True)
        diff = np.abs(np.asarray(rad_ref) - np.asarray(rad_mk))
        assert diff.max() < 1e-5, diff.max()
        assert int(s_ref) == int(s_mk)

    def test_oversized_image_falls_back(self):
        """Atlases past MAX_PACKED_TEXELS — or float atlases past
        MAX_KERNEL_TEXELS that aren't u8/255-representable — keep the
        XLA path (a non-u8 atlas can't use the packed tier losslessly)."""
        from raytracing_tpu.scene.builder import SceneBuilder

        b = SceneBuilder()
        big = np.zeros((1200, 2048, 3), np.float32)  # 2.46M > 2^21
        b.sphere((0, 0, 0), 2.0, b.lambertian(b.image(big)))
        assert not build_mega_scene(b.compile()).supported

        scene, _ = self._earth_like_scene(256, 512, quantize=False)
        assert not build_mega_scene(scene).supported

    def test_renderer_integration(self):
        from raytracing_tpu.render.renderer import render

        scene, cfg = build("three_spheres", image_width=64, samples_per_pixel=4, max_depth=5)
        # interpret-mode megakernel through the public Renderer API
        import raytracing_tpu.ops.megakernel as mk
        from functools import partial

        ref = render(scene, cfg, seed=2, hit_method="brute").radiance
        orig = mk.trace_megakernel
        try:
            mk.trace_megakernel = partial(orig, interpret=True)
            got = render(scene, cfg, seed=2, hit_method="mega").radiance
        finally:
            mk.trace_megakernel = orig
        diff = np.abs(got - ref)
        # a handful of stochastic-coin flips (rsqrt rounding) are expected
        assert (diff.max(axis=-1) > 2e-2).mean() < 0.005
        assert diff.mean() < 1e-3

    def test_renderer_phased_regen_matches_single_phase(self):
        """Through the Renderer (which supplies the tm/pix/smp ``regen``
        hook): phased compaction on a moving-sphere scene must reproduce
        the single-phase render — the recomputed time column must be
        bit-identical to the generate_rays stream."""
        from raytracing_tpu.render.renderer import Renderer
        import raytracing_tpu.ops.megakernel as mk
        from functools import partial

        scene, cfg = build("bouncing_spheres", image_width=24,
                           samples_per_pixel=2, max_depth=8)
        assert scene.flags.has_moving
        orig = mk.trace_megakernel
        try:
            mk.trace_megakernel = partial(orig, interpret=True)
            r1 = Renderer(cfg, hit_method="mega", phase_depths=[8])
            one = r1.render(scene, seed=6)
            r2 = Renderer(cfg, hit_method="mega", phase_depths=[2, 3, 3])
            ph = r2.render(scene, seed=6)
        finally:
            mk.trace_megakernel = orig
        assert one.segments == ph.segments
        diff = np.abs(one.radiance - ph.radiance)
        assert diff.max() < 1e-5, f"max diff {diff.max()}"

    def test_renderer_u8_transfer_matches_f32(self):
        """transfer="u8" (device-side quantization, bench fast path) must
        produce exactly the bytes the f32 path quantizes to on host."""
        from raytracing_tpu.render.renderer import Renderer
        import raytracing_tpu.ops.megakernel as mk
        from functools import partial

        scene, cfg = build("three_spheres", image_width=64,
                           samples_per_pixel=2, max_depth=4)
        orig = mk.trace_megakernel
        try:
            mk.trace_megakernel = partial(orig, interpret=True)
            f32 = Renderer(cfg, hit_method="mega").render(scene, seed=3)
            u8 = Renderer(cfg, hit_method="mega",
                          transfer="u8").render(scene, seed=3)
        finally:
            mk.trace_megakernel = orig
        assert u8.radiance is None and u8.u8 is not None
        assert u8.segments == f32.segments
        np.testing.assert_array_equal(u8.image_u8, f32.image_u8)


class TestTransferModes:
    def test_fused_u8_blob_matches_f32(self):
        """transfer='u8' (single blob: image bytes + bitcast per-launch
        segment counts) must reproduce the f32 path's image and exact
        segment count through the fused renderer."""
        from raytracing_tpu.render.renderer import Renderer

        scene, cfg = build("three_spheres", image_width=48,
                           samples_per_pixel=4, max_depth=5)
        kw = dict(hit_method="mega", mode="while",
                  max_rays_per_launch=2048)  # multiple launches
        rf = Renderer(cfg, **kw).render(scene, seed=3)
        ru = Renderer(cfg, **kw, transfer="u8").render(scene, seed=3)
        assert ru.segments == rf.segments and rf.launches == ru.launches
        assert ru.launches > 1
        np.testing.assert_array_equal(ru.image_u8, rf.image_u8)
