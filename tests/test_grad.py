"""Gradient correctness: jax.grad vs central finite differences
(SURVEY.md §4.3; BASELINE.md correctness row).

Contract being tested (see diff/gradients.py docstring): *pathwise interior*
gradients. Geometry/camera gradients exist only through continuous shading —
so these tests use marble-noise / bilinear-image textures, and screen FD
components for local smoothness (a decision boundary inside ±eps makes FD
meaningless there). On flat-shaded scenes the geometry gradient must be
exactly zero, which is asserted explicitly.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracing_tpu.diff.gradients import render_once
from raytracing_tpu.models.scenes import build
from raytracing_tpu.render.camera import CameraConfig, CameraParams
from raytracing_tpu.scene.builder import SceneBuilder


def _marble_sphere_scene(image_bilinear=False):
    """A single marble-noise lambertian sphere floating in the sky: every
    scattered ray escapes (convex body, cosine-hemisphere directions), so
    the radiance is a smooth function of geometry — no boundaries away from
    the silhouette."""
    b = SceneBuilder()
    b.sphere((0.0, 0.0, -3.0), 1.0, b.lambertian(b.noise(2.0)))
    scene = b.compile(use_bvh=False, image_bilinear=image_bilinear)
    cfg = CameraConfig(
        aspect_ratio=1.0, image_width=8, samples_per_pixel=2, max_depth=3,
        background=(0.7, 0.8, 1.0), vfov=30.0, lookfrom=(0, 0, 0),
        lookat=(0, 0, -1), focus_dist=1.0,
    )
    return scene, cfg


def _center_loss(img):
    """Mean over the central pixel block — solidly on the sphere, away from
    the silhouette where visibility flips."""
    h, w, _ = img.shape
    return jnp.mean(img[h // 2 - 2 : h // 2 + 2, w // 2 - 2 : w // 2 + 2])


def _fd_check(loss_fn, p0, eps, rtol=0.08, atol=1e-4, min_mag=1e-4, components=None):
    """AD vs central FD, skipping components where the function is locally
    non-smooth (curvature comparable to the slope ⇒ a boundary within ±eps).
    ``components`` restricts the FD sweep (e.g. to real, non-padding rows)."""
    loss_fn = jax.jit(loss_fn)  # compile once; FD loop reuses it
    g = np.asarray(jax.jit(jax.grad(loss_fn))(p0), np.float64)
    p0 = np.asarray(p0, np.float64)
    f0 = float(loss_fn(jnp.asarray(p0, jnp.float32)))
    checked = 0
    it = components if components is not None else (
        list(np.ndindex(p0.shape)) if p0.ndim else [()]
    )
    for idx in it:
        dp = np.zeros_like(p0)
        dp[idx] = eps
        fp = float(loss_fn(jnp.asarray(p0 + dp, jnp.float32)))
        fm = float(loss_fn(jnp.asarray(p0 - dp, jnp.float32)))
        fd = (fp - fm) / (2 * eps)
        if abs(fd) < min_mag:
            continue
        curvature = abs(fp + fm - 2 * f0)
        if curvature > 0.3 * abs(fp - fm):  # boundary crossed → FD invalid
            continue
        checked += 1
        np.testing.assert_allclose(g[idx], fd, rtol=rtol, atol=atol,
                                   err_msg=f"component {idx}")
    assert checked > 0, "no smooth FD components found; test scene degenerate"
    return g


class TestGeometryGrads:
    def test_sphere_center(self):
        scene, cfg = _marble_sphere_scene()

        def loss(center):
            s = scene.replace(spheres=scene.spheres.replace(center=center))
            return _center_loss(render_once(s, cfg, seed=1))

        _fd_check(loss, scene.spheres.center, eps=2e-3)

    def test_sphere_radius(self):
        scene, cfg = _marble_sphere_scene()

        def loss(radius):
            s = scene.replace(spheres=scene.spheres.replace(radius=radius))
            return _center_loss(render_once(s, cfg, seed=1))

        # Only the real sphere row: perturbing a zero-radius padding row
        # births a sphere around the camera origin (discontinuous by design).
        _fd_check(loss, scene.spheres.radius, eps=5e-4, components=[(0,)])

    def test_quad_geometry(self):
        # Bilinear image shading: piecewise-bilinear in (u, v) with mild
        # curvature, so FD is trustworthy at eps ~1e-3. (Marble has octave-7
        # curvature that makes FD eps-dependent even though AD is exact —
        # verified by convergence as eps→0.)
        ramp = np.zeros((8, 8, 3), np.float32)
        ramp[..., 0] = np.linspace(0, 1, 8)[None, :]
        ramp[..., 1] = np.linspace(0, 1, 8)[:, None]
        ramp[..., 2] = 0.5
        b = SceneBuilder()
        b.quad((-2, -2, -3), (4, 0, 0), (0, 4, 0), b.lambertian(b.image(ramp)))
        scene = b.compile(use_bvh=False, image_bilinear=True)
        cfg = CameraConfig(
            aspect_ratio=1.0, image_width=8, samples_per_pixel=2, max_depth=2,
            background=(0.7, 0.8, 1.0), vfov=30.0, lookfrom=(0, 0, 0),
            lookat=(0, 0, -1), focus_dist=1.0,
        )

        def loss(q):
            s = scene.replace(quads=scene.quads.replace(q=q))
            return _center_loss(render_once(s, cfg, seed=1))

        # Real quad only: in-plane q shifts change (α, β) → the image value;
        # z shifts move the plane.
        _fd_check(loss, scene.quads.q, eps=1e-3,
                  components=[(0, 0), (0, 1), (0, 2)])

    def test_quad_uv_edge_vectors(self):
        """u/v edge-vector gradients (quad.hpp:8-126 basis): stretching an
        edge rescales (α, β) → the bilinear image value. Same ramp-quad
        scene as test_quad_geometry, differentiating u and v."""
        ramp = np.zeros((8, 8, 3), np.float32)
        ramp[..., 0] = np.linspace(0, 1, 8)[None, :]
        ramp[..., 1] = np.linspace(0, 1, 8)[:, None]
        ramp[..., 2] = 0.5
        b = SceneBuilder()
        b.quad((-2, -2, -3), (4, 0, 0), (0, 4, 0), b.lambertian(b.image(ramp)))
        scene = b.compile(use_bvh=False, image_bilinear=True)
        cfg = CameraConfig(
            aspect_ratio=1.0, image_width=8, samples_per_pixel=2, max_depth=2,
            background=(0.7, 0.8, 1.0), vfov=30.0, lookfrom=(0, 0, 0),
            lookat=(0, 0, -1), focus_dist=1.0,
        )

        def loss_u(u):
            s = scene.replace(quads=scene.quads.replace(u=u))
            return _center_loss(render_once(s, cfg, seed=1))

        def loss_v(v):
            s = scene.replace(quads=scene.quads.replace(v=v))
            return _center_loss(render_once(s, cfg, seed=1))

        _fd_check(loss_u, scene.quads.u, eps=2e-3,
                  components=[(0, 0), (0, 1)])
        _fd_check(loss_v, scene.quads.v, eps=2e-3,
                  components=[(0, 0), (0, 1)])

    def test_image_texture_bilinear_geometry_grad(self):
        rng = np.random.default_rng(0)
        img = rng.random((16, 32, 3)).astype(np.float32)
        b = SceneBuilder()
        b.sphere((0.0, 0.0, -3.0), 1.0, b.lambertian(b.image(img)))
        scene = b.compile(use_bvh=False, image_bilinear=True)
        cfg = CameraConfig(
            aspect_ratio=1.0, image_width=8, samples_per_pixel=2, max_depth=2,
            background=(0.7, 0.8, 1.0), vfov=30.0, lookfrom=(0, 0, 0),
            lookat=(0, 0, -1), focus_dist=1.0,
        )

        def loss(center):
            s = scene.replace(spheres=scene.spheres.replace(center=center))
            return _center_loss(render_once(s, cfg, seed=1))

        _fd_check(loss, scene.spheres.center, eps=5e-4, rtol=0.15)

    def test_flat_shading_gives_zero_geometry_grad(self):
        # Solid colors + constant background ⇒ radiance piecewise constant
        # in geometry ⇒ pathwise gradient exactly 0 (the documented contract).
        scene, cfg = build("single_sphere", image_width=16, samples_per_pixel=2, max_depth=3)

        def loss(center):
            s = scene.replace(spheres=scene.spheres.replace(center=center))
            return jnp.mean(render_once(s, cfg, seed=1))

        g = np.asarray(jax.grad(loss)(scene.spheres.center))
        np.testing.assert_array_equal(g, 0.0)


class TestShadingGrads:
    def test_albedo(self):
        scene, cfg = build("single_sphere", image_width=16, samples_per_pixel=2, max_depth=3)

        def loss(rgb):
            s = scene.replace(textures=scene.textures.replace(rgb=rgb))
            return jnp.mean(render_once(s, cfg, seed=1))

        g = np.asarray(jax.grad(loss)(scene.textures.rgb), np.float64)
        p0 = np.asarray(scene.textures.rgb, np.float64)
        eps = 1e-2
        for idx in [(0, 0), (0, 2)]:
            dp = np.zeros_like(p0)
            dp[idx] = eps
            fd = (
                float(loss(jnp.asarray(p0 + dp, jnp.float32)))
                - float(loss(jnp.asarray(p0 - dp, jnp.float32)))
            ) / (2 * eps)
            np.testing.assert_allclose(g[idx], fd, rtol=0.05, atol=1e-5)

    def test_emission(self):
        scene, cfg = build("simple_light", image_width=24, samples_per_pixel=2, max_depth=4)

        def loss(rgb):
            s = scene.replace(textures=scene.textures.replace(rgb=rgb))
            return jnp.mean(render_once(s, cfg, seed=1))

        g = np.asarray(jax.grad(loss)(scene.textures.rgb))
        assert np.isfinite(g).all()
        assert g.max() > 1e-5  # more emission → brighter image

    def test_metal_fuzz_through_marble_ground(self):
        # fuzz steers the reflected direction; with a marble ground the
        # reflected shading varies continuously → nonzero fuzz gradient.
        b = SceneBuilder()
        b.sphere((0.0, -1000.0, 0.0), 1000.0, b.lambertian(b.noise(1.0)))
        b.sphere((0.0, 1.0, -4.0), 1.0, b.metal((0.9, 0.9, 0.9), 0.2))
        scene = b.compile(use_bvh=False)
        cfg = CameraConfig(
            aspect_ratio=1.0, image_width=8, samples_per_pixel=4, max_depth=3,
            background=(0.7, 0.8, 1.0), vfov=25.0, lookfrom=(0, 1, 0),
            lookat=(0, 1, -4), focus_dist=1.0,
        )

        def loss(fuzz):
            s = scene.replace(materials=scene.materials.replace(fuzz=fuzz))
            return _center_loss(render_once(s, cfg, seed=3))

        g = np.asarray(jax.grad(loss)(scene.materials.fuzz))
        assert np.isfinite(g).all()
        assert np.abs(g).max() > 1e-4

    def test_dielectric_ior_through_marble_ground(self):
        b = SceneBuilder()
        b.sphere((0.0, -1000.0, 0.0), 1000.0, b.lambertian(b.noise(1.0)))
        b.sphere((0.0, 1.0, -4.0), 1.0, b.dielectric(1.5))
        scene = b.compile(use_bvh=False)
        cfg = CameraConfig(
            aspect_ratio=1.0, image_width=8, samples_per_pixel=4, max_depth=4,
            background=(0.7, 0.8, 1.0), vfov=25.0, lookfrom=(0, 1, 0),
            lookat=(0, 1, -4), focus_dist=1.0,
        )

        def loss(ior):
            s = scene.replace(materials=scene.materials.replace(ior=ior))
            return _center_loss(render_once(s, cfg, seed=3))

        g = np.asarray(jax.grad(loss)(scene.materials.ior))
        assert np.isfinite(g).all()
        assert np.abs(g).max() > 1e-4


class TestCameraGrads:
    def test_lookfrom_fd(self):
        scene, cfg = _marble_sphere_scene()
        p0 = CameraParams.from_config(cfg)

        def loss(lookfrom):
            return _center_loss(render_once(scene, cfg, p0.replace(lookfrom=lookfrom), seed=1))

        g = np.asarray(jax.grad(loss)(p0.lookfrom), np.float64)
        base = np.asarray(p0.lookfrom, np.float64)
        eps = 1e-3
        checked = 0
        for k in range(3):
            dp = np.zeros(3)
            dp[k] = eps
            fd = (
                float(loss(jnp.asarray(base + dp, jnp.float32)))
                - float(loss(jnp.asarray(base - dp, jnp.float32)))
            ) / (2 * eps)
            if abs(fd) > 1e-3:
                np.testing.assert_allclose(g[k], fd, rtol=0.1, atol=1e-3)
                checked += 1
        assert checked > 0

    def test_vfov_fd(self):
        scene, cfg = _marble_sphere_scene()
        p0 = CameraParams.from_config(cfg)

        def loss(vfov):
            return _center_loss(render_once(scene, cfg, p0.replace(vfov=vfov), seed=1))

        g = float(jax.grad(loss)(p0.vfov))
        eps = 0.05
        fd = (float(loss(p0.vfov + eps)) - float(loss(p0.vfov - eps))) / (2 * eps)
        assert abs(g - fd) < 0.1 * max(abs(fd), 1e-3), (g, fd)

    def test_focus_dist_fd_with_defocus(self):
        """Defocus optics gradients (camera.hpp:180-232 thin-lens): with a
        static defocus_angle > 0, focus_dist shifts both the focal plane
        and the viewport scale; its pathwise gradient must match FD. (The
        defocus sampling *branch* keys off the static config — enabling
        defocus is a config change, not a differentiable one.)"""
        scene, _ = _marble_sphere_scene()
        cfg = CameraConfig(
            aspect_ratio=1.0, image_width=8, samples_per_pixel=4, max_depth=3,
            background=(0.7, 0.8, 1.0), vfov=30.0, lookfrom=(0, 0, 0),
            lookat=(0, 0, -1), defocus_angle=2.0, focus_dist=3.0,
        )
        p0 = CameraParams.from_config(cfg)

        def loss(fd_):
            return _center_loss(
                render_once(scene, cfg, p0.replace(focus_dist=fd_), seed=1)
            )

        g = float(jax.grad(loss)(p0.focus_dist))
        eps = 3e-3
        fd = (float(loss(p0.focus_dist + eps))
              - float(loss(p0.focus_dist - eps))) / (2 * eps)
        assert abs(fd) > 1e-4, "degenerate FD slope"
        assert abs(g - fd) < 0.12 * max(abs(fd), 1e-3), (g, fd)

    def test_defocus_angle_fd(self):
        """defocus_angle magnitude gradient under a static enabled-defocus
        config: widening the aperture blurs the center block."""
        scene, _ = _marble_sphere_scene()
        cfg = CameraConfig(
            aspect_ratio=1.0, image_width=8, samples_per_pixel=4, max_depth=3,
            background=(0.7, 0.8, 1.0), vfov=30.0, lookfrom=(0, 0, 0),
            lookat=(0, 0, -1), defocus_angle=2.0, focus_dist=3.0,
        )
        p0 = CameraParams.from_config(cfg)

        def loss(ang):
            return _center_loss(
                render_once(scene, cfg, p0.replace(defocus_angle=ang), seed=1)
            )

        g = float(jax.grad(loss)(p0.defocus_angle))
        eps = 0.05
        fd = (float(loss(p0.defocus_angle + eps))
              - float(loss(p0.defocus_angle - eps))) / (2 * eps)
        if abs(fd) > 1e-4:
            assert abs(g - fd) < 0.15 * max(abs(fd), 1e-3), (g, fd)
        else:
            assert np.isfinite(g)

    def test_motion_blur_time_grads_finite(self):
        """Moving-sphere scene: velocity gradients flow through the
        per-ray motion-blur time (sphere.hpp center-as-ray) and are
        finite; FD-checked on the velocity y component."""
        b = SceneBuilder()
        b.sphere((0.0, 0.0, -3.0), 1.0, b.lambertian(b.noise(2.0)),
                 center2=(0.0, 0.15, -3.0))
        scene = b.compile(use_bvh=False)
        cfg = CameraConfig(
            aspect_ratio=1.0, image_width=8, samples_per_pixel=4, max_depth=3,
            background=(0.7, 0.8, 1.0), vfov=30.0, lookfrom=(0, 0, 0),
            lookat=(0, 0, -1), focus_dist=1.0,
        )
        assert scene.flags.has_moving

        def loss(vel):
            s = scene.replace(spheres=scene.spheres.replace(velocity=vel))
            return _center_loss(render_once(s, cfg, seed=1))

        _fd_check(loss, scene.spheres.velocity, eps=2e-3, rtol=0.12,
                  components=[(0, 1), (0, 2)])


class TestGradInfra:
    def test_bvh_hit_grads_match_brute(self):
        scene, cfg = _marble_sphere_scene()
        b = SceneBuilder()
        b.sphere((0.0, 0.0, -3.0), 1.0, b.lambertian(b.noise(2.0)))
        scene_bvh = b.compile(use_bvh=True)

        from raytracing_tpu.ops.intersect import closest_hit_brute
        from raytracing_tpu.ops.traverse import closest_hit_bvh

        def loss(center, s0, hit_fn):
            s = s0.replace(spheres=s0.spheres.replace(center=center))
            return _center_loss(render_once(s, cfg, seed=1, hit_fn=hit_fn))

        g_brute = np.asarray(
            jax.grad(lambda c: loss(c, scene, closest_hit_brute))(scene.spheres.center)
        )
        g_bvh = np.asarray(
            jax.grad(lambda c: loss(c, scene_bvh, closest_hit_bvh))(scene_bvh.spheres.center)
        )
        np.testing.assert_allclose(g_bvh[:1], g_brute[:1], rtol=1e-3, atol=1e-6)

    def test_remat_matches_no_remat(self):
        scene, cfg = _marble_sphere_scene()

        def loss(center, remat):
            s = scene.replace(spheres=scene.spheres.replace(center=center))
            return _center_loss(render_once(s, cfg, seed=1, remat=remat))

        g1 = np.asarray(jax.grad(lambda c: loss(c, True))(scene.spheres.center))
        g2 = np.asarray(jax.grad(lambda c: loss(c, False))(scene.spheres.center))
        np.testing.assert_allclose(g1, g2, rtol=1e-4, atol=1e-7)

    def test_optimize_recovers_albedo(self):
        from raytracing_tpu.diff.optimize import fit_albedo

        scene, cfg = build("single_sphere", image_width=16, samples_per_pixel=2, max_depth=3)
        target = render_once(scene, cfg, seed=0)
        # perturb albedo and fit it back
        bad = scene.replace(textures=scene.textures.replace(rgb=scene.textures.rgb * 0.3))
        # same-seed fit: the loss floor is ~0, so convergence is sharp
        fitted, losses = fit_albedo(bad, target, cfg, steps=60, lr=5e-2, seed=0,
                                    reseed_every_step=False)
        assert losses[-1] < losses[0] * 0.1
