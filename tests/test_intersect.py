"""Intersection unit tests vs closed forms (SURVEY.md §4.1/§4.5)."""
import numpy as np
import jax.numpy as jnp

from raytracing_tpu.ops import intersect
from raytracing_tpu.scene.builder import SceneBuilder


def _scene_one_sphere(center=(0, 0, -3), r=1.0, center2=None):
    b = SceneBuilder()
    b.sphere(center, r, b.lambertian((0.5, 0.5, 0.5)), center2=center2)
    return b.compile(use_bvh=False)


def _rays(*rows):
    o = jnp.asarray([r[0] for r in rows], jnp.float32)
    d = jnp.asarray([r[1] for r in rows], jnp.float32)
    t = jnp.zeros(len(rows), jnp.float32)
    return o, d, t


class TestSphere:
    def test_head_on(self):
        scene = _scene_one_sphere()
        o, d, t = _rays(((0, 0, 0), (0, 0, -1)))
        hit = intersect.closest_hit_brute(scene, o, d, t)
        assert bool(hit.valid[0])
        np.testing.assert_allclose(hit.t[0], 2.0, rtol=1e-6)
        np.testing.assert_allclose(hit.p[0], [0, 0, -2], atol=1e-6)
        np.testing.assert_allclose(hit.normal[0], [0, 0, 1], atol=1e-6)
        assert bool(hit.front_face[0])

    def test_from_inside(self):
        scene = _scene_one_sphere(center=(0, 0, 0))
        o, d, t = _rays(((0, 0, 0), (1, 0, 0)))
        hit = intersect.closest_hit_brute(scene, o, d, t)
        assert bool(hit.valid[0])
        np.testing.assert_allclose(hit.t[0], 1.0, rtol=1e-6)
        assert not bool(hit.front_face[0])  # back face, normal flipped inward
        np.testing.assert_allclose(hit.normal[0], [-1, 0, 0], atol=1e-6)

    def test_miss(self):
        scene = _scene_one_sphere()
        o, d, t = _rays(((0, 5, 0), (0, 0, -1)))
        hit = intersect.closest_hit_brute(scene, o, d, t)
        assert not bool(hit.valid[0])
        assert np.isinf(hit.t[0])

    def test_unnormalized_direction_t_scale(self):
        # t is in units of |d|: doubling d halves t (reference keeps d unnormalized)
        scene = _scene_one_sphere()
        o, d, t = _rays(((0, 0, 0), (0, 0, -2)))
        hit = intersect.closest_hit_brute(scene, o, d, t)
        np.testing.assert_allclose(hit.t[0], 1.0, rtol=1e-6)

    def test_tmin_epsilon_skips_self_hit(self):
        # origin exactly on the surface: nearest root ~0 rejected by t_min
        scene = _scene_one_sphere(center=(0, 0, 0))
        o, d, t = _rays(((0, 0, 1.0), (0, 0, -1)))
        hit = intersect.closest_hit_brute(scene, o, d, t)
        np.testing.assert_allclose(hit.t[0], 2.0, rtol=1e-5)

    def test_moving_sphere(self):
        scene = _scene_one_sphere(center=(0, 0, -3), center2=(2, 0, -3))
        o = jnp.asarray([[0, 0, 0], [2, 0, 0]], jnp.float32)
        d = jnp.asarray([[0, 0, -1], [0, 0, -1]], jnp.float32)
        t = jnp.asarray([0.0, 1.0], jnp.float32)
        hit = intersect.closest_hit_brute(scene, o, d, t)
        # at time 0 center x=0; at time 1 center x=2
        assert bool(hit.valid[0]) and bool(hit.valid[1])
        np.testing.assert_allclose(hit.t, [2.0, 2.0], rtol=1e-6)

    def test_uv_poles_and_seam(self):
        # sphere.hpp:100-111: u = (atan2(-z, x)+pi)/2pi, v = acos(-y)/pi
        scene = _scene_one_sphere(center=(0, 0, 0))
        rows = [
            ((0, 3, 0), (0, -1, 0)),   # top pole: v=1
            ((0, -3, 0), (0, 1, 0)),   # bottom pole: v=0
            ((3, 0, 0), (-1, 0, 0)),   # +x: u=0.5, v=0.5
            ((0, 0, -3), (0, 0, 1)),   # -z: u=0.75
        ]
        o, d, t = _rays(*rows)
        hit = intersect.closest_hit_brute(scene, o, d, t)
        np.testing.assert_allclose(hit.v[0], 1.0, atol=1e-5)
        np.testing.assert_allclose(hit.v[1], 0.0, atol=1e-5)
        np.testing.assert_allclose(hit.u[2], 0.5, atol=1e-5)
        np.testing.assert_allclose(hit.v[2], 0.5, atol=1e-5)
        np.testing.assert_allclose(hit.u[3], 0.75, atol=1e-5)


class TestQuad:
    def _scene_quad(self):
        b = SceneBuilder()
        b.quad((-1, -1, -2), (2, 0, 0), (0, 2, 0), b.lambertian((1, 0, 0)))
        return b.compile(use_bvh=False)

    def test_center_hit_uv(self):
        scene = self._scene_quad()
        o, d, t = _rays(((0, 0, 0), (0, 0, -1)))
        hit = intersect.closest_hit_brute(scene, o, d, t)
        assert bool(hit.valid[0])
        np.testing.assert_allclose(hit.t[0], 2.0, rtol=1e-6)
        np.testing.assert_allclose([hit.u[0], hit.v[0]], [0.5, 0.5], atol=1e-6)
        np.testing.assert_allclose(hit.normal[0], [0, 0, 1], atol=1e-6)

    def test_outside_interior(self):
        scene = self._scene_quad()
        o, d, t = _rays(((1.5, 0, 0), (0, 0, -1)))  # x=1.5 > quad extent
        hit = intersect.closest_hit_brute(scene, o, d, t)
        assert not bool(hit.valid[0])

    def test_parallel_reject(self):
        scene = self._scene_quad()
        o, d, t = _rays(((0, 0, 0), (1, 0, 0)))  # parallel to quad plane
        hit = intersect.closest_hit_brute(scene, o, d, t)
        assert not bool(hit.valid[0])

    def test_corner_uv(self):
        scene = self._scene_quad()
        o, d, t = _rays(((-0.999, -0.999, 0), (0, 0, -1)), ((0.999, 0.999, 0), (0, 0, -1)))
        hit = intersect.closest_hit_brute(scene, o, d, t)
        np.testing.assert_allclose([hit.u[0], hit.v[0]], [0.0005, 0.0005], atol=1e-3)
        np.testing.assert_allclose([hit.u[1], hit.v[1]], [0.9995, 0.9995], atol=1e-3)


class TestClosest:
    def test_closest_wins(self):
        b = SceneBuilder()
        m = b.lambertian((1, 1, 1))
        b.sphere((0, 0, -5), 1.0, m)
        b.sphere((0, 0, -3), 0.5, m)   # closer
        b.quad((-1, -1, -8), (2, 0, 0), (0, 2, 0), m)
        scene = b.compile(use_bvh=False)
        o, d, t = _rays(((0, 0, 0), (0, 0, -1)))
        hit = intersect.closest_hit_brute(scene, o, d, t)
        np.testing.assert_allclose(hit.t[0], 2.5, rtol=1e-6)
        assert int(hit.prim_id[0]) == 1

    def test_mixed_quad_closest(self):
        b = SceneBuilder()
        m = b.lambertian((1, 1, 1))
        b.sphere((0, 0, -5), 1.0, m)
        b.quad((-1, -1, -2), (2, 0, 0), (0, 2, 0), m)
        scene = b.compile(use_bvh=False)
        o, d, t = _rays(((0, 0, 0), (0, 0, -1)))
        hit = intersect.closest_hit_brute(scene, o, d, t)
        np.testing.assert_allclose(hit.t[0], 2.0, rtol=1e-6)
        assert int(hit.prim_id[0]) == scene.n_spheres  # first quad
