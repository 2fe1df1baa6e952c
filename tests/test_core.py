"""Unit tests for core math/RNG/color — closed-form checks per SURVEY.md §4.1."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracing_tpu.core import color, rng, vecmath as vm


class TestVecMath:
    def test_dot_cross(self):
        a = jnp.array([[1.0, 2.0, 3.0], [0.0, 1.0, 0.0]])
        b = jnp.array([[4.0, -5.0, 6.0], [0.0, 0.0, 1.0]])
        np.testing.assert_allclose(vm.dot(a, b), [12.0, 0.0])
        np.testing.assert_allclose(vm.cross(a, b)[1], [1.0, 0.0, 0.0])

    def test_reflect_identity(self):
        # v - 2(v·n)n: 45° incidence on y-plane flips y
        v = jnp.array([1.0, -1.0, 0.0])
        n = jnp.array([0.0, 1.0, 0.0])
        np.testing.assert_allclose(vm.reflect(v, n), [1.0, 1.0, 0.0], atol=1e-7)
        # reflected vector has same length, mirrored angle
        rv = vm.reflect(v, n)
        np.testing.assert_allclose(vm.length(rv), vm.length(v), rtol=1e-6)
        np.testing.assert_allclose(vm.dot(rv, n), -vm.dot(v, n), rtol=1e-6)

    def test_refract_snell(self):
        # Snell's law: eta_i sin(theta_i) = eta_t sin(theta_t)
        n = jnp.array([0.0, 1.0, 0.0])
        theta_i = 0.5
        uv = jnp.array([jnp.sin(theta_i), -jnp.cos(theta_i), 0.0])
        eta = jnp.asarray(1.0 / 1.5)
        out = vm.refract(uv, n, eta)
        sin_t = jnp.sqrt(out[0] ** 2 + out[2] ** 2)
        np.testing.assert_allclose(float(sin_t), float(eta * jnp.sin(theta_i)), rtol=1e-6)
        np.testing.assert_allclose(float(vm.length(out)), 1.0, rtol=1e-5)

    def test_refract_normal_incidence(self):
        n = jnp.array([0.0, 1.0, 0.0])
        uv = jnp.array([0.0, -1.0, 0.0])
        out = vm.refract(uv, n, jnp.asarray(0.75))
        np.testing.assert_allclose(out, [0.0, -1.0, 0.0], atol=1e-6)

    def test_near_zero_correct_on_y(self):
        # The reference's vec3::near_zero y-component bug (vec3.hpp:76) must
        # NOT be reproduced: y = 0.5 is not near zero.
        v = jnp.array([[1e-9, 0.5, 1e-9], [1e-9, 1e-9, 1e-9], [1e-9, -0.5, 1e-9]])
        np.testing.assert_array_equal(vm.near_zero(v), [False, True, False])

    def test_set_face_normal(self):
        d = jnp.array([[0.0, -1.0, 0.0], [0.0, 1.0, 0.0]])
        outward = jnp.array([[0.0, 1.0, 0.0], [0.0, 1.0, 0.0]])
        nrm, ff = vm.set_face_normal(d, outward)
        np.testing.assert_array_equal(ff, [True, False])
        np.testing.assert_allclose(nrm[1], [0.0, -1.0, 0.0])

    def test_ray_at(self):
        o = jnp.array([[1.0, 0.0, 0.0]])
        d = jnp.array([[0.0, 2.0, 0.0]])
        np.testing.assert_allclose(vm.ray_at(o, d, jnp.array([1.5]))[0], [1.0, 3.0, 0.0])


class TestRNG:
    def test_deterministic_and_seed_sensitive(self):
        uid = jnp.arange(100, dtype=jnp.uint32)
        s = jnp.zeros(100, jnp.uint32)
        c = jnp.zeros(100, jnp.uint32)
        a = rng.uniform4(uid, s, c, 1)
        b = rng.uniform4(uid, s, c, 1)
        c2 = rng.uniform4(uid, s, c, 2)
        np.testing.assert_array_equal(a, b)
        assert np.abs(np.asarray(a) - np.asarray(c2)).max() > 0.1

    def test_range_and_mean(self):
        uid = jnp.arange(20000, dtype=jnp.uint32)
        u = rng.uniform4(uid, jnp.zeros_like(uid), jnp.zeros_like(uid), 7)
        u = np.asarray(u)
        assert u.min() >= 0.0 and u.max() < 1.0
        np.testing.assert_allclose(u.mean(), 0.5, atol=0.01)
        np.testing.assert_allclose(u.var(), 1 / 12, atol=0.01)

    def test_streams_decorrelated(self):
        uid = jnp.arange(10000, dtype=jnp.uint32)
        z = jnp.zeros_like(uid)
        u0 = np.asarray(rng.uniform4(uid, z, z, 7))[:, 0]
        u1 = np.asarray(rng.uniform4(uid, z, z + 1, 7))[:, 0]
        corr = np.corrcoef(u0, u1)[0, 1]
        assert abs(corr) < 0.05

    def test_unit_vector_on_sphere(self):
        uid = jnp.arange(5000, dtype=jnp.uint32)
        z = jnp.zeros_like(uid)
        u = rng.uniform4(uid, z, z, 3)
        v = rng.unit_vector(u[:, :2])
        lens = np.asarray(jnp.linalg.norm(v, axis=-1))
        np.testing.assert_allclose(lens, 1.0, atol=1e-5)
        # each component has mean ~0 (uniform over sphere)
        np.testing.assert_allclose(np.asarray(v).mean(axis=0), 0.0, atol=0.05)

    def test_unit_disk(self):
        uid = jnp.arange(5000, dtype=jnp.uint32)
        z = jnp.zeros_like(uid)
        u = rng.uniform4(uid, z, z, 3)
        p = np.asarray(rng.unit_disk(u[:, :2]))
        r = np.hypot(p[:, 0], p[:, 1])
        assert r.max() <= 1.0
        # uniform density: E[r^2] = 1/2
        np.testing.assert_allclose((r**2).mean(), 0.5, atol=0.02)

    def test_matches_numpy_oracle(self):
        from oracle import uniform4 as np_uniform4

        got = np.asarray(rng.uniform4(jnp.uint32(123), jnp.uint32(4), jnp.uint32(5), 99))
        want = np_uniform4(123, 4, 5, 99)
        np.testing.assert_allclose(got, want, atol=1e-7)


class TestColor:
    def test_gamma(self):
        c = jnp.array([0.0, 0.25, 1.0, -0.5])
        np.testing.assert_allclose(color.linear_to_gamma(c), [0.0, 0.5, 1.0, 0.0])

    def test_quantize_truncation(self):
        # write_color semantics (color.hpp:52-54): clamp to 0.999, x256, trunc
        c = jnp.array([0.0, 1.0, 2.0, 0.25])
        q = np.asarray(color.quantize_u8(c))
        assert q[0] == 0
        assert q[1] == 255  # 0.999*256 = 255.744 → 255
        assert q[2] == 255
        assert q[3] == int(256 * 0.5)  # gamma(0.25)=0.5 → 128
