"""Texture + Perlin unit tests (SURVEY.md §4.1)."""
import numpy as np
import jax.numpy as jnp

from raytracing_tpu.scene import perlin, textures
from raytracing_tpu.scene.builder import SceneBuilder


def _eval(scene, tid, pts, u=None, v=None):
    n = pts.shape[0]
    tid_arr = jnp.full((n,), tid, jnp.int32)
    u = jnp.zeros(n) if u is None else u
    v = jnp.zeros(n) if v is None else v
    return np.asarray(textures.eval_texture(scene, tid_arr, u, v, jnp.asarray(pts, jnp.float32)))


class TestSolidChecker:
    def test_solid(self):
        b = SceneBuilder()
        t = b.solid((0.1, 0.2, 0.3))
        b.sphere((0, 0, 0), 1.0, b.lambertian(t))
        scene = b.compile(use_bvh=False)
        out = _eval(scene, t, np.zeros((2, 3)))
        np.testing.assert_allclose(out, [[0.1, 0.2, 0.3]] * 2, rtol=1e-6)

    def test_checker_parity_including_negative(self):
        # floor-based parity (texture.hpp:61-75): cell (0,0,0) even,
        # (-1,0,0) odd (floor(-0.5) = -1), (-1,-1,0) even.
        b = SceneBuilder()
        t = b.checker(1.0, (1, 1, 1), (0, 0, 0))  # inv_scale = 1
        b.sphere((0, 0, 0), 1.0, b.lambertian(t))
        scene = b.compile(use_bvh=False)
        pts = np.array([
            [0.5, 0.5, 0.5],     # sum 0 even → white
            [1.5, 0.5, 0.5],     # sum 1 odd → black
            [-0.5, 0.5, 0.5],    # floor -1 → sum 0? (-1+0+0) odd → black
            [-0.5, -0.5, 0.5],   # (-1-1+0) even → white
        ])
        out = _eval(scene, t, pts)
        np.testing.assert_allclose(out[:, 0], [1, 0, 0, 1], atol=1e-6)

    def test_checker_scale(self):
        # checker(0.32, ...) → inv_scale = 1/0.32 = 3.125 (texture.hpp:36)
        b = SceneBuilder()
        t = b.checker(0.32, (1, 1, 1), (0, 0, 0))
        b.sphere((0, 0, 0), 1.0, b.lambertian(t))
        scene = b.compile(use_bvh=False)
        # p = 0.32 → cell 1 per axis? floor(3.125*0.32)=1 → sum 3 odd
        out = _eval(scene, t, np.array([[0.32, 0.32, 0.32]]))
        np.testing.assert_allclose(out[0, 0], 0.0, atol=1e-6)

    def test_nested_checker(self):
        # checker-of-checker resolves through two indirection rounds
        b = SceneBuilder()
        inner = b.checker(1.0, (1, 0, 0), (0, 1, 0))
        t = b.checker(10.0, inner, b.solid((0, 0, 1)))
        b.sphere((0, 0, 0), 1.0, b.lambertian(t))
        scene = b.compile(use_bvh=False)
        # p=(0.5,0.5,0.5): outer cell (0,0,0) even → inner; inner cell even → red
        out = _eval(scene, t, np.array([[0.5, 0.5, 0.5]]))
        np.testing.assert_allclose(out[0], [1, 0, 0], atol=1e-6)


class TestImage:
    def test_nearest_lookup_and_vflip(self):
        img = np.zeros((2, 4, 3), np.float32)
        img[0, 0] = (1, 0, 0)  # top-left
        img[1, 3] = (0, 1, 0)  # bottom-right
        b = SceneBuilder()
        t = b.image(img)
        b.sphere((0, 0, 0), 1.0, b.lambertian(t))
        scene = b.compile(use_bvh=False)
        # u=0, v=1 → texel (0,0) after v-flip (texture.hpp:106-108)
        out = _eval(
            scene, t, np.zeros((2, 3)),
            u=jnp.asarray([0.0, 0.99]), v=jnp.asarray([1.0, 0.01]),
        )
        np.testing.assert_allclose(out[0], [1, 0, 0], atol=1e-2)
        np.testing.assert_allclose(out[1], [0, 1, 0], atol=1e-2)

    def test_u_clamp(self):
        img = np.ones((2, 2, 3), np.float32) * 0.5
        b = SceneBuilder()
        t = b.image(img)
        b.sphere((0, 0, 0), 1.0, b.lambertian(t))
        scene = b.compile(use_bvh=False)
        out = _eval(scene, t, np.zeros((1, 3)), u=jnp.asarray([1.7]), v=jnp.asarray([-0.3]))
        np.testing.assert_allclose(out[0], [0.5, 0.5, 0.5], atol=1e-2)


class TestPerlin:
    def test_noise_range_and_determinism(self):
        tabs = perlin.make_tables(0)
        tabs2 = perlin.make_tables(0)
        np.testing.assert_array_equal(np.asarray(tabs.perm_x), np.asarray(tabs2.perm_x))
        pts = jnp.asarray(np.random.default_rng(1).uniform(-20, 20, (2000, 3)), jnp.float32)
        n = np.asarray(perlin.noise(tabs, pts))
        assert n.min() >= -1.0 and n.max() <= 1.0
        assert n.std() > 0.05  # non-degenerate

    def test_noise_zero_at_lattice(self):
        # gradient noise is exactly 0 at integer lattice points
        tabs = perlin.make_tables(0)
        pts = jnp.asarray([[0, 0, 0], [1, 2, 3], [-4, 5, -6]], jnp.float32)
        np.testing.assert_allclose(np.asarray(perlin.noise(tabs, pts)), 0.0, atol=1e-6)

    def test_continuity(self):
        tabs = perlin.make_tables(0)
        p = jnp.asarray([[0.5, 0.7, 0.9]], jnp.float32)
        eps = 1e-3
        p2 = p + eps
        d = abs(float(perlin.noise(tabs, p)[0]) - float(perlin.noise(tabs, p2)[0]))
        assert d < 0.05

    def test_turb_nonnegative(self):
        tabs = perlin.make_tables(0)
        pts = jnp.asarray(np.random.default_rng(2).uniform(-5, 5, (500, 3)), jnp.float32)
        t = np.asarray(perlin.turbulence(tabs, pts, 7))
        assert t.min() >= 0.0

    def test_marble_range(self):
        tabs = perlin.make_tables(0)
        pts = jnp.asarray(np.random.default_rng(3).uniform(-5, 5, (500, 3)), jnp.float32)
        m = np.asarray(perlin.marble(tabs, pts, jnp.float32(4.0)))
        assert m.min() >= 0.0 and m.max() <= 1.0

    def test_permutations_are_permutations(self):
        tabs = perlin.make_tables(5)
        for p in (tabs.perm_x, tabs.perm_y, tabs.perm_z):
            np.testing.assert_array_equal(np.sort(np.asarray(p)), np.arange(256))

    def test_gradients_unit(self):
        tabs = perlin.make_tables(0)
        lens = np.linalg.norm(np.asarray(tabs.randvec), axis=-1)
        np.testing.assert_allclose(lens, 1.0, atol=1e-5)
