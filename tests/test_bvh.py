"""BVH structural invariants + BVH == brute-force property tests
(SURVEY.md §4.5)."""
import numpy as np
import jax.numpy as jnp
import pytest

from raytracing_tpu.ops import bvh as bvh_mod
from raytracing_tpu.ops.intersect import closest_hit_brute
from raytracing_tpu.ops.traverse import closest_hit_bvh
from raytracing_tpu.scene.builder import SceneBuilder


def _random_scene(seed, n_spheres=40, n_quads=10, moving=False):
    rng = np.random.default_rng(seed)
    b = SceneBuilder()
    m = b.lambertian((0.5, 0.5, 0.5))
    for _ in range(n_spheres):
        c = rng.uniform(-10, 10, 3)
        c2 = c + rng.uniform(-0.5, 0.5, 3) if moving and rng.random() < 0.5 else None
        b.sphere(tuple(c), rng.uniform(0.1, 2.0), m, center2=None if c2 is None else tuple(c2))
    for _ in range(n_quads):
        b.quad(tuple(rng.uniform(-10, 10, 3)), tuple(rng.uniform(-3, 3, 3)),
               tuple(rng.uniform(-3, 3, 3)), m)
    return b.compile(use_bvh=True)


def _random_rays(seed, n=512):
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.uniform(-15, 15, (n, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    t = jnp.asarray(rng.random(n), jnp.float32)
    return o, d, t


class TestBuild:
    def test_structure_invariants(self):
        scene = _random_scene(0)
        prim = np.asarray(scene.bvh.prim)
        miss = np.asarray(scene.bvh.miss)
        k = len(prim)
        n_real = 50  # 40 spheres + 10 quads
        assert (prim >= 0).sum() == n_real          # one leaf per primitive
        assert k == 2 * n_real - 1                  # binary tree node count
        assert miss[0] == -1                        # root skips to end
        # every leaf id unique and within the padded global space
        leaf_ids = prim[prim >= 0]
        assert len(np.unique(leaf_ids)) == n_real

    def test_child_bboxes_contained(self):
        scene = _random_scene(1)
        bmin = np.asarray(scene.bvh.bbox_min)
        bmax = np.asarray(scene.bvh.bbox_max)
        prim = np.asarray(scene.bvh.prim)
        # internal node i's first child is i+1: child box ⊆ parent box
        for i in range(len(prim) - 1):
            if prim[i] < 0:
                assert np.all(bmin[i] <= bmin[i + 1] + 1e-5)
                assert np.all(bmax[i] >= bmax[i + 1] - 1e-5)

    def test_quad_bbox_padded(self):
        # axis-aligned quad has zero thickness → padded to >= 1e-4 (aabb.hpp:135)
        q = np.array([[0, 0, 0]], np.float32)
        u = np.array([[1, 0, 0]], np.float32)
        v = np.array([[0, 1, 0]], np.float32)
        bmin, bmax = bvh_mod.primitive_bounds(
            np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32),
            np.zeros(0, np.float32), q, u, v)
        assert (bmax[0, 2] - bmin[0, 2]) >= 1e-4


class TestTraversalMatchesBrute:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_first_hit_match(self, seed):
        scene = _random_scene(seed)
        o, d, t = _random_rays(seed + 100)
        hb = closest_hit_brute(scene, o, d, t)
        hv = closest_hit_bvh(scene, o, d, t)
        np.testing.assert_array_equal(np.asarray(hb.valid), np.asarray(hv.valid))
        # identical primitive except possible exact-tie cases
        same_prim = np.asarray(hb.prim_id) == np.asarray(hv.prim_id)
        tb, tv = np.asarray(hb.t), np.asarray(hv.t)
        finite = np.isfinite(tb)
        np.testing.assert_allclose(tb[finite], tv[finite], rtol=1e-5)
        assert same_prim.mean() > 0.999

    def test_moving_spheres(self):
        scene = _random_scene(7, moving=True)
        o, d, t = _random_rays(200)
        hb = closest_hit_brute(scene, o, d, t)
        hv = closest_hit_bvh(scene, o, d, t)
        finite = np.isfinite(np.asarray(hb.t))
        np.testing.assert_allclose(
            np.asarray(hb.t)[finite], np.asarray(hv.t)[finite], rtol=1e-5
        )

    def test_axis_parallel_rays(self):
        scene = _random_scene(3)
        # rays exactly along coordinate axes (slab-test edge case, aabb.hpp:78)
        o = jnp.asarray([[0, 0, 20], [20, 0, 0], [0, 20, 0], [-20, 0, 0]], jnp.float32)
        d = jnp.asarray([[0, 0, -1], [-1, 0, 0], [0, -1, 0], [1, 0, 0]], jnp.float32)
        t = jnp.zeros(4, jnp.float32)
        hb = closest_hit_brute(scene, o, d, t)
        hv = closest_hit_bvh(scene, o, d, t)
        np.testing.assert_array_equal(np.asarray(hb.valid), np.asarray(hv.valid))
        finite = np.isfinite(np.asarray(hb.t))
        np.testing.assert_allclose(
            np.asarray(hb.t)[finite], np.asarray(hv.t)[finite], rtol=1e-5
        )

    def test_single_primitive(self):
        b = SceneBuilder()
        b.sphere((0, 0, -3), 1.0, b.lambertian((1, 1, 1)))
        scene = b.compile(use_bvh=True)
        o = jnp.asarray([[0, 0, 0]], jnp.float32)
        d = jnp.asarray([[0, 0, -1]], jnp.float32)
        t = jnp.zeros(1, jnp.float32)
        hv = closest_hit_bvh(scene, o, d, t)
        np.testing.assert_allclose(np.asarray(hv.t)[0], 2.0, rtol=1e-6)
