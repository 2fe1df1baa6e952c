"""The ``translate`` instancing wrapper (reference hittable.hpp:74-117).

The reference shifts the ray by -offset, hits the inner object, and adds
offset back to the hit point; for stored-coordinate primitives that is
exactly a +offset shift of the stored geometry. The golden check is
therefore build-time: a box built at the origin inside ``translate(off)``
must compile to *bit-identical* scene tables (and BVH) as the same box
baked at the offset coordinates — which makes every downstream render
identical by construction. A small render cross-check is included anyway.
"""
import numpy as np
import pytest

from raytracing_tpu.render.renderer import render
from raytracing_tpu.render.camera import CameraConfig
from raytracing_tpu.scene.builder import SceneBuilder


OFF = (130.0, 7.5, -65.25)


def _baked():
    b = SceneBuilder()
    white = b.lambertian((0.73, 0.73, 0.73))
    b.box(np.add((0, 0, 0), OFF), np.add((165, 165, 165), OFF), white)
    b.sphere(np.add((10, 20, 30), OFF), 40.0, white)
    return b.compile()


def _translated():
    b = SceneBuilder()
    white = b.lambertian((0.73, 0.73, 0.73))
    with b.translate(OFF):
        b.box((0, 0, 0), (165, 165, 165), white)
        b.sphere((10, 20, 30), 40.0, white)
    return b.compile()


class TestTranslate:
    def test_translated_box_equals_baked_tables(self):
        a, t = _baked(), _translated()
        np.testing.assert_array_equal(np.asarray(a.quads.q), np.asarray(t.quads.q))
        np.testing.assert_array_equal(np.asarray(a.quads.u), np.asarray(t.quads.u))
        np.testing.assert_array_equal(np.asarray(a.quads.v), np.asarray(t.quads.v))
        np.testing.assert_array_equal(
            np.asarray(a.spheres.center), np.asarray(t.spheres.center)
        )
        # AABB shift (hittable.hpp:83) falls out of the BVH build
        np.testing.assert_array_equal(
            np.asarray(a.bvh.bbox_min), np.asarray(t.bvh.bbox_min)
        )
        np.testing.assert_array_equal(np.asarray(a.bvh.prim), np.asarray(t.bvh.prim))

    def test_translated_render_matches_baked(self):
        cfg = CameraConfig(
            image_width=24,
            aspect_ratio=1.0,
            samples_per_pixel=2,
            max_depth=3,
            vfov=40.0,
            lookfrom=(400.0, 120.0, 300.0),
            lookat=(212.0, 90.0, -60.0),
            background=(0.7, 0.8, 1.0),
        )
        ra = render(_baked(), cfg, seed=3, hit_method="brute")
        rt = render(_translated(), cfg, seed=3, hit_method="brute")
        np.testing.assert_array_equal(ra.radiance, rt.radiance)
        assert ra.radiance.std() > 0  # the box is actually in frame

    def test_nested_translate_composes(self):
        b = SceneBuilder()
        m = b.lambertian((0.5, 0.5, 0.5))
        with b.translate((1, 0, 0)):
            with b.translate((0, 2, 0)):
                b.sphere((0, 0, 3), 1.0, m)
        np.testing.assert_allclose(b.sph_center[0], [1.0, 2.0, 3.0])
