"""The scene zoo: every scene the reference can render, as named registry
entries (replacing the recompile-to-switch-scenes ``switch(7)`` selector,
reference: src/main.cpp:348-397), plus the BASELINE.md acceptance configs.

Scene constants (geometry, materials, camera settings) are taken from the
reference builders (src/main.cpp:12-346, cited per function). Random scene
generation (bouncing_spheres) uses a seeded NumPy PRNG with the same
decision sequence as the reference's rand() stream — distributional parity,
not bit parity (the reference's RNG is unseeded libc rand,
rtweekend.hpp:23-27).
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import numpy as np

from ..render.camera import CameraConfig
from ..scene.builder import SceneBuilder
from ..scene.types import Scene

SceneFn = Callable[..., Tuple[Scene, CameraConfig]]
SCENES: Dict[str, SceneFn] = {}


def register(name: str):
    def deco(fn: SceneFn):
        SCENES[name] = fn
        return fn

    return deco


def build(name: str, **kwargs) -> Tuple[Scene, CameraConfig]:
    """Build a registry scene by name: ``build("cornell_box")``."""
    if name not in SCENES:
        raise KeyError(f"unknown scene '{name}'; available: {sorted(SCENES)}")
    return SCENES[name](**kwargs)


SKY = (0.7, 0.8, 1.0)  # the tutorial's light-blue background (main.cpp:87)


@register("bouncing_spheres")
def bouncing_spheres(seed: int = 42, use_bvh: bool = True, **cam_overrides):
    """Final scene: checker ground + 22×22 random grid of small spheres
    (80% moving lambertian / 15% metal / 5% glass) + 3 big spheres, BVH
    (reference main.cpp:12-101)."""
    b = SceneBuilder()
    ground = b.lambertian(b.checker(0.32, (0.2, 0.3, 0.1), (0.9, 0.9, 0.9)))
    b.sphere((0.0, -1000.0, -1.0), 1000.0, ground)

    rng = np.random.default_rng(seed)
    for a in range(-11, 11):
        for bb in range(-11, 11):
            choose_mat = rng.random()
            center = np.array([a + 0.9 * rng.random(), 0.2, bb + 0.9 * rng.random()])
            if np.linalg.norm(center - np.array([4.0, 0.2, 0.0])) > 0.9:
                if choose_mat < 0.8:
                    albedo = rng.random(3) * rng.random(3)
                    mat = b.lambertian(tuple(albedo))
                    center2 = center + np.array([0.0, rng.uniform(0.0, 0.5), 0.0])
                    b.sphere(tuple(center), 0.2, mat, center2=tuple(center2))
                elif choose_mat < 0.95:
                    albedo = rng.uniform(0.5, 1.0, 3)
                    mat = b.metal(tuple(albedo), rng.uniform(0.0, 0.5))
                    b.sphere(tuple(center), 0.2, mat)
                else:
                    b.sphere(tuple(center), 0.2, b.dielectric(1.5))

    b.sphere((0.0, 1.0, 0.0), 1.0, b.dielectric(1.5))
    b.sphere((-4.0, 1.0, 0.0), 1.0, b.lambertian((0.4, 0.2, 0.1)))
    b.sphere((4.0, 1.0, 0.0), 1.0, b.metal((0.7, 0.6, 0.5), 0.0))

    cfg = CameraConfig(
        aspect_ratio=16.0 / 9.0,
        image_width=400,
        samples_per_pixel=50,
        max_depth=20,
        background=SKY,
        vfov=20.0,
        lookfrom=(13.0, 2.0, 3.0),
        lookat=(0.0, 0.0, 0.0),
        vup=(0.0, 1.0, 0.0),
        defocus_angle=0.6,
        focus_dist=10.0,
    )
    cfg = _override(cfg, cam_overrides)
    return b.compile(use_bvh=use_bvh), cfg


@register("checkered_spheres")
def checkered_spheres(use_bvh: bool = False, **cam_overrides):
    """Two r=10 checkered spheres (main.cpp:104-138)."""
    b = SceneBuilder()
    checker = b.checker(0.32, (0.2, 0.3, 0.1), (0.9, 0.9, 0.9))
    mat = b.lambertian(checker)
    b.sphere((0.0, -10.0, 0.0), 10.0, mat)
    b.sphere((0.0, 10.0, 0.0), 10.0, mat)
    cfg = CameraConfig(
        aspect_ratio=16.0 / 9.0,
        image_width=400,
        samples_per_pixel=50,
        max_depth=20,
        background=SKY,
        vfov=20.0,
        lookfrom=(13.0, 2.0, 3.0),
        lookat=(0.0, 0.0, 0.0),
        defocus_angle=0.0,
    )
    return b.compile(use_bvh=use_bvh), _override(cfg, cam_overrides)


@register("earth")
def earth(use_bvh: bool = False, image: str = "earthmap.jpg", **cam_overrides):
    """Image-textured globe (main.cpp:141-171). Asset resolution order:
    ``earthmap.jpg`` (the reference's asset — drop it into images/ or point
    $RTW_IMAGES at it for exact reference parity; we do not copy it), then
    the vendored ``images/earthmap.ppm`` (a procedurally generated
    earth-like stand-in, committed so the rtw_image file pipeline —
    probing, PPM decode, u8 round-trip — runs on a real file by default),
    then the in-memory procedural generator as a last resort."""
    from ..scene import assets

    b = SceneBuilder()
    if assets.find_image(image) is not None:
        tex = b.image(image)
    elif assets.find_image("earthmap.ppm") is not None:
        tex = b.image("earthmap.ppm")
    else:
        tex = b.image(assets.generate_earthlike())
    b.sphere((0.0, 0.0, 0.0), 2.0, b.lambertian(tex))
    cfg = CameraConfig(
        aspect_ratio=16.0 / 9.0,
        image_width=400,
        samples_per_pixel=100,
        max_depth=50,
        background=SKY,
        vfov=20.0,
        lookfrom=(0.0, 0.0, 12.0),
        lookat=(0.0, 0.0, 0.0),
        defocus_angle=0.0,
    )
    return b.compile(use_bvh=use_bvh), _override(cfg, cam_overrides)


@register("perlin_sphere")
def perlin_sphere(use_bvh: bool = False, **cam_overrides):
    """Marble-noise ground + sphere (main.cpp:174-207)."""
    b = SceneBuilder()
    pertext = b.noise(4.0)
    b.sphere((0.0, -1000.0, 0.0), 1000.0, b.lambertian(pertext))
    b.sphere((0.0, 2.0, 0.0), 2.0, b.lambertian(pertext))
    cfg = CameraConfig(
        aspect_ratio=16.0 / 9.0,
        image_width=400,
        samples_per_pixel=100,
        max_depth=50,
        background=SKY,
        vfov=20.0,
        lookfrom=(13.0, 2.0, 3.0),
        lookat=(0.0, 0.0, 0.0),
        defocus_angle=0.0,
    )
    return b.compile(use_bvh=use_bvh), _override(cfg, cam_overrides)


@register("quads")
def quads(use_bvh: bool = False, **cam_overrides):
    """Five colored quads (main.cpp:210-251)."""
    b = SceneBuilder()
    b.quad((-3, -2, 5), (0, 0, -4), (0, 4, 0), b.lambertian((1.0, 0.2, 0.2)))
    b.quad((-2, -2, 0), (4, 0, 0), (0, 4, 0), b.lambertian((0.2, 1.0, 0.2)))
    b.quad((3, -2, 1), (0, 0, 4), (0, 4, 0), b.lambertian((0.2, 0.2, 1.0)))
    b.quad((-2, 3, 1), (4, 0, 0), (0, 0, 4), b.lambertian((1.0, 0.5, 0.0)))
    b.quad((-2, -3, 5), (4, 0, 0), (0, 0, -4), b.lambertian((0.2, 0.8, 0.8)))
    cfg = CameraConfig(
        aspect_ratio=1.0,
        image_width=400,
        samples_per_pixel=100,
        max_depth=50,
        background=SKY,
        vfov=80.0,
        lookfrom=(0.0, 0.0, 9.0),
        lookat=(0.0, 0.0, 0.0),
        defocus_angle=0.0,
    )
    return b.compile(use_bvh=use_bvh), _override(cfg, cam_overrides)


@register("simple_light")
def simple_light(use_bvh: bool = False, **cam_overrides):
    """Perlin spheres + emissive sphere and quad, black background
    (main.cpp:254-298)."""
    b = SceneBuilder()
    pertext = b.noise(4.0)
    b.sphere((0.0, -1000.0, 0.0), 1000.0, b.lambertian(pertext))
    b.sphere((0.0, 2.0, 0.0), 2.0, b.lambertian(pertext))
    difflight = b.diffuse_light((4.0, 4.0, 4.0))
    b.sphere((0.0, 7.0, 0.0), 2.0, difflight)
    b.quad((3.0, 1.0, -2.0), (2.0, 0.0, 0.0), (0.0, 2.0, 0.0), difflight)
    cfg = CameraConfig(
        aspect_ratio=16.0 / 9.0,
        image_width=400,
        samples_per_pixel=100,
        max_depth=50,
        background=(0.0, 0.0, 0.0),
        vfov=20.0,
        lookfrom=(26.0, 3.0, 6.0),
        lookat=(0.0, 2.0, 0.0),
        defocus_angle=0.0,
    )
    return b.compile(use_bvh=use_bvh), _override(cfg, cam_overrides)


@register("cornell_box")
def cornell_box(use_bvh: bool = False, **cam_overrides):
    """The compiled-in scene 7: Cornell box with two (unrotated) blocks
    (main.cpp:301-346)."""
    b = SceneBuilder()
    red = b.lambertian((0.65, 0.05, 0.05))
    white = b.lambertian((0.73, 0.73, 0.73))
    green = b.lambertian((0.12, 0.45, 0.15))
    light = b.diffuse_light((15.0, 15.0, 15.0))
    b.quad((555, 0, 0), (0, 555, 0), (0, 0, 555), green)
    b.quad((0, 0, 0), (0, 555, 0), (0, 0, 555), red)
    b.quad((343, 554, 332), (-130, 0, 0), (0, 0, -105), light)
    b.quad((0, 0, 0), (555, 0, 0), (0, 0, 555), white)
    b.quad((555, 555, 555), (-555, 0, 0), (0, 0, -555), white)
    b.quad((0, 0, 555), (555, 0, 0), (0, 555, 0), white)
    b.box((130, 0, 65), (295, 165, 230), white)
    b.box((265, 0, 295), (430, 330, 460), white)
    cfg = CameraConfig(
        aspect_ratio=1.0,
        image_width=600,
        samples_per_pixel=100,
        max_depth=50,
        background=(0.0, 0.0, 0.0),
        vfov=40.0,
        lookfrom=(278.0, 278.0, -800.0),
        lookat=(278.0, 278.0, 0.0),
        defocus_angle=0.0,
    )
    return b.compile(use_bvh=use_bvh), _override(cfg, cam_overrides)


# ---------------------------------------------------------------------------
# BASELINE.md acceptance configs 1-2 (not reference scenes per se)
# ---------------------------------------------------------------------------

@register("single_sphere")
def single_sphere(use_bvh: bool = False, **cam_overrides):
    """Acceptance config 1: single lambertian sphere + ground,
    200×100 @ 16 spp, depth 8 (BASELINE.md)."""
    b = SceneBuilder()
    b.sphere((0.0, 0.0, -1.0), 0.5, b.lambertian((0.5, 0.5, 0.5)))
    b.sphere((0.0, -100.5, -1.0), 100.0, b.lambertian((0.5, 0.5, 0.5)))
    cfg = CameraConfig(
        aspect_ratio=2.0,
        image_width=200,
        samples_per_pixel=16,
        max_depth=8,
        background=SKY,
        vfov=90.0,
        lookfrom=(0.0, 0.0, 0.0),
        lookat=(0.0, 0.0, -1.0),
        defocus_angle=0.0,
        focus_dist=1.0,
    )
    return b.compile(use_bvh=use_bvh), _override(cfg, cam_overrides)


@register("three_spheres")
def three_spheres(use_bvh: bool = False, **cam_overrides):
    """Acceptance config 2: lambertian/metal/dielectric trio,
    400×225 @ 64 spp, depth 16 (BASELINE.md)."""
    b = SceneBuilder()
    b.sphere((0.0, -100.5, -1.0), 100.0, b.lambertian((0.8, 0.8, 0.0)))
    b.sphere((0.0, 0.0, -1.2), 0.5, b.lambertian((0.1, 0.2, 0.5)))
    b.sphere((-1.0, 0.0, -1.0), 0.5, b.dielectric(1.5))
    b.sphere((1.0, 0.0, -1.0), 0.5, b.metal((0.8, 0.6, 0.2), 0.3))
    cfg = CameraConfig(
        aspect_ratio=16.0 / 9.0,
        image_width=400,
        samples_per_pixel=64,
        max_depth=16,
        background=SKY,
        vfov=90.0,
        lookfrom=(0.0, 0.0, 0.0),
        lookat=(0.0, 0.0, -1.0),
        defocus_angle=0.0,
        focus_dist=1.0,
    )
    return b.compile(use_bvh=use_bvh), _override(cfg, cam_overrides)


def _override(cfg: CameraConfig, overrides: dict) -> CameraConfig:
    if not overrides:
        return cfg
    from dataclasses import replace

    return replace(cfg, **overrides)
