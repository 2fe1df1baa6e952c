"""Host-side scene construction + compilation to device SoA arrays.

This is the "scene compiler" (SURVEY.md §3.2): the user-facing builder API
replaces the reference's ``hittable_list::add`` object-graph construction
(reference: src/hittable/hittable_list.hpp:32-37), and ``compile()`` lowers
everything to the flat :class:`Scene` pytree — including the host-built BVH
(reference builds its BVH as a recursive pointer tree at scene setup,
src/accelerator/bvh_node.hpp:21-77; we flatten to skip-link arrays).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np
import jax.numpy as jnp

from . import assets, perlin
from .types import (
    BVH,
    MAT_DIELECTRIC,
    MAT_DIFFUSE_LIGHT,
    MAT_LAMBERTIAN,
    MAT_METAL,
    TEX_CHECKER,
    TEX_IMAGE,
    TEX_NOISE,
    TEX_SOLID,
    ImageAtlas,
    Materials,
    PerlinTables,
    Quads,
    Scene,
    SceneFlags,
    Spheres,
    Textures,
)

Color = Union[Tuple[float, float, float], Sequence[float], np.ndarray]


def _pad_to(n: int, multiple: int) -> int:
    return max(multiple, ((n + multiple - 1) // multiple) * multiple)


@dataclass
class SceneBuilder:
    """Imperative scene construction API.

    Texture/material/primitive ``add_*`` methods return integer ids; the
    final ``compile()`` produces the immutable device-side :class:`Scene`.
    """
    # texture columns
    tex_type: List[int] = field(default_factory=list)
    tex_rgb: List[np.ndarray] = field(default_factory=list)
    tex_scale: List[float] = field(default_factory=list)
    tex_child: List[Tuple[int, int]] = field(default_factory=list)
    tex_image: List[int] = field(default_factory=list)
    images: List[np.ndarray] = field(default_factory=list)
    # material columns
    mat_type: List[int] = field(default_factory=list)
    mat_tex: List[int] = field(default_factory=list)
    mat_fuzz: List[float] = field(default_factory=list)
    mat_ior: List[float] = field(default_factory=list)
    # sphere columns
    sph_center: List[np.ndarray] = field(default_factory=list)
    sph_velocity: List[np.ndarray] = field(default_factory=list)
    sph_radius: List[float] = field(default_factory=list)
    sph_mat: List[int] = field(default_factory=list)
    # quad columns
    quad_q: List[np.ndarray] = field(default_factory=list)
    quad_u: List[np.ndarray] = field(default_factory=list)
    quad_v: List[np.ndarray] = field(default_factory=list)
    quad_mat: List[int] = field(default_factory=list)

    # ----------------------------- textures ------------------------------
    def _add_texture_row(self, ttype, rgb=(0, 0, 0), scale=1.0, child=(0, 0), image=-1) -> int:
        self.tex_type.append(ttype)
        self.tex_rgb.append(np.asarray(rgb, np.float32))
        self.tex_scale.append(float(scale))
        self.tex_child.append((int(child[0]), int(child[1])))
        self.tex_image.append(int(image))
        return len(self.tex_type) - 1

    def solid(self, rgb: Color) -> int:
        """solid_color (texture.hpp:25-41)."""
        return self._add_texture_row(TEX_SOLID, rgb=rgb)

    def checker(self, scale: float, even: Union[int, Color], odd: Union[int, Color]) -> int:
        """3-D spatial checker of two sub-textures (texture.hpp:47-85).
        ``even``/``odd`` may be texture ids or RGB colors."""
        even_id = even if isinstance(even, int) else self.solid(even)
        odd_id = odd if isinstance(odd, int) else self.solid(odd)
        return self._add_texture_row(TEX_CHECKER, scale=1.0 / scale, child=(even_id, odd_id))

    def image(self, source: Union[str, np.ndarray]) -> int:
        """Image texture (texture.hpp:91-122); ``source`` is a filename
        (probed per rtw_stb_image.hpp:40-61) or an (H, W, 3) float array."""
        arr = assets.load_image(source) if isinstance(source, str) else np.asarray(source, np.float32)
        self.images.append(arr)
        return self._add_texture_row(TEX_IMAGE, image=len(self.images) - 1)

    def noise(self, scale: float) -> int:
        """Marble noise texture (texture.hpp:127-156)."""
        return self._add_texture_row(TEX_NOISE, scale=scale)

    def _as_tex(self, tex_or_rgb: Union[int, Color]) -> int:
        return tex_or_rgb if isinstance(tex_or_rgb, int) else self.solid(tex_or_rgb)

    # ----------------------------- materials -----------------------------
    def _add_material_row(self, mtype, tex, fuzz=0.0, ior=1.0) -> int:
        self.mat_type.append(mtype)
        self.mat_tex.append(tex)
        self.mat_fuzz.append(float(fuzz))
        self.mat_ior.append(float(ior))
        return len(self.mat_type) - 1

    def lambertian(self, tex_or_rgb: Union[int, Color]) -> int:
        """Diffuse material (material.hpp:42-75)."""
        return self._add_material_row(MAT_LAMBERTIAN, self._as_tex(tex_or_rgb))

    def metal(self, rgb: Color, fuzz: float) -> int:
        """Fuzzy mirror (material.hpp:80-111); fuzz clamped to <= 1 like the
        reference ctor (material.hpp:83)."""
        return self._add_material_row(MAT_METAL, self.solid(rgb), fuzz=min(float(fuzz), 1.0))

    def dielectric(self, refraction_index: float) -> int:
        """Glass with stochastic Fresnel (material.hpp:122-207)."""
        return self._add_material_row(MAT_DIELECTRIC, self.solid((1.0, 1.0, 1.0)), ior=refraction_index)

    def diffuse_light(self, tex_or_rgb: Union[int, Color]) -> int:
        """Emissive-only material (material.hpp:223-240)."""
        return self._add_material_row(MAT_DIFFUSE_LIGHT, self._as_tex(tex_or_rgb))

    # ----------------------------- geometry ------------------------------
    def sphere(self, center: Color, radius: float, mat: int, center2: Optional[Color] = None) -> int:
        """Static or moving sphere (sphere.hpp:16-44). A moving sphere
        travels center→center2 over t ∈ [0, 1]."""
        c = np.asarray(center, np.float32)
        self.sph_center.append(c)
        vel = np.zeros(3, np.float32) if center2 is None else np.asarray(center2, np.float32) - c
        self.sph_velocity.append(vel)
        self.sph_radius.append(float(radius))
        self.sph_mat.append(mat)
        return len(self.sph_radius) - 1

    def quad(self, q: Color, u: Color, v: Color, mat: int) -> int:
        """Parallelogram from corner + two edge vectors (quad.hpp:8-17)."""
        self.quad_q.append(np.asarray(q, np.float32))
        self.quad_u.append(np.asarray(u, np.float32))
        self.quad_v.append(np.asarray(v, np.float32))
        self.quad_mat.append(mat)
        return len(self.quad_mat) - 1

    def box(self, a: Color, b: Color, mat: int) -> None:
        """Axis-aligned box as 6 quads from two opposite corners
        (quad.hpp:129-159)."""
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        mn = np.minimum(a, b)
        mx = np.maximum(a, b)
        dx = np.array([mx[0] - mn[0], 0, 0], np.float32)
        dy = np.array([0, mx[1] - mn[1], 0], np.float32)
        dz = np.array([0, 0, mx[2] - mn[2]], np.float32)
        self.quad([mn[0], mn[1], mx[2]], dx, dy, mat)    # front
        self.quad([mx[0], mn[1], mx[2]], -dz, dy, mat)   # right
        self.quad([mx[0], mn[1], mn[2]], -dx, dy, mat)   # back
        self.quad([mn[0], mn[1], mn[2]], dz, dy, mat)    # left
        self.quad([mn[0], mx[1], mx[2]], dx, -dz, mat)   # top
        self.quad([mn[0], mn[1], mn[2]], dx, dz, mat)    # bottom

    def translate(self, offset: Color):
        """Instancing wrapper (reference hittable.hpp:74-117): primitives
        added inside the ``with`` block are shifted by ``offset``.

        The reference implements translate by offsetting the *ray* origin by
        ``-offset`` before the inner hit and adding ``offset`` back to the
        hit point (hittable.hpp:89-99). For stored-coordinate primitives
        (spheres, quads) that is exactly equivalent to shifting the stored
        geometry — sphere centers and quad corners — by ``+offset``, which
        this does at scene-compile time: ``t``, normals and UVs are
        translation-invariant, and the AABB shift (hittable.hpp:83) falls
        out of the BVH build over the shifted coordinates.

        Usage::

            with b.translate((130, 0, 65)):
                b.box((0, 0, 0), (165, 165, 165), white)
        """
        return _TranslateScope(self, np.asarray(offset, np.float32))

    # ----------------------------- compile -------------------------------
    @property
    def n_spheres(self) -> int:
        return len(self.sph_radius)

    @property
    def n_quads(self) -> int:
        return len(self.quad_mat)

    def compile(
        self,
        use_bvh: bool = True,
        perlin_seed: int = 0,
        pad_multiple: int = 8,
        image_bilinear: bool = False,
    ) -> Scene:
        """Lower the builder state to a device-ready :class:`Scene`.

        Primitive tables are padded to a lane-friendly multiple with inert
        entries (zero-radius spheres / degenerate quads). The BVH is built
        over the *real* primitives, indexing the padded global id space
        (spheres first, then quads at offset n_sphere_rows).
        """
        n_sph = _pad_to(max(self.n_spheres, 1), pad_multiple)
        n_quad = _pad_to(max(self.n_quads, 1), pad_multiple)

        def stack(rows, pad_rows, shape, dtype=np.float32, fill=0):
            out = np.full((pad_rows, *shape), fill, dtype)
            if rows:
                out[: len(rows)] = np.asarray(rows, dtype)
            return out

        spheres = Spheres(
            center=jnp.asarray(stack(self.sph_center, n_sph, (3,))),
            velocity=jnp.asarray(stack(self.sph_velocity, n_sph, (3,))),
            radius=jnp.asarray(stack(self.sph_radius, n_sph, ())),
            mat_id=jnp.asarray(stack(self.sph_mat, n_sph, (), np.int32)),
        )
        quads = Quads(
            q=jnp.asarray(stack(self.quad_q, n_quad, (3,))),
            u=jnp.asarray(stack(self.quad_u, n_quad, (3,))),
            v=jnp.asarray(stack(self.quad_v, n_quad, (3,))),
            mat_id=jnp.asarray(stack(self.quad_mat, n_quad, (), np.int32)),
        )

        if not self.mat_type:  # a scene must have at least one material row
            self.lambertian((0.5, 0.5, 0.5))
        materials = Materials(
            mtype=jnp.asarray(np.asarray(self.mat_type, np.int32)),
            tex_id=jnp.asarray(np.asarray(self.mat_tex, np.int32)),
            fuzz=jnp.asarray(np.asarray(self.mat_fuzz, np.float32)),
            ior=jnp.asarray(np.asarray(self.mat_ior, np.float32)),
        )
        textures = Textures(
            ttype=jnp.asarray(np.asarray(self.tex_type, np.int32)),
            rgb=jnp.asarray(np.stack(self.tex_rgb)),
            scale=jnp.asarray(np.asarray(self.tex_scale, np.float32)),
            child=jnp.asarray(np.asarray(self.tex_child, np.int32)),
            image_id=jnp.asarray(np.asarray(self.tex_image, np.int32)),
        )

        if self.images:
            hmax = max(im.shape[0] for im in self.images)
            wmax = max(im.shape[1] for im in self.images)
            texels = np.zeros((len(self.images), hmax, wmax, 3), np.float32)
            sizes = np.zeros((len(self.images), 2), np.int32)
            for k, im in enumerate(self.images):
                texels[k, : im.shape[0], : im.shape[1]] = im
                sizes[k] = (im.shape[0], im.shape[1])
        else:
            texels = np.zeros((1, 1, 1, 3), np.float32)
            sizes = np.zeros((1, 2), np.int32)
        atlas = ImageAtlas(texels=jnp.asarray(texels), sizes=jnp.asarray(sizes))

        flags = SceneFlags(
            has_checker=any(t == TEX_CHECKER for t in self.tex_type),
            has_image=any(t == TEX_IMAGE for t in self.tex_type),
            has_noise=any(t == TEX_NOISE for t in self.tex_type),
            has_moving=any(np.any(v != 0) for v in self.sph_velocity),
            image_bilinear=image_bilinear,
        )

        bvh = None
        if use_bvh and (self.n_spheres + self.n_quads) > 0:
            from ..ops.bvh import build_bvh  # host-side NumPy build

            bvh_np = build_bvh(
                sphere_center=np.asarray(self.sph_center, np.float32).reshape(-1, 3),
                sphere_velocity=np.asarray(self.sph_velocity, np.float32).reshape(-1, 3),
                sphere_radius=np.asarray(self.sph_radius, np.float32),
                quad_q=np.asarray(self.quad_q, np.float32).reshape(-1, 3),
                quad_u=np.asarray(self.quad_u, np.float32).reshape(-1, 3),
                quad_v=np.asarray(self.quad_v, np.float32).reshape(-1, 3),
                quad_id_offset=n_sph,
            )
            bvh = BVH(
                bbox_min=jnp.asarray(bvh_np.bbox_min),
                bbox_max=jnp.asarray(bvh_np.bbox_max),
                prim=jnp.asarray(bvh_np.prim),
                miss=jnp.asarray(bvh_np.miss),
            )

        return Scene(
            spheres=spheres,
            quads=quads,
            materials=materials,
            textures=textures,
            atlas=atlas,
            perlin=perlin.make_tables(perlin_seed),
            bvh=bvh,
            flags=flags,
        )


class _TranslateScope:
    """Context manager backing :meth:`SceneBuilder.translate`: records the
    primitive counts at entry and offsets everything added inside the scope
    on exit. Nestable — offsets compose, matching nested ``translate``
    wrappers in the reference object graph."""

    def __init__(self, builder: SceneBuilder, offset: np.ndarray):
        self.builder = builder
        self.offset = offset

    def __enter__(self):
        self._s0 = self.builder.n_spheres
        self._q0 = self.builder.n_quads
        return self.builder

    def __exit__(self, exc_type, exc, tb):
        if exc_type is not None:
            return False
        b = self.builder
        for i in range(self._s0, b.n_spheres):
            b.sph_center[i] = b.sph_center[i] + self.offset
        for j in range(self._q0, b.n_quads):
            b.quad_q[j] = b.quad_q[j] + self.offset
        return False
