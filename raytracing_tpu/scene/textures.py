"""Vectorized texture evaluation over integer texture ids — the wavefront
replacement for ``texture::value`` virtual dispatch (reference:
src/core/texture.hpp:11-156).

Checker textures are *indirection*, not computation: a checker's value at
(u, v, p) is its even or odd child's value at the same point
(texture.hpp:57-79). So evaluation first rewrites texture ids through
CHECKER_NEST_DEPTH rounds of parity-selected child lookup, then evaluates
only leaf texture types (solid / image / marble-noise).
"""
from __future__ import annotations

import jax.numpy as jnp

from . import perlin as perlin_mod
from .types import (
    CHECKER_NEST_DEPTH,
    TEX_CHECKER,
    TEX_IMAGE,
    TEX_NOISE,
    TEX_SOLID,
    Scene,
)

# Sentinel for a missing image at lookup time (reference texture.hpp:99-102
# returns cyan when the image has no data).
CYAN = (0.0, 1.0, 1.0)


def resolve_checker(scene: Scene, tex_id: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Rewrite checker ids to their parity-selected child id
    (texture.hpp:57-79): cell = floor(inv_scale·p) per axis; even iff the
    summed integer cell coords are even. Non-checker ids pass through."""
    tex = scene.textures
    for _ in range(CHECKER_NEST_DEPTH):
        is_checker = tex.ttype[tex_id] == TEX_CHECKER
        inv_scale = tex.scale[tex_id]
        cells = jnp.floor(inv_scale[..., None] * p).astype(jnp.int32)
        is_even = (jnp.sum(cells, axis=-1) % 2) == 0
        child = jnp.where(is_even, tex.child[tex_id, 0], tex.child[tex_id, 1])
        tex_id = jnp.where(is_checker, child, tex_id)
    return tex_id


def _image_value(scene: Scene, tex_id: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Texel fetch (texture.hpp:91-122): clamp u, flip v, then either the
    reference's nearest-neighbor truncation or (``flags.image_bilinear``)
    bilinear filtering — the latter makes the texture C0 in (u, v) so
    geometry gradients flow (diff/gradients.py)."""
    atlas = scene.atlas
    img = scene.textures.image_id[tex_id]
    h = atlas.sizes[img, 0]
    w = atlas.sizes[img, 1]
    uu = jnp.clip(u, 0.0, 1.0)
    vv = 1.0 - jnp.clip(v, 0.0, 1.0)
    if scene.flags.image_bilinear:
        x = uu * w.astype(u.dtype) - 0.5
        y = vv * h.astype(u.dtype) - 0.5
        x0f = jnp.floor(x)
        y0f = jnp.floor(y)
        fx = (x - x0f)[..., None]
        fy = (y - y0f)[..., None]
        x0 = jnp.clip(x0f.astype(jnp.int32), 0, w - 1)
        x1 = jnp.clip(x0 + 1, 0, w - 1)
        y0 = jnp.clip(y0f.astype(jnp.int32), 0, h - 1)
        y1 = jnp.clip(y0 + 1, 0, h - 1)
        t00 = atlas.texels[img, y0, x0]
        t01 = atlas.texels[img, y0, x1]
        t10 = atlas.texels[img, y1, x0]
        t11 = atlas.texels[img, y1, x1]
        texel = (
            (1 - fy) * ((1 - fx) * t00 + fx * t01)
            + fy * ((1 - fx) * t10 + fx * t11)
        )
    else:
        i = jnp.clip((uu * w.astype(u.dtype)).astype(jnp.int32), 0, w - 1)
        j = jnp.clip((vv * h.astype(u.dtype)).astype(jnp.int32), 0, h - 1)
        texel = atlas.texels[img, j, i]
    # Missing image (h <= 0) → cyan sentinel (texture.hpp:99-102).
    return jnp.where((h > 0)[..., None], texel, jnp.asarray(CYAN, texel.dtype))


def eval_texture(
    scene: Scene,
    tex_id: jnp.ndarray,   # (B,) i32
    u: jnp.ndarray,        # (B,) f32
    v: jnp.ndarray,        # (B,) f32
    p: jnp.ndarray,        # (B, 3) f32 hit point
) -> jnp.ndarray:
    """Color of texture ``tex_id`` at surface coords (u, v) / world point p.

    Compute-all-and-select over leaf texture types; scene flags statically
    skip branches no texture in the scene uses.
    """
    tex = scene.textures
    flags = scene.flags

    if flags.has_checker:
        tex_id = resolve_checker(scene, tex_id, p)

    ttype = tex.ttype[tex_id]
    out = tex.rgb[tex_id]  # TEX_SOLID value (texture.hpp:34) — the default

    if flags.has_image:
        img_val = _image_value(scene, tex_id, u, v)
        out = jnp.where((ttype == TEX_IMAGE)[..., None], img_val, out)

    if flags.has_noise:
        m = perlin_mod.marble(scene.perlin, p, tex.scale[tex_id])
        noise_val = m[..., None] * jnp.ones((3,), out.dtype)
        out = jnp.where((ttype == TEX_NOISE)[..., None], noise_val, out)

    return out
