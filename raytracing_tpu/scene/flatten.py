"""Flatten a compiled Scene into dense per-primitive shading tables for the
Pallas megakernel (ops/megakernel.py).

The megakernel avoids all per-ray gathers by carrying the winning
primitive's attributes through the intersection loop — which requires every
attribute it might need (geometry + material + texture params) to be a
scalar column of the primitive row. This module packs:

  sphere_table: (SPH_FIELDS, Np) f32 — geometry + folded material/texture
  quad_table:   (QUAD_FIELDS, Mp) f32 — same, plus the precomputed plane
                basis (n, D, w — reference quad.hpp:12-23)

Materials/textures fold per primitive (the reference shares them by
pointer; we denormalize — memory is trivial at these scene sizes).
Supported texture kinds in-kernel: solid, checker-of-solids, marble noise,
and nearest-texel images up to MAX_KERNEL_TEXELS. Scenes beyond that
(oversized atlases, bilinear filtering, nested non-solid checkers) report
``supported=False`` and the renderer falls back to the XLA wavefront path.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .types import (
    MAT_DIFFUSE_LIGHT,
    TEX_CHECKER,
    TEX_IMAGE,
    TEX_NOISE,
    TEX_SOLID,
    Scene,
)

# sphere table rows
S_CX, S_CY, S_CZ, S_VX, S_VY, S_VZ, S_R = range(7)
S_MTYPE, S_PARAM, S_AR, S_AG, S_AB, S_TKIND, S_TSCALE, S_A2R, S_A2G, S_A2B = range(7, 17)
SPH_FIELDS = 17

# quad table rows: geometry then the same shading block
Q_QX, Q_QY, Q_QZ, Q_UX, Q_UY, Q_UZ, Q_VX, Q_VY, Q_VZ = range(9)
Q_NX, Q_NY, Q_NZ, Q_D, Q_WX, Q_WY, Q_WZ = range(9, 16)
Q_MTYPE, Q_PARAM, Q_AR, Q_AG, Q_AB, Q_TKIND, Q_TSCALE, Q_A2R, Q_A2G, Q_A2B = range(16, 26)
QUAD_FIELDS = 26

# in-kernel texture kinds
TK_SOLID = 0.0
TK_CHECKER = 1.0
TK_NOISE = 2.0   # marble (texture.hpp:127-156); TSCALE = noise scale
TK_IMAGE = 3.0   # image texture (texture.hpp:91-122); A2R/A2G/A2B carry
                 # (atlas base texel, width, height) — see atlas_table()

# Largest image (H·W texels) the kernel fetches from the channel-
# replicated f32 atlas (24 sublane-replicated rows in VMEM). The per-lane
# gather scans the atlas in 128-lane chunks, so cost grows linearly
# with this; 16384 texels (e.g. 128×128) ≈ 128 chunk-selects per fetch.
MAX_KERNEL_TEXELS = 16384

# Bigger images use the round-5 PACKED tier: one (1, T) int32 row holding
# R<<16|G<<8|B per texel (the u8 values the reference's rtw_image pipeline
# produces — rtw_stb_image.hpp:154-169), broadcast to (8, 128) chunk by
# chunk at fetch time. 1/24th the VMEM of the replicated tier (a 1024×512
# reference-scale earthmap is 2.1 MB) and one scan instead of three.
# Requires texels to be exactly u8/255 (true for every file-loaded image —
# the loader round-trips u8 for reference parity; raw float arrays that
# aren't representable fall back to the XLA path). Above this cap (8 MB
# VMEM) scenes fall back to the XLA integrator (supported=False).
MAX_PACKED_TEXELS = 1 << 21

# ---------------------------------------------------------------------------
# Unified primitive table (megakernel v2): one (U_FIELDS, Np+Mq) table whose
# shading rows are shared between spheres and quads, so a single one-hot
# matmul resolves the winner's attributes regardless of primitive kind.
# Geometry rows are kind-specific:
#   spheres: G0..G2 = center, G3..G5 = velocity, G6 = radius
#   quads:   G0..G2 = unit normal, G3 = plane D, G4..G6 = w
# Quad extras (corner q, edges u, v) live in rows 17..25; zero for spheres.
# ---------------------------------------------------------------------------
U_G0, U_G1, U_G2, U_G3, U_G4, U_G5, U_G6 = range(7)
U_MTYPE, U_PARAM, U_AR, U_AG, U_AB, U_TKIND, U_TSCALE, U_A2R, U_A2G, U_A2B = range(7, 17)
U_QX, U_QY, U_QZ, U_UX, U_UY, U_UZ, U_VX, U_VY, U_VZ = range(17, 26)
U_FIELDS = 32  # padded to a sublane-friendly row count


def unified_table(scene: Scene, chunk: int = 8):
    """Build the unified primitive table.

    Returns (table (U_FIELDS, P) f32, n_sph_pad, n_quad, supported) where
    spheres occupy columns [0, n_sph_pad) (padded to a multiple of ``chunk``
    with radius-0 rows) and quads the remaining columns (padded to
    ``chunk`` too, with zero normals → rejected).
    """
    flat = flatten_scene(scene, lane_pad=1)
    stab = np.asarray(flat.sphere_table)
    qtab = np.asarray(flat.quad_table)
    ns = int(np.count_nonzero(stab[S_R] > 0))
    nxr = qtab[Q_NX:Q_NZ + 1]
    nq = int(np.count_nonzero((nxr * nxr).sum(0) > 0))

    ns_pad = max(chunk, -(-max(ns, 1) // chunk) * chunk)
    nq_pad = max(chunk, -(-max(nq, 1) // chunk) * chunk)
    table = np.zeros((U_FIELDS, ns_pad + nq_pad), np.float32)
    if ns:
        table[U_G0:U_G2 + 1, :ns] = stab[S_CX:S_CZ + 1, :ns]
        table[U_G3:U_G5 + 1, :ns] = stab[S_VX:S_VZ + 1, :ns]
        table[U_G6, :ns] = stab[S_R, :ns]
        table[U_MTYPE:U_A2B + 1, :ns] = stab[S_MTYPE:S_A2B + 1, :ns]
    if nq:
        o = ns_pad
        table[U_G0:U_G2 + 1, o:o + nq] = qtab[Q_NX:Q_NZ + 1, :nq]
        table[U_G3, o:o + nq] = qtab[Q_D, :nq]
        table[U_G4:U_G6 + 1, o:o + nq] = qtab[Q_WX:Q_WZ + 1, :nq]
        table[U_MTYPE:U_A2B + 1, o:o + nq] = qtab[Q_MTYPE:Q_A2B + 1, :nq]
        table[U_QX:U_QZ + 1, o:o + nq] = qtab[Q_QX:Q_QZ + 1, :nq]
        table[U_UX:U_UZ + 1, o:o + nq] = qtab[Q_UX:Q_UZ + 1, :nq]
        table[U_VX:U_VZ + 1, o:o + nq] = qtab[Q_VX:Q_VZ + 1, :nq]
    return table, ns_pad, nq, flat.supported


# spheres per culling cluster in the block kernel's clustered sweep
# (ops/megakernel_block.py): consecutive sweep-table rows grouped under one
# swept AABB that the kernel slab-tests against the whole ray tile before
# (conditionally) sweeping the group
CLUSTER_SIZE = 16


def sweep_tables(scene: Scene):
    """Per-primitive scalar tables for the block megakernel's SMEM sweep
    (ops/megakernel_block.py): the scalar core streams one primitive's
    fields per loop step as vector-scalar operands — measured ~1.35x the
    pairwise-chunk sweep and ~70x faster to compile (no unrolled chunks).

    Returns (sph (max(ns,1), 8) f32, quad (max(nq,1), 16) f32, ns, nq,
    ns_pad) where ns_pad is the unified-table quad column offset (chunk-8
    padded, matching unified_table) so winner index ``ns_pad + j`` resolves
    quad ``j`` in the replicated resolve table.

    Sphere cols: cx cy cz vx vy vz r² (r² computed in f32 so the kernel's
    ``oc·oc - r²`` matches the pairwise kernel's ``... - r*r`` bit-for-bit).
    Quad cols: nx ny nz D qx qy qz wx wy wz ux uy uz vx vy vz.
    """
    flat = flatten_scene(scene, lane_pad=1)
    stab = np.asarray(flat.sphere_table)
    qtab = np.asarray(flat.quad_table)
    ns = int(np.count_nonzero(stab[S_R] > 0))
    nxr = qtab[Q_NX:Q_NZ + 1]
    nq = int(np.count_nonzero((nxr * nxr).sum(0) > 0))
    ns_pad = max(8, -(-max(ns, 1) // 8) * 8)

    # pad row counts to a multiple of CLUSTER_SIZE (spheres; divisible by
    # the manual-unroll factor 8 — Mosaic only lowers fori unroll=1/full)
    # resp. 8 (quads). Padding rows can never win: sphere pads carry
    # r² = -1e30 (discriminant always very negative), quad pads a zero
    # normal (denominator rejected).
    ns_it = max(CLUSTER_SIZE,
                -(-max(ns, 1) // CLUSTER_SIZE) * CLUSTER_SIZE)
    nq_it = max(8, -(-max(nq, 1) // 8) * 8)
    sph = np.zeros((ns_it, 8), np.float32)
    sph[:, 6] = -1e30
    if ns:
        sph[:, 0:3] = 0.0
        sph[:ns, 0:3] = stab[S_CX:S_CZ + 1, :ns].T
        sph[:ns, 3:6] = stab[S_VX:S_VZ + 1, :ns].T
        r = stab[S_R, :ns].astype(np.float32)
        sph[:ns, 6] = r * r
    quad = np.zeros((nq_it, 16), np.float32)
    if nq:
        quad[:nq, 0:3] = qtab[Q_NX:Q_NZ + 1, :nq].T
        quad[:nq, 3] = qtab[Q_D, :nq]
        quad[:nq, 4:7] = qtab[Q_QX:Q_QZ + 1, :nq].T
        quad[:nq, 7:10] = qtab[Q_WX:Q_WZ + 1, :nq].T
        quad[:nq, 10:13] = qtab[Q_UX:Q_UZ + 1, :nq].T
        quad[:nq, 13:16] = qtab[Q_VX:Q_VZ + 1, :nq].T
    return sph, quad, ns, nq, ns_pad


def sphere_cluster_order(scene: Scene, big_factor: float = 8.0):
    """Spatial (Morton) sphere ordering so CLUSTER_SIZE-row groups of the
    sweep table form *compact* blobs the frustum cull can reject.

    Build order groups whole grid rows of the final scene into one
    cluster: a 22-unit-long slab whose bounding sphere is as wide as the
    scene, so no ray cone can ever cull it (measured: 31/31 clusters
    executed per tile). This reorders the spheres:

    * oversized spheres (radius > ``big_factor`` × median real radius,
      e.g. the r=1000 ground sphere) come first in original order — their
      bounds span the scene, so they get their own never-culled leading
      cluster(s) instead of poisoning a spatial one;
    * the rest are sorted by the Morton code of their swept-box center
      (10 bits/axis over the small-sphere bounding box);
    * padding entries (radius ≤ 0) stay last.

    Returns a permutation ``perm`` with ``perm[new] = old`` (identity if
    there is nothing to reorder), to be applied to every per-sphere scene
    column before flattening. Winner *values* are unchanged — only the
    tie-break order among exactly-equal hit distances moves, which the
    kernel-equality tests already treat as measure-zero.
    """
    r = np.asarray(scene.spheres.radius)
    n = r.shape[0]
    perm = np.arange(n)
    real = np.nonzero(r > 0)[0]
    if len(real) < 2 * CLUSTER_SIZE:
        return perm
    rr = r[real]
    med = float(np.median(rr))
    big_mask = rr > big_factor * max(med, 1e-30)
    big = real[big_mask]
    small = real[~big_mask]
    c = np.asarray(scene.spheres.center)[small]
    v = np.asarray(scene.spheres.velocity)[small]
    mid = c + 0.5 * v
    lo = mid.min(axis=0)
    span = np.maximum(mid.max(axis=0) - lo, 1e-30)
    q = np.clip(((mid - lo) / span * 1023.0).astype(np.int64), 0, 1023)

    def _spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    key = (_spread(q[:, 0]) | (_spread(q[:, 1]) << 1)
           | (_spread(q[:, 2]) << 2))
    order = np.argsort(key, kind="stable")
    pad = np.nonzero(r <= 0)[0]
    return np.concatenate([big, small[order], pad]).astype(np.int64)


def sphere_cluster_boxes(sph_sweep: np.ndarray):
    """Swept AABBs of consecutive CLUSTER_SIZE-row groups of the sphere
    sweep table — the cull geometry for the block kernel's clustered sweep.

    Each sphere's box spans its full motion (centers ``c`` and ``c+v``,
    the reference's t∈[0,1] motion-blur window, sphere.hpp:36-44 /
    bvh-style swept bounds) inflated by the radius. Padding rows
    (r² ≤ 0) contribute empty boxes; an all-padding cluster gets
    min=+BIG/max=-BIG so its slab test can never pass.

    Returns (n_clusters, 8) f32 [mnx mny mnz mxx mxy mxz 0 0] for SMEM.
    """
    rows = np.asarray(sph_sweep, np.float32)
    n = rows.shape[0]
    assert n % CLUSTER_SIZE == 0
    c = rows[:, 0:3]
    v = rows[:, 3:6]
    rsq = rows[:, 6]
    real = rsq > 0
    r = np.sqrt(np.maximum(rsq, 0.0))[:, None]
    mn = np.minimum(c, c + v) - r
    mx = np.maximum(c, c + v) + r
    mn = np.where(real[:, None], mn, 3.0e38)
    mx = np.where(real[:, None], mx, -3.0e38)
    k = n // CLUSTER_SIZE
    out = np.zeros((k, 8), np.float32)
    out[:, 0:3] = mn.reshape(k, CLUSTER_SIZE, 3).min(axis=1)
    out[:, 3:6] = mx.reshape(k, CLUSTER_SIZE, 3).max(axis=1)
    return out


def global_id_map(scene: Scene):
    """Kernel-index → global-primitive-id map for the megakernel's
    recorded decisions (diff/replay.py). Kernel sphere ``j`` is the j-th
    *real* sphere (radius > 0) in scene order; kernel quad ``j`` (at
    column ``ns_pad + j``) is the j-th real quad. Global ids are XLA-side:
    sphere array index, or ``scene.n_spheres + quad array index``
    (ops/intersect.py closest_hit_brute concatenation order). Padding
    columns map to -1 (they can never win a sweep)."""
    radius = np.asarray(scene.spheres.radius)
    sidx = np.nonzero(radius > 0)[0]
    qu = np.asarray(scene.quads.u)
    qv = np.asarray(scene.quads.v)
    n_cross = np.cross(qu, qv)
    qidx = np.nonzero((n_cross * n_cross).sum(-1) > 0)[0]
    ns = len(sidx)
    nq = len(qidx)
    ns_pad = max(8, -(-max(ns, 1) // 8) * 8)
    out = np.full(ns_pad + max(nq, 1), -1, np.int32)
    out[:ns] = sidx
    out[ns_pad:ns_pad + nq] = scene.n_spheres + qidx
    return out


def resolve_table_rep(table: np.ndarray, fields):
    """Field-replicated resolve table for the block kernel: for each field
    ``f`` in ``fields``, rows [fi·8, fi·8+8) all hold ``table[f]`` so a
    per-ray ``take_along_axis`` with an (8, 128) winner-index block fetches
    that field for all 1024 rays at once. (P → lanes, 128-padded.)"""
    p = table.shape[1]
    p_pad = max(128, -(-p // 128) * 128)
    out = np.zeros((len(fields) * 8, p_pad), np.float32)
    for fi, f in enumerate(fields):
        out[fi * 8:(fi + 1) * 8, :p] = table[f][None, :]
    return out


def noise_tables_rep(scene: Scene):
    """Row-replicated Perlin tables for per-ray (8, 128) gathers:
    (48, 256) f32 — row blocks of 8: perm_x, perm_y, perm_z, grad_x,
    grad_y, grad_z (each replicated across its 8 sublanes)."""
    out = np.zeros((48, 256), np.float32)
    out[0:8] = np.asarray(scene.perlin.perm_x)[None, :]
    out[8:16] = np.asarray(scene.perlin.perm_y)[None, :]
    out[16:24] = np.asarray(scene.perlin.perm_z)[None, :]
    rv = np.asarray(scene.perlin.randvec)
    out[24:32] = rv[:, 0][None, :]
    out[32:40] = rv[:, 1][None, :]
    out[40:48] = rv[:, 2][None, :]
    return out


def atlas_table_rep(scene: Scene, max_texels: int = MAX_KERNEL_TEXELS):
    """Channel-replicated atlas for per-ray gathers: (24, T_pad128) f32,
    row blocks of 8 = R, G, B replicated. Returns (table, bases, ok)."""
    tab, bases, ok = atlas_table(scene, max_texels)
    if not ok:
        return np.zeros((24, 128), np.float32), None, False
    out = np.zeros((24, tab.shape[1]), np.float32)
    for c in range(3):
        out[c * 8:(c + 1) * 8] = tab[c][None, :]
    return out, bases, True


class FlatScene(NamedTuple):
    sphere_table: jnp.ndarray  # (SPH_FIELDS, Np)
    quad_table: jnp.ndarray    # (QUAD_FIELDS, Mp)
    supported: bool            # False → megakernel cannot shade this scene


def atlas_table(scene: Scene, max_texels: int = MAX_KERNEL_TEXELS):
    """Pack the scene's image atlas into a gather-friendly (8, T_pad128)
    table — rows 0..2 hold R, G, B of row-major-flattened texels, images
    concatenated. Returns (table f32, per-image base offsets, ok). ``ok``
    is False when the atlas exceeds ``max_texels`` (the kernel's per-lane
    gather scans lanes in 128-wide chunks, so VMEM and fetch cost grow
    linearly with atlas size) — callers then fall back to the XLA path."""
    sizes = np.asarray(scene.atlas.sizes)
    texels = np.asarray(scene.atlas.texels)
    total = int((np.maximum(sizes[:, 0], 0) * np.maximum(sizes[:, 1], 0)).sum())
    if total > max_texels:
        return np.zeros((8, 128), np.float32), None, False
    t_pad = max(128, -(-max(total, 1) // 128) * 128)
    tab = np.zeros((8, t_pad), np.float32)
    bases = []
    off = 0
    for k in range(len(sizes)):
        h, w = int(sizes[k, 0]), int(sizes[k, 1])
        bases.append(off)
        if h > 0 and w > 0:
            tab[0:3, off:off + h * w] = texels[k, :h, :w].reshape(h * w, 3).T
            off += h * w
    return tab, bases, True


def atlas_table_packed(scene: Scene, max_texels: int = MAX_PACKED_TEXELS):
    """(S_pad8, 128) int32 RGB-packed atlas (big-image kernel tier; see
    MAX_PACKED_TEXELS): texel ``t`` lives at ``[t >> 7, t & 127]`` with
    word = r8 << 16 | g8 << 8 | b8. The kernel reconstructs each channel
    as f32(u8) / 255.0 — bit-identical to the stored f32 texel because
    the loader computes texels the same way (u8 round-trip per
    rtw_stb_image.hpp:154-169 parity). Texels-on-SUBLANES lets the
    kernel's range-bounded scan fetch 8-row windows with dynamic
    8-aligned sublane loads (the only dynamic indexing Mosaic allows)
    instead of unrolling the whole atlas into the instruction stream.

    Returns (table int32, per-image base offsets, ok); ok is False when
    the atlas exceeds ``max_texels`` or any texel is not exactly
    u8/255-representable (e.g. a raw float array fed to builder.image)."""
    sizes = np.asarray(scene.atlas.sizes)
    texels = np.asarray(scene.atlas.texels, np.float32)
    total = int((np.maximum(sizes[:, 0], 0) * np.maximum(sizes[:, 1], 0)).sum())
    if total > max_texels:
        return None, None, False
    u8 = np.clip(np.rint(texels * 255.0), 0, 255).astype(np.int64)
    if not np.array_equal(u8.astype(np.float32) / np.float32(255.0), texels):
        return None, None, False
    packed = (u8[..., 0] << 16) | (u8[..., 1] << 8) | u8[..., 2]
    # rows of 128 texels, padded to a multiple of 8 rows (1024 texels) so
    # every 8-row window load is in bounds
    s_pad = max(8, -(-max(total, 1) // 1024) * 8)
    flat = np.zeros((s_pad * 128,), np.int32)
    bases = []
    off = 0
    for k in range(len(sizes)):
        h, w = int(sizes[k, 0]), int(sizes[k, 1])
        bases.append(off)
        if h > 0 and w > 0:
            flat[off:off + h * w] = packed[k, :h, :w].reshape(h * w)
            off += h * w
    return flat.reshape(s_pad, 128), bases, True


def perlin_tables(scene: Scene):
    """Pack the Perlin tables (scene/perlin.py make_tables) for in-kernel
    lane gathers: ``perm_tab (8, 256)`` rows 0..2 = perm_x/y/z (integers,
    exact in f32) and ``vec_tab (8, 256)`` rows 0..2 = gradient x/y/z."""
    perm = np.zeros((8, 256), np.float32)
    perm[0] = np.asarray(scene.perlin.perm_x)
    perm[1] = np.asarray(scene.perlin.perm_y)
    perm[2] = np.asarray(scene.perlin.perm_z)
    vec = np.zeros((8, 256), np.float32)
    vec[0:3] = np.asarray(scene.perlin.randvec).T
    return perm, vec


def _shading_columns(scene: Scene, mat_id: np.ndarray, atlas_bases=None):
    """Per-primitive folded shading block (10 rows) for ``mat_id`` rows.
    Returns (rows (10, n) np.float32, supported).

    Texture kinds folded in-kernel: solid, checker-of-solids, marble noise
    (TSCALE = scale) and nearest-neighbor image (A2R/A2G/A2B = atlas base,
    width, height; reference texture.hpp:91-156). A missing image folds to
    solid cyan — the reference's no-data sentinel (texture.hpp:99-102).
    """
    mats = np.asarray(scene.materials.mtype)
    tex_id = np.asarray(scene.materials.tex_id)
    fuzz = np.asarray(scene.materials.fuzz)
    ior = np.asarray(scene.materials.ior)
    ttype = np.asarray(scene.textures.ttype)
    rgb = np.asarray(scene.textures.rgb)
    scale = np.asarray(scene.textures.scale)
    child = np.asarray(scene.textures.child)
    image_id = np.asarray(scene.textures.image_id)
    sizes = np.asarray(scene.atlas.sizes)

    n = len(mat_id)
    rows = np.zeros((10, n), np.float32)
    supported = True
    for k, m in enumerate(mat_id):
        mt = mats[m]
        t = tex_id[m]
        tk = TK_SOLID
        alb = rgb[t]
        alb2 = np.zeros(3, np.float32)
        tscale = 1.0
        if ttype[t] == TEX_CHECKER:
            even, odd = child[t]
            if ttype[even] == TEX_SOLID and ttype[odd] == TEX_SOLID:
                tk = TK_CHECKER
                alb = rgb[even]
                alb2 = rgb[odd]
                tscale = scale[t]  # already inv_scale (builder.checker)
            else:
                supported = False
        elif ttype[t] == TEX_NOISE:
            tk = TK_NOISE
            tscale = scale[t]
        elif ttype[t] == TEX_IMAGE:
            img = int(image_id[t])
            h, w = int(sizes[img, 0]), int(sizes[img, 1])
            if h <= 0 or w <= 0:
                alb = np.asarray((0.0, 1.0, 1.0), np.float32)  # cyan sentinel
            elif atlas_bases is None or scene.flags.image_bilinear:
                # atlas too large for VMEM, or bilinear filtering requested
                # (kernel implements the reference's nearest-neighbor only)
                supported = False
            else:
                tk = TK_IMAGE
                alb2 = np.asarray((atlas_bases[img], w, h), np.float32)
        rows[0, k] = mt
        rows[1, k] = fuzz[m] if mt != 2 else ior[m]  # PARAM: fuzz | ior
        rows[2:5, k] = alb
        rows[5, k] = tk
        rows[6, k] = tscale
        rows[7:10, k] = alb2
    return rows, supported


def flatten_scene(scene: Scene, lane_pad: int = 128) -> FlatScene:
    """Host-side packing (NumPy; not differentiable — the megakernel is a
    forward/inference path; gradients use the XLA wavefront integrator)."""
    sph = scene.spheres
    center = np.asarray(sph.center)
    vel = np.asarray(sph.velocity)
    radius = np.asarray(sph.radius)
    smat = np.asarray(sph.mat_id)
    # only real spheres (radius > 0) participate
    real = radius > 0
    idx = np.nonzero(real)[0]
    ns = len(idx)
    np_pad = max(lane_pad, -(-max(ns, 1) // lane_pad) * lane_pad)
    stab = np.zeros((SPH_FIELDS, np_pad), np.float32)
    stab[S_R, :] = 0.0  # padded rows never hit

    atlas_bases = None
    if scene.flags.has_image and not scene.flags.image_bilinear:
        _, atlas_bases, atlas_ok = atlas_table(scene)
        if not atlas_ok:
            # replicated-f32 tier too small: try the packed-u8 tier
            # (the base offsets are laid out identically)
            _, atlas_bases, atlas_ok = atlas_table_packed(scene)
        if not atlas_ok:
            atlas_bases = None

    if ns:
        stab[S_CX:S_CZ + 1, :ns] = center[idx].T
        stab[S_VX:S_VZ + 1, :ns] = vel[idx].T
        stab[S_R, :ns] = radius[idx]
        shade, sup_s = _shading_columns(scene, smat[idx], atlas_bases)
        stab[S_MTYPE:S_A2B + 1, :ns] = shade
    else:
        sup_s = True

    qd = scene.quads
    qq = np.asarray(qd.q)
    qu = np.asarray(qd.u)
    qv = np.asarray(qd.v)
    qmat = np.asarray(qd.mat_id)
    n_cross = np.cross(qu, qv)
    nn = (n_cross * n_cross).sum(-1)
    realq = nn > 0
    qidx = np.nonzero(realq)[0]
    mq = len(qidx)
    mq_pad = max(lane_pad, -(-max(mq, 1) // lane_pad) * lane_pad)
    qtab = np.zeros((QUAD_FIELDS, mq_pad), np.float32)
    if mq:
        qtab[Q_QX:Q_QZ + 1, :mq] = qq[qidx].T
        qtab[Q_UX:Q_UZ + 1, :mq] = qu[qidx].T
        qtab[Q_VX:Q_VZ + 1, :mq] = qv[qidx].T
        n_r = n_cross[qidx]
        nn_r = nn[qidx]
        unit_n = n_r / np.sqrt(nn_r)[:, None]
        qtab[Q_NX:Q_NZ + 1, :mq] = unit_n.T
        qtab[Q_D, :mq] = (unit_n * qq[qidx]).sum(-1)
        qtab[Q_WX:Q_WZ + 1, :mq] = (n_r / nn_r[:, None]).T
        shade_q, sup_q = _shading_columns(scene, qmat[qidx], atlas_bases)
        qtab[Q_MTYPE:Q_A2B + 1, :mq] = shade_q
        # padded quads: zero normal → denominator 0 → rejected in kernel
    else:
        sup_q = True

    return FlatScene(
        sphere_table=jnp.asarray(stab),
        quad_table=jnp.asarray(qtab),
        supported=bool(sup_s and sup_q),
    )


def n_real_spheres(flat: FlatScene) -> int:
    return int(np.count_nonzero(np.asarray(flat.sphere_table[S_R]) > 0))


def n_real_quads(flat: FlatScene) -> int:
    nx = np.asarray(flat.quad_table[Q_NX:Q_NZ + 1])
    return int(np.count_nonzero((nx * nx).sum(0) > 0))
