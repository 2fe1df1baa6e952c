"""Pallas TPU wavefront megakernel: the full per-bounce pipeline —
intersect → shade → texture → scatter → RNG — with the entire scene
(primitive tables, chunked BVH, Perlin tables, image atlas) resident in
VMEM and the bounce loop inside the kernel.

Architecture (v3 — unrolled bounces + in-kernel BVH; see
/opt/skills/guides/pallas_guide.md):

* A tile is 128 rays; per-ray state lives in ``(1, 128)`` rows (rays on
  lanes). The grid iterates ray tiles.
* Closest hit, two strategies selected per scene size:
  - **dense sweep**: the unified primitive table ``(P, 128)`` (primitives
    on sublanes, fields on lanes — scene/flatten.py) is tested in chunks
    of 8 with static indexing only: chunk fields broadcast ``(8, 1)``
    against ray rows giving pairwise ``(8, 128)`` candidate blocks — pure
    f32 VPU, no scalar loads, no MXU in the precision-critical path.
  - **chunked-BVH walk** (ops/mega_bvh.py): each lane walks a preorder
    skip-link tree over homogeneous 8-primitive leaf chunks; node fields
    arrive via lane gathers (``take_along_axis`` on ``(8, 128)`` blocks),
    leaves are intersected pairwise immediately so ``t_best`` shrinks and
    later slab tests prune (bvh_node.hpp:80-95 semantics).
* Winner attributes resolve via per-lane gathers from a transposed field
  table — exact f32 and ~10x cheaper than the one-hot-HIGHEST-matmul
  alternative measured in round 1.
* Textures evaluate in-kernel for all four reference kinds: solid,
  3-D checker, marble Perlin noise (7-octave turbulence, XOR-hash lattice
  gathers — perlin.hpp:94-254) and nearest-texel images from a packed
  atlas (texture.hpp:91-122; capped at flatten.MAX_KERNEL_TEXELS — larger
  atlases fall back to the XLA path).
* The bounce loop is **statically unrolled** per phase: a Mosaic
  ``while_loop`` iteration was measured (round 2, v5e) to carry a ~2 µs
  fixed floor — carry spill/relayout + cond — that dwarfs the ~0.7 µs of
  actual VPU work per bounce. Early termination is provided between
  phases instead: the driver runs shrinking bounce budgets with dead-ray
  compaction between them (``trace_megakernel`` ``phase_depths``).
* RNG is the same PCG4D counter hash as core/rng.py, evaluated in-kernel on
  u32 lanes — sampling decisions match the XLA wavefront integrator.

Mosaic gotchas encoded here (each found the hard way on v5e):
  * no u32→f32 casts (route through i32),
  * no select on bool operands / bool loop carries (carry f32 masks),
  * constant-initialized loop carries get pinned to replicated register
    layouts — initialize from a VMEM round-trip,
  * dynamic indexing must be 8-aligned on sublanes and is impossible on
    lanes (hence the chunked, transposed table layout); per-lane dynamic
    addressing only via ``take_along_axis`` within a 128-lane window,
  * per-primitive scalar loads from SMEM stall the vector pipeline (the v1
    design ran at ~5e5 rays/s); everything here is vector slices,
  * while_loop iterations cost ~2 µs regardless of body size — unroll
    static trip counts, amortize data-dependent ones,
  * no ``arctan2``/``arctan`` lowering on the real-hardware TC path
    (interpret mode accepts them silently!) — use the polynomial
    ``megakernel_block._atan2f``; sin/cos/exp/log/sqrt/rsqrt are fine.

This is the forward/throughput path. Gradients: either the XLA integrator
(render/integrator.py) end to end, or — the fast path — this kernel as the
*decision pass* (``trace_megakernel(want_ids=True)`` records per-bounce
winner ids) feeding the O(B) differentiable replay in diff/replay.py.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene import flatten as fl
from ..scene.types import Scene

TILE = 128          # rays per row group (lane count)
GROUPS = 8          # row groups per grid step (block sublane minimum)
BLOCK = TILE * GROUPS  # 1024 rays per grid step
CHUNK = 8           # primitives per pairwise block

BIG = 3.0e38
T_MIN = 1e-3

MT_METAL = 1.0
MT_DIELECTRIC = 2.0
MT_LIGHT = 3.0


class MegaScene(NamedTuple):
    table: jnp.ndarray    # (P, 128) unified primitive table (prims × fields)
    table_t: jnp.ndarray  # (32, P_pad128) transposed copy (fields × prims) —
                          # lets the winner's attributes be fetched with
                          # per-lane gathers instead of a one-hot matmul
    n_sph_pad: int        # sphere rows occupy [0, n_sph_pad)
    n_prims: int          # total rows P (multiple of CHUNK)
    supported: bool
    # in-kernel chunked BVH (ops/mega_bvh.py); None → brute-force only
    bvh_nodes: jnp.ndarray | None = None   # (8, K_pad128)
    sph_leaf: jnp.ndarray | None = None    # (64, LS_pad128)
    quad_leaf: jnp.ndarray | None = None   # (192, LQ_pad128)
    n_nodes: int = 0
    n_sph_chunks: int = 0
    n_quad_chunks: int = 0
    # texture resources (scene/flatten.py perlin_tables / atlas_table)
    perm_tab: jnp.ndarray | None = None    # (8, 256) Perlin permutations
    vec_tab: jnp.ndarray | None = None     # (8, 256) Perlin gradients
    atlas_tab: jnp.ndarray | None = None   # (8, T_pad128) packed RGB texels
    has_noise: bool = False                # any TK_NOISE primitive
    has_image: bool = False                # any TK_IMAGE primitive
    # block-layout kernel tables (ops/megakernel_block.py)
    sph_sweep: jnp.ndarray | None = None   # (max(ns,1), 8) SMEM scalar sweep
    quad_sweep: jnp.ndarray | None = None  # (max(nq,1), 16)
    n_sph: int = 0
    n_quad: int = 0
    tabt_rep: jnp.ndarray | None = None    # (F*8, P_pad128) field-replicated
    resolve_fields: tuple = ()             # unified-table field order in tabt_rep
    noise_rep: jnp.ndarray | None = None   # (48, 256) replicated Perlin
    atlas_rep: jnp.ndarray | None = None   # (24, T_pad128) replicated atlas
    kid_map: jnp.ndarray | None = None     # kernel idx → global prim id
                                           # (scene/flatten.py global_id_map)
    sph_cluster_boxes: jnp.ndarray | None = None  # (K, 8) swept cluster AABBs
                                           # (flatten.sphere_cluster_boxes)


# use the in-kernel BVH walk once the scene has more than this many
# primitive chunks. The crossover is far out: the block-layout SMEM sweep
# costs ~0.034 ns/seg per primitive (measured 17 ns/seg at 488 prims,
# v5e) while the lockstep walk's measured floor is ~80 ns/seg at the
# final-scene size — the walk only wins once the dense sweep passes it,
# around ~2.5k primitives.
BVH_MIN_CHUNKS = 256

# node steps per while-loop iteration of the in-kernel walk (amortizes the
# ~2 µs Mosaic while-iteration floor over a block of unrolled steps)
WALK_UNROLL = 8


def build_mega_scene(scene: Scene) -> MegaScene:
    # spatially reorder spheres (Morton, oversized-first) so the sweep
    # table's CLUSTER_SIZE groups are compact blobs the scalar frustum
    # cull can reject; kid_map composes the permutation back to original
    # scene ids so recorded decisions stay scene-order (flatten.py
    # sphere_cluster_order)
    orig_n_spheres = scene.n_spheres
    sph_perm = fl.sphere_cluster_order(scene)
    reordered = not np.array_equal(sph_perm, np.arange(len(sph_perm)))
    if reordered:
        scene = scene.replace(
            spheres=jax.tree_util.tree_map(
                lambda a: a[np.asarray(sph_perm)], scene.spheres
            )
        )
    table, ns_pad, nq, supported = fl.unified_table(scene, chunk=CHUNK)
    # kernel layout: primitives on sublanes, fields on lanes (padded to 128)
    t = np.zeros((table.shape[1], TILE), np.float32)
    t[:, : table.shape[0]] = np.asarray(table).T
    p_pad = -(-table.shape[1] // TILE) * TILE
    tt = np.zeros((fl.U_FIELDS, p_pad), np.float32)
    tt[:, : table.shape[1]] = np.asarray(table)

    from . import mega_bvh

    n_sph = int(np.count_nonzero(np.asarray(table)[fl.U_G6, :ns_pad] > 0))
    cb = mega_bvh.build_chunked_bvh(np.asarray(table), ns_pad, n_sph, nq)
    tkind = np.asarray(table)[fl.U_TKIND]
    has_noise = bool(np.any(tkind == fl.TK_NOISE))
    has_image = bool(np.any(tkind == fl.TK_IMAGE))
    perm_np, vec_np = fl.perlin_tables(scene)
    if has_image:
        atlas_np, _, small_ok = fl.atlas_table(scene)
        atlas_rep_np, _, _ = fl.atlas_table_rep(scene)
        if not small_ok:
            # big-image tier: (1, T) int32 RGB-packed atlas, broadcast to
            # chunks at fetch time (flatten.MAX_PACKED_TEXELS). The block
            # kernel detects the tier by dtype; the group-layout kernel
            # has no packed fetch, so trace_megakernel forces the block
            # layout for these scenes.
            packed_np, _, packed_ok = fl.atlas_table_packed(scene)
            if packed_ok:
                atlas_rep_np = packed_np
    else:
        atlas_np = np.zeros((8, TILE), np.float32)
        atlas_rep_np = np.zeros((24, TILE), np.float32)

    # block-layout kernel tables (ops/megakernel_block.py)
    sph_sw, quad_sw, n_sph_real, n_quad_real, _ = fl.sweep_tables(scene)
    resolve_fields = (fl.U_G0, fl.U_G1, fl.U_G2, fl.U_G3, fl.U_G4, fl.U_G5,
                      fl.U_G6, fl.U_MTYPE, fl.U_PARAM, fl.U_AR, fl.U_AG,
                      fl.U_AB, fl.U_TKIND, fl.U_TSCALE, fl.U_A2R, fl.U_A2G,
                      fl.U_A2B)
    if has_image and n_quad_real > 0:
        resolve_fields = resolve_fields + (
            fl.U_QX, fl.U_QY, fl.U_QZ, fl.U_UX, fl.U_UY, fl.U_UZ,
            fl.U_VX, fl.U_VY, fl.U_VZ)
    tabt_rep_np = fl.resolve_table_rep(np.asarray(table), resolve_fields)
    # Append the kernel-id → ORIGINAL-scene-id map as one more replicated
    # pseudo-field (8 rows) so the block kernel can record GLOBAL winner
    # ids directly with one in-kernel lane gather. The XLA alternative —
    # jnp.take(kid_map, ids) over (depth, B) recorded ids — lowers to an
    # element-serial TPU gather at ~8 ns/element and dominated the whole
    # fwd+bwd decision pass (measured 59 of 78 ms per 360k-ray chunk,
    # device trace 2026-08-20).
    kid_np = np.asarray(_compose_kid_map(
        fl.global_id_map(scene), sph_perm if reordered else None,
        orig_n_spheres))
    p_pad_rep = tabt_rep_np.shape[1]
    kid_pad = np.full((p_pad_rep,), -1.0, np.float32)
    kid_pad[: kid_np.shape[0]] = kid_np.astype(np.float32)
    tabt_rep_np = np.concatenate(
        [tabt_rep_np, np.tile(kid_pad[None, :], (8, 1))], axis=0)
    noise_rep_np = (fl.noise_tables_rep(scene) if has_noise
                    else np.zeros((48, 256), np.float32))
    return MegaScene(
        table=jnp.asarray(t),
        table_t=jnp.asarray(tt),
        n_sph_pad=ns_pad,
        n_prims=table.shape[1],
        supported=supported,
        bvh_nodes=jnp.asarray(cb.node_tab),
        sph_leaf=jnp.asarray(cb.sph_leaf_tab),
        quad_leaf=jnp.asarray(cb.quad_leaf_tab),
        n_nodes=cb.n_nodes,
        n_sph_chunks=cb.n_sph_chunks,
        n_quad_chunks=cb.n_quad_chunks,
        perm_tab=jnp.asarray(perm_np),
        vec_tab=jnp.asarray(vec_np),
        atlas_tab=jnp.asarray(atlas_np),
        has_noise=has_noise,
        has_image=has_image,
        sph_sweep=jnp.asarray(sph_sw),
        quad_sweep=jnp.asarray(quad_sw),
        n_sph=n_sph_real,
        n_quad=n_quad_real,
        tabt_rep=jnp.asarray(tabt_rep_np),
        resolve_fields=resolve_fields,
        noise_rep=jnp.asarray(noise_rep_np),
        atlas_rep=jnp.asarray(atlas_rep_np),
        kid_map=jnp.asarray(kid_np),
        sph_cluster_boxes=jnp.asarray(fl.sphere_cluster_boxes(sph_sw)),
    )


def _compose_kid_map(kid: np.ndarray, sph_perm, n_spheres: int):
    """Map kernel winner ids through the cluster-order sphere permutation
    back to ORIGINAL scene sphere indices (quad ids are untouched — quads
    are not reordered)."""
    if sph_perm is None:
        return kid
    kid = np.array(kid)
    m = (kid >= 0) & (kid < n_spheres)
    kid[m] = np.asarray(sph_perm)[kid[m]]
    return kid


def _pcg4d(a, b, c, d):
    mul = jnp.uint32(1664525)
    add = jnp.uint32(1013904223)
    v0 = a * mul + add
    v1 = b * mul + add
    v2 = c * mul + add
    v3 = d * mul + add
    v0 = v0 + v1 * v3
    v1 = v1 + v2 * v0
    v2 = v2 + v0 * v1
    v3 = v3 + v1 * v2
    v0 = v0 ^ (v0 >> 16)
    v1 = v1 ^ (v1 >> 16)
    v2 = v2 ^ (v2 >> 16)
    v3 = v3 ^ (v3 >> 16)
    v0 = v0 + v1 * v3
    v1 = v1 + v2 * v0
    v2 = v2 + v0 * v1
    v3 = v3 + v1 * v2
    return v0, v1, v2, v3


def _u01(x):
    # Mosaic has no u32→f32 cast; the top-24-bit value fits an i32 exactly.
    return (x >> jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32) * jnp.float32(
        1.0 / (1 << 24)
    )


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def make_megakernel(mega: MegaScene, *, max_depth: int, background,
                    tmin: float = T_MIN, interpret: bool = False,
                    use_bvh: bool | None = None, ablate: tuple = (),
                    unroll: bool | None = None):
    """Returns ``fn(table, rays...) -> (rad_r, rad_g, rad_b, bounces)`` on
    ``(n_tiles, 128)`` ray component arrays.

    ``use_bvh`` selects the closest-hit strategy inside the kernel: the
    per-lane stackless chunked-BVH walk (ops/mega_bvh.py; reference
    semantics bvh_node.hpp:80-95) or the dense pairwise sweep over every
    primitive chunk. Default (None): BVH when the scene is large enough
    (> BVH_MIN_CHUNKS chunks) for the walk to out-prune the sweep.

    ``ablate`` (perf-diagnosis only, wrong images): drop named stages —
    'resolve' (winner-attribute gathers), 'shade' (material math), 'rng'.
    """
    n_prims = mega.n_prims
    ns_pad = mega.n_sph_pad
    n_chunks = n_prims // CHUNK
    sph_chunks = ns_pad // CHUNK
    tabt_shape1 = mega.table_t.shape[1]
    bg_r, bg_g, bg_b = (float(background[0]), float(background[1]), float(background[2]))
    U = fl
    if use_bvh is None:
        use_bvh = mega.bvh_nodes is not None and n_chunks > BVH_MIN_CHUNKS
    if unroll is None:
        # unrolled bounces are the fast compiled form; interpret mode (CI)
        # keeps the while_loop so the traced graph stays small enough for
        # the CPU interpreter/compiler (an unrolled depth-20 body is ~100k
        # jaxpr equations and XLA-CPU chokes on it)
        unroll = not interpret
    if use_bvh:
        assert mega.bvh_nodes is not None, "mega scene built without a BVH"
    n_node_lanes = mega.bvh_nodes.shape[1] if use_bvh else TILE
    ls_lanes = mega.sph_leaf.shape[1] if use_bvh else TILE
    lq_lanes = mega.quad_leaf.shape[1] if use_bvh else TILE
    n_sph_chunks = mega.n_sph_chunks
    n_quad_chunks = mega.n_quad_chunks
    has_noise = mega.has_noise
    has_image = mega.has_image
    atlas_lanes = mega.atlas_tab.shape[1] if mega.atlas_tab is not None else TILE

    def kernel(tab_ref, tabt_ref, nodes_ref, sleaf_ref, qleaf_ref,
               perm_ref, vec_ref, atlas_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tm_ref,
               pix_ref, smp_ref,
               tr_ref, tg_ref, tb2_ref, ra_ref, ga_ref, ba_ref, act_ref,
               seed_ref,
               rr_ref, rg_ref, rb_ref, bc_ref,
               oox_ref, ooy_ref, ooz_ref, odx_ref, ody_ref, odz_ref,
               otr_ref, otg_ref, otb_ref, oact_ref,
               zref):
        seed = seed_ref[0]
        b_off = seed_ref[1]

        # non-constant-foldable carry seeds (see module docstring)
        zref[:] = jnp.zeros((1, TILE), jnp.float32)
        zero = zref[:]
        one = zero + 1.0

        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, TILE), 0).astype(
            jnp.float32
        )  # (8, 128): 0..7 down the sublanes

        ox_blk = ox_ref[:]
        oy_blk = oy_ref[:]
        oz_blk = oz_ref[:]
        dx_blk = dx_ref[:]
        dy_blk = dy_ref[:]
        dz_blk = dz_ref[:]
        tm_blk = tm_ref[:]
        pix_blk = pix_ref[:].astype(jnp.uint32)
        smp_blk = smp_ref[:].astype(jnp.uint32)
        thr_r_blk = tr_ref[:]
        thr_g_blk = tg_ref[:]
        thr_b_blk = tb2_ref[:]
        rad_r_blk = ra_ref[:]
        rad_g_blk = ga_ref[:]
        rad_b_blk = ba_ref[:]
        act_blk = act_ref[:]

        def fld(blk, f):
            """(8, 1) field column of an (8, 128) table chunk."""
            return blk[:, f:f + 1]

        def intersect(ox, oy, oz, dx, dy, dz, tmv):
            """Closest hit. Returns (t (1,128), idx (1,128) f32; idx<0 = miss)."""
            a = _dot3(dx, dy, dz, dx, dy, dz)
            inv_a = 1.0 / a

            def sph_chunk(k, carry):
                # k is a static python int: chunk slices are fully static and
                # the loop is unrolled — Mosaic pipelines straight-line code
                # far better than a fori_loop with this small a body.
                tb, ib = carry
                blk = tab_ref[k * CHUNK:(k + 1) * CHUNK, :]
                cx = fld(blk, U.U_G0) + tmv * fld(blk, U.U_G3)
                cy = fld(blk, U.U_G1) + tmv * fld(blk, U.U_G4)
                cz = fld(blk, U.U_G2) + tmv * fld(blk, U.U_G5)
                r = fld(blk, U.U_G6)
                ocx = ox - cx
                ocy = oy - cy
                ocz = oz - cz
                half_b = _dot3(ocx, ocy, ocz, dx, dy, dz)
                cq = _dot3(ocx, ocy, ocz, ocx, ocy, ocz) - r * r
                disc = half_b * half_b - a * cq
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                root0 = (-half_b - sq) * inv_a
                root1 = (-half_b + sq) * inv_a
                ok0 = (root0 > tmin) & (root0 < tb)
                ok1 = (root1 > tmin) & (root1 < tb)
                root = jnp.where(ok0, root0, root1)
                valid = (disc >= 0.0) & (ok0 | ok1) & (r > 0.0)
                cand = jnp.where(valid, root, BIG)              # (8, 128)
                cmin = jnp.min(cand, axis=0, keepdims=True)     # (1, 128)
                # lowest-index tie-break among this chunk's winners
                idxs = jnp.where(cand == cmin, sub_iota + float(k * CHUNK), BIG)
                cidx = jnp.min(idxs, axis=0, keepdims=True)
                imp = cmin < tb
                tb = jnp.where(imp, cmin, tb)
                ib = jnp.where(imp, cidx, ib)
                return tb, ib

            def quad_chunk(k, carry):
                tb, ib = carry
                blk = tab_ref[k * CHUNK:(k + 1) * CHUNK, :]
                nx = fld(blk, U.U_G0)
                ny = fld(blk, U.U_G1)
                nz = fld(blk, U.U_G2)
                denom = _dot3(nx, ny, nz, dx, dy, dz)
                safe = jnp.where(jnp.abs(denom) < 1e-8, 1.0, denom)
                tq = (fld(blk, U.U_G3) - _dot3(nx, ny, nz, ox, oy, oz)) / safe
                px = ox + tq * dx - fld(blk, U.U_QX)
                py = oy + tq * dy - fld(blk, U.U_QY)
                pz = oz + tq * dz - fld(blk, U.U_QZ)
                ux = fld(blk, U.U_UX)
                uy = fld(blk, U.U_UY)
                uz = fld(blk, U.U_UZ)
                vx = fld(blk, U.U_VX)
                vy = fld(blk, U.U_VY)
                vz = fld(blk, U.U_VZ)
                wx = fld(blk, U.U_G4)
                wy = fld(blk, U.U_G5)
                wz = fld(blk, U.U_G6)
                alpha = (wx * (py * vz - pz * vy) + wy * (pz * vx - px * vz)
                         + wz * (px * vy - py * vx))
                beta = (wx * (uy * pz - uz * py) + wy * (uz * px - ux * pz)
                        + wz * (ux * py - uy * px))
                valid = (
                    (jnp.abs(denom) >= 1e-8)
                    & (tq > tmin) & (tq < tb)
                    & (alpha >= 0.0) & (alpha <= 1.0)
                    & (beta >= 0.0) & (beta <= 1.0)
                )
                cand = jnp.where(valid, tq, BIG)
                cmin = jnp.min(cand, axis=0, keepdims=True)
                idxs = jnp.where(cand == cmin, sub_iota + float(k * CHUNK), BIG)
                cidx = jnp.min(idxs, axis=0, keepdims=True)
                imp = cmin < tb
                tb = jnp.where(imp, cmin, tb)
                ib = jnp.where(imp, cidx, ib)
                return tb, ib

            tb = zero + BIG
            ib = zero - 1.0
            carry = (tb, ib)
            for k in range(sph_chunks):          # static unroll
                carry = sph_chunk(k, carry)
            for k in range(sph_chunks, n_chunks):
                carry = quad_chunk(k, carry)
            return carry

        def gather8(tab_ref, row0, n_lanes, idx):
            """Fetch sublane rows [row0, row0+8) of a (rows, n_lanes) VMEM
            table at per-lane indices ``idx`` — (1, 128) i32 (same index for
            every row) or (8, 128) (per-row indices) → (8, 128). Lane
            gathers only address 128 lanes, so wider tables are walked in
            128-lane chunks combined with a range select (same pattern as
            resolve())."""
            out = None
            for c in range(n_lanes // TILE):
                local = jnp.clip(idx - c * TILE, 0, TILE - 1)
                idx8 = jnp.broadcast_to(local, (CHUNK, TILE))
                rows = tab_ref[row0:row0 + CHUNK, c * TILE:(c + 1) * TILE]
                g = jnp.take_along_axis(rows, idx8, axis=1)
                if out is None:
                    out = g
                else:
                    use = (idx >= c * TILE) & (idx < (c + 1) * TILE)
                    out = jnp.where(use, g, out)
            return out

        def intersect_bvh(ox, oy, oz, dx, dy, dz, tmv, act):
            """Closest hit via the per-lane stackless chunked-BVH walk
            (ops/mega_bvh.py; reference bvh_node.hpp:80-95 semantics: AABB
            slab reject + closest-so-far clipping). Each iteration every
            live lane advances one node — internal hit descends (preorder
            i+1), miss follows the skip link — and any lane that landed on
            a leaf immediately pairwise-intersects that leaf's 8 member
            primitives, shrinking its t_best so later slab tests prune
            harder. Returns (t (1,128), idx (1,128) f32; idx<0 = miss)."""
            a = _dot3(dx, dy, dz, dx, dy, dz)
            inv_a = 1.0 / a

            def safe_inv(v):
                # axis-parallel rays: ±inf reciprocals work in the slab
                # algebra, but Mosaic's min/max NaN behavior is safer
                # avoided — clamp like ops/traverse.py:_DIR_EPS
                s = jnp.where(v < 0.0, -1.0, 1.0)
                return s / jnp.maximum(jnp.abs(v), 1e-20)

            ivx = safe_inv(dx)
            ivy = safe_inv(dy)
            ivz = safe_inv(dz)

            def leaf_sphere(pend, tb, ib):
                mask = (pend >= 0.0) & (pend < float(n_sph_chunks))
                ci = jnp.clip(pend.astype(jnp.int32), 0, ls_lanes - 1)
                f = [gather8(sleaf_ref, fi * CHUNK, ls_lanes, ci)
                     for fi in range(8)]
                cx = f[0] + tmv * f[3]
                cy = f[1] + tmv * f[4]
                cz = f[2] + tmv * f[5]
                r = f[6]
                gid = f[7]
                ocx = ox - cx
                ocy = oy - cy
                ocz = oz - cz
                half_b = _dot3(ocx, ocy, ocz, dx, dy, dz)
                cq = _dot3(ocx, ocy, ocz, ocx, ocy, ocz) - r * r
                disc = half_b * half_b - a * cq
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                root0 = (-half_b - sq) * inv_a
                root1 = (-half_b + sq) * inv_a
                ok0 = (root0 > tmin) & (root0 < tb)
                ok1 = (root1 > tmin) & (root1 < tb)
                root = jnp.where(ok0, root0, root1)
                valid = (disc >= 0.0) & (ok0 | ok1) & (r > 0.0) & mask
                cand = jnp.where(valid, root, BIG)
                cmin = jnp.min(cand, axis=0, keepdims=True)
                gsel = jnp.where(cand == cmin, gid, BIG)
                gmin = jnp.min(gsel, axis=0, keepdims=True)
                imp = cmin < tb
                tb = jnp.where(imp, cmin, tb)
                ib = jnp.where(imp, gmin, ib)
                return tb, ib

            def leaf_quad(pend, tb, ib):
                mask = (pend >= float(n_sph_chunks)) & (
                    pend < float(n_sph_chunks + n_quad_chunks)
                )
                ci = jnp.clip(
                    pend.astype(jnp.int32) - n_sph_chunks, 0, lq_lanes - 1
                )
                f = [gather8(qleaf_ref, fi * CHUNK, lq_lanes, ci)
                     for fi in range(17)]
                nx, ny, nz, Dd, wx, wy, wz, gid = f[0:8]
                qx, qy, qz, ux, uy, uz, vx, vy, vz = f[8:17]
                denom = _dot3(nx, ny, nz, dx, dy, dz)
                safe = jnp.where(jnp.abs(denom) < 1e-8, 1.0, denom)
                tq = (Dd - _dot3(nx, ny, nz, ox, oy, oz)) / safe
                px = ox + tq * dx - qx
                py = oy + tq * dy - qy
                pz = oz + tq * dz - qz
                alpha = (wx * (py * vz - pz * vy) + wy * (pz * vx - px * vz)
                         + wz * (px * vy - py * vx))
                beta = (wx * (uy * pz - uz * py) + wy * (uz * px - ux * pz)
                        + wz * (ux * py - uy * px))
                valid = (
                    (jnp.abs(denom) >= 1e-8)
                    & (tq > tmin) & (tq < tb)
                    & (alpha >= 0.0) & (alpha <= 1.0)
                    & (beta >= 0.0) & (beta <= 1.0)
                    & mask
                )
                cand = jnp.where(valid, tq, BIG)
                cmin = jnp.min(cand, axis=0, keepdims=True)
                gsel = jnp.where(cand == cmin, gid, BIG)
                gmin = jnp.min(gsel, axis=0, keepdims=True)
                imp = cmin < tb
                tb = jnp.where(imp, cmin, tb)
                ib = jnp.where(imp, gmin, ib)
                return tb, ib

            def walk_body(carry):
                node, tb, ib = carry
                live = node >= 0.0
                ni = jnp.clip(node.astype(jnp.int32), 0, n_node_lanes - 1)
                g = gather8(nodes_ref, 0, n_node_lanes, ni)
                t0x = (g[0:1, :] - ox) * ivx
                t1x = (g[3:4, :] - ox) * ivx
                t0y = (g[1:2, :] - oy) * ivy
                t1y = (g[4:5, :] - oy) * ivy
                t0z = (g[2:3, :] - oz) * ivz
                t1z = (g[5:6, :] - oz) * ivz
                enter = jnp.maximum(
                    jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                    jnp.maximum(jnp.minimum(t0z, t1z), tmin),
                )
                exit_ = jnp.minimum(
                    jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                    jnp.minimum(jnp.maximum(t0z, t1z), tb),
                )
                boxhit = (enter < exit_) & live
                leafc = g[7:8, :]
                is_leaf = leafc >= 0.0
                nxt = jnp.where(boxhit & ~is_leaf, node + 1.0, g[6:7, :])
                node = jnp.where(live, nxt, node)
                pend = jnp.where(boxhit & is_leaf, leafc, -1.0)
                if n_sph_chunks > 0:
                    tb, ib = leaf_sphere(pend, tb, ib)
                if n_quad_chunks > 0:
                    tb, ib = leaf_quad(pend, tb, ib)
                return node, tb, ib

            def walk_cond(carry):
                return jnp.max(carry[0]) >= 0.0

            def walk_block(carry):
                # WALK_UNROLL node steps per while iteration: the ~2 µs
                # Mosaic while-iteration floor is amortized across a block
                # of straight-line steps; finished lanes no-op (live mask),
                # so the only waste is up to WALK_UNROLL-1 trailing steps.
                for _ in range(WALK_UNROLL):
                    carry = walk_body(carry)
                return carry

            node0 = jnp.where(act > 0.5, zero, zero - 1.0)
            _, tb, ib = jax.lax.while_loop(
                walk_cond, walk_block, (node0, zero + BIG, zero - 1.0)
            )
            return tb, ib

        n_lane_chunks = tabt_shape1 // TILE
        # fields 0..23 in sublane groups of 8 (17 used); quad-UV image
        # lookups additionally need U_VY/U_VZ (fields 24, 25) → group 4
        n_field_groups = 4 if (has_image and n_quad_chunks > 0) else 3

        def resolve(ib, fields):
            """Winner-attribute fetch via per-lane gathers. Mosaic's
            dynamic-gather wants full (8,128) operands, so each gather pulls
            8 *fields* (sublanes) of one 128-primitive lane chunk at the
            per-ray index; chunks are combined with a lane select. Exact f32
            and ~10x cheaper than the one-hot-matmul alternative.
            Returns {field → (1, 128) value}."""
            ibi = ib.astype(jnp.int32)
            groups = [None] * n_field_groups
            for c in range(n_lane_chunks):
                local = jnp.clip(ibi - c * TILE, 0, TILE - 1)
                idx8 = jnp.broadcast_to(local, (CHUNK, TILE))
                use = (ibi >= c * TILE) & (ibi < (c + 1) * TILE)
                for gi in range(n_field_groups):
                    rows = tabt_ref[gi * CHUNK:(gi + 1) * CHUNK,
                                    c * TILE:(c + 1) * TILE]
                    g = jnp.take_along_axis(rows, idx8, axis=1)
                    groups[gi] = g if groups[gi] is None else jnp.where(use, g, groups[gi])
            return {f: groups[f // CHUNK][f % CHUNK:f % CHUNK + 1, :] for f in fields}

        def group_trace(g):
            ox = ox_blk[g:g + 1, :]
            oy = oy_blk[g:g + 1, :]
            oz = oz_blk[g:g + 1, :]
            dx = dx_blk[g:g + 1, :]
            dy = dy_blk[g:g + 1, :]
            dz = dz_blk[g:g + 1, :]
            tmv = tm_blk[g:g + 1, :]
            pix = pix_blk[g:g + 1, :]
            smp = smp_blk[g:g + 1, :]
            st0 = (thr_r_blk[g:g + 1, :], thr_g_blk[g:g + 1, :], thr_b_blk[g:g + 1, :],
                   rad_r_blk[g:g + 1, :], rad_g_blk[g:g + 1, :], rad_b_blk[g:g + 1, :],
                   act_blk[g:g + 1, :])
            seed_t = jnp.full((1, TILE), jnp.uint32(seed))
            return _trace_one_group(ox, oy, oz, dx, dy, dz, tmv, pix, smp, seed_t, st0)

        def _trace_one_group(ox, oy, oz, dx, dy, dz, tmv, pix, smp, seed_t, st0):
            def bounce_body(carry):
                (b, ox, oy, oz, dx, dy, dz, thr_r, thr_g, thr_b,
                 rad_r, rad_g, rad_b, active_f, bounces) = carry
                active = active_f > 0.5

                if use_bvh:
                    t, ib = intersect_bvh(ox, oy, oz, dx, dy, dz, tmv, active_f)
                else:
                    t, ib = intersect(ox, oy, oz, dx, dy, dz, tmv)
                FIELDS = (U.U_G0, U.U_G1, U.U_G2, U.U_G3, U.U_G4, U.U_G5,
                          U.U_G6, U.U_MTYPE, U.U_PARAM, U.U_AR, U.U_AG,
                          U.U_AB, U.U_TKIND, U.U_TSCALE, U.U_A2R, U.U_A2G,
                          U.U_A2B)
                if "resolve" in ablate:
                    attrs = {f: zero + 0.5 for f in FIELDS}
                else:
                    attrs = resolve(ib, FIELDS)

                def at(f):
                    return attrs[f]  # (1, 128)

                hit = t < BIG
                miss = active & ~hit
                rad_r = rad_r + jnp.where(miss, thr_r * bg_r, 0.0)
                rad_g = rad_g + jnp.where(miss, thr_g * bg_g, 0.0)
                rad_b = rad_b + jnp.where(miss, thr_b * bg_b, 0.0)

                px = ox + t * dx
                py = oy + t * dy
                pz = oz + t * dz

                is_quad = ib >= float(ns_pad)
                # outward normal: sphere (p - c_t)/r | quad unit plane normal
                cxt = at(U.U_G0) + tmv * at(U.U_G3)
                cyt = at(U.U_G1) + tmv * at(U.U_G4)
                czt = at(U.U_G2) + tmv * at(U.U_G5)
                r_att = at(U.U_G6)
                inv_r = 1.0 / jnp.where(r_att != 0.0, r_att, 1.0)
                own_x = jnp.where(is_quad, at(U.U_G0), (px - cxt) * inv_r)
                own_y = jnp.where(is_quad, at(U.U_G1), (py - cyt) * inv_r)
                own_z = jnp.where(is_quad, at(U.U_G2), (pz - czt) * inv_r)
                d_dot_n = _dot3(dx, dy, dz, own_x, own_y, own_z)
                front = d_dot_n < 0.0
                sgn = jnp.where(front, 1.0, -1.0)
                nx = own_x * sgn
                ny = own_y * sgn
                nz = own_z * sgn

                mt = at(U.U_MTYPE)
                prm = at(U.U_PARAM)
                ar = at(U.U_AR)
                ag = at(U.U_AG)
                ab = at(U.U_AB)
                # checker texture (texture.hpp:57-79)
                ts = at(U.U_TSCALE)
                cells = (
                    jnp.floor(ts * px).astype(jnp.int32)
                    + jnp.floor(ts * py).astype(jnp.int32)
                    + jnp.floor(ts * pz).astype(jnp.int32)
                )
                use2 = (at(U.U_TKIND) == fl.TK_CHECKER) & ((cells % 2) != 0)
                ar = jnp.where(use2, at(U.U_A2R), ar)
                ag = jnp.where(use2, at(U.U_A2G), ag)
                ab = jnp.where(use2, at(U.U_A2B), ab)

                if has_noise:
                    # marble noise (texture.hpp:150 via perlin.hpp:94-254);
                    # same op order as scene/perlin.py for parity. Each
                    # octave: 8 lattice corners, each one (8,128) gather of
                    # the three axis permutations (per-row indices) + one
                    # gather of the gradient at the XOR hash.
                    sub_i = jax.lax.broadcasted_iota(
                        jnp.int32, (CHUNK, TILE), 0
                    )
                    accum_t = zero
                    weight = 1.0
                    tpx, tpy, tpz = px, py, pz
                    for _oct in range(7):
                        pfx = jnp.floor(tpx)
                        pfy = jnp.floor(tpy)
                        pfz = jnp.floor(tpz)
                        uu = tpx - pfx
                        vv = tpy - pfy
                        ww = tpz - pfz
                        ixx = pfx.astype(jnp.int32)
                        iyy = pfy.astype(jnp.int32)
                        izz = pfz.astype(jnp.int32)
                        hx_h = uu * uu * (3.0 - 2.0 * uu)
                        hy_h = vv * vv * (3.0 - 2.0 * vv)
                        hz_h = ww * ww * (3.0 - 2.0 * ww)
                        acc = zero
                        for di in (0, 1):
                            for dj in (0, 1):
                                for dk in (0, 1):
                                    ix_d = (ixx + di) & 255
                                    iy_d = (iyy + dj) & 255
                                    iz_d = (izz + dk) & 255
                                    idx8 = jnp.where(
                                        sub_i == 0,
                                        jnp.broadcast_to(ix_d, (CHUNK, TILE)),
                                        jnp.where(
                                            sub_i == 1,
                                            jnp.broadcast_to(iy_d, (CHUNK, TILE)),
                                            jnp.broadcast_to(iz_d, (CHUNK, TILE)),
                                        ),
                                    )
                                    hperm = gather8(perm_ref, 0, 256, idx8)
                                    hashv = (
                                        hperm[0:1, :].astype(jnp.int32)
                                        ^ hperm[1:2, :].astype(jnp.int32)
                                        ^ hperm[2:3, :].astype(jnp.int32)
                                    )
                                    gv = gather8(vec_ref, 0, 256, hashv)
                                    offx = uu - float(di)
                                    offy = vv - float(dj)
                                    offz = ww - float(dk)
                                    wx = hx_h if di else 1.0 - hx_h
                                    wy = hy_h if dj else 1.0 - hy_h
                                    wz = hz_h if dk else 1.0 - hz_h
                                    dotg = (gv[0:1, :] * offx
                                            + gv[1:2, :] * offy
                                            + gv[2:3, :] * offz)
                                    acc = acc + wx * wy * wz * dotg
                        accum_t = accum_t + weight * acc
                        weight *= 0.5
                        tpx = tpx * 2.0
                        tpy = tpy * 2.0
                        tpz = tpz * 2.0
                    turb = jnp.abs(accum_t)
                    marble = 0.5 * (1.0 + jnp.sin(ts * pz + 10.0 * turb))
                    use_n = at(U.U_TKIND) == fl.TK_NOISE
                    ar = jnp.where(use_n, marble, ar)
                    ag = jnp.where(use_n, marble, ag)
                    ab = jnp.where(use_n, marble, ab)

                if has_image:
                    # nearest-texel image lookup (texture.hpp:91-122):
                    # sphere UV from the outward normal (sphere.hpp:100-111,
                    # pole-safe form as ops/intersect.py hit_attributes) or
                    # quad UV = (α, β) (quad.hpp:97-114); clamp u, flip v,
                    # truncate to texel, gather packed atlas RGB.
                    rxz = jnp.sqrt(
                        jnp.maximum(own_x * own_x + own_z * own_z, 0.0)
                    )
                    # _atan2f: Mosaic TC has no arctan2 lowering (see
                    # megakernel_block.py)
                    from .megakernel_block import _atan2f

                    theta = _atan2f(rxz, -own_y)
                    x_safe = jnp.where(rxz > 0.0, own_x, 1.0)
                    phi = _atan2f(-own_z, x_safe) + jnp.pi
                    u_tex = phi * (1.0 / (2.0 * jnp.pi))
                    v_tex = theta * (1.0 / jnp.pi)
                    if n_quad_chunks > 0:
                        # α/β from the winner's corner+edges (resolve
                        # groups extended to cover U_VY/U_VZ)
                        pqx = px - at(U.U_QX)
                        pqy = py - at(U.U_QY)
                        pqz = pz - at(U.U_QZ)
                        uxq = at(U.U_UX)
                        uyq = at(U.U_UY)
                        uzq = at(U.U_UZ)
                        vxq = at(U.U_VX)
                        vyq = at(U.U_VY)
                        vzq = at(U.U_VZ)
                        wxq = at(U.U_G4)
                        wyq = at(U.U_G5)
                        wzq = at(U.U_G6)
                        alpha_q = (wxq * (pqy * vzq - pqz * vyq)
                                   + wyq * (pqz * vxq - pqx * vzq)
                                   + wzq * (pqx * vyq - pqy * vxq))
                        beta_q = (wxq * (uyq * pqz - uzq * pqy)
                                  + wyq * (uzq * pqx - uxq * pqz)
                                  + wzq * (uxq * pqy - uyq * pqx))
                        u_tex = jnp.where(is_quad, alpha_q, u_tex)
                        v_tex = jnp.where(is_quad, beta_q, v_tex)
                    base_i = at(U.U_A2R).astype(jnp.int32)
                    w_img = at(U.U_A2G)
                    h_img = at(U.U_A2B)
                    uu_c = jnp.clip(u_tex, 0.0, 1.0)
                    vv_c = 1.0 - jnp.clip(v_tex, 0.0, 1.0)
                    w_i = w_img.astype(jnp.int32)
                    h_i = h_img.astype(jnp.int32)
                    ti = jnp.clip((uu_c * w_img).astype(jnp.int32), 0,
                                  jnp.maximum(w_i - 1, 0))
                    tj = jnp.clip((vv_c * h_img).astype(jnp.int32), 0,
                                  jnp.maximum(h_i - 1, 0))
                    flat = base_i + tj * w_i + ti
                    texel = gather8(atlas_ref, 0, atlas_lanes, flat)
                    use_i = at(U.U_TKIND) == fl.TK_IMAGE
                    ar = jnp.where(use_i, texel[0:1, :], ar)
                    ag = jnp.where(use_i, texel[1:2, :], ag)
                    ab = jnp.where(use_i, texel[2:3, :], ab)

                # RNG for this bounce (core/rng.py stream layout)
                if "rng" in ablate:
                    u0 = zero + 0.25
                    u1 = zero + 0.5
                    u2 = zero + 0.75
                else:
                    ctr = jnp.full(ox.shape, jnp.uint32(0)) + (
                        (b.astype(jnp.uint32) + b_off) * jnp.uint32(4) + jnp.uint32(2)
                    )
                    v0, v1, v2, _ = _pcg4d(pix, smp, ctr, seed_t)
                    u0 = _u01(v0)
                    u1 = _u01(v1)
                    u2 = _u01(v2)
                def _shade():
                    zdir = 1.0 - 2.0 * u0
                    rho = jnp.sqrt(jnp.maximum(0.0, 1.0 - zdir * zdir))
                    phi = (2.0 * jnp.pi) * u1
                    rux = rho * jnp.cos(phi)
                    ruy = rho * jnp.sin(phi)
                    ruz = zdir

                    # lambertian (material.hpp:54-60)
                    ldx = nx + rux
                    ldy = ny + ruy
                    ldz = nz + ruz
                    degen = (jnp.abs(ldx) < 1e-8) & (jnp.abs(ldy) < 1e-8) & (jnp.abs(ldz) < 1e-8)
                    ldx = jnp.where(degen, nx, ldx)
                    ldy = jnp.where(degen, ny, ldy)
                    ldz = jnp.where(degen, nz, ldz)

                    # metal (material.hpp:89-105)
                    d_dot_on = _dot3(dx, dy, dz, nx, ny, nz)
                    rdx = dx - 2.0 * d_dot_on * nx
                    rdy = dy - 2.0 * d_dot_on * ny
                    rdz = dz - 2.0 * d_dot_on * nz
                    rlen = jax.lax.rsqrt(_dot3(rdx, rdy, rdz, rdx, rdy, rdz) + 1e-30)
                    mdx = rdx * rlen + prm * rux
                    mdy = rdy * rlen + prm * ruy
                    mdz = rdz * rlen + prm * ruz
                    metal_ok = _dot3(mdx, mdy, mdz, nx, ny, nz) > 0.0

                    # dielectric (material.hpp:128-174)
                    dinv = jax.lax.rsqrt(_dot3(dx, dy, dz, dx, dy, dz) + 1e-30)
                    udx = dx * dinv
                    udy = dy * dinv
                    udz = dz * dinv
                    ri = jnp.where(front, 1.0 / prm, prm)
                    cos_t = jnp.minimum(-_dot3(udx, udy, udz, nx, ny, nz), 1.0)
                    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
                    cannot = ri * sin_t > 1.0
                    r0 = (1.0 - ri) / (1.0 + ri)
                    r0 = r0 * r0
                    reflectance = r0 + (1.0 - r0) * (1.0 - cos_t) ** 5
                    use_reflect = cannot | (reflectance > u2)
                    rpx = ri * (udx + cos_t * nx)
                    rpy = ri * (udy + cos_t * ny)
                    rpz = ri * (udz + cos_t * nz)
                    k2 = jnp.abs(1.0 - _dot3(rpx, rpy, rpz, rpx, rpy, rpz))
                    par = -jnp.sqrt(k2)
                    fdx = rpx + par * nx
                    fdy = rpy + par * ny
                    fdz = rpz + par * nz
                    u_dot_n = _dot3(udx, udy, udz, nx, ny, nz)
                    xdx = udx - 2.0 * u_dot_n * nx
                    xdy = udy - 2.0 * u_dot_n * ny
                    xdz = udz - 2.0 * u_dot_n * nz
                    gdx = jnp.where(use_reflect, xdx, fdx)
                    gdy = jnp.where(use_reflect, xdy, fdy)
                    gdz = jnp.where(use_reflect, xdz, fdz)

                    is_metal = mt == MT_METAL
                    is_diel = mt == MT_DIELECTRIC
                    is_light = mt == MT_LIGHT
                    ndx = jnp.where(is_metal, mdx, ldx)
                    ndy = jnp.where(is_metal, mdy, ldy)
                    ndz = jnp.where(is_metal, mdz, ldz)
                    ndx = jnp.where(is_diel, gdx, ndx)
                    ndy = jnp.where(is_diel, gdy, ndy)
                    ndz = jnp.where(is_diel, gdz, ndz)

                    att_r = jnp.where(is_diel, 1.0, ar)
                    att_g = jnp.where(is_diel, 1.0, ag)
                    att_b = jnp.where(is_diel, 1.0, ab)
                    return (ndx, ndy, ndz, att_r, att_g, att_b,
                            is_metal, is_diel, is_light, metal_ok)

                if "shade" in ablate:
                    is_metal = mt == MT_METAL
                    is_diel = mt == MT_DIELECTRIC
                    is_light = mt == MT_LIGHT
                    metal_ok = u0 > -1.0
                    ndx, ndy, ndz = dx, dy, dz
                    att_r, att_g, att_b = ar, ag, ab
                else:
                    (ndx, ndy, ndz, att_r, att_g, att_b, is_metal, is_diel,
                     is_light, metal_ok) = _shade()

                hit_mask = active & hit
                emit = hit_mask & is_light
                rad_r = rad_r + jnp.where(emit, thr_r * ar, 0.0)
                rad_g = rad_g + jnp.where(emit, thr_g * ag, 0.0)
                rad_b = rad_b + jnp.where(emit, thr_b * ab, 0.0)

                # logical form, not select-on-bools (Mosaic lacks i8→i1 trunc)
                did_scatter = (is_metal & metal_ok) | (~is_metal & ~is_light)
                live = hit_mask & did_scatter
                thr_r = jnp.where(live, thr_r * att_r, thr_r)
                thr_g = jnp.where(live, thr_g * att_g, thr_g)
                thr_b = jnp.where(live, thr_b * att_b, thr_b)
                ox = jnp.where(live, px, ox)
                oy = jnp.where(live, py, oy)
                oz = jnp.where(live, pz, oz)
                dx = jnp.where(live, ndx, dx)
                dy = jnp.where(live, ndy, dy)
                dz = jnp.where(live, ndz, dz)

                bounces = bounces + jnp.where(active, 1.0, 0.0)
                return (b + 1, ox, oy, oz, dx, dy, dz, thr_r, thr_g, thr_b,
                        rad_r, rad_g, rad_b, jnp.where(live, 1.0, 0.0), bounces)

            def cond(carry):
                b = carry[0]
                active_f = carry[13]
                return (b < max_depth) & (jnp.max(active_f) > 0.5)

            thr_r0, thr_g0, thr_b0, rad_r0, rad_g0, rad_b0, act0 = st0
            init = (jnp.int32(0), ox, oy, oz, dx, dy, dz,
                    thr_r0 + zero, thr_g0 + zero, thr_b0 + zero,
                    rad_r0 + zero, rad_g0 + zero, rad_b0 + zero,
                    act0 + zero, zero)  # f32 active mask + f32 bounce counter
            if unroll:
                # Straight-line bounces: a Mosaic while_loop iteration has a
                # ~2 µs fixed floor (carry spill/relayout + cond/branch —
                # measured round 2; it dwarfs the ~0.7 µs of actual VPU
                # compute per bounce), so phases run their static bounce
                # budget fully unrolled. Dead-lane waste is handled by
                # keeping phases short + compacting between them.
                out = init
                for _ in range(max_depth):
                    out = bounce_body(out)
                return out
            out = jax.lax.while_loop(cond, bounce_body, init)
            return out

        for g in range(GROUPS):
            out = group_trace(g)
            (_, f_ox, f_oy, f_oz, f_dx, f_dy, f_dz,
             f_tr, f_tg, f_tb, f_rr, f_rg, f_rb, f_act, f_bc) = out
            rr_ref[g:g + 1, :] = f_rr
            rg_ref[g:g + 1, :] = f_rg
            rb_ref[g:g + 1, :] = f_rb
            bc_ref[g:g + 1, :] = f_bc.astype(jnp.int32)
            oox_ref[g:g + 1, :] = f_ox
            ooy_ref[g:g + 1, :] = f_oy
            ooz_ref[g:g + 1, :] = f_oz
            odx_ref[g:g + 1, :] = f_dx
            ody_ref[g:g + 1, :] = f_dy
            odz_ref[g:g + 1, :] = f_dz
            otr_ref[g:g + 1, :] = f_tr
            otg_ref[g:g + 1, :] = f_tg
            otb_ref[g:g + 1, :] = f_tb
            oact_ref[g:g + 1, :] = f_act


    def run(table, table_t, bvh_nodes, sph_leaf, quad_leaf,
            perm_tab, vec_tab, atlas_tab,
            ox, oy, oz, dx, dy, dz, tmv, pix, smp,
            thr_r, thr_g, thr_b, rad_r, rad_g, rad_b, act,
            seed_and_offset):
        """One phase over the full batch. All ray args are (n_rows, 128);
        ``seed_and_offset`` is a (2,) i32/u32 array [seed, bounce_offset].
        Returns (rad_r, rad_g, rad_b, bounces, ox..dz, thr..., act)."""
        n_rows = ox.shape[0]
        assert n_rows % GROUPS == 0
        grid = (n_rows // GROUPS,)
        ray_spec = pl.BlockSpec((GROUPS, TILE), lambda i: (i, 0), memory_space=pltpu.VMEM)
        f32 = jnp.float32
        out_shape = (
            [jax.ShapeDtypeStruct((n_rows, TILE), f32)] * 3
            + [jax.ShapeDtypeStruct((n_rows, TILE), jnp.int32)]
            + [jax.ShapeDtypeStruct((n_rows, TILE), f32)] * 10
        )

        def whole(arr):
            return pl.BlockSpec(arr.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                whole(table), whole(table_t),
                whole(bvh_nodes), whole(sph_leaf), whole(quad_leaf),
                whole(perm_tab), whole(vec_tab), whole(atlas_tab),
            ] + [ray_spec] * 16 + [
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=[ray_spec] * 14,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((1, TILE), jnp.float32),        # carry-layout seed
            ],
            interpret=interpret,
        )(table, table_t, bvh_nodes, sph_leaf, quad_leaf,
          perm_tab, vec_tab, atlas_tab,
          ox, oy, oz, dx, dy, dz, tmv, pix, smp,
          thr_r, thr_g, thr_b, rad_r, rad_g, rad_b, act, seed_and_offset)

    return run


def make_regen(n_pixels, n_block, spp_chunk, pixel_start, sample_start,
               seed, has_moving, ray_order: str = "sample"):
    """Build the ``regen`` hook for ``trace_megakernel``: recompute the
    tm/pix/smp columns from the compaction permutation (they are pure
    functions of the original ray index) instead of carrying them through
    every boundary sort. The formulas mirror the renderer's lane layouts
    ("sample" = sample-major tiling, "pixel" = pixel-major repeat); the
    time column replays the generate_rays STREAM_TIME draw bit-exactly.
    """
    from ..core import rng as rng_mod

    def regen(perm):
        if ray_order == "pixel":
            blk = perm // spp_chunk
            smp = sample_start + perm % spp_chunk
        else:
            blk = perm % n_block
            smp = sample_start + perm // n_block
        pix = jnp.minimum(pixel_start + blk, n_pixels - 1)
        if has_moving:
            tm = rng_mod.uniform4(
                pix, smp, jnp.uint32(rng_mod.STREAM_TIME), seed
            )[:, 0]
        else:
            tm = jnp.zeros(perm.shape, jnp.float32)
        return tm, pix, smp

    return regen


def trace_megakernel(
    mega: MegaScene,
    o: jnp.ndarray,
    d: jnp.ndarray,
    time: jnp.ndarray,
    pixel_ids: jnp.ndarray,
    sample_ids: jnp.ndarray,
    background,
    max_depth: int,
    seed,
    interpret: bool | None = None,  # None: interpret iff backend is CPU
    phase_depths=None,
    active0=None,
    use_bvh: bool | None = None,
    unroll: bool | None = None,
    sort_mode: str = "alive",   # "alive" | "coherent" inter-phase compaction
    layout: str | None = None,  # "block" | "group" | None (auto)
    want_ids: bool = False,     # True | "compacted": per-bounce winner ids
    want_counts: bool = False,  # also return per-ray exact bounce counts
    use_clusters: bool | None = None,  # block kernel AABB cluster culling
    regen=None,  # (perm (B,) i32) -> (tm, pix, smp): recompute instead of sort
    sort_regions: int = 1,  # compact within R independent regions (batched sort)
    phase_prefixes=None,  # per-phase static live-ray row prefixes (+ ok flag)
):
    """Wavefront trace through the megakernel. B must be a multiple of 1024.

    ``phase_depths``: optional list of per-phase bounce budgets summing to
    ≤ max_depth (e.g. ``[3, 17]``). Between phases the batch is *compacted*:
    rays are stably sorted dead-last, so later phases run straggler bounces
    at full lane occupancy and fully-dead groups exit after one loop check.
    Default: one phase (no sort) — best for shallow depths.

    ``regen``: optional ``perm -> (tm, pix, smp)`` hook (see
    ``make_regen``) that recomputes those columns from the compaction
    permutation instead of carrying them through every boundary sort —
    they are pure functions of the original ray index. ``sort_regions``:
    compact within R independent contiguous lane regions (one batched
    sort) instead of globally; regions align to 1024-ray blocks so at
    most one partial block per region survives uncompacted.

    ``layout`` selects the kernel: ``"block"`` = (8,128) ray tiles with the
    SMEM-scalar sweep (ops/megakernel_block.py — the fast dense path),
    ``"group"`` = (1,128) ray rows with pairwise chunks / BVH walk
    (this module). Auto: block unless the BVH walk is selected.

    Returns (radiance (B, 3), segments traced ()); with ``want_ids`` (block
    layout only) additionally the recorded per-bounce *global* winner ids
    ``(sum(phase_depths), B) i32`` in original ray order, -1 = miss — the
    TPU decision pass for replay differentiation (diff/replay.py). Phase
    compaction permutes rays mid-trace; each phase's id rows are restored
    to camera order with one fused sort keyed on the composed permutation.

    ``phase_prefixes``: optional per-phase STATIC row prefixes (None or a
    1024-multiple ≤ B per phase; the first phase must be None). Phase
    ``pi`` then launches its kernel over only the first ``P`` rays —
    compaction packs survivors first, so when ``P`` covers every live
    ray the tail is dead and passes through unchanged (radiance kept,
    zero new segments; exact). A trailing output flag ``ok`` (scalar
    bool) is appended to the return tuple: False iff some prefix was
    exceeded (then radiance/segments silently missed live rays — the
    caller MUST check it; plan prefixes from a warm-up length histogram
    like diff/replay_kernel.plan_prefixes). Measured motivation: after
    depth-5 compaction only ~8% of final-scene rays live, but the tail
    phase still pays the per-grid-step DMA fixed cost for every dead
    1024-ray block (~70% of that kernel's device time, trace
    2026-08-20).

    ``want_ids="compacted"`` (round-5 sort diet): instead of restoring
    the later-phase id words to camera order through the final unpermute
    (7 extra sort operands at the bench shape), return them in the
    *current compacted lane order* together with the composed
    permutation, and let the consumer (replay_grads_sorted's
    ``compacted=`` path) move them straight to its length-sorted order —
    the camera-order detour is pure data movement. Extras become
    ``ids0 (pd0, B) camera order`` (phase 1 is recorded under the
    identity permutation), ``later_words (W, B) compacted order`` (the
    per-phase packed words of phases 2.., concatenated; W=0 for a
    single phase), ``perm (B,) i32`` (camera index per compacted lane),
    then with ``want_counts`` BOTH ``counts`` (camera order, via the
    unpermute) and ``counts_c`` (compacted order, free). Radiance is
    still returned in camera order — only the id columns skip the
    unpermute.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B = o.shape[0]
    assert B % BLOCK == 0, f"megakernel batch must be a multiple of {BLOCK}, got {B}"
    rows = B // TILE

    def r2(x):
        return x.reshape(rows, TILE)

    f32 = jnp.float32
    state = dict(
        ox=r2(o[:, 0]), oy=r2(o[:, 1]), oz=r2(o[:, 2]),
        dx=r2(d[:, 0]), dy=r2(d[:, 1]), dz=r2(d[:, 2]),
        tm=r2(time),
        pix=r2(pixel_ids.astype(jnp.int32)), smp=r2(sample_ids.astype(jnp.int32)),
        tr=jnp.ones((rows, TILE), f32), tg=jnp.ones((rows, TILE), f32),
        tb=jnp.ones((rows, TILE), f32),
        rr=jnp.zeros((rows, TILE), f32), rg=jnp.zeros((rows, TILE), f32),
        rb=jnp.zeros((rows, TILE), f32),
        act=(jnp.ones((rows, TILE), f32) if active0 is None
             else r2(active0.astype(f32))),
    )
    if phase_depths is None:
        phase_depths = [max_depth]

    order0 = jnp.arange(B, dtype=jnp.int32)
    perm = order0  # composed permutation original → current layout
    segments = jnp.zeros((), jnp.int32)
    offset = 0

    # kernel selection: the block layout is the fast dense path; the group
    # layout carries the in-kernel BVH walk (and remains the perf baseline)
    resolved_bvh = (use_bvh if use_bvh is not None
                    else (mega.bvh_nodes is not None
                          and mega.n_prims // CHUNK > BVH_MIN_CHUNKS))
    if layout is None:
        layout = "group" if resolved_bvh else "block"
    if mega.atlas_rep.dtype == jnp.int32 and layout == "group":
        # the packed big-image atlas fetch exists only in the block
        # kernel; the dense-sweep block layout is correct (if slower)
        # for BVH-scale scenes, so fall back rather than fail
        layout = "block"
        resolved_bvh = False
    assert layout in ("block", "group")
    if layout == "block":
        assert not resolved_bvh or use_bvh is None, \
            "the block-layout kernel has no BVH walk (use layout='group')"
    if want_ids:
        assert layout == "block", "want_ids requires the block layout"
    if want_counts:
        # per-ray exact bounce counts (B,) i32 in original ray order:
        # sum(counts) == segments. Accumulated in the current permuted
        # layout as one more state column riding the boundary sorts, then
        # restored with the final unpermute. Feeds the replay kernels'
        # per-tile path-length gating (diff/replay_kernel.py).
        assert layout == "block", "want_counts requires the block layout"
        state["bcc"] = jnp.zeros((rows, TILE), jnp.int32)

    # Recorded winner ids, two tiers (the kernel records GLOBAL scene ids
    # directly — kid-map pseudo-field gather in megakernel_block.py; an
    # XLA-side jnp.take(kid_map, ids) here would be an element-serial
    # gather at ~8 ns/element, measured 59 of 78 ms of the whole fwd+bwd
    # chunk):
    # * phase 1 is recorded under the identity permutation — already in
    #   camera order, free (ids_rows).
    # * later phases' ids are packed three 10-bit ids per int32 word
    #   (lossless for n_prims <= 1023; diff/replay_kernel._pack_ids) and
    #   DEFERRED: the words ride the remaining boundary sorts as extra
    #   operands and are restored to camera order by the one final
    #   unpermute sort, instead of paying a dedicated restore sort per
    #   phase (round-5 trace: the per-phase restores were 2 of the 5
    #   ~1.5 ms sorts in each fwd+bwd decision chunk).
    ids_rows = []    # (pd, B) blocks already in camera order (phase 1)
    pending_ids = [] # [{'pd': int, 'cols': [(B,) i32 words]}] later phases

    def _ids_pack(phase_ids):
        from ..diff.replay_kernel import _pack_ids

        pd_n = phase_ids.shape[0]
        gid = phase_ids.reshape(pd_n, B)
        if mega.n_prims <= 1023:
            return dict(pd=pd_n, pack=True, cols=_pack_ids(gid, pd_n))
        return dict(pd=pd_n, pack=False,
                    cols=[gid[k] for k in range(pd_n)])

    if phase_prefixes is not None:
        assert layout == "block", "phase_prefixes requires the block layout"
        assert len(phase_prefixes) == len(phase_depths)
        assert phase_prefixes[0] is None, "first phase sees every ray"
        for p in phase_prefixes[1:]:
            assert p is None or (0 < p <= B and p % BLOCK == 0), \
                f"prefix must be a 1024-multiple in (0, {B}], got {p}"
    prefix_ok = jnp.bool_(True)
    for pi, pd in enumerate(phase_depths):
        so = jnp.asarray([seed, offset], jnp.uint32)
        pref = phase_prefixes[pi] if phase_prefixes is not None else None
        if pref is not None and pref == B:
            pref = None
        rows_p = rows if pref is None else pref // TILE
        if pref is not None:
            # exactness check (validated on device, asserted by the
            # caller): every ray past the prefix must be dead — the
            # alive-first compaction guarantees it iff the prefix
            # covers this phase's live count
            prefix_ok = prefix_ok & jnp.logical_not(
                jnp.any(state["act"][rows_p:] > 0.0))

        def _sl(a):
            return a if pref is None else a[:rows_p]

        def _cat(top, tail):
            return top if pref is None else jnp.concatenate(
                [top, tail[rows_p:]], axis=0)

        if layout == "block":
            from .megakernel_block import make_megakernel_block

            last = pi == len(phase_depths) - 1
            runp = make_megakernel_block(
                mega, max_depth=pd, background=background,
                interpret=interpret, unroll=bool(unroll),
                want_state=not last, want_ids=want_ids,
                use_clusters=use_clusters)
            out = runp(mega.sph_sweep, mega.quad_sweep, mega.tabt_rep,
                       mega.noise_rep, mega.atlas_rep,
                       _sl(state["ox"]), _sl(state["oy"]), _sl(state["oz"]),
                       _sl(state["dx"]), _sl(state["dy"]), _sl(state["dz"]),
                       _sl(state["tm"]), _sl(state["pix"]), _sl(state["smp"]),
                       _sl(state["tr"]), _sl(state["tg"]), _sl(state["tb"]),
                       _sl(state["rr"]), _sl(state["rg"]), _sl(state["rb"]),
                       _sl(state["act"]), so)
            if want_ids:
                out = list(out)
                phase_ids = out.pop()
                if pref is not None:
                    # tail rays are dead: no recorded decisions
                    phase_ids = jnp.concatenate(
                        [phase_ids,
                         jnp.full((pd, rows - rows_p, TILE), -1,
                                  jnp.int32)], axis=1)
                if pi == 0:
                    ids_rows.append(phase_ids.reshape(pd, B))
                else:
                    pending_ids.append(_ids_pack(phase_ids))
            if last:
                rr, rg, rb, bc = out
                segments = segments + jnp.sum(bc)
                state.update(rr=_cat(rr, state["rr"]),
                             rg=_cat(rg, state["rg"]),
                             rb=_cat(rb, state["rb"]))
                if want_counts:
                    if pref is not None:
                        bc = jnp.concatenate(
                            [bc, jnp.zeros((rows - rows_p, TILE),
                                           jnp.int32)], axis=0)
                    state["bcc"] = state["bcc"] + bc
                break
        else:
            runp = make_megakernel(mega, max_depth=pd, background=background,
                                   interpret=interpret, use_bvh=use_bvh,
                                   unroll=unroll)
            out = runp(mega.table, mega.table_t,
                       mega.bvh_nodes, mega.sph_leaf, mega.quad_leaf,
                       mega.perm_tab, mega.vec_tab, mega.atlas_tab,
                       state["ox"], state["oy"], state["oz"],
                       state["dx"], state["dy"], state["dz"],
                       state["tm"], state["pix"], state["smp"],
                       state["tr"], state["tg"], state["tb"],
                       state["rr"], state["rg"], state["rb"], state["act"], so)
        (rr, rg, rb, bc, ox2, oy2, oz2, dx2, dy2, dz2, tr2, tg2, tb2, act2) = out
        segments = segments + jnp.sum(bc)
        if want_counts:
            if pref is not None:
                bc = jnp.concatenate(
                    [bc, jnp.zeros((rows - rows_p, TILE), jnp.int32)],
                    axis=0)
            state["bcc"] = state["bcc"] + bc
        state.update(ox=_cat(ox2, state["ox"]), oy=_cat(oy2, state["oy"]),
                     oz=_cat(oz2, state["oz"]), dx=_cat(dx2, state["dx"]),
                     dy=_cat(dy2, state["dy"]), dz=_cat(dz2, state["dz"]),
                     rr=_cat(rr, state["rr"]), rg=_cat(rg, state["rg"]),
                     rb=_cat(rb, state["rb"]), tr=_cat(tr2, state["tr"]),
                     tg=_cat(tg2, state["tg"]), tb=_cat(tb2, state["tb"]),
                     act=_cat(act2, state["act"]))
        offset += pd
        if pi < len(phase_depths) - 1:
            # Compaction between phases as ONE multi-operand lax.sort:
            # key + every per-ray state array + the composed permutation
            # move together through a single fused sort. (The obvious
            # argsort + per-array gather formulation compiles to ~14
            # element-serial gather fusions at ~1.1 ms each on v5e inside
            # this module — 16+ ms per boundary, 3x the phased kernels
            # themselves; the fused sort is far cheaper.) TPU sort cost
            # scales with operand count and comparator size, so the sort
            # is slimmed three ways (measured ~2.3x on v5e, see
            # /tmp/micro history): (a) the key is a *unique* int32
            # (dead-flag · B + lane) so an UNstable single-compare sort
            # reproduces the stable dead-last partition exactly — f32
            # keys generate NaN-canonicalizing selects in the comparator
            # and is_stable appends an iota tiebreaker; (b) ``act`` is
            # not sorted — it is re-derived from the sorted key;
            # (c) at the *first* boundary the phase-1 radiance (still in
            # camera order: no prior permutation) is set aside and the
            # kernel re-accumulates from zero, dropping rr/rg/rb from
            # that sort; the set-aside is added back after the final
            # unpermute.
            alive_flat = state["act"].reshape(B)
            if sort_mode == "coherent":
                # alive-first, then direction octant, then quantized origin
                # cell: surviving bounce rays land in lanes next to rays
                # walking similar BVH subtrees, shrinking the lockstep max
                # of the per-lane walk (and re-cohering the dense sweep's
                # chunk locality). Scene extent from the BVH root box.
                root_mn = mega.bvh_nodes[0:3, 0]
                root_mx = mega.bvh_nodes[3:6, 0]
                inv_ext = 15.0 / jnp.maximum(root_mx - root_mn, 1e-6)
                dxf = state["dx"].reshape(B)
                dyf = state["dy"].reshape(B)
                dzf = state["dz"].reshape(B)
                octant = (
                    (dxf < 0).astype(jnp.int32)
                    + 2 * (dyf < 0).astype(jnp.int32)
                    + 4 * (dzf < 0).astype(jnp.int32)
                )
                def cell(v, axis):
                    q = (v.reshape(B) - root_mn[axis]) * inv_ext[axis]
                    return jnp.clip(q.astype(jnp.int32), 0, 15)
                key = (
                    (1.0 - alive_flat).astype(jnp.int32) * (1 << 30)
                    + (octant << 12)
                    + (cell(state["ox"], 0) << 8)
                    + (cell(state["oy"], 1) << 4)
                    + cell(state["oz"], 2)
                )
            else:
                # plain alive-first compaction: unique composite key makes
                # the unstable sort bit-identical to the stable partition
                key = (alive_flat <= 0.0).astype(jnp.int32) * B + order0
                stable = False
            if sort_mode == "coherent":
                # non-unique key: stability (iota tiebreak) keeps the
                # partition deterministic
                stable = True
            overlay = False
            if pi == 0:
                rad0 = (state["rr"], state["rg"], state["rb"])
                names = [k for k in state.keys()
                         if k not in ("act", "rr", "rg", "rb")]
            else:
                # radiance/throughput overlay (round 5, same argument as
                # render/pool.py): an ALIVE ray's phase-accumulated
                # radiance is identically zero (every path has exactly
                # one terminal contribution with this material set), and
                # a DEAD ray's throughput is never read again — so the
                # two triples share 3 sort columns instead of 6,
                # reconstructed from the dead bit after the sort.
                overlay = True
                names = [k for k in state.keys()
                         if k not in ("act", "rr", "rg", "rb")]
            if regen is not None:
                # tm/pix/smp are pure functions of the ORIGINAL ray index
                # (camera RNG streams keyed on (pixel, sample)): recompute
                # them from the sorted permutation instead of moving three
                # more 4-byte columns through the sort
                names = [k for k in names if k not in ("tm", "pix", "smp")]
            ops = [key] + [state[k].reshape(B) for k in names] + [perm]
            if overlay:
                dead_now = alive_flat <= 0.0
                for tk, rk in (("tr", "rr"), ("tg", "rg"), ("tb", "rb")):
                    i = 1 + names.index(tk)
                    ops[i] = jnp.where(dead_now, state[rk].reshape(B),
                                       ops[i])
            n_core = len(ops)
            for p in pending_ids:  # deferred id words follow the lanes
                ops.extend(p["cols"])
            # prefix-sliced boundary sort (round 5): with a valid phase
            # prefix, every ray past it is dead AND position-stable (it
            # entered this phase dead and nothing moves it), so only the
            # prefix region needs sorting — the tail columns are reused
            # untouched. The dead ordering inside/outside the slice
            # differs from the full sort, but per-ray values and the
            # final unpermute (keyed on the original index) are
            # identical, so radiance/ids/counts are bit-equal.
            cut = None
            if (phase_prefixes is not None and sort_regions == 1
                    and pref is not None):
                cut = pref
            if cut is not None:
                tails = [x[cut:] for x in ops]
                ops = [x[:cut] for x in ops]
            if sort_regions > 1:
                # regional compaction: R independent sorts of contiguous
                # B/R-lane regions (sorted along the minor axis, batched
                # over regions). Alive rays pack within their own region
                # instead of globally — at most one partial 1024-ray
                # sub-block per region survives uncompacted, a negligible
                # occupancy loss — and each sort is over a much shorter
                # span. The key embeds the GLOBAL lane index, which is
                # monotone within a region, so per-region order matches
                # the global partition restricted to the region.
                assert B % sort_regions == 0
                L = B // sort_regions
                assert L % BLOCK == 0, "regions must align to ray blocks"
                ops = [x.reshape(sort_regions, L) for x in ops]
                sorted_ops = jax.lax.sort(ops, num_keys=1, is_stable=stable)
                sorted_ops = [x.reshape(B) for x in sorted_ops]
            else:
                sorted_ops = jax.lax.sort(ops, num_keys=1, is_stable=stable)
            if cut is not None:
                sorted_ops = [jnp.concatenate([v, t])
                              for v, t in zip(sorted_ops, tails)]
            for k, v in zip(names, sorted_ops[1:1 + len(names)]):
                state[k] = v.reshape(rows, TILE)
            k0 = n_core
            for p in pending_ids:
                p["cols"] = list(sorted_ops[k0:k0 + len(p["cols"])])
                k0 += len(p["cols"])
            if sort_mode == "coherent":
                dead_bit = sorted_ops[0] >= (1 << 30)
            else:
                dead_bit = sorted_ops[0] >= B
            state["act"] = jnp.where(
                dead_bit, 0.0, 1.0).reshape(rows, TILE)
            if pi == 0:
                zero2 = jnp.zeros((rows, TILE), jnp.float32)
                state.update(rr=zero2, rg=zero2, rb=zero2)
            else:
                # un-overlay: dead lanes' sorted "throughput" is their
                # radiance; alive lanes' radiance is identically zero
                # (their throughput column is the real throughput). Dead
                # lanes keep the radiance value in the throughput slot —
                # finite and never read (the kernel masks dead lanes).
                db = dead_bit.reshape(rows, TILE)
                state.update(
                    rr=jnp.where(db, state["tr"], 0.0),
                    rg=jnp.where(db, state["tg"], 0.0),
                    rb=jnp.where(db, state["tb"], 0.0))
            perm = sorted_ops[n_core - 1]
            if regen is not None:
                tm2, pix2, smp2 = regen(perm)
                state.update(
                    tm=tm2.astype(jnp.float32).reshape(rows, TILE),
                    pix=pix2.astype(jnp.int32).reshape(rows, TILE),
                    smp=smp2.astype(jnp.int32).reshape(rows, TILE),
                )

    # undo the composed permutation: one more fused sort keyed on the
    # original ray index restores camera order, then the set-aside
    # phase-1 radiance (already in camera order) is added back. With
    # regional compaction every boundary permuted only within regions, so
    # the restore can be regional too (perm values of region r all lie in
    # region r's index range).
    counts = None
    counts_c = None
    perm_out = None
    later_words = None
    compacted_ids = want_ids == "compacted"
    if len(phase_depths) > 1:
        un_ops = [perm, state["rr"].reshape(B), state["rg"].reshape(B),
                  state["rb"].reshape(B)]
        if want_counts:
            un_ops.append(state["bcc"].reshape(B))
            if compacted_ids:
                counts_c = state["bcc"].reshape(B)
        if compacted_ids:
            # later-phase id words stay in compacted order (doc above):
            # the unpermute slims to 5 operands and the consumer's
            # length sort picks the words up directly
            perm_out = perm
            cols = [c for p in pending_ids for c in p["cols"]]
            later_words = (jnp.stack(cols, axis=0) if cols
                           else jnp.zeros((0, B), jnp.int32))
            pending_ids = []
        n_un = len(un_ops)
        for p in pending_ids:  # deferred later-phase id words (see above)
            un_ops.extend(p["cols"])
        if sort_regions > 1:
            L = B // sort_regions
            un_ops = [x.reshape(sort_regions, L) for x in un_ops]
            out = [x.reshape(B) for x in jax.lax.sort(
                un_ops, num_keys=1, is_stable=False)]
        else:
            out = jax.lax.sort(un_ops, num_keys=1, is_stable=False)
        rr, rg, rb = out[1], out[2], out[3]
        if want_counts:
            counts = out[4]
        k0 = n_un
        for p in pending_ids:
            cols = out[k0:k0 + len(p["cols"])]
            k0 += len(p["cols"])
            if p["pack"]:
                from ..diff.replay_kernel import _unpack_ids

                ids_rows.append(_unpack_ids(list(cols), p["pd"]))
            else:
                ids_rows.append(jnp.stack(cols, axis=0))
        rr = rr + rad0[0].reshape(B)
        rg = rg + rad0[1].reshape(B)
        rb = rb + rad0[2].reshape(B)
    else:
        rr = state["rr"].reshape(B)
        rg = state["rg"].reshape(B)
        rb = state["rb"].reshape(B)
        if want_counts:
            counts = state["bcc"].reshape(B)
            counts_c = counts
        if compacted_ids:  # single phase: camera order IS compacted order
            perm_out = jnp.arange(B, dtype=jnp.int32)
            later_words = jnp.zeros((0, B), jnp.int32)
    radiance = jnp.stack([rr, rg, rb], axis=-1)
    extras = []
    if compacted_ids:
        extras += [jnp.concatenate(ids_rows, axis=0), later_words, perm_out]
    elif want_ids:
        extras.append(jnp.concatenate(ids_rows, axis=0))
    if want_counts:
        extras.append(counts)
        if compacted_ids:
            extras.append(counts_c)
    if phase_prefixes is not None:
        extras.append(prefix_ok)
    if extras:
        return (radiance, segments, *extras)
    return radiance, segments

