"""Host-side two-level BVH build for the Pallas megakernel's in-kernel
traversal (ops/megakernel.py).

Reference semantics: recursive longest-axis median split over AABB-sorted
spans (src/accelerator/bvh_node.hpp:25-77), AABB slab reject + closest-so-far
clipping during traversal (bvh_node.hpp:80-95). The TPU-native twist is the
*leaf granularity*: leaves hold up to ``LEAF_SIZE`` primitives of one kind
("chunks"), because the kernel intersects a leaf as one pairwise
``(8 members, 128 rays)`` VPU block — per-primitive leaves would waste the
vector width. Internal nodes flatten to depth-first preorder with miss
(skip) links for a stackless per-lane walk:

    node i internal:  box hit  → i + 1 (preorder first child)
                      box miss → miss[i]
    node i leaf:      queue chunk[i] for pairwise intersection, → miss[i]

Output layouts are gather-friendly for Mosaic's lane gather
(``take_along_axis`` on (8, 128) blocks — see ops/megakernel.py resolve()):

  * ``node_tab (8, K_pad)``: one sublane per node field
    [bmin.xyz, bmax.xyz, miss_link, leaf_chunk(-1=internal)], nodes on lanes.
  * ``leaf_tab (8·NGROUP, L_pad)``: per field f and member s,
    ``leaf_tab[g·8+s_field...]`` — precisely: group g row s holds field
    ``FIELD(g, s)`` of *all 8 members stacked how the kernel gathers them*:
    row layout is field-major: for each field f (8 per group), rows are the
    8 chunk members. One lane gather per field fetches that field for all
    8 members of each ray's chunk.

Chunks are homogeneous (all-sphere or all-quad) so the kernel can run one
intersection routine per chunk kind; sphere chunks get ids [0, n_sph_chunks)
and quad chunks [n_sph_chunks, n_chunks). Member ids are columns of the
megakernel's unified primitive table (scene/flatten.py unified_table), so
the winner index feeds the existing attribute resolve() unchanged.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np

from .bvh import PAD_DELTA

LEAF_SIZE = 8
LANE = 128

# node_tab sublane rows
N_BMINX, N_BMINY, N_BMINZ, N_BMAXX, N_BMAXY, N_BMAXZ, N_MISS, N_LEAF = range(8)


class ChunkedBVH(NamedTuple):
    node_tab: np.ndarray      # (8, K_pad) f32
    sph_leaf_tab: np.ndarray  # (8*8, LS_pad) f32 — fields [cx cy cz vx vy vz r gid] × 8 members
    quad_leaf_tab: np.ndarray # (8*17→(8*24), LQ_pad) f32 — fields [nx ny nz D wx wy wz gid qx qy qz ux uy uz vx vy vz] × 8 members
    n_nodes: int
    n_sph_chunks: int
    n_quad_chunks: int
    depth_max: int            # tree depth (diagnostics)


SPH_LEAF_FIELDS = 8   # cx cy cz vx vy vz r gid
QUAD_LEAF_FIELDS = 24 # nx ny nz D wx wy wz gid qx qy qz ux uy uz vx vy vz (+pad)


def _pad_lanes(n: int) -> int:
    return max(LANE, -(-n // LANE) * LANE)


def build_chunked_bvh(table: np.ndarray, n_sph_pad: int, n_sph: int, n_quad: int) -> ChunkedBVH:
    """Build from the unified primitive table (scene/flatten.py).

    ``table`` is (U_FIELDS, P); spheres occupy columns [0, n_sph), quads
    [n_sph_pad, n_sph_pad + n_quad). Quad columns hold the *plane* form
    (n, D, w) in G0..G6 and the corner/edges in U_QX.. — both are packed
    into the quad leaf table.
    """
    from ..scene import flatten as fl

    # --- per-primitive AABBs in unified-column space -----------------------
    cols = []
    kinds = []
    for i in range(n_sph):
        cols.append(i)
        kinds.append(0)
    for j in range(n_quad):
        cols.append(n_sph_pad + j)
        kinds.append(1)
    cols = np.asarray(cols, np.int64)
    kinds = np.asarray(kinds, np.int64)
    P = len(cols)
    bmin = np.zeros((P, 3), np.float32)
    bmax = np.zeros((P, 3), np.float32)
    if n_sph:
        c0 = table[[fl.U_G0, fl.U_G1, fl.U_G2]][:, :n_sph].T
        vel = table[[fl.U_G3, fl.U_G4, fl.U_G5]][:, :n_sph].T
        r = table[fl.U_G6, :n_sph][:, None]
        c1 = c0 + vel
        bmin[:n_sph] = np.minimum(c0 - r, c1 - r)
        bmax[:n_sph] = np.maximum(c0 + r, c1 + r)
    if n_quad:
        qs = slice(n_sph_pad, n_sph_pad + n_quad)
        q = table[[fl.U_QX, fl.U_QY, fl.U_QZ]][:, qs].T
        u = table[[fl.U_UX, fl.U_UY, fl.U_UZ]][:, qs].T
        v = table[[fl.U_VX, fl.U_VY, fl.U_VZ]][:, qs].T
        corners = np.stack([q, q + u, q + v, q + u + v])
        qmin = corners.min(axis=0)
        qmax = corners.max(axis=0)
        thin = (qmax - qmin) < PAD_DELTA  # aabb::pad_to_minimums (aabb.hpp:135-154)
        qmin = np.where(thin, qmin - PAD_DELTA / 2, qmin)
        qmax = np.where(thin, qmax + PAD_DELTA / 2, qmax)
        bmin[n_sph:] = qmin
        bmax[n_sph:] = qmax

    # --- recursive leaf-8 build (longest-axis median split, homogeneous
    #     leaves; bvh_node.hpp:25-77 with LEAF_SIZE > 1) ---------------------
    chunks: list = []       # list of (kind, member column indices)
    out_rows: list = []     # preorder [bmin3, bmax3, miss placeholder, leaf]
    depth_max = [0]

    def emit_leaf(idxs: np.ndarray) -> None:
        node_min = bmin[idxs].min(axis=0)
        node_max = bmax[idxs].max(axis=0)
        chunk_id = len(chunks)
        chunks.append((int(kinds[idxs[0]]), cols[idxs]))
        out_rows.append((node_min, node_max, -1, chunk_id))

    def emit(idxs: np.ndarray, depth: int) -> int:
        """Emit the subtree over idxs; return node count."""
        depth_max[0] = max(depth_max[0], depth)
        kset = set(kinds[idxs].tolist())
        if len(idxs) <= LEAF_SIZE and len(kset) == 1:
            emit_leaf(idxs)
            return 1
        node_min = bmin[idxs].min(axis=0)
        node_max = bmax[idxs].max(axis=0)
        slot = len(out_rows)
        out_rows.append((node_min, node_max, -1, -1))
        if len(idxs) <= LEAF_SIZE:
            # mixed tiny span: one homogeneous leaf per kind
            left = idxs[kinds[idxs] == 0]
            right = idxs[kinds[idxs] == 1]
        else:
            axis = int(np.argmax(node_max - node_min))  # longest_axis
            key = bmin[idxs][:, axis]
            s = idxs[np.argsort(key, kind="stable")]    # bvh_node.hpp:69
            mid = len(idxs) // 2
            left, right = s[:mid], s[mid:]
        n_l = emit(left, depth + 1)
        n_r = emit(right, depth + 1)
        return 1 + n_l + n_r

    import sys

    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 10000 + P))
    try:
        emit(np.arange(P), 1)
    finally:
        sys.setrecursionlimit(old)

    K = len(out_rows)
    leaf = np.asarray([r[3] for r in out_rows], np.int64)
    miss = np.full(K, -1, np.int64)
    # subtree sizes right-to-left, then skip links via explicit stack
    size = np.ones(K, np.int64)
    for i in range(K - 1, -1, -1):
        if leaf[i] < 0:
            l = i + 1
            size[i] = 1 + size[l] + size[l + size[l]]
    stack = [(0, -1)]
    while stack:
        i, m = stack.pop()
        miss[i] = m
        if leaf[i] < 0:
            l = i + 1
            r = l + int(size[l])
            stack.append((l, r))
            stack.append((r, m))

    # --- reorder chunks: spheres first, then quads -------------------------
    order = sorted(range(len(chunks)), key=lambda c: chunks[c][0])
    remap = {old_id: new_id for new_id, old_id in enumerate(order)}
    n_sph_chunks = sum(1 for k, _ in chunks if k == 0)
    n_quad_chunks = len(chunks) - n_sph_chunks

    k_pad = _pad_lanes(K)
    node_tab = np.zeros((8, k_pad), np.float32)
    for i, (mn, mx, _, lf) in enumerate(out_rows):
        node_tab[N_BMINX:N_BMINZ + 1, i] = mn
        node_tab[N_BMAXX:N_BMAXZ + 1, i] = mx
        node_tab[N_MISS, i] = float(miss[i])
        node_tab[N_LEAF, i] = float(remap[lf]) if lf >= 0 else -1.0
    # padded node columns: empty boxes (min > max) → never hit; miss = -1
    node_tab[N_BMINX:N_BMINZ + 1, K:] = 1.0
    node_tab[N_BMAXX:N_BMAXZ + 1, K:] = -1.0
    node_tab[N_MISS, K:] = -1.0
    node_tab[N_LEAF, K:] = -1.0

    # --- leaf member tables ------------------------------------------------
    ls_pad = _pad_lanes(max(n_sph_chunks, 1))
    lq_pad = _pad_lanes(max(n_quad_chunks, 1))
    sph_tab = np.zeros((SPH_LEAF_FIELDS * 8, ls_pad), np.float32)
    quad_tab = np.zeros((QUAD_LEAF_FIELDS * 8, lq_pad), np.float32)
    # dead sphere members: r = 0 → rejected by the kernel's r > 0 check;
    # dead quad members: zero normal → |denom| < eps → rejected.
    from ..scene import flatten as fl2

    sph_fields = [fl2.U_G0, fl2.U_G1, fl2.U_G2, fl2.U_G3, fl2.U_G4, fl2.U_G5,
                  fl2.U_G6, None]  # None = gid
    quad_fields = [fl2.U_G0, fl2.U_G1, fl2.U_G2, fl2.U_G3, fl2.U_G4, fl2.U_G5,
                   fl2.U_G6, None, fl2.U_QX, fl2.U_QY, fl2.U_QZ,
                   fl2.U_UX, fl2.U_UY, fl2.U_UZ, fl2.U_VX, fl2.U_VY, fl2.U_VZ]

    for old_id, (kind, members) in enumerate(chunks):
        new_id = remap[old_id]
        if kind == 0:
            tab, fields, base = sph_tab, sph_fields, new_id
        else:
            tab, fields, base = quad_tab, quad_fields, new_id - n_sph_chunks
        for s, col in enumerate(members):
            for f, uf in enumerate(fields):
                tab[f * 8 + s, base] = (
                    float(col) if uf is None else table[uf, col]
                )
        # pad members: gid points at member 0 (harmless: its candidate is
        # masked dead by r=0 / zero-normal rejection)
        for s in range(len(members), LEAF_SIZE):
            for f, uf in enumerate(fields):
                tab[f * 8 + s, base] = float(members[0]) if uf is None else 0.0

    return ChunkedBVH(
        node_tab=node_tab,
        sph_leaf_tab=sph_tab,
        quad_leaf_tab=quad_tab,
        n_nodes=K,
        n_sph_chunks=n_sph_chunks,
        n_quad_chunks=n_quad_chunks,
        depth_max=depth_max[0],
    )
