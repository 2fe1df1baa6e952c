"""Scene-sharded ("tensor parallel") closest-hit: primitives partitioned by
range across the ``tp`` mesh axis, global closest hit via psum-min
collectives over ICI (SURVEY.md §2.9 TP analog).

Each chip intersects the megabatch against its primitive shard; the global
winner is found with two `pmin` reductions ((t), then (global prim id) for
deterministic tie-breaking); the winning chip contributes the full hit
record via a masked `psum`. Materials/textures stay replicated (tiny);
geometry memory and intersection FLOPs scale 1/ntp.

Runs inside `shard_map` with the scene's sphere/quad tables sharded on their
leading axis and everything else replicated (see parallel/shard.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.intersect import BIG, T_MIN, HitBatch, hit_attributes, quad_ts, sphere_ts
from ..scene.types import Scene

_INT_MAX = jnp.int32(2**31 - 1)


def closest_hit_scene_sharded(
    scene_local: Scene,
    o: jnp.ndarray,
    d: jnp.ndarray,
    time: jnp.ndarray,
    t_min: float = T_MIN,
    *,
    axis: str = "tp",
) -> HitBatch:
    """Closest hit where ``scene_local`` holds this chip's primitive shard.

    Global primitive ids: chip k's sphere i → k·ns_local + i; chip k's quad
    j → ns_total + k·nq_local + j.
    """
    idx = jax.lax.axis_index(axis)
    ntp = jax.lax.psum(1, axis)
    ns_local = scene_local.n_spheres
    nq_local = scene_local.n_quads
    ns_total = ns_local * ntp

    ts = sphere_ts(scene_local, o, d, time, t_min, BIG)   # (B, ns_local)
    tq = quad_ts(scene_local, o, d, t_min, BIG)           # (B, nq_local)
    all_t = jnp.concatenate([ts, tq], axis=1)
    local_best = jnp.argmin(all_t, axis=1).astype(jnp.int32)
    local_t = jnp.take_along_axis(all_t, local_best[:, None], axis=1)[:, 0]

    # Global minimum t across shards, then lowest-global-id tie-break.
    # Winner *selection* is discrete → computed under stop_gradient (pmin has
    # no AD rule and needs none); the winner's record below is assembled with
    # differentiable masked psums, so gradients still flow to geometry.
    local_t_sg = jax.lax.stop_gradient(local_t)
    t_glob = jax.lax.pmin(local_t_sg, axis)
    local_is_quad = local_best >= ns_local
    global_id = jnp.where(
        local_is_quad,
        ns_total + idx * nq_local + (local_best - ns_local),
        idx * ns_local + local_best,
    )
    candidate = jnp.where(
        (local_t_sg == t_glob) & jnp.isfinite(local_t_sg), global_id, _INT_MAX
    )
    gid = jax.lax.pmin(candidate, axis)
    i_win = (candidate == gid) & (gid != _INT_MAX)

    # Winning chip computes the full record from its local tables; everyone
    # else contributes zeros; psum assembles.
    hit_local = hit_attributes(
        scene_local, o, d, time, jnp.where(i_win, local_t, BIG), local_best
    )

    def _mask_sum(x, zero_val=0):
        masked = jnp.where(
            i_win[(...,) + (None,) * (x.ndim - 1)], x, jnp.zeros_like(x) + zero_val
        )
        return jax.lax.psum(masked.astype(jnp.float32) if x.dtype == bool else masked, axis)

    valid = jax.lax.psum(jnp.where(i_win, 1, 0), axis) > 0
    return HitBatch(
        valid=valid,
        t=jnp.where(valid, jax.lax.psum(jnp.where(i_win, hit_local.t, 0.0), axis), BIG),
        p=_mask_sum(hit_local.p),
        normal=_mask_sum(hit_local.normal),
        front_face=_mask_sum(hit_local.front_face) > 0,
        u=_mask_sum(hit_local.u),
        v=_mask_sum(hit_local.v),
        mat_id=jax.lax.psum(jnp.where(i_win, hit_local.mat_id, 0), axis),
        prim_id=jnp.where(valid, gid, -1),
    )


def shard_scene_primitives(scene: Scene, ntp: int) -> Scene:
    """Host-side: pad primitive tables so their leading dim divides ``ntp``
    (the actual sharding is applied by shard_map in_specs).

    Scaling note: the sharded closest hit is brute-force over each chip's
    primitive range (``bvh=None`` below) — per-chip cost O(P/ntp) per ray,
    which is the right trade at reference scene sizes (~500 primitives)
    where a per-shard BVH's traversal overhead exceeds the sweep. For the
    "scene too large to replicate" regime this mode exists for (SURVEY.md
    §5), the upgrade path is sharding BVH *subtrees*: split the host tree
    at depth log2(ntp), give each chip one subtree (its own skip-link
    array) and keep the same psum-min winner reduction — the reduction
    contract here does not change. Not yet implemented; brute-force keeps
    per-chip cost exact and the collective layer fully exercised.
    """
    import numpy as np

    def pad_rows(arr, mult):
        n = arr.shape[0]
        target = -(-n // mult) * mult
        if target == n:
            return arr
        pad = [(0, target - n)] + [(0, 0)] * (arr.ndim - 1)
        return jnp.asarray(np.pad(np.asarray(arr), pad))

    sph = scene.spheres
    qd = scene.quads
    return scene.replace(
        spheres=sph.replace(
            center=pad_rows(sph.center, ntp),
            velocity=pad_rows(sph.velocity, ntp),
            radius=pad_rows(sph.radius, ntp),
            mat_id=pad_rows(sph.mat_id, ntp),
        ),
        quads=qd.replace(
            q=pad_rows(qd.q, ntp),
            u=pad_rows(qd.u, ntp),
            v=pad_rows(qd.v, ntp),
            mat_id=pad_rows(qd.mat_id, ntp),
        ),
        bvh=None,  # brute-force sharded intersection; BVH stays per-chip mode
    )
