"""Perlin gradient noise: seeded host-side table generation + vectorized
device evaluation (reference: src/core/perlin.hpp:9-266).

The reference fills its tables with unseeded ``rand()`` at construction
(perlin.hpp:9-31); we generate them on host with a seeded NumPy PRNG so runs
are reproducible, then ship them to the device as constants. Evaluation is
the same XOR-hash lattice-gradient scheme, fully vectorized: 8 corner
gathers + Hermite-smoothed trilinear blend of ``dot(gradient, offset)``.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .types import PerlinTables

POINT_COUNT = 256


def make_tables(seed: int = 0) -> PerlinTables:
    """Host-side table generation (replaces perlin.hpp:9-31 ctor).

    Gradient vectors are normalized uniform-cube samples, matching the
    reference's ``unit_vector(vec3::random(-1,1))`` distribution
    (perlin.hpp:21-24); permutations are Fisher–Yates shuffles
    (perlin.hpp:162-188).
    """
    rng = np.random.default_rng(seed)
    v = rng.uniform(-1.0, 1.0, size=(POINT_COUNT, 3))
    # Reject near-zero vectors deterministically by resampling once from a
    # fixed follow-up draw (probability ~0 but keeps normalize() safe).
    norms = np.linalg.norm(v, axis=-1, keepdims=True)
    v = np.where(norms < 1e-12, 1.0, v / np.maximum(norms, 1e-12))
    perms = [rng.permutation(POINT_COUNT).astype(np.int32) for _ in range(3)]
    return PerlinTables(
        randvec=jnp.asarray(v, jnp.float32),
        perm_x=jnp.asarray(perms[0]),
        perm_y=jnp.asarray(perms[1]),
        perm_z=jnp.asarray(perms[2]),
    )


def noise(tables: PerlinTables, p: jnp.ndarray) -> jnp.ndarray:
    """Gradient noise in [-1, 1] for points ``p`` of shape (..., 3)
    (reference ``noise_perlin`` + ``perlin_interp``, perlin.hpp:94-254)."""
    pf = jnp.floor(p)
    uvw = p - pf                      # fractional cell coords (u, v, w)
    ijk = pf.astype(jnp.int32)        # lattice cell (i, j, k)
    hermite = uvw * uvw * (3.0 - 2.0 * uvw)

    accum = jnp.zeros(p.shape[:-1], p.dtype)
    for di in (0, 1):
        for dj in (0, 1):
            for dk in (0, 1):
                # XOR-hash of per-axis permuted lattice coords
                # (perlin.hpp:119-124). `& 255` on int32 matches C semantics
                # for negative coords.
                hx = tables.perm_x[(ijk[..., 0] + di) & 255]
                hy = tables.perm_y[(ijk[..., 1] + dj) & 255]
                hz = tables.perm_z[(ijk[..., 2] + dk) & 255]
                g = tables.randvec[hx ^ hy ^ hz]  # (..., 3) corner gradient
                offset = uvw - jnp.asarray([di, dj, dk], p.dtype)
                wx = di * hermite[..., 0] + (1 - di) * (1.0 - hermite[..., 0])
                wy = dj * hermite[..., 1] + (1 - dj) * (1.0 - hermite[..., 1])
                wz = dk * hermite[..., 2] + (1 - dk) * (1.0 - hermite[..., 2])
                accum = accum + wx * wy * wz * jnp.sum(g * offset, axis=-1)
    return accum


def turbulence(tables: PerlinTables, p: jnp.ndarray, depth: int = 7) -> jnp.ndarray:
    """Octave sum with halving weight / doubling frequency, abs at the end
    (reference ``turb``, perlin.hpp:135-158)."""
    accum = jnp.zeros(p.shape[:-1], p.dtype)
    temp_p = p
    weight = 1.0
    for _ in range(depth):
        accum = accum + weight * noise(tables, temp_p)
        weight *= 0.5
        temp_p = temp_p * 2.0
    return jnp.abs(accum)


def marble(tables: PerlinTables, p: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """The active noise_texture variant: 0.5·(1 + sin(scale·z + 10·turb(p,7)))
    (reference texture.hpp:150). Returns a scalar field (...,)."""
    return 0.5 * (1.0 + jnp.sin(scale * p[..., 2] + 10.0 * turbulence(tables, p, 7)))
