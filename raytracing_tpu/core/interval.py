"""Interval helpers (reference: src/common/interval.hpp:10-80).

In the vectorized renderer an interval is just a ``(lo, hi)`` pair of arrays;
these helpers keep the reference's open/closed semantics explicit. The
renderer standardizes on the *open* ``surrounds`` test for valid hits
(the reference mixes ``surrounds`` for spheres and ``contains`` for quads —
SURVEY.md §2.8.6).
"""
from __future__ import annotations

import jax.numpy as jnp

INF = jnp.inf


def contains(lo, hi, x):
    """Closed containment: lo <= x <= hi (interval.hpp:29-34)."""
    return (lo <= x) & (x <= hi)


def surrounds(lo, hi, x):
    """Open containment: lo < x < hi (interval.hpp:37-41)."""
    return (lo < x) & (x < hi)


def clamp(lo, hi, x):
    """Clamp x into [lo, hi] (interval.hpp:44-53)."""
    return jnp.clip(x, lo, hi)


def expand(lo, hi, delta):
    """Symmetric expansion by delta/2 per side (interval.hpp:56-63)."""
    pad = delta / 2.0
    return lo - pad, hi + pad


def size(lo, hi):
    return hi - lo
