"""Device-mesh construction helpers.

The reference is single-threaded with zero parallelism (SURVEY.md §2.9); all
scaling in this framework is expressed as `jax.sharding.Mesh` axes:

  * ``dp`` — data parallel: pixel-tile × sample megabatch sharding (the
    analog of the reference's pixel loop, camera.hpp:40-49),
  * ``tp`` — tensor/scene parallel: primitives partitioned by range across
    chips with a psum-min closest-hit reduction (SURVEY.md §2.9 "TP analog"),
  * ``sp`` — sample parallel: samples-per-pixel split across chips (the
    "sequence" axis of this workload, SURVEY.md §5 long-context analog).

Multi-host bring-up goes through :func:`initialize_distributed`
(jax.distributed over DCN); within a slice, collectives ride ICI.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(
    axis_sizes: Optional[Sequence[int]] = None,
    axis_names: Tuple[str, ...] = ("dp",),
    devices=None,
) -> Mesh:
    """Build a mesh over the available devices.

    ``make_mesh()`` → all devices on one ``dp`` axis.
    ``make_mesh((4, 2), ("dp", "tp"))`` → 4-way data × 2-way scene parallel.
    """
    devices = list(jax.devices() if devices is None else devices)
    if axis_sizes is None:
        axis_sizes = (len(devices),)
    axis_sizes = tuple(int(s) for s in axis_sizes)
    n = int(np.prod(axis_sizes))
    if n > len(devices):
        raise ValueError(f"mesh wants {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(axis_sizes)
    return Mesh(dev_array, axis_names[: len(axis_sizes)])


def initialize_distributed(coordinator: Optional[str] = None, **kwargs) -> None:
    """Multi-host initialization (DCN). No-op when already initialized or
    single-process. Mirrors `jax.distributed.initialize` defaults."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator, **kwargs)
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process environment
