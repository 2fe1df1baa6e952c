"""Multi-process (multi-host) rendering over a global device mesh.

The single-process sharded renderer (parallel/shard.py) jits over local
arrays; under `jax.distributed` every jit input must instead be a *global*
`jax.Array` whose shards live on the right processes. This module wraps
build_sharded_renderer with the global-array plumbing:

  * replicated inputs (scene tables, camera params) are broadcast with a
    fully-replicated NamedSharding,
  * the pixel axis is laid out over ``dp`` with make_array_from_callback
    (each process materializes only its addressable shards),
  * the per-shard radiance comes back via multihost_utils.process_allgather
    so every process ends with the full image.

RNG identity is global (pixel, sample) ids — core/rng.py — so an N-process
render is bit-identical to the 1-process render of the same seed, which is
the invariant tests/test_multihost.py asserts across real OS processes
(2-process localhost `jax.distributed.initialize`, SURVEY.md §4.4).

The reference has no distributed anything (single thread,
src/core/camera.hpp:40-67); this layer is designed from the BASELINE
multi-host scaling targets.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..render.camera import CameraConfig, CameraParams
from ..scene.types import Scene
from .shard import build_sharded_renderer


def global_mesh(axis_sizes, axis_names) -> Mesh:
    """Mesh over ALL processes' devices (jax.devices() is global under
    jax.distributed)."""
    devs = np.asarray(jax.devices())
    n = int(np.prod(axis_sizes))
    if n > devs.size:
        raise ValueError(f"mesh wants {n} devices, global pool has {devs.size}")
    return Mesh(devs[:n].reshape(tuple(axis_sizes)), tuple(axis_names))


def _replicate(tree, mesh: Mesh):
    """Broadcast a host-local pytree to a fully-replicated global array."""
    sharding = NamedSharding(mesh, P())

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])

    return jax.tree.map(put, tree)


def render_sharded_distributed(
    scene: Scene,
    cfg: CameraConfig,
    mesh: Mesh,
    params: Optional[CameraParams] = None,
    seed: int = 0,
    *,
    hit_method: str = "brute",
    mode: str = "scan",
    sample_chunk: Optional[int] = None,
    checkpoint: Optional[str] = None,
    chunk_cb=None,
):
    """Multi-process sharded render → ((H, W, 3) mean radiance replicated on
    every process, total segments).

    ``sample_chunk``: render the spp budget in windows of this many
    samples per pixel, accumulating on the host between windows — the
    failure-recovery unit for multi-host renders. After each completed
    window, process 0 writes ``checkpoint`` (atomic npz: sample-sum so
    far, segments, next window start); if the file exists on entry, all
    processes resume from its recorded window (the checkpoint path must
    be readable by every process that restarts — in production a shared
    filesystem, in tests a shared tmpdir). Any process dying mid-window
    stalls the others' collectives; the launcher kills and relaunches the
    job, which replays only the remaining windows — RNG sample ids are
    global, so the resumed render is identical to an uninterrupted one
    (tests/test_multihost.py kill-recovery test). ``chunk_cb(k)`` (when
    set) runs on every process after window ``k`` completes — test hook
    for fault injection. For sp-sharded meshes, prefer windows that are
    multiples of ``spp / n_sp`` (other windows are correct but leave sp
    shards partially idle).
    """
    fn, scene_prep, n_pix_pad = build_sharded_renderer(
        scene, cfg, mesh, hit_method=hit_method, mode=mode
    )
    if params is None:
        params = CameraParams.from_config(cfg)

    scene_g = _replicate(scene_prep, mesh)
    params_g = _replicate(params, mesh)
    dp_sharding = NamedSharding(mesh, P("dp"))
    pixel_ids = jax.make_array_from_callback(
        (n_pix_pad,), dp_sharding,
        lambda idx: np.arange(n_pix_pad, dtype=np.int32)[idx],
    )
    seed_g = _replicate(jnp.uint32(seed), mesh)

    from jax.experimental import multihost_utils

    spp = cfg.samples_per_pixel
    if sample_chunk is None:
        windows = [(0, spp)]
    else:
        windows = [(s, min(s + sample_chunk, spp))
                   for s in range(0, spp, sample_chunk)]

    import os

    acc = np.zeros((n_pix_pad, 3), np.float32)
    seg_total = 0
    start_k = 0
    if checkpoint and os.path.exists(checkpoint):
        with np.load(checkpoint) as ck:
            acc = ck["acc"]
            seg_total = int(ck["segments"])
            start_k = int(ck["next_window"])

    for k in range(start_k, len(windows)):
        lo, hi = windows[k]
        part, segments = fn(scene_g, params_g, pixel_ids, seed_g,
                            jnp.asarray([lo, hi], jnp.int32))
        part_full = multihost_utils.process_allgather(part, tiled=True)
        acc = acc + np.asarray(part_full)
        seg_total += int(segments)
        if checkpoint and jax.process_index() == 0:
            tmp = checkpoint + ".tmp.npz"  # np.savez appends .npz itself
            np.savez(tmp, acc=acc, segments=seg_total, next_window=k + 1)
            os.replace(tmp, checkpoint)
        if chunk_cb is not None:
            chunk_cb(k)

    mean = acc[: cfg.n_pixels] / cfg.samples_per_pixel
    return mean.reshape(cfg.image_height, cfg.image_width, 3), seg_total
