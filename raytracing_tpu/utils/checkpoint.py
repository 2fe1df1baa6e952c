"""Checkpoint / resume (SURVEY.md §5):

(a) **render checkpoints** — accumulated per-pixel radiance sums + the next
    sample-chunk cursor, so an interrupted progressive render resumes
    mid-accumulation with an identical final image (the counter-based RNG
    makes replay exact);
(b) **optimization checkpoints** — arbitrary parameter/optimizer pytrees for
    the differentiable path (orbax-compatible layout; plain npz transport so
    it also works without orbax).

Failure recovery: the render driver is embarrassingly restartable — rerun
with the last checkpoint and only missing sample chunks are traced
(tested in tests/test_utils.py, including a simulated mid-render kill).
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np


def save_render_state(path: str, state: Dict[str, Any]) -> None:
    """Atomically persist {'accum': (N,3) f32, 'segments': int, 'schunk': int}."""
    d = os.path.dirname(os.path.abspath(path))
    if d:
        os.makedirs(d, exist_ok=True)
    tmp = path + ".tmp"
    np.savez(
        tmp,
        accum=np.asarray(state["accum"], np.float32),
        segments=np.int64(state["segments"]),
        schunk=np.int64(state["schunk"]),
    )
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def load_render_state(path: str) -> Optional[Dict[str, Any]]:
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        return {
            "accum": z["accum"],
            "segments": int(z["segments"]),
            "schunk": int(z["schunk"]),
        }


def save_pytree(path: str, tree: Any) -> None:
    """Flatten a pytree of arrays to npz + a JSON treedef sidecar."""
    import jax

    leaves, treedef = jax.tree.flatten(tree)
    d = os.path.dirname(os.path.abspath(path))
    if d:
        os.makedirs(d, exist_ok=True)
    tmp = path + ".tmp"
    np.savez(tmp, **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)})
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)
    with open(path + ".treedef.json", "w") as f:
        json.dump({"n_leaves": len(leaves), "treedef": str(treedef)}, f)


def load_pytree_leaves(path: str):
    """Load the leaf list (caller re-assembles with its own treedef via
    jax.tree.unflatten)."""
    with np.load(path) as z:
        return [z[f"leaf_{i}"] for i in range(len(z.files))]


def restore_pytree(path: str, like: Any) -> Any:
    """Restore into the structure of ``like``."""
    import jax

    leaves = load_pytree_leaves(path)
    _, treedef = jax.tree.flatten(like)
    return jax.tree.unflatten(treedef, leaves)
