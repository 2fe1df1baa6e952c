"""Structured logging/observability (SURVEY.md §5 metrics/logging).

The reference's only diagnostics are a scanline countdown and stderr errors
(camera.hpp:47-48, main.cpp:361-366). Here: JSONL event records (scene
compile stats, per-launch rays/s, wavefront occupancy) + console mirror.
"""
from __future__ import annotations

import json
import sys
import time
from typing import Any, Optional, TextIO


class JsonlLogger:
    def __init__(self, path: Optional[str] = None, echo: bool = True):
        self._fh: Optional[TextIO] = open(path, "a") if path else None
        self.echo = echo

    def log(self, event: str, **fields: Any) -> None:
        rec = {"ts": time.time(), "event": event, **fields}
        line = json.dumps(rec)
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()
        if self.echo:
            print(line, file=sys.stderr)

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None


def scene_stats(scene) -> dict:
    """Compile-time stats the reference keeps implicit in its BVH ctor
    (bvh_node.hpp:30-76)."""
    import numpy as np

    stats = {
        "n_spheres": int(scene.n_spheres),
        "n_quads": int(scene.n_quads),
        "n_materials": int(scene.materials.mtype.shape[0]),
        "n_textures": int(scene.textures.ttype.shape[0]),
        "has_bvh": scene.bvh is not None,
        "flags": dict(scene.flags._asdict()),
    }
    if scene.bvh is not None:
        prim = np.asarray(scene.bvh.prim)
        stats["bvh_nodes"] = int(prim.shape[0])
        stats["bvh_leaves"] = int((prim >= 0).sum())
    return stats
