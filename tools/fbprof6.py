"""Time the EXACT bench_fwd_bwd chunk program (grads_chunk) solo — with
a per-call host fence — and in the async 25-chunk accumulation loop, to
reconcile the stage-split numbers (fbprof4/5) with the end-to-end
unfused bench rate.

    python tools/fbprof6.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench

    bench._enable_compile_cache()
    s = bench._fwd_bwd_setup()
    s["plan"](fused=False)
    grads_chunk, args = s["grads_chunk"], s["args"]
    n_chunks, spc = s["n_chunks"], s["spp_chunk"]

    chunk_fn = jax.jit(grads_chunk).lower(*args, jnp.int32(0)).compile()

    # solo, fenced per call
    out = chunk_fn(*args, jnp.int32(0))
    np.asarray(out[1])
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = chunk_fn(*args, jnp.int32(0))
        np.asarray(out[1]), np.asarray(out[2])
        times.append(time.perf_counter() - t0)
    print(f"chunk solo: best {min(times)*1e3:.1f} ms  "
          f"all {[round(t*1e3,1) for t in times]}", flush=True)

    # async loop, fenced once (the bench pattern)
    t0 = time.perf_counter()
    gc = jnp.zeros_like(args[0])
    gr = jnp.zeros_like(args[1])
    segs = jnp.zeros((), jnp.int32)
    for c in range(n_chunks):
        _, g1, g2, _, seg = chunk_fn(*args, jnp.int32(c * spc))
        gc, gr, segs = gc + g1, gr + g2, segs + seg
    np.asarray(gc), np.asarray(gr)
    dt = time.perf_counter() - t0
    print(f"loop {n_chunks} chunks: {dt*1e3:.1f} ms total, "
          f"{dt/n_chunks*1e3:.1f} ms/chunk, "
          f"{int(segs)/dt/1e6:.2f}M rays/s", flush=True)


if __name__ == "__main__":
    main()
