"""Primitive-cost measurements on the real chip for the pool-renderer
design. Each op runs ITERS times inside one jit with a data dependence
between iterations (so XLA cannot elide or overlap them), fenced by a
4-byte scalar materialization — per-op device time, free of the
tunnel's D2H bandwidth (~25-50 MB/s, which dominated the naive
version of this script) and its ~2 ms dispatch latency.

    python tools/prim_bench.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 20


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    def timeit(name, fn, *args, reps=3):
        val = fn(*args)
        float(np.asarray(val))
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            val = fn(*args)
            float(np.asarray(val))
            times.append(time.perf_counter() - t0)
        per = min(times) / ITERS
        print(f"{name}: {per*1e3:.3f} ms/op  (batch best "
              f"{min(times)*1e3:.1f} ms, all {[round(t*1e3,1) for t in times]})",
              flush=True)

    key = jax.random.PRNGKey(0)
    B = 262144

    # 1. boundary sort: B lanes, i32 key + 14 payload operands
    k1 = jax.random.randint(key, (B,), 0, 1 << 24, dtype=jnp.int32)
    fops = [jax.random.normal(jax.random.fold_in(key, i), (B,), jnp.float32)
            for i in range(13)]
    iop = jax.random.randint(key, (B,), 0, 1 << 24, dtype=jnp.int32)

    @jax.jit
    def bsort(k1, iop, *fops):
        def body(_, carry):
            k, io = carry
            out = jax.lax.sort([k] + list(fops) + [io], num_keys=1,
                               is_stable=False)
            # feed back a derived key: new dependence each iteration
            return (out[-1] ^ 12345, out[-1])
        k, io = jax.lax.fori_loop(0, ITERS, body, (k1, iop))
        return jnp.sum(io)

    timeit(f"boundary_sort_{B//1024}k_x15", bsort, k1, iop, *fops)

    # 2. final fold sort: 9.4M rows, i32 key + 3 f32 payloads
    N = 9 * 1024 * 1024 + B
    kN = jax.random.randint(key, (N,), 0, 1 << 24, dtype=jnp.int32)
    r3 = [jax.random.normal(jax.random.fold_in(key, 7 + i), (N,), jnp.float32)
          for i in range(3)]
    F_ITERS = 3

    @jax.jit
    def fsort(kN, a, b, c):
        def body(_, carry):
            k, a, b, c = carry
            out = jax.lax.sort([k, a, b, c], num_keys=1, is_stable=False)
            return (out[0] ^ 9876, out[1], out[2], out[3])
        k, a, b, c = jax.lax.fori_loop(0, F_ITERS, body, (kN, a, b, c))
        return jnp.sum(a)

    val = fsort(kN, *r3)
    float(np.asarray(val))
    t0 = time.perf_counter()
    val = fsort(kN, *r3)
    float(np.asarray(val))
    print(f"final_sort_9.4M_x4: {(time.perf_counter()-t0)/F_ITERS*1e3:.1f} "
          "ms/op", flush=True)

    # 3. scatter-add B updates into (90112, 3), duplicate indices
    npx = 90112
    idx = jax.random.randint(key, (B,), 0, npx, dtype=jnp.int32)
    upd = jax.random.normal(key, (B, 3), jnp.float32)
    acc0 = jnp.zeros((npx, 3), jnp.float32)

    @jax.jit
    def scat(acc0, idx, upd):
        def body(i, acc):
            return acc.at[(idx + i) % npx].add(upd)
        return jnp.sum(jax.lax.fori_loop(0, ITERS, body, acc0))

    timeit("scatter_add_262k_to_90k_dup", scat, acc0, idx, upd)

    # 4. scatter-set B SORTED UNIQUE indices into 9.4M rows
    idxs = jnp.sort(jax.random.permutation(key, N)[:B].astype(jnp.int32))
    big0 = jnp.zeros((N,), jnp.float32)

    @jax.jit
    def scatset(big0, idxs, v):
        def body(i, big):
            return big.at[idxs].set(
                v + i, mode="drop", unique_indices=True,
                indices_are_sorted=True)
        return jnp.sum(jax.lax.fori_loop(0, ITERS, body, big0))

    timeit("scatter_set_262k_sorted_unique_to_9.4M", scatset, big0, idxs,
           fops[0])

    # 5. dynamic_update_slice of a B block into 9.4M at dynamic offset
    @jax.jit
    def dus(big0, blk):
        def body(i, big):
            return jax.lax.dynamic_update_slice(big, blk, (i * 1024,))
        return jnp.sum(jax.lax.fori_loop(0, ITERS, body, big0))

    timeit("dus_262k_into_9.4M", dus, big0, fops[0])

    # 6. segment-fold alternative: per-boundary sorted-by-pixel
    # prefix-sum is just a cumsum over B
    @jax.jit
    def csum(v):
        def body(_, x):
            return jnp.cumsum(x) * 1e-6
        return jnp.sum(jax.lax.fori_loop(0, ITERS, body, v))

    timeit("cumsum_262k", csum, fops[0])


if __name__ == "__main__":
    main()
