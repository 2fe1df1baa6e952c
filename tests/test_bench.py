"""CI smoke for the bench harness itself (bench.py).

Round-3 lesson: the driver's end-of-round bench run is the only consumer
of bench_fwd_bwd, and a latent breakage there silently drops the
forward+backward metric from the round's BENCH json. Exercise both the
fused sweep and the unfused per-chunk fallback at a tiny shape on CPU
(interpret-mode kernels) and assert they agree on the exact segment
count and on gradients' finiteness.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_fwd_bwd_fused_and_unfused_agree():
    import bench

    r_fused = bench.bench_fwd_bwd(width=64, spp=4, max_depth=5,
                                  spp_chunk=2, fused=True)
    r_unf = bench.bench_fwd_bwd(width=64, spp=4, max_depth=5,
                                spp_chunk=2, fused=False)
    assert r_fused["segments"] == r_unf["segments"] > 0
    assert r_unf["fused"] is False
    assert np.isfinite(r_fused["rays_per_s"])


def test_forward_bench_runs():
    import bench

    r = bench.bench_forward(width=64, spp=4, max_depth=5)
    assert r is not None and r["segments"] > 0
