"""CI ground-truth check against the actual C++ reference renderer.

Builds /root/reference/src/main.cpp (stb stubbed — no compared scene
loads an image) and compares image statistics on a tiny deterministic
config, asserting the tolerances from tools/cpp_compare.py. This is the
committed live version of the stored CPP_COMPARE.json comparison
(BASELINE.md correctness row: "allclose vs C++ reference at equal spp").
"""
import os
import shutil
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))


@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")
@pytest.mark.skipif(not os.path.isdir("/root/reference/src"),
                    reason="reference checkout not mounted")
def test_quads_stats_match_cpp_reference():
    import cpp_compare

    r = cpp_compare.run_config("quads", width=64, spp=8, depth=4)
    # Monte-Carlo mean over 64*64*8 samples: the C++ (f64, std::rand) and
    # JAX (f32, PCG4D) estimators agree to well under 4 u8 counts; the
    # quads scene has no stochastic materials so nonblack is exact.
    assert r["mean_abs_diff_u8"] <= 4.0, r
    assert r["nonblack_abs_diff"] <= 0.02, r


@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")
@pytest.mark.skipif(not os.path.isdir("/root/reference/src"),
                    reason="reference checkout not mounted")
def test_cornell_stats_match_cpp_reference():
    import cpp_compare

    # Emissive + black-background + multi-bounce diffuse interreflection
    # path; small+noisy, so looser mean tolerance (stored CPP_COMPARE.json
    # carries the bigger config).
    r = cpp_compare.run_config("cornell_box", width=48, spp=24, depth=8)
    assert r["mean_abs_diff_u8"] <= 6.0, r
    assert r["nonblack_abs_diff"] <= 0.05, r
