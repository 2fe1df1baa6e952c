"""TPU-only smoke tests (skipped on CPU CI; run manually on hardware).

The key canary guards MXU-precision regressions: if any hot dot product
lowers to the MXU at bf16 default precision, Cornell-box light transport
collapses (fraction of lit pixels drops ~5x) — see ops/intersect.py quad_ts.
"""
import numpy as np
import jax
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu",) and "axon" not in str(jax.devices()[0]).lower(),
    reason="TPU-only smoke test",
)


def test_cornell_light_transport_canary():
    from raytracing_tpu.diff.gradients import render_once
    from raytracing_tpu.models.scenes import build

    scene, cfg = build("cornell_box", image_width=64, samples_per_pixel=16, max_depth=16)
    img = np.asarray(jax.jit(lambda: render_once(scene, cfg, seed=0, remat=False))())
    lit = (img.max(-1) > 0).mean()
    assert 0.25 < lit < 0.6, f"lit-pixel fraction {lit}: TPU precision regression?"
