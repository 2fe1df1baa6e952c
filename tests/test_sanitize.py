"""checkify / NaN sanitizer coverage of the gather-heavy render paths
(SURVEY.md §5 race-detection tier; see utils/sanitize.py for why these are
the failure modes that matter in a functionally-pure renderer)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracing_tpu.diff.gradients import render_once
from raytracing_tpu.models.scenes import build
from raytracing_tpu.ops.traverse import closest_hit_bvh
from raytracing_tpu.utils.sanitize import checked, nan_guard


class TestSanitizers:
    def test_checked_render_clean(self):
        """The full wavefront render (BVH traversal + texture gathers +
        scatter) carries no index/NaN/div errors."""
        scene, cfg = build(
            "bouncing_spheres", image_width=16, samples_per_pixel=2, max_depth=4
        )

        def f():
            # remat=False: checkify's error carry does not compose with
            # jax.checkpoint-wrapped scan bodies (unpack mismatch in the
            # rematerialized closure); the sanitizer pass is a debug tier,
            # not the production remat path.
            return render_once(scene, cfg, seed=3, hit_fn=closest_hit_bvh,
                               remat=False)

        err, img = jax.jit(checked(f))()
        err.throw()  # no-op when clean
        assert np.isfinite(np.asarray(img)).all()

    def test_checked_catches_nan(self):
        def bad(x):
            return jnp.sqrt(x) / jnp.sum(x)

        err, _ = jax.jit(checked(bad))(jnp.asarray([-1.0, 1.0]))
        with pytest.raises(Exception, match="nan"):
            err.throw()

    def test_nan_guard_raises(self):
        with pytest.raises(FloatingPointError):
            with nan_guard():
                jnp.log(jnp.zeros(4) - 1.0).block_until_ready()

    def test_nan_guard_clean_render(self):
        scene, cfg = build(
            "cornell_box", image_width=12, samples_per_pixel=1, max_depth=3
        )
        with nan_guard():
            img = render_once(scene, cfg, seed=1)
            np.asarray(img)
        assert np.isfinite(np.asarray(img)).all()
