"""Pallas fwd+bwd replay kernel vs the XLA replay paths.

Forward must be BIT-identical to replay_trace_fast (same scalar op
order); the hand-derived backward must match jax.grad of the XLA replay
to f32 reassociation tolerance. Runs the kernels in interpret mode on
the CPU CI backend.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracing_tpu.diff.replay import record_decisions, replay_trace
from raytracing_tpu.diff.replay_fast import replay_trace_fast, supported_fast
from raytracing_tpu.diff.replay_kernel import replay_trace_kernel
from raytracing_tpu.models.scenes import build
from raytracing_tpu.render import camera as cam_mod
from raytracing_tpu.render.camera import CameraParams

B_ALIGN = 2048


def _setup(name, depth=8, seed=5):
    # batch must be a 2048 multiple: pad pixels, padding lanes start dead
    scene, cfg = build(name, image_width=32, samples_per_pixel=1,
                       max_depth=depth)
    n_pix = cfg.n_pixels
    B = -(-n_pix // B_ALIGN) * B_ALIGN
    pix = jnp.minimum(jnp.arange(B, dtype=jnp.int32), n_pix - 1)
    smp = jnp.zeros((B,), jnp.int32)
    act0 = jnp.arange(B) < n_pix
    params = CameraParams.from_config(cfg)
    derived = cam_mod.derive(cfg, params)
    o, d, t = cam_mod.generate_rays(cfg, derived, pix, smp,
                                    jnp.uint32(seed),
                                    motion_blur=scene.flags.has_moving)
    bg = jnp.asarray(cfg.background, jnp.float32)
    ids = record_decisions(scene, o, d, t, pix, smp, bg, depth,
                           jnp.uint32(seed), active0=act0)
    return scene, ids, o, d, t, pix, smp, bg, depth, seed, act0


class TestReplayKernel:
    @pytest.mark.parametrize("name", [
        "three_spheres", "bouncing_spheres", "quads", "cornell_box",
    ])
    def test_forward_bit_identical(self, name):
        (scene, ids, o, d, t, pix, smp, bg, depth, seed,
         act0) = _setup(name)
        assert supported_fast(scene)
        want, wseg = replay_trace_fast(scene, ids, o, d, t, pix, smp, bg,
                                       depth, jnp.uint32(seed),
                                       active0=act0)
        got, gseg = replay_trace_kernel(scene, ids, o, d, t, pix, smp, bg,
                                        depth, jnp.uint32(seed),
                                        active0=act0)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        assert int(gseg) == int(wseg)

    @pytest.mark.parametrize("name", [
        "three_spheres", "bouncing_spheres", "cornell_box",
    ])
    def test_backward_matches_autodiff(self, name):
        (scene, ids, o, d, t, pix, smp, bg, depth, seed,
         act0) = _setup(name, depth=6)

        def loss(fn, center, vel, rad, rgb, qq):
            s = scene.replace(
                spheres=scene.spheres.replace(center=center, velocity=vel,
                                              radius=rad),
                textures=scene.textures.replace(rgb=rgb),
                quads=scene.quads.replace(q=qq),
            )
            out, _ = fn(s, ids, o, d, t, pix, smp, bg, depth,
                        jnp.uint32(seed), active0=act0)
            return jnp.sum(out * out)

        args = (scene.spheres.center, scene.spheres.velocity,
                scene.spheres.radius, scene.textures.rgb, scene.quads.q)
        g_ref = jax.grad(lambda *a: loss(replay_trace, *a),
                         argnums=(0, 1, 2, 3, 4))(*args)
        g_k = jax.grad(lambda *a: loss(replay_trace_kernel, *a),
                       argnums=(0, 1, 2, 3, 4))(*args)
        for gr, gk in zip(g_ref, g_k):
            np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                                       rtol=3e-5, atol=3e-6)

    @pytest.mark.parametrize("name", ["bouncing_spheres", "cornell_box"])
    def test_path_length_gating_exact(self, name):
        """Per-tile bounce gating (lengths from the decision pass's
        want_counts) must be BIT-identical to the ungated replay —
        forward radiance, segment count, and gradients."""
        (scene, ids, o, d, t, pix, smp, bg, depth, seed,
         act0) = _setup(name, depth=6)
        from raytracing_tpu.ops.megakernel import (
            build_mega_scene, trace_megakernel,
        )
        mega = build_mega_scene(scene)
        mrad, mseg, ids2, cnt = trace_megakernel(
            mega, o, d, t, pix, smp, bg, depth, jnp.uint32(seed),
            interpret=True, active0=act0, want_ids=True, want_counts=True,
            layout="block")
        # counts: exact per-ray liveness — sums to segments, zero on
        # dead-start padding lanes
        assert int(cnt.sum()) == int(mseg)
        n_live = int(np.asarray(act0).sum())
        assert int(cnt[n_live:].sum()) == 0

        r0, s0 = replay_trace_kernel(scene, ids2, o, d, t, pix, smp, bg,
                                     depth, jnp.uint32(seed), active0=act0)
        r1, s1 = replay_trace_kernel(scene, ids2, o, d, t, pix, smp, bg,
                                     depth, jnp.uint32(seed), active0=act0,
                                     lengths=cnt)
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r0))
        assert int(s1) == int(s0)

        def loss(kw, center, rgb):
            s = scene.replace(
                spheres=scene.spheres.replace(center=center),
                textures=scene.textures.replace(rgb=rgb))
            out, _ = replay_trace_kernel(
                s, ids2, o, d, t, pix, smp, bg, depth, jnp.uint32(seed),
                active0=act0, **kw)
            return jnp.sum(out * out)

        args = (scene.spheres.center, scene.textures.rgb)
        g0 = jax.grad(lambda *a: loss({}, *a), argnums=(0, 1))(*args)
        g1 = jax.grad(lambda *a: loss(dict(lengths=cnt), *a),
                      argnums=(0, 1))(*args)
        for a, b in zip(g0, g1):
            np.testing.assert_array_equal(np.asarray(b), np.asarray(a))

        # radiance_in: forward kernel skipped — returns the given
        # radiance and the decision pass's segment count; with a LINEAR
        # loss (rad_bar independent of the forward value) the gradients
        # are bit-identical to the gated replay's.
        r2, s2 = replay_trace_kernel(scene, ids2, o, d, t, pix, smp, bg,
                                     depth, jnp.uint32(seed), active0=act0,
                                     lengths=cnt, radiance_in=mrad)
        np.testing.assert_array_equal(np.asarray(r2), np.asarray(mrad))
        assert int(s2) == int(mseg)

        def lin_loss(kw, center):
            s = scene.replace(spheres=scene.spheres.replace(center=center))
            out, _ = replay_trace_kernel(
                s, ids2, o, d, t, pix, smp, bg, depth, jnp.uint32(seed),
                active0=act0, **kw)
            return jnp.sum(out)

        gl1 = jax.grad(lambda c: lin_loss(dict(lengths=cnt), c))(
            scene.spheres.center)
        gl2 = jax.grad(lambda c: lin_loss(
            dict(lengths=cnt, radiance_in=mrad), c))(scene.spheres.center)
        np.testing.assert_array_equal(np.asarray(gl2), np.asarray(gl1))

    def test_material_param_grads(self):
        """fuzz (metal) and ior (dielectric) gradients through the
        kernel's hand-written normalize/reflect/refract VJPs."""
        (scene, ids, o, d, t, pix, smp, bg, depth, seed,
         act0) = _setup("three_spheres", depth=6)

        def loss(fn, fuzz, ior):
            s = scene.replace(
                materials=scene.materials.replace(fuzz=fuzz, ior=ior))
            out, _ = fn(s, ids, o, d, t, pix, smp, bg, depth,
                        jnp.uint32(seed), active0=act0)
            return jnp.sum(out * out)

        args = (scene.materials.fuzz, scene.materials.ior)
        g_ref = jax.grad(lambda *a: loss(replay_trace, *a),
                         argnums=(0, 1))(*args)
        g_k = jax.grad(lambda *a: loss(replay_trace_kernel, *a),
                       argnums=(0, 1))(*args)
        for gr, gk in zip(g_ref, g_k):
            np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                                       rtol=3e-5, atol=3e-6)

    @pytest.mark.parametrize("name", ["bouncing_spheres", "cornell_box"])
    def test_replay_grads_sorted(self, name):
        """The explicit-cotangent sorted gradient pass (bench.py's round-3
        fwd+bwd path) must match the custom_vjp kernel path: same scene
        grads for an arbitrary radiance cotangent, with and without a
        prefix plan (the plan slices away only all-zero rows — ulp-level
        reduction-tree differences only), and ok=False on a violated plan."""
        from raytracing_tpu.diff.replay_fast import build_replay_table
        from raytracing_tpu.diff.replay_kernel import (
            plan_prefixes, replay_grads_sorted,
        )
        from raytracing_tpu.ops.megakernel import (
            build_mega_scene, trace_megakernel,
        )

        (scene, _, o, d, t, pix, smp, bg, depth, seed,
         act0) = _setup(name, depth=6)
        mega = build_mega_scene(scene)
        _, mseg, ids2, cnt = trace_megakernel(
            mega, o, d, t, pix, smp, bg, depth, jnp.uint32(seed),
            interpret=True, active0=act0, want_ids=True, want_counts=True,
            layout="block")
        B = o.shape[0]
        rng = np.random.default_rng(3)
        rad_bar = jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32))

        def f(center, rgb):
            s = scene.replace(
                spheres=scene.spheres.replace(center=center),
                textures=scene.textures.replace(rgb=rgb))
            out, _ = replay_trace_kernel(
                s, ids2, o, d, t, pix, smp, bg, depth, jnp.uint32(seed),
                active0=act0, lengths=cnt)
            return out

        args = (scene.spheres.center, scene.textures.rgb)
        _, vjp = jax.vjp(f, *args)
        gc_ref, gr_ref = vjp(rad_bar)

        def new_path(prefixes, ray_regen=None):
            table, tab_vjp = jax.vjp(
                lambda c, r: build_replay_table(scene.replace(
                    spheres=scene.spheres.replace(center=c),
                    textures=scene.textures.replace(rgb=r))), *args)
            tbar, ok = replay_grads_sorted(
                scene, table, ids2, o, d, t, pix, smp, bg, depth,
                jnp.uint32(seed), rad_bar, cnt, prefixes=prefixes,
                ray_regen=ray_regen)
            return tab_vjp(tbar), ok

        (gc, gr), ok = new_path(None)
        assert bool(ok)
        np.testing.assert_allclose(np.asarray(gc), np.asarray(gc_ref),
                                   rtol=3e-5, atol=3e-6)
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gr_ref),
                                   rtol=3e-5, atol=3e-6)

        hist = np.bincount(np.asarray(cnt), minlength=depth + 1)
        prefixes = plan_prefixes(hist, B, depth, margin=1.0)
        # the plan slices away only all-zero gradient rows, so the sums
        # agree to the reduction-tree reassociation of the resized matmul
        # (~1 ulp; exact zeros cannot change the value beyond that)
        (gc_p, gr_p), ok_p = new_path(prefixes)
        assert bool(ok_p)
        np.testing.assert_allclose(np.asarray(gc_p), np.asarray(gc),
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(gr_p), np.asarray(gr),
                                   rtol=1e-5, atol=1e-7)

        # a violated plan must be flagged (bounce 0 touches every live
        # ray; 0 rows cannot cover them)
        bad = (0,) + prefixes[1:]
        _, ok_bad = new_path(bad)
        assert not bool(ok_bad)

        # ray_regen (slim sort: only key + rad_bar + packed ids move;
        # rays recomputed from the sorted key) must be bit-identical —
        # an exact regen here is a gather from the original arrays
        def regen(orig):
            return o[orig], d[orig], t[orig], pix[orig], smp[orig]

        (gc_rg, gr_rg), ok_rg = new_path(prefixes, ray_regen=regen)
        assert bool(ok_rg)
        np.testing.assert_array_equal(np.asarray(gc_rg), np.asarray(gc_p))
        np.testing.assert_array_equal(np.asarray(gr_rg), np.asarray(gr_p))

    @pytest.mark.parametrize("name", ["bouncing_spheres", "cornell_box"])
    def test_replay_grads_sorted_compacted(self, name):
        """want_ids="compacted" (the round-5 sort diet: later-phase id
        words stay in compacted order and meet the replay's length sort
        directly, skipping the camera-order unpermute) must be
        BIT-identical to the unified camera-order ids path — the two
        sorts run over the same unique key set, so every sorted column
        and every one-hot dot is the same."""
        from raytracing_tpu.diff.replay_fast import build_replay_table
        from raytracing_tpu.diff.replay_kernel import replay_grads_sorted
        from raytracing_tpu.ops.megakernel import (
            build_mega_scene, trace_megakernel,
        )

        (scene, _, o, d, t, pix, smp, bg, depth, seed,
         act0) = _setup(name, depth=6)
        mega = build_mega_scene(scene)
        phases = [2, 2, 2]
        common = dict(background=bg, max_depth=depth,
                      seed=jnp.uint32(seed), interpret=True, active0=act0,
                      want_counts=True, layout="block",
                      phase_depths=phases)
        rad_u, _, ids_u, cnt_u = trace_megakernel(
            mega, o, d, t, pix, smp, want_ids=True, **common)
        rad_c, _, ids0, later, perm, cnt_cam, cnt_c = trace_megakernel(
            mega, o, d, t, pix, smp, want_ids="compacted", **common)
        # radiance + camera-order counts are unaffected by the id routing
        np.testing.assert_array_equal(np.asarray(rad_c), np.asarray(rad_u))
        np.testing.assert_array_equal(np.asarray(cnt_cam),
                                      np.asarray(cnt_u))
        # compacted-order counts are the camera counts under perm
        np.testing.assert_array_equal(
            np.asarray(cnt_c), np.asarray(cnt_u)[np.asarray(perm)])

        B = o.shape[0]
        rng = np.random.default_rng(3)
        rad_bar = jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32))
        table = build_replay_table(scene)

        def regen(orig):
            return o[orig], d[orig], t[orig], pix[orig], smp[orig]

        tbar_ref, ok_ref = replay_grads_sorted(
            scene, table, ids_u, o, d, t, pix, smp, bg, depth,
            jnp.uint32(seed), rad_bar, cnt_u, ray_regen=regen)
        bundle = dict(ids0=ids0, later=later, perm=perm, counts_c=cnt_c,
                      phase_depths=tuple(phases),
                      pack=mega.n_prims <= 1023)
        tbar_new, ok_new = replay_grads_sorted(
            scene, table, None, o, d, t, pix, smp, bg, depth,
            jnp.uint32(seed), rad_bar, cnt_u, ray_regen=regen,
            compacted=bundle)
        assert bool(ok_ref) and bool(ok_new)
        np.testing.assert_array_equal(np.asarray(tbar_new),
                                      np.asarray(tbar_ref))
