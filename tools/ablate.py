"""Per-stage megakernel ablation on the real chip.

Times trace_megakernel on one launch-sized batch with kernel stages
ablated (the make_megakernel_block ``ablate`` hooks), splitting device
time into sweep / shade / resolve / rng. The fence is a scalar
``radiance.sum()`` materialization — forces full execution, transfers
4 bytes (render/renderer.py documents why block_until_ready alone
cannot be trusted on this platform).

    python tools/ablate.py --batch 131072 --depth 20
"""
from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="bouncing_spheres")
    ap.add_argument("--batch", type=int, default=131072)
    ap.add_argument("--depth", type=int, default=20)
    ap.add_argument("--spp-chunk", type=int, default=2)
    ap.add_argument("--phases", default="[2,3,15]")
    ap.add_argument("--ablate", default=None,
                    help='JSON list of ablate tuples, e.g. \'[[],["sweep"]]\'')
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import numpy as np
    import jax.numpy as jnp

    from raytracing_tpu.models.scenes import build
    from raytracing_tpu.ops.megakernel import build_mega_scene
    from raytracing_tpu.ops.megakernel_block import make_megakernel_block
    from raytracing_tpu.render import camera as cam_mod
    from raytracing_tpu.render.camera import CameraParams

    scene, cfg = build(args.scene, image_width=400, samples_per_pixel=100,
                       max_depth=args.depth)
    mega = build_mega_scene(scene)
    B = args.batch
    n_pix = B // args.spp_chunk
    pix = jnp.tile(jnp.arange(n_pix, dtype=jnp.int32) % cfg.n_pixels,
                   args.spp_chunk)
    smp = jnp.repeat(jnp.arange(args.spp_chunk, dtype=jnp.int32), n_pix)
    params = CameraParams.from_config(cfg)
    derived = cam_mod.derive(cfg, params)
    o, d, t = cam_mod.generate_rays(cfg, derived, pix, smp, jnp.uint32(7),
                                    motion_blur=scene.flags.has_moving)
    phases = json.loads(args.phases)
    variants = (json.loads(args.ablate) if args.ablate
                else [[], ["sweep"], ["shade"], ["rng"], ["resolve"],
                      ["sweep", "shade", "rng", "resolve"]])

    from raytracing_tpu.ops import megakernel as mk

    def run_variant(ablate):
        ab = tuple(ablate)

        # phase-wise manual drive mirroring trace_megakernel's block path,
        # but with the ablate hooks plumbed through
        def go():
            rows = B // 128
            st = dict(
                ox=o[:, 0].reshape(rows, 128), oy=o[:, 1].reshape(rows, 128),
                oz=o[:, 2].reshape(rows, 128), dx=d[:, 0].reshape(rows, 128),
                dy=d[:, 1].reshape(rows, 128), dz=d[:, 2].reshape(rows, 128),
                tm=t.reshape(rows, 128),
                pixr=pix.reshape(rows, 128), smpr=smp.reshape(rows, 128),
            )
            f32 = jnp.float32
            ones = jnp.ones((rows, 128), f32)
            zeros = jnp.zeros((rows, 128), f32)
            tr, tg, tb = ones, ones, ones
            rr, rg, rb = zeros, zeros, zeros
            act = ones
            total = jnp.zeros((), jnp.int32)
            off = 0
            for i_ph, pd in enumerate(phases):
                runp = make_megakernel_block(
                    mega, max_depth=pd, background=cfg.background,
                    want_state=(i_ph < len(phases) - 1), ablate=ab)
                so = jnp.asarray([7, off], jnp.uint32)
                out = runp(mega.sph_sweep, mega.quad_sweep, mega.tabt_rep,
                           mega.noise_rep, mega.atlas_rep,
                           st["ox"], st["oy"], st["oz"], st["dx"],
                           st["dy"], st["dz"], st["tm"], st["pixr"],
                           st["smpr"], tr, tg, tb, rr, rg, rb, act, so)
                if i_ph == len(phases) - 1:
                    rr, rg, rb, bc = out
                    total = total + jnp.sum(bc)
                else:
                    (rr, rg, rb, bc, st["ox"], st["oy"], st["oz"],
                     st["dx"], st["dy"], st["dz"], tr, tg, tb, act) = out
                    total = total + jnp.sum(bc)
                off += pd
            return rr.sum() + rg.sum() + rb.sum(), total

        fn = jax.jit(go)
        val, segs = fn()
        float(val)  # compile + fence
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            val, segs = fn()
            float(val)
            times.append(time.perf_counter() - t0)
        return dict(seconds=[round(x, 4) for x in times],
                    best=round(min(times), 4), segments=int(segs))

    for ab in variants:
        try:
            out = run_variant(ab)
            print("ABL", json.dumps(ab), "->", json.dumps(out), flush=True)
        except Exception as e:
            print("ABL", json.dumps(ab), "-> FAILED:", repr(e), flush=True)


if __name__ == "__main__":
    main()
