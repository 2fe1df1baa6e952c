"""Top-level render driver: batches (pixel-block × sample-chunk) launches of
the jitted wavefront integrator and accumulates radiance.

This is the TPU replacement for the reference's triple render loop
(src/core/camera.hpp:40-67): the pixel and sample loops become one megabatch
ray dimension per launch; the bounce recursion is the integrator's scan.
Chunking bounds device memory for arbitrarily large (W·H·spp) workloads and
gives natural checkpoint/resume boundaries (SURVEY.md §5 checkpoint/resume).
"""
from __future__ import annotations

import time as _time
from dataclasses import dataclass
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.color import to_u8_image
from ..ops.intersect import closest_hit_brute
from ..scene.types import Scene
from . import camera as cam_mod
from .camera import CameraConfig, CameraParams
from .integrator import trace


@dataclass
class RenderResult:
    radiance: Optional[np.ndarray]  # (H, W, 3) f32 mean radiance
                                    # (None when transfer="u8")
    segments: int         # total ray-scene queries traced
    seconds: float        # wall-clock render time (excludes compile)
    launches: int
    u8: Optional[np.ndarray] = None  # (H, W, 3) u8 (device-quantized)
    ok: Optional[bool] = None  # phase-prefix validity (None: no prefixes);
                               # False = a prefix was exceeded, rerun
                               # without prefixes or replan

    @property
    def image_u8(self) -> np.ndarray:
        if self.u8 is not None:
            return self.u8
        return np.asarray(to_u8_image(jnp.asarray(self.radiance)))


def _pick_hit_fn(scene: Scene, method: str) -> Callable:
    if method == "brute":
        return closest_hit_brute
    if method == "bvh" or (method == "auto" and scene.bvh is not None and scene.n_primitives > 64):
        if scene.bvh is None:
            raise ValueError("scene was compiled without a BVH")
        from ..ops.traverse import closest_hit_bvh

        return closest_hit_bvh
    return closest_hit_brute


def _render_chunk(
    scene: Scene,
    params: CameraParams,
    pixel_start: jnp.ndarray,   # () i32 — first pixel of the block
    sample_start: jnp.ndarray,  # () i32 — first sample of the chunk
    seed: jnp.ndarray,          # () u32
    *,
    cfg: CameraConfig,
    n_block: int,
    spp_chunk: int,
    hit_fn: Callable,
    mode: str,
    remat: bool,
    mega=None,                  # MegaScene → use the Pallas megakernel
    phase_depths=None,          # megakernel phase schedule override
    sort_mode: str = "alive",   # megakernel inter-phase compaction mode
    use_clusters=None,          # megakernel sphere-sweep AABB culling
    ray_order: str = "sample",  # lane layout: "sample" | "pixel" (see below)
    sort_regions: int = 1,      # regional compaction sorts (megakernel)
    phase_prefixes=None,        # megakernel static live-prefix tail phases
    want_counts: bool = False,  # also return per-ray bounce counts (mega
                                # path only) — the prefix-planning hook
):
    """One launch: n_block contiguous pixels × spp_chunk samples.
    Returns (block radiance *sum* over the chunk's samples (n_block, 3),
    segments traced ()).

    ``ray_order`` fixes how (pixel, sample) pairs map to ray lanes:
    "sample" = sample-major (all pixels for sample s, then s+1 — a
    1024-ray megakernel tile spans 1024 *pixels*, i.e. several full image
    rows); "pixel" = pixel-major (spp_chunk consecutive samples of each
    pixel are adjacent — a tile spans only 1024/spp_chunk pixels, giving
    the tile a far tighter ray cone for the scalar frustum cull). The
    per-ray RNG streams are keyed on (pixel, sample) values, not lanes,
    so every path traces identically either way (equal segment counts);
    the image matches to ~1 ulp (the per-pixel sample sum reduces along
    a different axis)."""
    derived = cam_mod.derive(cfg, params)
    pix_raw = pixel_start + jnp.arange(n_block, dtype=jnp.int32)
    pix = jnp.minimum(pix_raw, cfg.n_pixels - 1)      # clamp tail padding
    srange = jnp.arange(spp_chunk, dtype=jnp.int32)
    if ray_order == "pixel":
        pixel_ids = jnp.repeat(pix, spp_chunk)        # (B,)
        sample_ids = sample_start + jnp.tile(srange, n_block)
        pix_ok = jnp.repeat(pix_raw < cfg.n_pixels, spp_chunk)
    else:
        pixel_ids = jnp.tile(pix, spp_chunk)          # (B,)
        sample_ids = sample_start + jnp.repeat(srange, n_block)
        pix_ok = jnp.tile(pix_raw < cfg.n_pixels, spp_chunk)
    o, d, t = cam_mod.generate_rays(
        cfg, derived, pixel_ids, sample_ids, seed, motion_blur=scene.flags.has_moving
    )
    # Padded rays — tail samples (sample >= spp) AND the last block's
    # clamped duplicate pixels — start dead: they neither trace (no wasted
    # bounces) nor count toward the segments metric.
    valid0 = (sample_ids < cfg.samples_per_pixel) & pix_ok
    if mega is not None:
        from ..ops.megakernel import trace_megakernel

        # Shrinking phase budgets with alive-first compaction between them:
        # straggler bounces then run at full lane occupancy. With the
        # fused-sort compaction (one multi-operand lax.sort per boundary,
        # ~0.2 ms) this measured 5.2 ms vs 17.7 ms single-phase device
        # time on the final-scene 131072-ray depth-20 workload (v5e).
        phases = phase_depths
        if phases is None and cfg.max_depth > 6:
            phases = [2, 3, cfg.max_depth - 5]

        # tm/pix/smp are pure functions of the original ray index: rebuild
        # them after each compaction instead of sorting three more state
        # columns (bit-identical to the generate_rays stream — same
        # (pixel, sample, seed) RNG keys)
        from ..ops.megakernel import make_regen

        regen = make_regen(cfg.n_pixels, n_block, spp_chunk, pixel_start,
                           sample_start, seed, scene.flags.has_moving,
                           ray_order)

        if want_counts:
            # planning hook: per-ray exact bounce counts for this launch
            # (same ray stream as the real render) — callers derive the
            # per-phase live prefixes from them (bench.py forward plan)
            assert phase_prefixes is None
            _, _, cnt = trace_megakernel(
                mega, o, d, t, pixel_ids, sample_ids, cfg.background,
                cfg.max_depth, seed, phase_depths=phases, active0=valid0,
                sort_mode=sort_mode, use_clusters=use_clusters,
                regen=regen, sort_regions=sort_regions, want_counts=True,
            )
            return cnt
        if phase_prefixes is not None:
            # static live-prefix tail phases (ops/megakernel.py): exact
            # iff every prefix covers its phase's live set — the ok flag
            # is threaded to RenderResult.ok and MUST be checked
            radiance, segments, ok = trace_megakernel(
                mega, o, d, t, pixel_ids, sample_ids, cfg.background,
                cfg.max_depth, seed, phase_depths=phases, active0=valid0,
                sort_mode=sort_mode, use_clusters=use_clusters,
                regen=regen, sort_regions=sort_regions,
                phase_prefixes=phase_prefixes,
            )
            valid = (sample_ids < cfg.samples_per_pixel)[:, None]
            radiance = jnp.where(valid, radiance, 0.0)
            if ray_order == "pixel":
                rad = radiance.reshape(n_block, spp_chunk, 3).sum(axis=1)
            else:
                rad = radiance.reshape(spp_chunk, n_block, 3).sum(axis=0)
            return rad, segments, ok
        radiance, segments = trace_megakernel(
            mega, o, d, t, pixel_ids, sample_ids, cfg.background,
            cfg.max_depth, seed, phase_depths=phases, active0=valid0,
            sort_mode=sort_mode, use_clusters=use_clusters, regen=regen,
            sort_regions=sort_regions,
        )
    else:
        assert phase_prefixes is None, \
            "phase_prefixes requires the megakernel path"
        radiance, segments = trace(
            scene,
            o,
            d,
            t,
            pixel_ids,
            sample_ids,
            jnp.asarray(cfg.background, jnp.float32),
            cfg.max_depth,
            seed,
            hit_fn=hit_fn,
            mode=mode,
            remat=remat,
            active0=valid0,
        )
    # Mask samples past spp (tail of the last sample chunk).
    valid = (sample_ids < cfg.samples_per_pixel)[:, None]
    radiance = jnp.where(valid, radiance, 0.0)
    if ray_order == "pixel":
        return radiance.reshape(n_block, spp_chunk, 3).sum(axis=1), segments
    return radiance.reshape(spp_chunk, n_block, 3).sum(axis=0), segments


class Renderer:
    """Caches the compiled chunk function across calls for a given
    (scene structure, camera config, batching plan)."""

    def __init__(
        self,
        cfg: CameraConfig,
        *,
        hit_method: str = "auto",
        mode: str = "scan",
        remat: bool = False,
        # 2^18 measured best on the TPU bench workload across rounds 2-5
        # (2^19/2^20 run 5-10% slower and large programs stress the remote
        # compiler); small workloads are unaffected (they fit one launch)
        max_rays_per_launch: int = 1 << 18,
        fused: bool = True,
        phase_depths=None,
        sort_mode: str = "alive",
        use_clusters=None,
        ray_order: str = "sample",
        spp_chunk: int | None = None,
        sort_regions: int = 1,
        schedule: str = "phased",   # "phased" | "pool" (render/pool.py)
        pool_size: int = 1 << 18,
        k_bounces: int = 2,
        pool_fold: str = "sort",
        transfer: str = "f32",      # "f32" | "u8" (fused mode only)
        phase_prefixes=None,        # static live-prefix tail phases — see
                                    # trace_megakernel; exactness is
                                    # checked via RenderResult.ok
        strict_prefixes: bool = True,  # raise when a phase prefix was
                                       # exceeded (ok=False) instead of
                                       # returning a silently-inexact
                                       # image; pass False to handle
                                       # RenderResult.ok manually (e.g.
                                       # benchmarking prefix plans)
    ):
        self.strict_prefixes = strict_prefixes
        self.phase_prefixes = (tuple(phase_prefixes)
                               if phase_prefixes is not None else None)
        self.cfg = cfg
        # "u8": quantize the final image on device and transfer only the
        # (H, W, 3) u8 bytes — the tunneled device→host link runs at
        # ~25-50 MB/s, so the f32 radiance transfer alone costs ~20-40 ms
        # on the benchmark workload (~5-8% of the render); production
        # serving wants the u8 image anyway. RenderResult.radiance is
        # None in this mode (use .image_u8). Fused mode only.
        assert transfer in ("f32", "u8")
        self.transfer = transfer
        self.schedule = schedule
        self.pool_size = pool_size
        self.k_bounces = k_bounces
        self.pool_fold = pool_fold
        self._pool_exe = None
        self._pool_scene = None
        self.hit_method = hit_method
        self.mode = mode
        self.remat = remat
        self.phase_depths = phase_depths
        self.sort_mode = sort_mode
        self.use_clusters = use_clusters
        self.ray_order = ray_order
        self.sort_regions = sort_regions
        # whole-render single-dispatch mode (see render()); falls back to
        # the per-chunk loop when progress/checkpointing needs host control
        self.fused = fused
        n_pix = cfg.n_pixels
        if spp_chunk is not None:
            # explicit samples-per-launch (pixel-major tiles want
            # spp_chunk ≥ 8 so a 1024-ray tile spans few pixels): derive
            # the pixel-block size from the launch cap, then shrink it to
            # the smallest 1024-multiple that still covers the image in
            # the same number of blocks (minimizes dead pixel padding)
            self.spp_chunk = max(1, min(cfg.samples_per_pixel, spp_chunk))
            cap = max(1024, max_rays_per_launch // self.spp_chunk)
            n_block = min(-(-n_pix // 1024) * 1024, cap // 1024 * 1024)
            blocks = -(-n_pix // n_block)
            per_block = -(-n_pix // blocks)
            self.n_block = -(-per_block // 1024) * 1024
        else:
            if n_pix <= max_rays_per_launch:
                self.n_block = n_pix
            else:
                self.n_block = max_rays_per_launch
            # megakernel launches want 1024-ray multiples; the padding
            # (dead out-of-range pixels, rows discarded on readback) is
            # harmless for the other hit methods too, so apply it
            # unconditionally — "auto" may resolve to the megakernel at
            # compile time. Round *before* deriving spp_chunk so
            # rays-per-launch never exceeds the cap.
            self.n_block = -(-self.n_block // 1024) * 1024
            self.spp_chunk = max(
                1,
                min(cfg.samples_per_pixel, max_rays_per_launch // self.n_block),
            )
        self._compiled = None
        self._compiled_scene = None
        self._chunk_fn = None
        self._fused = None
        self._fused_key = None
        self._fused_exe = None

    def _get_compiled(self, scene: Scene):
        # The megakernel path bakes the flattened scene tables into the
        # compiled fn, so the cache is keyed on scene identity: rendering a
        # different scene rebuilds (the XLA path would be correct either way
        # since it takes the scene as a traced argument).
        if self._compiled is not None and scene is not self._compiled_scene:
            self._compiled = None
        if self._compiled is None:
            self._compiled_scene = scene
            mega = None
            hit_fn = closest_hit_brute
            method = self.hit_method
            if method == "auto" and jax.default_backend() != "cpu":
                # On TPU the Pallas megakernel is both the fastest forward
                # path and the only one immune to the remote compiler's
                # multi-minute hangs at large batch sizes; prefer it when
                # the scene's textures are expressible.
                from ..ops.megakernel import build_mega_scene

                candidate = build_mega_scene(scene)
                if candidate.supported:
                    mega = candidate
                    method = "mega"
            if method == "mega" and mega is None:
                from ..ops.megakernel import build_mega_scene

                mega = build_mega_scene(scene)
                if not mega.supported:
                    raise ValueError(
                        "scene exceeds the megakernel's texture budget "
                        "(image atlas larger than MAX_PACKED_TEXELS, a "
                        "non-u8-representable float atlas above "
                        "MAX_KERNEL_TEXELS, or bilinear filtering "
                        "requested); use hit_method='brute'/'bvh'"
                    )
            if mega is None:
                hit_fn = _pick_hit_fn(scene, method)
            self._chunk_kwargs = dict(
                cfg=self.cfg,
                n_block=self.n_block,
                spp_chunk=self.spp_chunk,
                hit_fn=hit_fn,
                mode=self.mode,
                remat=self.remat,
                mega=mega,
                phase_depths=self.phase_depths,
                sort_mode=self.sort_mode,
                use_clusters=self.use_clusters,
                ray_order=self.ray_order,
                sort_regions=self.sort_regions,
            )
            fn = partial(_render_chunk, **self._chunk_kwargs,
                         phase_prefixes=self.phase_prefixes)
            self._chunk_fn = fn
            self._compiled = jax.jit(fn)
        return self._compiled

    def plan_phase_prefixes(self, scene: Scene, seed: int = 0,
                            margin_blocks: int = 1):
        """Untimed planning pass: run the exact per-launch ray streams
        through a counts-only trace and return the per-PHASE live-prefix
        tuple for ``Renderer(..., phase_prefixes=...)`` on the SAME
        (scene, cfg, batching, seed). One jitted fori_loop over every
        launch; exact by construction (the timed render replays the same
        streams), with ``margin_blocks`` extra 1024-ray blocks of slack.
        Requires the megakernel path."""
        self._get_compiled(scene)
        mega = self._chunk_kwargs.get("mega")
        if mega is None:
            raise ValueError("prefix planning needs the megakernel path")
        cfg = self.cfg
        phases = self.phase_depths
        if phases is None and cfg.max_depth > 6:
            phases = [2, 3, cfg.max_depth - 5]
        if phases is None or len(phases) < 2:
            return None
        kw = dict(self._chunk_kwargs)
        kw["want_counts"] = True
        cfn = partial(_render_chunk, **kw)
        n_blocks = -(-cfg.n_pixels // self.n_block)
        n_schunks = -(-cfg.samples_per_pixel // self.spp_chunk)
        d = cfg.max_depth

        def sweep(scene, params, seed_arr):
            def body(i, nb_max):
                b = i % n_blocks
                s = i // n_blocks
                cnt = cfn(scene, params, b * self.n_block,
                          s * self.spp_chunk, seed_arr)
                hist = jnp.bincount(jnp.clip(cnt, 0, d), length=d + 1)
                return jnp.maximum(nb_max, jnp.cumsum(hist[::-1])[::-1])

            return jax.lax.fori_loop(
                0, n_blocks * n_schunks, body,
                jnp.zeros((d + 1,), jnp.int32))

        params = CameraParams.from_config(cfg)
        nb_max = np.asarray(jax.jit(sweep)(scene, params, jnp.uint32(seed)))
        B = self.n_block * self.spp_chunk
        starts = [0]
        for pdep in phases[:-1]:
            starts.append(starts[-1] + pdep)
        step = 1024
        out = [None]
        for s in starts[1:]:
            live = int(nb_max[min(s + 1, d)])
            out.append(max(step, min(
                B, (-(-live // step) + margin_blocks) * step)))
        return tuple(out)

    def _get_fused(self, scene: Scene, n_blocks: int, start_schunk: int,
                   total: int):
        """Whole-render fn: fori_loop over all (sample-chunk, block) chunks
        in one jit — one host dispatch for the full image (the per-chunk
        loop pays ~1.8 ms tunnel latency per call on this setup)."""
        self._get_compiled(scene)  # (re)build self._chunk_fn for this scene
        key = (n_blocks, start_schunk, total, self._compiled_scene)
        if self._fused is not None and self._fused_key == key:
            return self._fused
        self._fused_exe = None
        chunk_fn = self._chunk_fn
        n_block, spp_chunk = self.n_block, self.spp_chunk

        cfg = self.cfg
        transfer_u8 = self.transfer == "u8"

        with_ok = self.phase_prefixes is not None

        def render_all(scene, params, accum0, seed):
            def body(i, carry):
                if with_ok:
                    accum, segs, okc = carry
                else:
                    accum, segs = carry
                c = i + start_schunk * n_blocks
                s = c // n_blocks
                b = c % n_blocks
                out = chunk_fn(
                    scene, params, b * n_block, s * spp_chunk, seed)
                rad, seg = out[0], out[1]
                old = jax.lax.dynamic_slice(
                    accum, (b * n_block, 0), (n_block, 3))
                accum = jax.lax.dynamic_update_slice(
                    accum, old + rad, (b * n_block, 0))
                if with_ok:
                    return accum, segs.at[i].set(seg), okc & out[2]
                return accum, segs.at[i].set(seg)

            init = (accum0, jnp.zeros((total,), jnp.int32))
            if with_ok:
                init = init + (jnp.bool_(True),)
            out = jax.lax.fori_loop(0, total, body, init)
            accum, segs = out[0], out[1]
            tail = (out[2],) if with_ok else ()
            if transfer_u8:
                mean = accum[: cfg.n_pixels] / cfg.samples_per_pixel
                img = to_u8_image(mean.reshape(
                    cfg.image_height, cfg.image_width, 3))
                # one D2H transfer: append the per-launch segment counts
                # (i32, bitcast to bytes) to the image bytes — a second
                # np.asarray round-trip on the tunneled link costs
                # multiple ms of pure latency
                seg_bytes = jax.lax.bitcast_convert_type(
                    segs, jnp.uint8).reshape(-1)
                blob = jnp.concatenate([img.reshape(-1), seg_bytes])
                return (accum, blob) + tail
            return (accum, segs) + tail

        self._fused = jax.jit(render_all)
        self._fused_key = key
        return self._fused

    def _render_pool(self, scene: Scene, params: CameraParams,
                     seed: int) -> RenderResult:
        """Regenerating-pool schedule (render/pool.py): the whole render
        is one persistent wavefront at ~full occupancy, outer-chunked
        over sample windows only when the (pixel, sample) stream exceeds
        the pool's 24-bit gid space."""
        from ..ops.megakernel import build_mega_scene
        from . import pool as pool_mod

        cfg = self.cfg
        if self._pool_exe is None or self._pool_scene is not scene:
            mega = build_mega_scene(scene)
            if not mega.supported:
                raise ValueError("scene exceeds the megakernel texture "
                                 "budget; the pool schedule needs the "
                                 "Pallas fast path")
            spp_w = min(cfg.samples_per_pixel,
                        max(1, (pool_mod.MAX_POOL_STREAM - 1) // cfg.n_pixels))
            interpret = jax.default_backend() == "cpu"
            mb = scene.flags.has_moving

            def run_window(params, seed_arr, sample_start, n_samples):
                return pool_mod.trace_pool(
                    mega, cfg, params, seed_arr,
                    pool_size=min(self.pool_size,
                                  -(-cfg.n_pixels * n_samples // 1024) * 1024),
                    k_bounces=self.k_bounces, interpret=interpret,
                    fold=self.pool_fold, sample_start=sample_start,
                    n_samples=n_samples, motion_blur=mb)

            spp = cfg.samples_per_pixel
            windows = [(s, min(spp_w, spp - s)) for s in range(0, spp, spp_w)]
            # single-window u8 mode: quantize on device and transfer only
            # the (H, W, 3) u8 bytes — same rationale as the fused path's
            # transfer="u8" (the f32 radiance is ~12 bytes/pixel over a
            # ~25-50 MB/s tunnel). Multi-window renders accumulate f32 on
            # host, so they keep the f32 transfer.
            u8_mode = self.transfer == "u8" and len(windows) == 1

            def run_u8(params, seed_arr, sample_start, n_samples):
                rad_sum, seg = run_window(params, seed_arr, sample_start,
                                          n_samples=n_samples)
                mean = rad_sum / cfg.samples_per_pixel
                return to_u8_image(mean.reshape(
                    cfg.image_height, cfg.image_width, 3)), seg

            exes = {}
            for _, n in windows:
                if n not in exes:
                    fn = partial(run_u8 if u8_mode else run_window,
                                 n_samples=n)
                    exes[n] = jax.jit(fn).lower(
                        params, jnp.uint32(seed), jnp.int32(0)).compile()
            self._pool_exe = (windows, exes, u8_mode)
            self._pool_scene = scene
        windows, exes, u8_mode = self._pool_exe
        t0 = _time.perf_counter()
        acc = None
        seg = 0
        for s, n in windows:
            rad, (lo, hi) = exes[n](params, jnp.uint32(seed), jnp.int32(s))
            rad_h = np.asarray(rad)  # honest fence (see fused branch)
            seg += int(np.uint32(hi)) * (1 << 32) + int(np.uint32(lo))
            acc = rad_h if acc is None else acc + rad_h
        seconds = _time.perf_counter() - t0
        if u8_mode:
            return RenderResult(
                radiance=None, segments=seg, seconds=seconds,
                launches=len(windows), u8=acc)
        mean = acc / cfg.samples_per_pixel
        return RenderResult(
            radiance=mean.reshape(cfg.image_height, cfg.image_width, 3),
            segments=seg,
            seconds=seconds,
            launches=len(windows),
        )

    def _checked(self, result: RenderResult) -> RenderResult:
        """Enforce the phase-prefix exactness contract: an undersized
        prefix (ok=False) means some live rays were dropped mid-path —
        the image is silently wrong unless the caller opted into manual
        handling with ``strict_prefixes=False``."""
        if self.strict_prefixes and result.ok is False:
            raise RuntimeError(
                "phase_prefixes exceeded: a tail phase's static live "
                "prefix was smaller than its live ray set, so the render "
                "dropped paths (RenderResult.ok=False). Re-plan with "
                "larger prefixes, or pass strict_prefixes=False to "
                "inspect the flagged result.")
        return result

    def render(
        self,
        scene: Scene,
        params: Optional[CameraParams] = None,
        seed: int = 0,
        progress: bool = False,
        resume_state: Optional[dict] = None,
        checkpoint_cb: Optional[Callable[[dict], None]] = None,
    ) -> RenderResult:
        cfg = self.cfg
        if params is None:
            params = CameraParams.from_config(cfg)
        if self.schedule == "pool":
            return self._render_pool(scene, params, seed)
        fn = self._get_compiled(scene)
        seed_arr = jnp.uint32(seed)

        n_pix = cfg.n_pixels
        n_blocks = -(-n_pix // self.n_block)
        n_schunks = -(-cfg.samples_per_pixel // self.spp_chunk)

        accum = jnp.zeros((n_blocks * self.n_block, 3), jnp.float32)
        seg_base = 0
        # Per-launch i32 counts stay on device (no per-launch sync) and are
        # summed on host in int64 at the end: a device-side i32 running sum
        # would overflow at ~2.1e9 segments (e.g. 1080p @ 500 spp, depth 50).
        seg_parts: list = []
        launches = 0
        start_schunk = 0
        if resume_state is not None:
            accum = jnp.asarray(resume_state["accum"])
            seg_base = int(resume_state["segments"])
            start_schunk = int(resume_state["schunk"])

        if self.fused and checkpoint_cb is None and not progress:
            # One device dispatch for the whole render: a fori_loop over
            # every (sample-chunk, block) chunk inside a single jit. On the
            # tunneled-TPU setup each jitted call costs ~1.8 ms of pure
            # host↔device dispatch latency regardless of content (measured:
            # a 4 KB XLA add and a 10-pallas-launch chain both ≈1.8-2.0 ms),
            # so the per-chunk Python loop pays ~2 dispatches/chunk of dead
            # wall time; fusing removes all but one.
            total = (n_schunks - start_schunk) * n_blocks
            fused_fn = self._get_fused(scene, n_blocks, start_schunk, total)
            # AOT compile so the single timed execution excludes compile
            # without a throwaway warm-up render; cache the executable so
            # repeated render() calls skip re-lowering
            if self._fused_exe is None:
                self._fused_exe = fused_fn.lower(
                    scene, params, accum, seed_arr).compile()
            compiled = self._fused_exe
            # Time through the host materialization, NOT block_until_ready:
            # on the tunneled remote platform block_until_ready has been
            # observed to return in ~3 ms while the device was still
            # executing a ~400 ms program (the outputs were correct; only
            # the wait was a no-op), which would inflate the benchmark
            # ~100x. np.asarray cannot return without the actual bytes.
            with_ok = self.phase_prefixes is not None
            t0 = _time.perf_counter()
            if self.transfer == "u8":
                # the f32 accumulator stays on device; only one u8 blob
                # (image bytes + bitcast per-launch segment counts)
                # crosses the ~25-50 MB/s link
                out = compiled(scene, params, accum, seed_arr)
                _accum, blob = out[0], out[1]
                blob_h = np.asarray(blob)
                n_img = cfg.n_pixels * 3
                img_h = blob_h[:n_img].reshape(
                    cfg.image_height, cfg.image_width, 3)
                segs_h = blob_h[n_img:].view(np.int32).astype(np.int64)
                seconds = _time.perf_counter() - t0
                return self._checked(RenderResult(
                    radiance=None,
                    segments=seg_base + int(np.sum(segs_h, initial=0)),
                    seconds=seconds,
                    launches=total,
                    u8=img_h,
                    ok=bool(out[2]) if with_ok else None,
                ))
            out = compiled(scene, params, accum, seed_arr)
            accum, segs_vec = out[0], out[1]
            accum_h = np.asarray(accum)
            segs_h = np.asarray(segs_vec, np.int64)
            seconds = _time.perf_counter() - t0
            segments = seg_base + int(np.sum(segs_h, initial=0))
            mean = accum_h[:n_pix] / cfg.samples_per_pixel
            return self._checked(RenderResult(
                radiance=mean.reshape(cfg.image_height, cfg.image_width, 3),
                segments=segments,
                seconds=seconds,
                launches=total,
                ok=bool(out[2]) if with_ok else None,
            ))

        # Warm-up compile outside the timed region.
        fn(scene, params, jnp.int32(0), jnp.int32(0), seed_arr)[0].block_until_ready()
        all_ok = jnp.bool_(True)
        t0 = _time.perf_counter()
        for s in range(start_schunk, n_schunks):
            for b in range(n_blocks):
                out = fn(
                    scene,
                    params,
                    jnp.int32(b * self.n_block),
                    jnp.int32(s * self.spp_chunk),
                    seed_arr,
                )
                rad, seg = out[0], out[1]
                if self.phase_prefixes is not None:
                    all_ok = all_ok & out[2]
                accum = accum.at[b * self.n_block : (b + 1) * self.n_block].add(rad)
                seg_parts.append(seg)
                launches += 1
            if progress:
                print(f"\rsample chunks remaining: {n_schunks - s - 1} ", end="", flush=True)
            if checkpoint_cb is not None:
                checkpoint_cb(
                    {
                        "accum": np.asarray(accum),
                        "segments": seg_base
                        + int(np.sum(np.asarray(seg_parts, np.int64))),
                        "schunk": s + 1,
                    }
                )
        # materialize inside the timed region (see the fused branch: the
        # remote platform's block_until_ready can return early)
        accum_h = np.asarray(accum)
        seconds = _time.perf_counter() - t0
        segments = seg_base + int(np.sum(np.asarray(seg_parts, np.int64), initial=0))
        if progress:
            print("\rDone.                        ", flush=True)

        mean = accum_h[:n_pix] / cfg.samples_per_pixel
        return self._checked(RenderResult(
            radiance=mean.reshape(cfg.image_height, cfg.image_width, 3),
            segments=segments,
            seconds=seconds,
            launches=launches,
            ok=(bool(all_ok) if self.phase_prefixes is not None else None),
        ))


def render(
    scene: Scene,
    cfg: CameraConfig,
    params: Optional[CameraParams] = None,
    seed: int = 0,
    hit_method: str = "auto",
    mode: str = "scan",
    remat: bool = False,
    max_rays_per_launch: int = 1 << 20,
    progress: bool = False,
) -> RenderResult:
    """One-shot functional API over :class:`Renderer`."""
    return Renderer(
        cfg,
        hit_method=hit_method,
        mode=mode,
        remat=remat,
        max_rays_per_launch=max_rays_per_launch,
    ).render(scene, params, seed, progress=progress)
