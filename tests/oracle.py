"""Independent NumPy float64 oracle renderer.

A deliberately *reference-shaped* implementation: recursive ray_color,
per-ray linear closest-hit scan, scalar-style control flow — the opposite of
the wavefront JAX renderer — but consuming the **same counter-based RNG
stream** (PCG4D over (pixel, sample, bounce·4+stream, seed)). With identical
sampling decisions, the two implementations must agree to f32 tolerance on
every pixel; this is the golden-image check from SURVEY.md §4.2/§7
("recorded RNG stream" mode).

This file intentionally reimplements everything (camera, intersection,
scatter, textures) from the math in the book/SURVEY rather than importing
the JAX code paths — only the compiled scene *data* and the CameraConfig are
shared.
"""
from __future__ import annotations

import numpy as np

U32 = np.uint32

# Stream ids — must match raytracing_tpu.core.rng
STREAM_RAYGEN = 0
STREAM_TIME = 1
STREAM_SCATTER = 2
N_STREAMS = 4

MAT_LAMBERTIAN, MAT_METAL, MAT_DIELECTRIC, MAT_LIGHT = 0, 1, 2, 3
TEX_SOLID, TEX_CHECKER, TEX_IMAGE, TEX_NOISE = 0, 1, 2, 3


def pcg4d(v):
    np.seterr(over="ignore")  # u32 wraparound is intended
    v = np.array(v, dtype=U32)
    v = (v * U32(1664525) + U32(1013904223)).astype(U32)
    v[0] = U32(v[0] + U32(v[1] * v[3]))
    v[1] = U32(v[1] + U32(v[2] * v[0]))
    v[2] = U32(v[2] + U32(v[0] * v[1]))
    v[3] = U32(v[3] + U32(v[1] * v[2]))
    v ^= v >> U32(16)
    v[0] = U32(v[0] + U32(v[1] * v[3]))
    v[1] = U32(v[1] + U32(v[2] * v[0]))
    v[2] = U32(v[2] + U32(v[0] * v[1]))
    v[3] = U32(v[3] + U32(v[1] * v[2]))
    return v


def uniform4(pixel, sample, ctr, seed):
    v = pcg4d([pixel, sample, ctr, seed])
    return (v >> U32(8)).astype(np.float64) / float(1 << 24)


def unit_vector_from(u0, u1):
    z = 1.0 - 2.0 * u0
    r = np.sqrt(max(0.0, 1.0 - z * z))
    phi = 2.0 * np.pi * u1
    return np.array([r * np.cos(phi), r * np.sin(phi), z])


def unit_disk_from(u0, u1):
    r = np.sqrt(u0)
    th = 2.0 * np.pi * u1
    return np.array([r * np.cos(th), r * np.sin(th)])


def _np(x):
    return np.asarray(x, dtype=np.float64)


class OracleRenderer:
    def __init__(self, scene, cfg, seed=0):
        """``scene`` is a compiled raytracing_tpu Scene (device arrays are
        read as plain data); ``cfg`` a CameraConfig."""
        self.cfg = cfg
        self.seed = seed
        s = scene
        self.sph_c = _np(s.spheres.center)
        self.sph_v = _np(s.spheres.velocity)
        self.sph_r = _np(s.spheres.radius)
        self.sph_m = np.asarray(s.spheres.mat_id)
        self.q_q = _np(s.quads.q)
        self.q_u = _np(s.quads.u)
        self.q_v = _np(s.quads.v)
        self.q_m = np.asarray(s.quads.mat_id)
        self.mtype = np.asarray(s.materials.mtype)
        self.mtex = np.asarray(s.materials.tex_id)
        self.mfuzz = _np(s.materials.fuzz)
        self.mior = _np(s.materials.ior)
        self.ttype = np.asarray(s.textures.ttype)
        self.trgb = _np(s.textures.rgb)
        self.tscale = _np(s.textures.scale)
        self.tchild = np.asarray(s.textures.child)
        self.timage = np.asarray(s.textures.image_id)
        self.texels = _np(s.atlas.texels)
        self.sizes = np.asarray(s.atlas.sizes)
        self.randvec = _np(s.perlin.randvec)
        self.perm = [np.asarray(p) for p in (s.perlin.perm_x, s.perlin.perm_y, s.perlin.perm_z)]
        self.has_moving = bool(np.any(self.sph_v != 0))
        # camera derivation (float64, camera.hpp:76-136 formulas)
        W, H = cfg.image_width, cfg.image_height
        theta = np.deg2rad(cfg.vfov)
        h = np.tan(theta / 2)
        vh = 2 * h * cfg.focus_dist
        vw = vh * (W / H)
        lookfrom = _np(cfg.lookfrom)
        w = lookfrom - _np(cfg.lookat)
        w /= np.linalg.norm(w)
        u = np.cross(_np(cfg.vup), w)
        u /= np.linalg.norm(u)
        v = np.cross(w, u)
        vu = vw * u
        vv = vh * -v
        self.du = vu / W
        self.dv = vv / H
        ul = lookfrom - cfg.focus_dist * w - vu / 2 - vv / 2
        self.p00 = ul + 0.5 * (self.du + self.dv)
        self.center = lookfrom
        dr = cfg.focus_dist * np.tan(np.deg2rad(cfg.defocus_angle) / 2)
        self.def_u = u * dr
        self.def_v = v * dr

    # ----------------------------- textures ------------------------------
    def tex_value(self, tid, uu, vv, p):
        for _ in range(2):  # checker indirection (matches CHECKER_NEST_DEPTH)
            if self.ttype[tid] == TEX_CHECKER:
                cells = np.floor(self.tscale[tid] * p).astype(np.int64)
                even = (cells.sum() % 2) == 0
                tid = self.tchild[tid, 0] if even else self.tchild[tid, 1]
        tt = self.ttype[tid]
        if tt == TEX_SOLID:
            return self.trgb[tid].copy()
        if tt == TEX_IMAGE:
            img = self.timage[tid]
            h, w = self.sizes[img]
            if h <= 0:
                return np.array([0.0, 1.0, 1.0])
            cu = min(max(uu, 0.0), 1.0)
            cv = 1.0 - min(max(vv, 0.0), 1.0)
            i = min(int(cu * w), w - 1)
            j = min(int(cv * h), h - 1)
            return self.texels[img, j, i].copy()
        if tt == TEX_NOISE:
            m = 0.5 * (1.0 + np.sin(self.tscale[tid] * p[2] + 10.0 * self.turb(p, 7)))
            return np.array([m, m, m])
        raise ValueError(f"bad texture type {tt}")

    def perlin_noise(self, p):
        pf = np.floor(p)
        u, v, w = p - pf
        i, j, k = pf.astype(np.int64)
        uu, vv, ww = [x * x * (3 - 2 * x) for x in (u, v, w)]
        acc = 0.0
        for di in (0, 1):
            for dj in (0, 1):
                for dk in (0, 1):
                    g = self.randvec[
                        self.perm[0][(i + di) & 255]
                        ^ self.perm[1][(j + dj) & 255]
                        ^ self.perm[2][(k + dk) & 255]
                    ]
                    wt = (
                        (di * uu + (1 - di) * (1 - uu))
                        * (dj * vv + (1 - dj) * (1 - vv))
                        * (dk * ww + (1 - dk) * (1 - ww))
                    )
                    acc += wt * np.dot(g, np.array([u - di, v - dj, w - dk]))
        return acc

    def turb(self, p, depth):
        acc, tp, wgt = 0.0, p.copy(), 1.0
        for _ in range(depth):
            acc += wgt * self.perlin_noise(tp)
            wgt *= 0.5
            tp = tp * 2
        return abs(acc)

    # ---------------------------- intersection ---------------------------
    def closest_hit(self, o, d, time, t_min=1e-3):
        best_t = np.inf
        best = None
        for i in range(len(self.sph_r)):
            r = self.sph_r[i]
            if r <= 0:
                continue
            c = self.sph_c[i] + time * self.sph_v[i]
            oc = o - c
            a = np.dot(d, d)
            half_b = np.dot(oc, d)
            cq = np.dot(oc, oc) - r * r
            disc = half_b * half_b - a * cq
            if disc < 0:
                continue
            sq = np.sqrt(disc)
            for root in ((-half_b - sq) / a, (-half_b + sq) / a):
                if t_min < root < best_t:
                    p = o + root * d
                    outward = (p - c) / r
                    theta = np.arccos(np.clip(-outward[1], -1, 1))
                    phi = np.arctan2(-outward[2], outward[0]) + np.pi
                    best_t = root
                    best = dict(
                        t=root, p=p, outward=outward, mat=self.sph_m[i],
                        u=phi / (2 * np.pi), v=theta / np.pi,
                    )
                    break
        for j in range(len(self.q_m)):
            qu, qv = self.q_u[j], self.q_v[j]
            n = np.cross(qu, qv)
            nn = np.dot(n, n)
            if nn == 0:
                continue
            normal = n / np.sqrt(nn)
            D = np.dot(normal, self.q_q[j])
            w = n / nn
            denom = np.dot(normal, d)
            if abs(denom) < 1e-8:
                continue
            t = (D - np.dot(normal, o)) / denom
            if not (t_min < t < best_t):
                continue
            p = o + t * d
            planar = p - self.q_q[j]
            alpha = np.dot(w, np.cross(planar, qv))
            beta = np.dot(w, np.cross(qu, planar))
            if 0 <= alpha <= 1 and 0 <= beta <= 1:
                best_t = t
                best = dict(t=t, p=p, outward=normal, mat=self.q_m[j], u=alpha, v=beta)
        if best is None:
            return None
        ff = np.dot(d, best["outward"]) < 0
        best["front_face"] = ff
        best["normal"] = best["outward"] if ff else -best["outward"]
        return best

    # ----------------------------- integrator ----------------------------
    def ray_color(self, o, d, time, pixel, sample, bounce):
        cfg = self.cfg
        if bounce >= cfg.max_depth:
            return np.zeros(3)
        rec = self.closest_hit(o, d, time)
        if rec is None:
            return _np(cfg.background)
        m = rec["mat"]
        mt = self.mtype[m]
        tex = self.tex_value(self.mtex[m], rec["u"], rec["v"], rec["p"])
        emitted = tex if mt == MAT_LIGHT else np.zeros(3)

        u4 = uniform4(pixel, sample, bounce * N_STREAMS + STREAM_SCATTER, self.seed)
        ruv = unit_vector_from(u4[0], u4[1])
        n = rec["normal"]

        if mt == MAT_LIGHT:
            return emitted
        if mt == MAT_LAMBERTIAN:
            nd = n + ruv
            if np.all(np.abs(nd) < 1e-8):
                nd = n
            atten = tex
        elif mt == MAT_METAL:
            refl = d - 2 * np.dot(d, n) * n
            nd = refl / np.linalg.norm(refl) + self.mfuzz[m] * ruv
            if np.dot(nd, n) <= 0:
                return emitted  # absorbed
            atten = tex
        elif mt == MAT_DIELECTRIC:
            atten = np.ones(3)
            ri = (1.0 / self.mior[m]) if rec["front_face"] else self.mior[m]
            ud = d / np.linalg.norm(d)
            cos_t = min(np.dot(-ud, n), 1.0)
            sin_t = np.sqrt(max(0.0, 1 - cos_t * cos_t))
            r0 = ((1 - ri) / (1 + ri)) ** 2
            refl_p = r0 + (1 - r0) * (1 - cos_t) ** 5
            if ri * sin_t > 1.0 or refl_p > u4[2]:
                nd = ud - 2 * np.dot(ud, n) * n
            else:
                cos_clip = min(np.dot(-ud, n), 1.0)
                perp = ri * (ud + cos_clip * n)
                par = -np.sqrt(abs(1.0 - np.dot(perp, perp))) * n
                nd = perp + par
        else:
            raise ValueError(f"bad material {mt}")
        child = self.ray_color(rec["p"], nd, time, pixel, sample, bounce + 1)
        return emitted + atten * child

    def render(self):
        cfg = self.cfg
        W, H = cfg.image_width, cfg.image_height
        img = np.zeros((H, W, 3))
        for j in range(H):
            for i in range(W):
                pixel = j * W + i
                acc = np.zeros(3)
                for s in range(cfg.samples_per_pixel):
                    u4 = uniform4(pixel, s, STREAM_RAYGEN, self.seed)
                    ox, oy = u4[0] - 0.5, u4[1] - 0.5
                    psample = self.p00 + (i + ox) * self.du + (j + oy) * self.dv
                    if cfg.defocus_angle > 0:
                        disk = unit_disk_from(u4[2], u4[3])
                        origin = self.center + disk[0] * self.def_u + disk[1] * self.def_v
                    else:
                        origin = self.center
                    if self.has_moving:
                        time = uniform4(pixel, s, STREAM_TIME, self.seed)[0]
                    else:
                        time = 0.0
                    acc += self.ray_color(origin, psample - origin, time, pixel, s, 0)
                img[j, i] = acc / cfg.samples_per_pixel
        return img
