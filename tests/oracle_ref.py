"""Scalar numpy oracle of the reference's EXACT estimator (quirks mode).

An independent re-implementation of the path tracer in plain numpy, one
path at a time, mirroring the reference's estimator semantics
(raygen.rgen:95-307 with the documented quirks, SURVEY.md par.3.6):

- emitter hits add throughput * mat.emission * 10, UN-weighted (quirks 2+3)
- NEE uses Le = emission * albedo with NO x10 gain (quirk 2)
- BSDF throughput uses the conditional-lobe pdf (quirk in par.3.6 item 13
  discussion / raygen.rgen:267-274)
- the quirks shadow-ray scheme (target behind the light, tmax = dist - eps)

It shares ONLY the counter-based RNG (pathtracer.sampling.rng) with the
renderer - every geometric/BSDF/MIS formula here is written from the
reference's GLSL semantics, so agreement with `reference_quirks=True`
renders validates the whole integrator beyond self-regression.
"""

from __future__ import annotations

import numpy as np

from pathtracer.sampling import rng

M_PI = 3.14159265358979323846
EPS = 1e-5


def _u4(pixel, sample, depth, salt, seed):
    return np.asarray(rng.uniform4(np.uint32(pixel), np.uint32(sample),
                                   depth, salt, seed), np.float32)


def _normalize(v):
    return v / max(np.linalg.norm(v), 1e-20)


def _onb(n):
    # common.glsl:52-58 branch
    if abs(n[0]) > abs(n[1]):
        t = _normalize(np.array([n[2], 0.0, -n[0]], np.float32))
    else:
        t = _normalize(np.array([0.0, -n[2], n[1]], np.float32))
    return t, np.cross(n, t)


def _reflect(i, n):
    return i - 2.0 * np.dot(n, i) * n


def _refract(i, n, eta):
    cosi = -np.dot(i, n)
    k = 1.0 - eta * eta * (1.0 - cosi * cosi)
    if k < 0.0:
        return np.zeros(3, np.float32), True
    return eta * i + (eta * cosi - np.sqrt(k)) * n, False


def _ggx_d(ndh, alpha):
    a2 = alpha * alpha
    denom = ndh * ndh * (a2 - 1.0) + 1.0
    return a2 / (M_PI * denom * denom)


def _smith_g(ndv, ndl, alpha):
    k = alpha * alpha / 2.0
    return (ndv / (ndv * (1 - k) + k)) * (ndl / (ndl * (1 - k) + k))


def _eval_brdf(n, v, l, albedo, metallic, roughness):
    ndl = max(np.dot(n, l), 0.0)
    ndv = max(np.dot(n, v), 0.0)
    if ndl <= 0.0 or ndv <= 0.0:
        return np.zeros(3, np.float32)
    h = _normalize(v + l)
    ndh = max(np.dot(n, h), 0.0)
    vdh = max(np.dot(v, h), 0.0)
    f0 = 0.04 * (1.0 - metallic) + albedo * metallic
    fr = f0 + (1.0 - f0) * (1.0 - vdh) ** 5
    alpha = max(0.001, roughness * roughness)
    spec = fr * (_ggx_d(ndh, alpha) * _smith_g(ndv, ndl, alpha)
                 / (4.0 * ndv * ndl + 1e-6))
    diff = (1.0 - metallic) * albedo / M_PI
    return (diff + spec).astype(np.float32)


def _pdf_ggx(n, v, l, roughness):
    h = _normalize(v + l)
    ndh = max(np.dot(n, h), 0.0)
    vdh = max(np.dot(v, h), EPS)
    alpha = max(0.001, roughness * roughness)
    return _ggx_d(ndh, alpha) * ndh / (4.0 * vdh)


def _pdf_bsdf(n, v, l, metallic, roughness):
    p_spec = np.clip(metallic + (1.0 - roughness) * 0.5, 0.0, 1.0)
    pd = max(np.dot(n, l), 0.0) / M_PI
    return max(p_spec * _pdf_ggx(n, v, l, roughness)
               + (1.0 - p_spec) * pd, 1e-6)


def _power_h(a, b):
    return a * a / max(a * a + b * b, 1e-20)


class SceneArrays:
    """Host copies of the scene tables the oracle needs."""

    def __init__(self, scene):
        g = lambda a: np.asarray(a)  # noqa: E731
        self.positions = g(scene.positions)
        self.normals = g(scene.normals)
        self.indices = g(scene.indices)
        self.face_material = g(scene.face_material)
        self.mat_albedo = g(scene.mat_albedo)
        self.mat_emission = g(scene.mat_emission)
        self.mat_roughness = g(scene.mat_roughness)
        self.mat_metallic = g(scene.mat_metallic)
        self.mat_ior = g(scene.mat_ior)
        self.mat_alpha = g(scene.mat_alpha)
        self.mat_type = g(scene.mat_type)
        self.light_v0 = g(scene.light_v0)
        self.light_v1 = g(scene.light_v1)
        self.light_v2 = g(scene.light_v2)
        self.light_normal = g(scene.light_normal)
        self.light_emission = g(scene.light_emission)
        self.light_area = g(scene.light_area)
        self.light_cdf = g(scene.light_cdf)
        self.light_pdf = g(scene.light_pdf)
        self.has_lights = scene.has_lights
        self.v0 = self.positions[self.indices[:, 0]]
        self.v1 = self.positions[self.indices[:, 1]]
        self.v2 = self.positions[self.indices[:, 2]]
        self.e1 = self.v1 - self.v0
        self.e2 = self.v2 - self.v0
        self.gn = np.cross(self.e1, self.e2)


def _closest_hit(s, o, d, t_min, t_max):
    """Vectorized-over-triangles Moller-Trumbore, scalar ray."""
    pvec = np.cross(d, s.e2)
    det = np.einsum("ij,ij->i", s.e1, pvec)
    ok = np.abs(det) > 1e-12
    inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
    tvec = o - s.v0
    u = np.einsum("ij,ij->i", tvec, pvec) * inv
    qvec = np.cross(tvec, s.e1)
    v = np.dot(qvec, d) * inv
    t = np.einsum("ij,ij->i", s.e2, qvec) * inv
    ok &= (u >= 0) & (v >= 0) & (u + v <= 1) & (t > t_min) & (t < t_max)
    t = np.where(ok, t, np.inf)
    j = int(np.argmin(t))
    if not np.isfinite(t[j]):
        return -1, np.inf, 0.0, 0.0
    return j, float(t[j]), float(u[j]), float(v[j])


def _occluded_front(s, o, d, t_max):
    """Any front-facing hit below t_max (raygen.rgen:210-230 policy)."""
    pvec = np.cross(d, s.e2)
    det = np.einsum("ij,ij->i", s.e1, pvec)
    ok = np.abs(det) > 1e-12
    inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
    tvec = o - s.v0
    u = np.einsum("ij,ij->i", tvec, pvec) * inv
    qvec = np.cross(tvec, s.e1)
    v = np.dot(qvec, d) * inv
    t = np.einsum("ij,ij->i", s.e2, qvec) * inv
    front = s.gn @ d < 0.0
    ok &= (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 0.0) & (t < t_max) & front
    return bool(ok.any())


def render_oracle(scene, cfg, cam_state):
    """Render cfg.width x cfg.height at cfg.spp with the quirks estimator.

    Returns f32 [H, W, 3]. Mirrors reference_quirks=True semantics; frame 0.
    """
    s = SceneArrays(scene)
    w, h = cfg.width, cfg.height
    pos = np.asarray(cam_state.position)
    front = np.asarray(cam_state.front)
    up = np.asarray(cam_state.up)
    right = np.asarray(cam_state.right)
    tan_fov = np.tan(np.radians(cfg.fov_deg * 0.5))
    aspect = w / h
    img = np.zeros((h, w, 3), np.float32)

    for py in range(h):
        for px in range(w):
            pixel = py * w + px
            acc = np.zeros(3, np.float32)
            for smp in range(cfg.spp):
                acc += _trace(s, cfg, pixel, smp, px, py, w, h, pos, front,
                              up, right, tan_fov, aspect)
            img[py, px] = acc / cfg.spp
    return img


def _trace(s, cfg, pixel, smp, px, py, w, h, pos, front, up, right,
           tan_fov, aspect):
    jit = _u4(pixel, smp, 0, rng.SALT_JITTER, cfg.seed)
    u_ndc = (px + jit[0]) / w * 2.0 - 1.0
    v_ndc = (py + jit[1]) / h * 2.0 - 1.0
    d = _normalize(front + right * (u_ndc * aspect * tan_fov)
                   - up * (v_ndc * tan_fov))
    o = pos.copy()
    T = np.ones(3, np.float32)
    L = np.zeros(3, np.float32)

    for depth in range(cfg.max_depth):
        tri, t, bu, bv = _closest_hit(s, o, d, cfg.t_min, cfg.t_max)
        if tri < 0:
            # gradient sky (miss.rmiss:153-156) x gain
            tt = np.clip(0.5 * (d[1] + 1.0), 0.0, 1.0)
            m = (1.0 - tt) ** 2
            sky = (np.array([0.6, 0.7, 0.9]) * (1 - m)
                   + np.array([0.02, 0.02, 0.05]) * m) * cfg.sky_gain
            L += T * sky.astype(np.float32)
            break

        i0, i1, i2 = s.indices[tri]
        n = _normalize(s.normals[i0] * (1 - bu - bv) + s.normals[i1] * bu
                       + s.normals[i2] * bv)
        p_hit = o + d * t
        mid = s.face_material[tri]
        albedo = s.mat_albedo[mid]
        rough = float(np.clip(s.mat_roughness[mid], 0.01, 1.0))
        metal = float(np.clip(s.mat_metallic[mid], 0.0, 1.0))
        alpha = float(np.clip(s.mat_alpha[mid], 0.0, 1.0))

        # emitter hit: quirks = raw emission, x gain, NO MIS weight
        L += T * s.mat_emission[mid] * cfg.emission_gain

        if depth == cfg.max_depth - 1:
            break

        u_alpha = float(_u4(pixel, smp, depth, rng.SALT_ALPHA, cfg.seed)[0])
        passthrough = (alpha < 0.99) and (u_alpha > alpha)

        is_dielectric = (not passthrough) and (s.mat_type[mid] == 2)
        view = -d

        if is_dielectric:
            cosi = np.dot(d, n)
            entering = cosi <= 0.0
            ior = float(s.mat_ior[mid])
            eta = 1.0 / ior if entering else ior
            n_eff = n if entering else -n
            refr, tir = _refract(d, n_eff, eta)
            f0 = 0.04
            refl_prob = np.clip(
                f0 + (1.0 - f0) * (1.0 - abs(cosi)) ** 5, 0.0, 1.0)
            u_d = float(_u4(pixel, smp, depth, rng.SALT_DIELECTRIC,
                            cfg.seed)[0])
            d_new = _reflect(d, n) if (tir or u_d < refl_prob) else refr

        shade = (not passthrough) and (not is_dielectric)

        if shade and s.has_lights:
            u_sel = float(_u4(pixel, smp, depth, rng.SALT_LIGHT_SELECT,
                              cfg.seed)[0])
            li = min(int(np.searchsorted(s.light_cdf, u_sel, side="left")),
                     len(s.light_cdf) - 1)
            lr = _u4(pixel, smp, depth, rng.SALT_LIGHT_UV, cfg.seed)
            sr1 = np.sqrt(lr[0])
            b0 = 1.0 - sr1
            b1 = lr[1] * sr1
            p_on = (s.light_v0[li] * b0 + s.light_v1[li] * b1
                    + s.light_v2[li] * (1.0 - b0 - b1))
            p_a = s.light_pdf[li] / max(s.light_area[li], EPS)
            to_l = p_on - p_hit
            dist2 = max(float(np.dot(to_l, to_l)), EPS)
            l_dir = to_l / np.sqrt(dist2)
            ndl = max(float(np.dot(n, l_dir)), 0.0)
            nldot = max(float(np.dot(s.light_normal[li], -l_dir)), 0.0)
            if ndl > 0.0 and nldot > 0.0:
                eps = cfg.shadow_eps
                s_orig = p_hit + n * eps
                target = p_on - s.light_normal[li] * eps   # quirks scheme
                s_dir = _normalize(target - s_orig)
                s_tmax = max(0.0, np.sqrt(dist2) - eps)
                if not _occluded_front(s, s_orig, s_dir, s_tmax):
                    f = _eval_brdf(n, view, l_dir, albedo, metal, rough)
                    p_omega = p_a * dist2 / max(nldot, EPS)
                    pdf_b = _pdf_bsdf(n, view, l_dir, metal, rough)
                    w_mis = _power_h(p_omega, pdf_b)
                    g = ndl * nldot / dist2
                    # quirks: NEE gain = 1 (no x10), Le = emission*albedo
                    L += T * f * s.light_emission[li] * (g / max(p_a, 1e-12)) \
                        * w_mis

        # BSDF sample (conditional-lobe pdf - quirks)
        u_lobe = float(_u4(pixel, smp, depth, rng.SALT_BSDF_LOBE,
                           cfg.seed)[0])
        uu = _u4(pixel, smp, depth, rng.SALT_BSDF_UV, cfg.seed)
        p_spec = float(np.clip(metal + (1.0 - rough) * 0.5, 0.0, 1.0))
        if u_lobe < p_spec:
            a = max(0.001, rough * rough)
            phi = 2.0 * M_PI * uu[0]
            cos_t = np.sqrt(max(0.0, (1.0 - uu[1])
                                / (1.0 + (a * a - 1.0) * uu[1])))
            sin_t = np.sqrt(max(0.0, 1.0 - cos_t * cos_t))
            tb, bb = _onb(n)
            h_vec = _normalize(np.cos(phi) * sin_t * tb
                               + np.sin(phi) * sin_t * bb + cos_t * n)
            l_new = _normalize(_reflect(-view, h_vec))
            pdf = max(_pdf_ggx(n, view, l_new, rough), 1e-6)
        else:
            phi = 2.0 * M_PI * uu[0]
            r = np.sqrt(uu[1])
            tb, bb = _onb(n)
            l_new = _normalize(r * np.cos(phi) * tb + r * np.sin(phi) * bb
                               + np.sqrt(max(0.0, 1.0 - uu[1])) * n)
            pdf = max(max(np.dot(n, l_new), 0.0) / M_PI, 1e-6)

        ndl_new = max(float(np.dot(n, l_new)), 0.0)
        if shade:
            f = _eval_brdf(n, view, l_new, albedo, metal, rough)
            T = T * f * (ndl_new / pdf)

        if passthrough:
            d_next = d
        elif is_dielectric:
            d_next = d_new
        else:
            d_next = l_new
        o = p_hit + d_next * cfg.t_min
        d = d_next

        if shade and ndl_new <= 0.0:
            break

        # Russian roulette (raygen.rgen:286-291)
        p_rr = float(np.clip(np.max(T), cfg.rr_clamp_lo, cfg.rr_clamp_hi))
        u_rr = float(_u4(pixel, smp, depth, rng.SALT_RR, cfg.seed)[0])
        if shade and depth > cfg.rr_start_depth:
            if u_rr > p_rr:
                break
            T = T / p_rr
        if np.max(T) < cfg.throughput_cutoff:
            break
    return L
