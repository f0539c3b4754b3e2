"""GGX metallic-roughness BSDF: eval / sample / pdf.

Batched re-derivation of the reference's BSDF library (common.glsl:60-166):

- roughness -> alpha = max(0.001, r^2)                common.glsl:71-73
- GGX NDF D                                           common.glsl:75-81
- Smith G with UE4-style k = a^2/2                    common.glsl:84-91
  (the reference's choice - kept for parity, SURVEY.md par.3.6.4)
- Schlick Fresnel, scalar and RGB                     common.glsl:63-68
- GGX NDF half-vector sampling (not VNDF - matches    common.glsl:94-114
  the reference's admitted approximation)
- cosine-weighted hemisphere sampling                 common.glsl:117-128
- direction pdfs                                      common.glsl:131-142
- combined diffuse+specular eval with                 common.glsl:146-166
  F0 = mix(0.04, albedo, metallic)

All functions are vectorized over a leading ray batch; every vec3 is a
[..., 3] array. Lobe selection probability P(spec) = clamp(metallic +
(1-roughness)*0.5) matches raygen.rgen:241,268.
"""

from __future__ import annotations

import jax.numpy as jnp

from pathtracer.utils import vmath

M_PI = 3.14159265358979323846
EPS = 1e-5  # common.glsl:24


def roughness_to_alpha(roughness):
    return jnp.maximum(0.001, roughness * roughness)


def ggx_d(n_dot_h, alpha):
    a2 = alpha * alpha
    ndh2 = n_dot_h * n_dot_h
    denom = ndh2 * (a2 - 1.0) + 1.0
    return a2 / (M_PI * denom * denom)


def smith_g1(n_dot_x, alpha):
    k = (alpha * alpha) / 2.0
    return n_dot_x / (n_dot_x * (1.0 - k) + k)


def smith_g(n_dot_v, n_dot_l, alpha):
    return smith_g1(n_dot_v, alpha) * smith_g1(n_dot_l, alpha)


def schlick_scalar(cos_theta, f0):
    return f0 + (1.0 - f0) * (1.0 - cos_theta) ** 5


def schlick_rgb(cos_theta, f0_rgb):
    return f0_rgb + (1.0 - f0_rgb) * ((1.0 - cos_theta) ** 5)[..., None]


def lobe_select_prob(metallic, roughness):
    """P(specular lobe) - raygen.rgen:241,268."""
    return jnp.clip(metallic + (1.0 - roughness) * 0.5, 0.0, 1.0)


def sample_ggx(n, v, roughness, u1, u2):
    """Sample L by GGX-NDF half-vector sampling (common.glsl:94-114)."""
    a = roughness_to_alpha(roughness)
    phi = 2.0 * M_PI * u1
    cos_t = jnp.sqrt(jnp.maximum(0.0, (1.0 - u2) / (1.0 + (a * a - 1.0) * u2)))
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    ht = jnp.stack([jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, cos_t], axis=-1)
    t, b = vmath.onb(n)
    h = vmath.normalize(ht[..., 0:1] * t + ht[..., 1:2] * b + ht[..., 2:3] * n)
    l = vmath.reflect(-v, h)
    return vmath.normalize(l)


def sample_cosine(n, u1, u2):
    """Cosine-weighted hemisphere around n (common.glsl:117-128)."""
    phi = 2.0 * M_PI * u1
    r = jnp.sqrt(u2)
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - u2))
    t, b = vmath.onb(n)
    return vmath.normalize(x[..., None] * t + y[..., None] * b + z[..., None] * n)


def pdf_cosine(n_dot_l):
    return n_dot_l / M_PI


def pdf_ggx(n, v, l, roughness):
    """Solid-angle pdf of sample_ggx (common.glsl:134-142)."""
    h = vmath.normalize(v + l)
    n_dot_h = jnp.maximum(vmath.dot(n, h), 0.0)
    v_dot_h = jnp.maximum(vmath.dot(v, h), EPS)
    alpha = roughness_to_alpha(roughness)
    d = ggx_d(n_dot_h, alpha)
    return (d * n_dot_h) / (4.0 * v_dot_h)


def pdf_bsdf(n, v, l, metallic, roughness):
    """Mixture pdf of the lobe-select sampler (raygen.rgen:241-244)."""
    p_spec = lobe_select_prob(metallic, roughness)
    ps = pdf_ggx(n, v, l, roughness)
    pd = pdf_cosine(jnp.maximum(vmath.dot(n, l), 0.0))
    return jnp.maximum(p_spec * ps + (1.0 - p_spec) * pd, 1e-6)


def eval_brdf(n, v, l, albedo, metallic, roughness):
    """Diffuse + GGX specular (common.glsl:146-166). Returns f [..., 3].

    Note: the diffuse term is albedo/pi scaled by (1-metallic); the spec
    term uses F0 = mix(0.04, albedo, metallic). Zero where NdotL or NdotV
    is non-positive.
    """
    n_dot_l = jnp.maximum(vmath.dot(n, l), 0.0)
    n_dot_v = jnp.maximum(vmath.dot(n, v), 0.0)
    valid = (n_dot_l > 0.0) & (n_dot_v > 0.0)

    h = vmath.normalize(v + l)
    n_dot_h = jnp.maximum(vmath.dot(n, h), 0.0)
    v_dot_h = jnp.maximum(vmath.dot(v, h), 0.0)

    f0 = 0.04 * (1.0 - metallic[..., None]) + albedo * metallic[..., None]
    fr = schlick_rgb(v_dot_h, f0)

    alpha = roughness_to_alpha(roughness)
    d = ggx_d(n_dot_h, alpha)
    g = smith_g(n_dot_v, n_dot_l, alpha)

    spec = fr * (d * g / (4.0 * n_dot_v * n_dot_l + 1e-6))[..., None]
    diff = (1.0 - metallic)[..., None] * albedo / M_PI
    return jnp.where(valid[..., None], diff + spec, 0.0)
