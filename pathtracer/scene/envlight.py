"""Environment-map importance sampling (equirect HDR).

Net-new capability over the reference (whose environment is a fixed
procedural gradient, miss.rmiss:153-156): BASELINE config 4 requires "HDR
environment-map lighting with importance sampling". Standard 2D CDF
construction over the luminance-weighted texel solid angles:

  w[r,c]   = luminance(env[r,c]) * sin(theta_r)
  marginal = cdf over row sums, conditional = per-row cdf over columns
  p(omega) = select_prob / texel_solid_angle   (piecewise-constant pdf)

Sampling and pdf lookups are pure jnp (device-side); CDF build is
numpy at scene-finalize time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

M_PI = np.pi


def build_env_distribution(envmap: np.ndarray):
    """CDFs + solid-angle pdf map for an equirect env map f32[H, W, 3].

    Returns (marginal_cdf f32[H], cond_cdf f32[H, W], pdf f32[H, W]).
    """
    env = np.asarray(envmap, np.float64)
    h, w = env.shape[:2]
    lum = 0.2126 * env[..., 0] + 0.7152 * env[..., 1] + 0.0722 * env[..., 2]
    theta = (np.arange(h) + 0.5) / h * M_PI
    weight = np.maximum(lum, 0.0) * np.sin(theta)[:, None]
    total = weight.sum()
    if total <= 0:
        weight = np.ones_like(weight)
        total = weight.sum()

    row_w = weight.sum(axis=1)
    marginal_cdf = np.cumsum(row_w) / total
    marginal_cdf[-1] = 1.0

    cond = np.cumsum(weight, axis=1)
    row_safe = np.where(row_w > 0, row_w, 1.0)[:, None]
    cond_cdf = cond / row_safe
    cond_cdf[:, -1] = 1.0

    select = weight / total                      # per-texel selection prob
    d_omega = (M_PI / h) * (2.0 * M_PI / w) * np.maximum(
        np.sin(theta)[:, None], 1e-8)
    pdf = select / d_omega                       # solid-angle pdf
    return (marginal_cdf.astype(np.float32), cond_cdf.astype(np.float32),
            pdf.astype(np.float32))


def _row_searchsorted(cdf2d, r, u):
    """Per-lane searchsorted(cdf2d[r], u, side='left') WITHOUT gathering
    the [N, W] row matrix.

    The naive `cond_cdf[r]` gather materializes [N, W] (4 GB at 1M lanes
    x 1024-wide env, a 34 GB compile-time OOM at the 8.4M-lane batched
    pool) just so each lane can binary-search its own row. An explicit
    lower-bound binary search needs log2(W) scalar-per-lane gathers
    `cdf2d[r, mid]` instead - O(N log W) time, O(N) memory - and returns
    bit-identical indices (pinned vs jnp.searchsorted in
    tests/test_envlight.py)."""
    w = cdf2d.shape[1]
    lo = jnp.zeros_like(r)
    hi = jnp.full_like(r, w)
    # insertion index lives in [0, w]: interval size w needs
    # ceil(log2(w)) + 1 halvings to reach 0
    steps = int(np.ceil(np.log2(max(w, 2)))) + 1

    def body(_, lohi):
        lo, hi = lohi
        open_ = lo < hi                     # converged lanes stay put
        mid = (lo + hi) // 2
        # lower bound: first index with cdf >= u; clamp the probe for
        # lanes already at mid == w (JAX would clamp the read anyway,
        # but the update must not move a converged lane)
        go_right = open_ & (cdf2d[r, jnp.minimum(mid, w - 1)] < u)
        return (jnp.where(go_right, mid + 1, lo),
                jnp.where(open_ & ~go_right, mid, hi))

    lo, _ = jax.lax.fori_loop(0, steps, body, (lo, hi))
    return lo


def sample_env(marginal_cdf, cond_cdf, u1, u2, u3, u4):
    """Sample directions from the env distribution.

    u1..u4: f32[N] uniforms (row, col, in-texel jitter x2).
    Returns (dir f32[N,3], row i32[N], col i32[N]).
    """
    h = marginal_cdf.shape[0]
    w = cond_cdf.shape[1]
    r = jnp.clip(jnp.searchsorted(marginal_cdf, u1, side="left"), 0, h - 1)
    c = jnp.clip(_row_searchsorted(cond_cdf, r, u2), 0, w - 1)

    theta = (r.astype(jnp.float32) + u3) / h * M_PI
    phi = ((c.astype(jnp.float32) + u4) / w - 0.5) * (2.0 * M_PI)
    st = jnp.sin(theta)
    d = jnp.stack([st * jnp.cos(phi), jnp.cos(theta), st * jnp.sin(phi)],
                  axis=-1)
    return d, r.astype(jnp.int32), c.astype(jnp.int32)


def env_pdf(pdf_map, d):
    """Solid-angle pdf of direction d [...,3] under the env distribution."""
    h, w = pdf_map.shape
    theta = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0))
    phi = jnp.arctan2(d[..., 2], d[..., 0])
    r = jnp.clip((theta / M_PI * h).astype(jnp.int32), 0, h - 1)
    c = jnp.clip(((phi / (2.0 * M_PI) + 0.5) * w).astype(jnp.int32), 0, w - 1)
    return pdf_map[r, c]
