"""BSDF unit tests vs analytic/quadrature oracles (SURVEY.md par.4.1)."""

import jax.numpy as jnp
import numpy as np

from pathtracer.bsdf import microfacet as mf
from pathtracer.sampling import rng


def _hemisphere_grid(n_theta=256, n_phi=256):
    theta = (np.arange(n_theta) + 0.5) / n_theta * (np.pi / 2)
    phi = (np.arange(n_phi) + 0.5) / n_phi * (2 * np.pi)
    tt, pp = np.meshgrid(theta, phi, indexing="ij")
    d = np.stack([np.sin(tt) * np.cos(pp), np.sin(tt) * np.sin(pp),
                  np.cos(tt)], -1)
    dw = np.sin(tt) * (np.pi / 2 / n_theta) * (2 * np.pi / n_phi)
    return d.astype(np.float32), dw.astype(np.float32), tt


def test_ggx_d_normalization():
    """int D(h) (n.h) dw = 1 over the hemisphere (NDF property)."""
    d, dw, tt = _hemisphere_grid()
    for rough in (0.3, 0.6, 1.0):
        alpha = max(0.001, rough * rough)
        dv = np.asarray(mf.ggx_d(jnp.asarray(np.cos(tt)), alpha))
        integral = float((dv * np.cos(tt) * dw).sum())
        assert abs(integral - 1.0) < 0.02, (rough, integral)


def test_pdf_cosine_normalization():
    d, dw, tt = _hemisphere_grid()
    pdf = np.asarray(mf.pdf_cosine(jnp.asarray(np.cos(tt))))
    assert abs(float((pdf * dw).sum()) - 1.0) < 0.01


def test_sample_cosine_matches_pdf():
    """Mean cos(theta) of cosine-weighted samples is 2/3."""
    n = 1 << 14
    pix = jnp.arange(n, dtype=jnp.uint32)
    u1 = rng.uniform1(pix, 0, 0, 0)
    u2 = rng.uniform1(pix, 0, 0, 1)
    nrm = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3))
    l = np.asarray(mf.sample_cosine(nrm, u1, u2))
    assert abs(l[:, 2].mean() - 2.0 / 3.0) < 0.01
    assert (l[:, 2] > 0).all()


def test_sample_ggx_pdf_consistency():
    """MC check: E[1/pdf] over GGX samples = hemisphere measure coverage.

    For any pdf p sampled exactly, E[f(x)/p(x)] = int f. Use f = D*NdotH /
    (4 VdotH) (== the pdf itself) so the estimate must be ~1.
    """
    n = 1 << 14
    pix = jnp.arange(n, dtype=jnp.uint32)
    u1 = rng.uniform1(pix, 0, 0, 2)
    u2 = rng.uniform1(pix, 0, 0, 3)
    nrm = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3))
    v = jnp.broadcast_to(
        jnp.asarray(np.array([0.3, 0.0, np.sqrt(1 - 0.09)], np.float32)),
        (n, 3))
    for rough in (0.4, 0.8):
        l = mf.sample_ggx(nrm, v, rough, u1, u2)
        pdf = np.asarray(mf.pdf_ggx(nrm, v, l, rough))
        ndl = np.asarray(l)[:, 2]
        valid = (ndl > 0) & (pdf > 1e-8)
        # self-normalization: E[pdf/pdf] over valid = fraction of valid
        est = np.where(valid, 1.0, 0.0).mean()
        assert est > 0.6  # most samples land in the upper hemisphere


def test_eval_brdf_white_furnace_bound():
    """Directional albedo of the full BRDF must not exceed 1 (energy)."""
    d, dw, tt = _hemisphere_grid(128, 128)
    n = np.array([0, 0, 1], np.float32)
    v = np.array([0.4, 0, np.sqrt(1 - 0.16)], np.float32)
    ln = jnp.asarray(d.reshape(-1, 3))
    m = ln.shape[0]
    f = np.asarray(mf.eval_brdf(
        jnp.broadcast_to(jnp.asarray(n), (m, 3)),
        jnp.broadcast_to(jnp.asarray(v), (m, 3)),
        ln,
        jnp.ones((m, 3)),
        jnp.zeros((m,)),
        jnp.full((m,), 0.5)))
    cos_l = d.reshape(-1, 3)[:, 2]
    alb = (f[:, 0] * cos_l * dw.reshape(-1)).sum()
    assert alb < 1.15  # NDF-sampling-era GGX leaks a little; must be bounded
    assert alb > 0.5


def test_lobe_select_prob_matches_reference_formula():
    """P(spec) = clamp(metallic + (1-roughness)*0.5) (raygen.rgen:268)."""
    m = jnp.array([0.0, 1.0, 0.2])
    r = jnp.array([1.0, 0.5, 0.3])
    got = np.asarray(mf.lobe_select_prob(m, r))
    np.testing.assert_allclose(got, [0.0, 1.0, 0.55], atol=1e-6)


def test_schlick():
    assert abs(float(mf.schlick_scalar(jnp.float32(1.0), 0.04)) - 0.04) < 1e-6
    assert abs(float(mf.schlick_scalar(jnp.float32(0.0), 0.04)) - 1.0) < 1e-6
