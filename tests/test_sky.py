"""Environment-light tests (miss.rmiss re-derivations)."""

import jax.numpy as jnp
import numpy as np

from pathtracer.config import RenderConfig
from pathtracer.integrator import sky


def test_gradient_matches_formula():
    """skyColorSimple (miss.rmiss:153-156) at +y, -y, horizon."""
    d = jnp.array([[0.0, 1.0, 0.0], [0.0, -1.0, 0.0], [1.0, 0.0, 0.0]])
    got = np.asarray(sky.gradient_sky(d, gain=1.0))
    np.testing.assert_allclose(got[0], [0.6, 0.7, 0.9], atol=1e-6)
    np.testing.assert_allclose(got[1], [0.02, 0.02, 0.05], atol=1e-6)
    # horizon: t=0.5, mix factor (1-0.5)^2 = 0.25
    expect = np.array([0.6, 0.7, 0.9]) * 0.75 + np.array([0.02, 0.02, 0.05]) * 0.25
    np.testing.assert_allclose(got[2], expect, atol=1e-6)


def test_gradient_gain():
    d = jnp.array([[0.0, 1.0, 0.0]])
    a = np.asarray(sky.gradient_sky(d, gain=0.2))
    np.testing.assert_allclose(a[0], np.array([0.6, 0.7, 0.9]) * 0.2,
                               atol=1e-6)


def test_hosek_positive_above_horizon():
    rng = np.random.default_rng(0)
    d = rng.normal(size=(64, 3))
    d[:, 1] = np.abs(d[:, 1]) + 0.05
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    out = np.asarray(sky.hosek_wilkie_sky(jnp.asarray(d, jnp.float32),
                                          (0.3, 0.6, 0.2), 1.0))
    assert np.isfinite(out).all()
    assert (out >= 0).all()
    assert out.max() > 0


def test_hosek_brighter_near_sun():
    sun = np.array([0.0, 0.7, 0.7])
    sun /= np.linalg.norm(sun)
    near = sun.copy()
    far = np.array([0.0, 0.7, -0.7])
    far /= np.linalg.norm(far)
    d = jnp.asarray(np.stack([near, far]), jnp.float32)
    out = np.asarray(sky.hosek_wilkie_sky(d, tuple(sun), 1.0))
    assert out[0].sum() > out[1].sum()


def test_envmap_constant():
    env = jnp.ones((4, 8, 3), jnp.float32) * 0.7
    rng = np.random.default_rng(1)
    d = rng.normal(size=(32, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    out = np.asarray(sky.envmap_radiance(env, jnp.asarray(d)))
    np.testing.assert_allclose(out, 0.7, atol=1e-5)


def test_sky_dispatch():
    cfg = RenderConfig(sky="black")
    d = jnp.array([[0.0, 1.0, 0.0]])
    env = jnp.zeros((1, 1, 3))
    np.testing.assert_allclose(
        np.asarray(sky.sky_radiance(cfg, env, d)), 0.0)
