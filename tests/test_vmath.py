"""Vector math unit tests (re-derivations of math/*.h + GLSL built-ins)."""

import jax.numpy as jnp
import numpy as np

from pathtracer.utils import vmath


def test_reflect_mirror():
    i = jnp.array([[1.0, -1.0, 0.0]]) / np.sqrt(2)
    n = jnp.array([[0.0, 1.0, 0.0]])
    r = np.asarray(vmath.reflect(i, n))[0]
    np.testing.assert_allclose(r, [1 / np.sqrt(2), 1 / np.sqrt(2), 0],
                               atol=1e-6)


def test_reflect_sign_invariance():
    """reflect(I, N) == reflect(I, -N) - relied on by the dielectric branch
    (raygen.rgen:160 reflects around N regardless of side)."""
    rng = np.random.default_rng(0)
    i = rng.normal(size=(10, 3)).astype(np.float32)
    n = rng.normal(size=(10, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    a = np.asarray(vmath.reflect(jnp.asarray(i), jnp.asarray(n)))
    b = np.asarray(vmath.reflect(jnp.asarray(i), jnp.asarray(-n)))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_refract_snell():
    # 45 deg into denser medium (eta = 1/1.5)
    i = jnp.array([[1.0, -1.0, 0.0]]) / np.sqrt(2)
    n = jnp.array([[0.0, 1.0, 0.0]])
    r, tir = vmath.refract(i, n, jnp.array([1 / 1.5]))
    r = np.asarray(r)[0]
    assert not bool(np.asarray(tir)[0])
    sin_in = np.sqrt(0.5)
    sin_out = abs(r[0]) / np.linalg.norm(r)
    np.testing.assert_allclose(sin_out, sin_in / 1.5, atol=1e-6)


def test_refract_tir():
    # shallow ray exiting dense medium -> TIR
    i = jnp.array([[0.99, -0.14106735, 0.0]])
    n = jnp.array([[0.0, 1.0, 0.0]])
    r, tir = vmath.refract(i, n, jnp.array([1.5]))
    assert bool(np.asarray(tir)[0])
    np.testing.assert_allclose(np.asarray(r)[0], 0.0)


def test_onb_orthonormal():
    rng = np.random.default_rng(3)
    n = rng.normal(size=(64, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    t, b = vmath.onb(jnp.asarray(n))
    t, b = np.asarray(t), np.asarray(b)
    np.testing.assert_allclose(np.sum(t * n, -1), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.sum(b * n, -1), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.sum(t * b, -1), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(t, axis=1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(b, axis=1), 1.0, atol=1e-5)


def test_luminance_weights():
    assert abs(float(vmath.luminance(jnp.array([1.0, 1.0, 1.0]))) - 1.0) < 1e-6
    assert abs(float(vmath.luminance(jnp.array([1.0, 0, 0]))) - 0.2126) < 1e-6
