"""Moller-Trumbore and brute-force intersector tests."""

import jax.numpy as jnp
import numpy as np

from pathtracer.kernels import intersect as isect


def test_single_triangle_hit():
    o = jnp.array([[0.25, 0.25, 1.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    v0 = jnp.array([[0.0, 0.0, 0.0]])
    v1 = jnp.array([[1.0, 0.0, 0.0]])
    v2 = jnp.array([[0.0, 1.0, 0.0]])
    t, u, v, hit = isect.ray_triangle(o, d, v0, v1, v2, 1e-4, 1e9)
    assert bool(hit[0])
    np.testing.assert_allclose(float(t[0]), 1.0, atol=1e-6)
    np.testing.assert_allclose([float(u[0]), float(v[0])], [0.25, 0.25],
                               atol=1e-6)


def test_miss_outside_and_behind():
    v0 = jnp.array([[0.0, 0.0, 0.0]])
    v1 = jnp.array([[1.0, 0.0, 0.0]])
    v2 = jnp.array([[0.0, 1.0, 0.0]])
    # outside barycentric range
    o = jnp.array([[2.0, 2.0, 1.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    _, _, _, hit = isect.ray_triangle(o, d, v0, v1, v2, 1e-4, 1e9)
    assert not bool(hit[0])
    # behind the origin
    o = jnp.array([[0.25, 0.25, -1.0]])
    _, _, _, hit = isect.ray_triangle(o, d, v0, v1, v2, 1e-4, 1e9)
    assert not bool(hit[0])


def test_backface_still_hits():
    """The closest-hit path has no backface culling (opaque trace flags)."""
    o = jnp.array([[0.25, 0.25, -1.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    v0 = jnp.array([[0.0, 0.0, 0.0]])
    v1 = jnp.array([[1.0, 0.0, 0.0]])
    v2 = jnp.array([[0.0, 1.0, 0.0]])
    _, _, _, hit = isect.ray_triangle(o, d, v0, v1, v2, 1e-4, 1e9)
    assert bool(hit[0])


def test_brute_closest_of_two():
    v0 = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, -2.0]])
    v1 = jnp.array([[1.0, 0.0, 0.0], [1.0, 0.0, -2.0]])
    v2 = jnp.array([[0.0, 1.0, 0.0], [0.0, 1.0, -2.0]])
    o = jnp.array([[0.25, 0.25, 1.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    hit = isect.intersect_brute(o, d, v0, v1, v2, 1e-4, 1e9)
    assert int(hit.tri[0]) == 0
    np.testing.assert_allclose(float(hit.t[0]), 1.0, atol=1e-6)


def test_brute_t_max_respected():
    v0 = jnp.array([[0.0, 0.0, 0.0]])
    v1 = jnp.array([[1.0, 0.0, 0.0]])
    v2 = jnp.array([[0.0, 1.0, 0.0]])
    o = jnp.array([[0.25, 0.25, 1.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    hit = isect.intersect_brute(o, d, v0, v1, v2, 1e-4, 0.5)
    assert int(hit.tri[0]) == -1


def test_occluded_backface_skip():
    """Shadow rays ignore back-facing occluders (raygen.rgen:214-218)."""
    # triangle with normal +z (CCW as seen from +z)
    v0 = jnp.array([[0.0, 0.0, 0.0]])
    v1 = jnp.array([[1.0, 0.0, 0.0]])
    v2 = jnp.array([[0.0, 1.0, 0.0]])
    t_max = jnp.array([5.0])
    # ray traveling -z: sees the front face -> blocked
    o = jnp.array([[0.25, 0.25, 1.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    assert bool(isect.occluded_brute(o, d, t_max, v0, v1, v2)[0])
    # ray traveling +z: hits the back face -> NOT blocked
    o = jnp.array([[0.25, 0.25, -1.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    assert not bool(isect.occluded_brute(o, d, t_max, v0, v1, v2)[0])
