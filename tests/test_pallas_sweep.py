"""Pallas sweep kernel exactness vs the brute-force oracle.

Runs the SAME kernel the TPU executes, in Pallas interpret mode on CPU
(kernels/packet._pallas_interpret picks this automatically off-TPU).
Small sizes - interpret mode emulates the DMA/semaphore machinery.
"""

import jax.numpy as jnp
import numpy as np

from pathtracer.accel.cluster import build_clusters
from pathtracer.kernels.intersect import intersect_brute, occluded_brute
from pathtracer.kernels.packet import intersect_clusters, occluded_clusters


def _soup(t, seed=0):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-1, 1, (t, 3)).astype(np.float32)
    v1 = v0 + rng.uniform(-0.3, 0.3, (t, 3)).astype(np.float32)
    v2 = v0 + rng.uniform(-0.3, 0.3, (t, 3)).astype(np.float32)
    return v0, v1, v2


def _rays(n, seed=1):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d


def test_pallas_closest_matches_bruteforce():
    v0, v1, v2 = _soup(300)
    o, d = _rays(700)
    accel = build_clusters(jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
                           max_clusters=16)
    hp = intersect_clusters(accel, jnp.asarray(o), jnp.asarray(d), 1e-3,
                            1e20, backend="pallas")
    hr = intersect_brute(jnp.asarray(o), jnp.asarray(d), jnp.asarray(v0),
                         jnp.asarray(v1), jnp.asarray(v2), 1e-3, 1e20)
    np.testing.assert_array_equal(np.asarray(hp.tri), np.asarray(hr.tri))
    both = np.asarray(hp.tri) >= 0
    assert both.sum() > 0
    np.testing.assert_allclose(np.asarray(hp.t)[both], np.asarray(hr.t)[both],
                               rtol=1e-4, atol=1e-5)


def test_pallas_occlusion_matches_bruteforce():
    v0, v1, v2 = _soup(300)
    o, d = _rays(700)
    accel = build_clusters(jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
                           max_clusters=16)
    t_max = jnp.full(len(o), 2.0, jnp.float32)
    op = np.asarray(occluded_clusters(accel, jnp.asarray(o), jnp.asarray(d),
                                      t_max, backend="pallas"))
    obr = np.asarray(occluded_brute(jnp.asarray(o), jnp.asarray(d), t_max,
                                    jnp.asarray(v0), jnp.asarray(v1),
                                    jnp.asarray(v2)))
    np.testing.assert_array_equal(op, obr)


def test_pallas_ragged_and_tiny():
    v0, v1, v2 = _soup(33, seed=7)
    accel = build_clusters(jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
                           max_clusters=4)
    for n in (1, 130, 257):
        o, d = _rays(n, seed=n)
        hp = intersect_clusters(accel, jnp.asarray(o), jnp.asarray(d), 1e-3,
                                1e20, backend="pallas")
        hr = intersect_brute(jnp.asarray(o), jnp.asarray(d), jnp.asarray(v0),
                             jnp.asarray(v1), jnp.asarray(v2), 1e-3, 1e20)
        np.testing.assert_array_equal(np.asarray(hp.tri), np.asarray(hr.tri))
