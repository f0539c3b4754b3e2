"""Packet (tile) traversal exactness vs the brute-force oracle.

Same contract as tests/test_lbvh.py (SURVEY.md par.4.1: "the brute-force
intersector IS the mock"): identical hit triangle ids, near-equal distances,
identical occlusion bits - across random soups, duplicate centroids, tiny
scenes, and ray counts that don't divide the tile size.
"""

import jax.numpy as jnp
import numpy as np

from pathtracer.accel.cluster import build_clusters
from pathtracer.kernels.intersect import intersect_brute, occluded_brute
from pathtracer.kernels.packet import (intersect_clusters,
                                       occluded_clusters)


def _check_match(v0, v1, v2, o, d, max_clusters=64):
    accel = build_clusters(jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
                           max_clusters=max_clusters)
    hp = intersect_clusters(accel, jnp.asarray(o), jnp.asarray(d), 1e-3, 1e20)
    hr = intersect_brute(jnp.asarray(o), jnp.asarray(d), jnp.asarray(v0),
                         jnp.asarray(v1), jnp.asarray(v2), 1e-3, 1e20)
    np.testing.assert_array_equal(np.asarray(hp.tri), np.asarray(hr.tri))
    both = np.asarray(hp.tri) >= 0
    np.testing.assert_allclose(np.asarray(hp.t)[both], np.asarray(hr.t)[both],
                               rtol=1e-4, atol=1e-5)


def test_packet_matches_bruteforce(random_tri_soup, random_rays):
    v0, v1, v2 = random_tri_soup
    o, d = random_rays
    _check_match(v0, v1, v2, o, d)


def test_packet_single_cluster(random_tri_soup, random_rays):
    """Everything in one cluster degenerates to dense brute force."""
    v0, v1, v2 = random_tri_soup
    o, d = random_rays
    _check_match(v0, v1, v2, o, d, max_clusters=1)


def test_packet_occlusion_matches(random_tri_soup, random_rays):
    v0, v1, v2 = random_tri_soup
    o, d = random_rays
    accel = build_clusters(jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
                           max_clusters=64)
    t_max = jnp.full(len(o), 2.0, jnp.float32)
    op = np.asarray(occluded_clusters(accel, jnp.asarray(o), jnp.asarray(d),
                                      t_max))
    obr = np.asarray(occluded_brute(jnp.asarray(o), jnp.asarray(d), t_max,
                                    jnp.asarray(v0), jnp.asarray(v1),
                                    jnp.asarray(v2)))
    np.testing.assert_array_equal(op, obr)


def test_packet_ragged_ray_count(random_tri_soup):
    """Ray counts that don't divide TILE_RAYS are padded correctly."""
    v0, v1, v2 = random_tri_soup
    rng = np.random.default_rng(3)
    for n in (1, 7, 255, 257, 1000):
        o = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        _check_match(v0, v1, v2, o, d)


def test_packet_tiny_scenes(random_rays):
    o, d = random_rays
    rng = np.random.default_rng(9)
    for t in (1, 2, 3, 17):
        v0 = rng.uniform(-1, 1, (t, 3)).astype(np.float32)
        v1 = v0 + rng.uniform(-0.5, 0.5, (t, 3)).astype(np.float32)
        v2 = v0 + rng.uniform(-0.5, 0.5, (t, 3)).astype(np.float32)
        _check_match(v0, v1, v2, o, d)


def test_packet_duplicate_centroids(random_rays):
    o, d = random_rays
    rng = np.random.default_rng(5)
    base = rng.uniform(-1, 1, (10, 3)).astype(np.float32)
    v0 = np.repeat(base, 8, axis=0)
    off = rng.uniform(-0.2, 0.2, (80, 3)).astype(np.float32)
    v1 = v0 + off
    v2 = v0 - off + rng.uniform(-0.1, 0.1, (80, 3)).astype(np.float32)
    _check_match(v0, v1, v2, o, d)
