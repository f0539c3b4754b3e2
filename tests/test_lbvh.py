"""LBVH build + traversal property tests vs the brute-force oracle.

SURVEY.md par.4.1: "the BVH must be *exact* ... the brute-force intersector
IS the mock". Every test asserts bitwise agreement of hit triangle ids and
near-equality of distances.
"""

import jax.numpy as jnp
import numpy as np

from pathtracer.accel import morton
from pathtracer.accel.lbvh import build_lbvh
from pathtracer.kernels.intersect import intersect_brute, occluded_brute
from pathtracer.kernels.traverse import intersect_bvh, occluded_bvh


def _as_mesh(v0, v1, v2):
    t = len(v0)
    verts = np.stack([v0, v1, v2], 1).reshape(-1, 3)
    idx = np.arange(3 * t).reshape(t, 3).astype(np.int32)
    return jnp.asarray(verts), jnp.asarray(idx)


def _check_match(v0, v1, v2, o, d):
    verts, idx = _as_mesh(v0, v1, v2)
    bvh = build_lbvh(jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2))
    hb = intersect_bvh(bvh, idx, verts, jnp.asarray(o), jnp.asarray(d),
                       1e-3, 1e20)
    hr = intersect_brute(jnp.asarray(o), jnp.asarray(d), jnp.asarray(v0),
                         jnp.asarray(v1), jnp.asarray(v2), 1e-3, 1e20)
    np.testing.assert_array_equal(np.asarray(hb.tri), np.asarray(hr.tri))
    both = np.asarray(hb.tri) >= 0
    np.testing.assert_allclose(np.asarray(hb.t)[both], np.asarray(hr.t)[both],
                               rtol=1e-4, atol=1e-5)
    return bvh, verts, idx


def test_bvh_structure_valid(random_tri_soup):
    v0, v1, v2 = random_tri_soup
    bvh = build_lbvh(jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2))
    n = len(v0)
    tri = np.asarray(bvh.tri_id)
    assert tri.shape[0] == 2 * n - 1
    # every triangle appears exactly once as a leaf
    leaves = np.sort(tri[tri >= 0])
    np.testing.assert_array_equal(leaves, np.arange(n))
    # links stay in range
    for link in (np.asarray(bvh.hit_link), np.asarray(bvh.miss_link)):
        assert ((link >= -1) & (link < 2 * n - 1)).all()
    # child AABBs are contained in the root AABB
    lo = np.asarray(bvh.aabb_min)
    hi = np.asarray(bvh.aabb_max)
    assert (lo >= lo[0] - 1e-5).all() and (hi <= hi[0] + 1e-5).all()


def test_bvh_matches_bruteforce(random_tri_soup, random_rays):
    v0, v1, v2 = random_tri_soup
    o, d = random_rays
    _check_match(v0, v1, v2, o, d)


def test_bvh_occlusion_matches(random_tri_soup, random_rays):
    v0, v1, v2 = random_tri_soup
    o, d = random_rays
    verts, idx = _as_mesh(v0, v1, v2)
    bvh = build_lbvh(jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2))
    t_max = jnp.full(len(o), 2.0, jnp.float32)
    ob = np.asarray(occluded_bvh(bvh, idx, verts, jnp.asarray(o),
                                 jnp.asarray(d), t_max))
    obr = np.asarray(occluded_brute(jnp.asarray(o), jnp.asarray(d), t_max,
                                    jnp.asarray(v0), jnp.asarray(v1),
                                    jnp.asarray(v2)))
    np.testing.assert_array_equal(ob, obr)


def test_bvh_duplicate_morton_codes(random_rays):
    """Coincident centroids (identical Morton codes) must still build an
    exact tree - exercises the Karras index-augmented delta."""
    o, d = random_rays
    rng = np.random.default_rng(5)
    base = rng.uniform(-1, 1, (10, 3)).astype(np.float32)
    # 8 triangles per location, same centroid
    v0 = np.repeat(base, 8, axis=0)
    off = rng.uniform(-0.2, 0.2, (80, 3)).astype(np.float32)
    v1 = v0 + off
    v2 = v0 - off + rng.uniform(-0.1, 0.1, (80, 3)).astype(np.float32)
    # recentre so centroids coincide exactly in quantization
    _check_match(v0, v1, v2, o, d)


def test_bvh_tiny_trees(random_rays):
    o, d = random_rays
    rng = np.random.default_rng(9)
    for t in (1, 2, 3, 5):
        v0 = rng.uniform(-1, 1, (t, 3)).astype(np.float32)
        v1 = v0 + rng.uniform(-0.5, 0.5, (t, 3)).astype(np.float32)
        v2 = v0 + rng.uniform(-0.5, 0.5, (t, 3)).astype(np.float32)
        _check_match(v0, v1, v2, o, d)


def test_morton_ordering():
    """Morton codes sort near points near each other: the code of the
    all-low corner < mixed < all-high corner."""
    pts = jnp.asarray(np.array([
        [0.01, 0.01, 0.01], [0.99, 0.99, 0.99], [0.5, 0.5, 0.5]],
        np.float32))
    codes = np.asarray(morton.morton_codes(
        pts, lo=jnp.zeros(3), hi=jnp.ones(3)))
    assert codes[0] < codes[2] < codes[1]


def test_morton_interleave_exact():
    got = int(np.asarray(morton.morton3d(
        jnp.asarray([1], jnp.uint32), jnp.asarray([0], jnp.uint32),
        jnp.asarray([0], jnp.uint32)))[0])
    assert got == 0b100
    got = int(np.asarray(morton.morton3d(
        jnp.asarray([0], jnp.uint32), jnp.asarray([0], jnp.uint32),
        jnp.asarray([3], jnp.uint32)))[0])
    assert got == 0b1001
