"""Fused Pallas cull exactness vs the XLA _tile_cull (same contract).

The Pallas cull (kernels/pallas_cull.py) must return bit-identical
tile_tnear to packet._tile_cull on CPU: same slab test, same accept
condition, same entry clamp, same +inf fill. The render-path tests then
exercise it end-to-end (it is the default cull on the Pallas backend).
"""

import jax.numpy as jnp
import numpy as np

from pathtracer.accel.cluster import build_clusters
from pathtracer.kernels import packet
from pathtracer.kernels.pallas_cull import tile_cull


def _soup(t, seed=0):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-1, 1, (t, 3)).astype(np.float32)
    v1 = v0 + rng.uniform(-0.3, 0.3, (t, 3)).astype(np.float32)
    v2 = v0 + rng.uniform(-0.3, 0.3, (t, 3)).astype(np.float32)
    return v0, v1, v2


def _rays(n, seed=1, park_tail=0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    if park_tail:
        o[-park_tail:] = packet._PARK
        d[-park_tail:] = np.array([0.0, 0.0, 1.0], np.float32)
    return o, d


def test_pallas_cull_matches_xla_cull():
    v0, v1, v2 = _soup(500)
    o, d = _rays(512, park_tail=70)
    accel = build_clusters(jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
                           max_clusters=16)
    n_tiles = 512 // packet.TILE_RAYS
    t_max = np.full((512,), 1e20, np.float32)
    t_max[-70:] = 0.0
    o = jnp.asarray(o)
    d = jnp.asarray(d)
    t_max = jnp.asarray(t_max)

    ref = packet._tile_cull(accel, o, d, 1e-3, t_max, n_tiles,
                            packet.TILE_RAYS)
    got = tile_cull(accel.aabb_lo, accel.aabb_hi, o, packet._safe_inv(d),
                    t_max, t_min=1e-3, n_tiles=n_tiles,
                    tile_rays=packet.TILE_RAYS, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_pallas_cull_nonmultiple_lane_clusters():
    """C not a lane multiple exercises the far-box padding path."""
    v0, v1, v2 = _soup(90, seed=3)
    o, d = _rays(128, seed=4)
    accel = build_clusters(jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
                           max_clusters=8)
    n_tiles = 128 // packet.TILE_RAYS
    t_max = jnp.full((128,), 50.0, jnp.float32)
    ref = packet._tile_cull(accel, jnp.asarray(o), jnp.asarray(d), 0.0,
                            t_max, n_tiles, packet.TILE_RAYS)
    got = tile_cull(accel.aabb_lo, accel.aabb_hi, jnp.asarray(o),
                    packet._safe_inv(jnp.asarray(d)), t_max, t_min=0.0,
                    n_tiles=n_tiles, tile_rays=packet.TILE_RAYS,
                    interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
