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


def test_pallas_cull_block_skip_exact():
    """The supercluster block gate must be bit-exact vs both the ungated
    kernel and the XLA cull (the gate is conservative: a skipped block's
    union AABB misses every ray, so every child entry is +inf anyway).
    Uses a spread-out scene + short t_max so many blocks really skip."""
    import os

    v0, v1, v2 = _soup(3000, seed=11)
    # spread the soup into distant islands so block AABBs separate
    off = (np.arange(3000)[:, None] // 300).astype(np.float32) * 25.0
    v0, v1, v2 = v0 + off, v1 + off, v2 + off
    o, d = _rays(256, seed=12)
    accel = build_clusters(jnp.asarray(v0), jnp.asarray(v1),
                           jnp.asarray(v2), max_clusters=512, min_k=4)
    assert accel.n_clusters >= 256, "need >= 2 lane blocks to gate"
    n_tiles = 256 // packet.TILE_RAYS
    t_max = jnp.full((256,), 40.0, jnp.float32)

    ref = packet._tile_cull(accel, jnp.asarray(o), jnp.asarray(d), 1e-3,
                            t_max, n_tiles, packet.TILE_RAYS)
    legs = {}
    for skip in ("0", "1"):
        os.environ["PT_CULL_SKIP"] = skip
        try:
            legs[skip] = tile_cull(
                accel.aabb_lo, accel.aabb_hi, jnp.asarray(o),
                packet._safe_inv(jnp.asarray(d)), t_max, t_min=1e-3,
                n_tiles=n_tiles, tile_rays=packet.TILE_RAYS,
                interpret=True)
        finally:
            os.environ.pop("PT_CULL_SKIP", None)
    np.testing.assert_array_equal(np.asarray(legs["1"]),
                                  np.asarray(legs["0"]))
    np.testing.assert_array_equal(np.asarray(legs["1"]), np.asarray(ref))


def test_sc_mask_is_conservative():
    """Every finite tile_tnear entry must sit in a masked-on block."""
    from pathtracer.kernels.pallas_cull import LANES, _sc_mask

    v0, v1, v2 = _soup(2000, seed=21)
    o, d = _rays(128, seed=22)
    accel = build_clusters(jnp.asarray(v0), jnp.asarray(v1),
                           jnp.asarray(v2), max_clusters=256, min_k=8)
    n_tiles = 128 // packet.TILE_RAYS
    t_max = jnp.full((128,), 1e20, jnp.float32)
    ref = np.asarray(packet._tile_cull(
        accel, jnp.asarray(o), jnp.asarray(d), 1e-3, t_max, n_tiles,
        packet.TILE_RAYS))

    c = accel.aabb_lo.shape[0]
    pad = (-c) % LANES
    lo = jnp.concatenate([accel.aabb_lo,
                          jnp.full((pad, 3), 1e30, jnp.float32)])
    hi = jnp.concatenate([accel.aabb_hi,
                          jnp.full((pad, 3), 1e30, jnp.float32)])
    ab = jnp.concatenate([lo.T, hi.T])
    blk = 128
    mask = np.asarray(_sc_mask(ab, jnp.asarray(o),
                               packet._safe_inv(jnp.asarray(d)), t_max,
                               1e-3, n_tiles, packet.TILE_RAYS, blk))
    nb = ab.shape[1] // blk
    fin = np.isfinite(np.pad(ref, ((0, 0), (0, pad)),
                             constant_values=np.inf))
    fin_blocks = fin.reshape(n_tiles, nb, blk).any(axis=2)
    assert np.all(mask[:, :nb][fin_blocks] == 1)
