"""Reversed shadow rays (cfg.shadow_from_light) match the forward scheme.

The NEE shadow test can be traced from the surface toward the light
(raygen.rgen:199-231's direction) or in REVERSE from the sampled light
point toward the surface. The blocked set must be identical: the facing
convention flips (front_sign=-1 in the occlusion kernels), the reversed
origin offset seg_len*1e-3 mirrors the forward tmax pullback, and t>0 /
t<tmax exclude emitter and receiver respectively. These tests pin that
equivalence at the kernel level and end-to-end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer.kernels.intersect import occluded_brute
from pathtracer.kernels.packet import occluded_clusters


def _random_tris(rng, n, lo=0.15, hi=0.85, scale=0.08):
    c = rng.uniform(lo, hi, size=(n, 3)).astype(np.float32)
    e = rng.normal(size=(n, 2, 3)).astype(np.float32) * scale
    v0 = c - e[:, 0] - e[:, 1]
    v1 = c + e[:, 0]
    v2 = c + e[:, 1]
    return (jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2))


def _random_segments(rng, n):
    """Segments crossing the blocker slab: surface z=0 plane to light z=1."""
    a = rng.uniform(0.0, 1.0, size=(n, 3)).astype(np.float32)
    b = rng.uniform(0.0, 1.0, size=(n, 3)).astype(np.float32)
    a[:, 2] = 0.0   # "surface" end
    b[:, 2] = 1.0   # "light" end
    return jnp.asarray(a), jnp.asarray(b)


def _forward(o, target, tri):
    seg = target - o
    seg_len = jnp.sqrt(jnp.sum(seg * seg, axis=1))
    d = seg / seg_len[:, None]
    tmax = seg_len * (1.0 - 1e-3)
    return occluded_brute(o, d, tmax, *tri)


def _reverse(o, target, tri):
    seg = target - o
    seg_len = jnp.sqrt(jnp.sum(seg * seg, axis=1))
    d = seg / seg_len[:, None]
    d_r = -d
    o_r = target + d_r * (seg_len * 1e-3)[:, None]
    tmax = seg_len * (1.0 - 1e-3)
    return occluded_brute(o_r, d_r, tmax, *tri, front_sign=-1.0)


def test_reverse_matches_forward_brute():
    rng = np.random.default_rng(7)
    tri = _random_tris(rng, 300)
    o, target = _random_segments(rng, 2048)
    fwd = np.asarray(_forward(o, target, tri))
    # forward counts blockers front-facing to d; reversed must count the
    # same triangles despite the flipped ray direction
    rev = np.asarray(_reverse(o, target, tri))
    # boundary-epsilon flips are possible in principle; with blockers well
    # inside the slab and these seeds there are none
    assert fwd.sum() > 100          # the test actually exercises blocking
    assert (~fwd).sum() > 100
    np.testing.assert_array_equal(rev, fwd)


def test_reverse_facing_convention():
    """A one-sided blocker: forward-front-facing only, both schemes agree."""
    # single triangle at z=0.5 with geometric normal -z (front-facing to a
    # +z forward shadow ray)
    v0 = jnp.array([[0.0, 0.0, 0.5]])
    v1 = jnp.array([[0.0, 4.0, 0.5]])
    v2 = jnp.array([[4.0, 0.0, 0.5]])   # cross(e1,e2) = (0,0,-16): -z
    tri = (v0, v1, v2)
    o = jnp.array([[0.5, 0.5, 0.0], [0.5, 0.5, 1.0]])
    target = jnp.array([[0.5, 0.5, 1.0], [0.5, 0.5, 0.0]])
    fwd = np.asarray(_forward(o, target, tri))
    rev = np.asarray(_reverse(o, target, tri))
    # lane 0 goes +z (normal opposes d: blocked); lane 1 goes -z (backface
    # skipped: open) - in BOTH schemes
    np.testing.assert_array_equal(fwd, [True, False])
    np.testing.assert_array_equal(rev, [True, False])


def test_reverse_matches_forward_cluster():
    """The packet/cluster backend honors front_sign identically."""
    from pathtracer.accel.cluster import build_clusters
    from pathtracer.scene.procedural import cornell_box

    scene = cornell_box().finalize()
    v0, v1, v2 = scene.tri_vertices(jnp.arange(scene.n_tris))
    accel = build_clusters(v0, v1, v2)

    rng = np.random.default_rng(3)
    n = 512
    o = jnp.asarray(rng.uniform(0.05, 0.95, size=(n, 3)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(0.05, 0.95, size=(n, 3)).astype(np.float32))
    seg = tgt - o
    seg_len = jnp.sqrt(jnp.sum(seg * seg, axis=1))
    d = seg / seg_len[:, None]
    tmax = seg_len * (1.0 - 1e-3)

    brute_fwd = np.asarray(occluded_brute(o, d, tmax, v0, v1, v2))
    d_r = -d
    o_r = tgt + d_r * (seg_len * 1e-3)[:, None]
    clus_rev = np.asarray(occluded_clusters(
        accel, o_r, d_r, tmax, front_sign=-1.0))
    np.testing.assert_array_equal(clus_rev, brute_fwd)


@pytest.mark.parametrize("backend", ["xla"])
def test_end_to_end_image_match(backend):
    """Cornell render: shadow_from_light flips nothing but batch geometry."""
    from pathtracer.accel.cluster import build_scene_clusters
    from pathtracer.config import RenderConfig
    from pathtracer.integrator.camera import Camera
    from pathtracer.render import render_frame
    from pathtracer.scene.procedural import cornell_box

    scene = build_scene_clusters(cornell_box(spheres=True).finalize())
    cam = Camera(position=(0.5, 0.5, -1.2))
    cam.look_at((0.5, 0.5, 0.5))
    base = dict(width=64, height=64, spp=2, max_depth=3,
                intersector="cluster", traversal_backend=backend)
    img_f = np.asarray(render_frame(
        scene, RenderConfig(**base), cam.state(), 0))
    img_r = np.asarray(render_frame(
        scene, RenderConfig(**base, shadow_from_light=True), cam.state(), 0))
    # identical RNG streams; only epsilon-boundary visibility can differ
    diff = np.abs(img_f - img_r).mean()
    assert diff < 1e-4, f"mean abs diff {diff}"
