"""Stackless threaded-BVH traversal (XLA vectorized).

Replaces the hardware BVH traversal behind `traceRayEXT` (raygen.rgen:129)
and the shadow `rayQueryEXT` walk (raygen.rgen:206-231). The Bvh from
accel/lbvh.py is threaded: every node knows where traversal goes on AABB hit
(`hit_link` - its first child, or for leaves the subtree-skip) and on miss
(`miss_link`). Traversal is therefore a single per-ray pointer chase with NO
stack - ideal for a lockstep SPMD machine: the whole ray batch advances one
node per iteration of a `lax.while_loop`, with gathers for node data and
jnp.where merges instead of SIMT divergence.

Closest-hit keeps per-ray best (t, tri, u, v); shadow traversal early-outs
lanes as soon as a front-facing occluder is found (backface-skip policy of
raygen.rgen:214-218).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pathtracer.kernels.intersect import Hit, ray_triangle
from pathtracer.scene.types import Bvh
from pathtracer.utils import vmath


def _slab_test(node_lo, node_hi, o, inv_d, t_min, t_max):
    """Ray-AABB slab test. All inputs [N,3]/[N]; returns bool[N]."""
    t1 = (node_lo - o) * inv_d
    t2 = (node_hi - o) * inv_d
    t_near = jnp.max(jnp.minimum(t1, t2), axis=-1)
    t_far = jnp.min(jnp.maximum(t1, t2), axis=-1)
    return (t_near <= t_far) & (t_far >= t_min) & (t_near <= t_max)


def _safe_inv(d):
    """1/d with zero components nudged off zero (keeps slab test NaN-free)."""
    tiny = 1e-20
    d_safe = jnp.where(jnp.abs(d) < tiny, jnp.where(d < 0, -tiny, tiny), d)
    return 1.0 / d_safe


def _like(ref, value, dtype):
    """Constant-filled array deriving data-dependence from `ref`.

    Under shard_map's manual axes, a fresh constant is "unvarying" while the
    while_loop body output is varying - the carry types then mismatch. An
    init derived from a varying input (ref * 0 + value) inherits the varying
    axes and works both inside and outside shard_map.
    """
    return (ref * 0).astype(dtype) + jnp.asarray(value, dtype)


def intersect_bvh(bvh: Bvh, indices, positions, o, d, t_min, t_max) -> Hit:
    """Closest hit for rays o/d [N,3] against the threaded BVH."""
    inv_d = _safe_inv(d)
    # Both o and d contribute: either alone can be replicated under
    # shard_map (e.g. primary-ray origins are the camera position).
    ref = o[..., 0] + d[..., 0]

    state = (
        _like(ref, 0, jnp.int32),                   # node ptr (root = 0)
        _like(ref, t_max, jnp.float32),             # best t
        _like(ref, -1, jnp.int32),                  # best tri
        _like(ref, 0.0, jnp.float32),               # best u
        _like(ref, 0.0, jnp.float32),               # best v
    )

    def cond(state):
        node, *_ = state
        return jnp.any(node >= 0)

    def body(state):
        node, best_t, best_tri, best_u, best_v = state
        live = node >= 0
        ni = jnp.maximum(node, 0)

        lo = bvh.aabb_min[ni]
        hi = bvh.aabb_max[ni]
        box_hit = _slab_test(lo, hi, o, inv_d, t_min, best_t) & live

        tri = bvh.tri_id[ni]
        is_leaf = (tri >= 0) & box_hit

        # Leaf: test the one triangle (all lanes compute, masked merge).
        ti = jnp.maximum(tri, 0)
        idx = indices[ti]
        t, u, v, tri_hit = ray_triangle(
            o, d, positions[idx[..., 0]], positions[idx[..., 1]],
            positions[idx[..., 2]], t_min, best_t)
        better = is_leaf & tri_hit & (t < best_t)
        best_t = jnp.where(better, t, best_t)
        best_tri = jnp.where(better, tri, best_tri)
        best_u = jnp.where(better, u, best_u)
        best_v = jnp.where(better, v, best_v)

        nxt = jnp.where(box_hit, bvh.hit_link[ni], bvh.miss_link[ni])
        node = jnp.where(live, nxt, node)
        return node, best_t, best_tri, best_u, best_v

    _, best_t, best_tri, best_u, best_v = jax.lax.while_loop(
        cond, body, state)
    best_t = jnp.where(best_tri >= 0, best_t, jnp.inf)
    return Hit(t=best_t, tri=best_tri, u=best_u, v=best_v)


def occluded_bvh(bvh: Bvh, indices, positions, o, d, t_max):
    """Any-hit visibility with backface skip (raygen.rgen:210-230).

    Returns bool[N]: True where a front-facing triangle blocks the segment.
    Lanes early-out (pointer -> -1) on the first qualifying hit.
    """
    inv_d = _safe_inv(d)
    ref = o[..., 0] + d[..., 0]

    state = (
        _like(ref, 0, jnp.int32),
        _like(ref, 0, jnp.int32).astype(bool),
    )

    def cond(state):
        node, _ = state
        return jnp.any(node >= 0)

    def body(state):
        node, blocked = state
        live = node >= 0
        ni = jnp.maximum(node, 0)

        lo = bvh.aabb_min[ni]
        hi = bvh.aabb_max[ni]
        box_hit = _slab_test(lo, hi, o, inv_d, 0.0, t_max) & live

        tri = bvh.tri_id[ni]
        is_leaf = (tri >= 0) & box_hit

        ti = jnp.maximum(tri, 0)
        idx = indices[ti]
        v0 = positions[idx[..., 0]]
        v1 = positions[idx[..., 1]]
        v2 = positions[idx[..., 2]]
        t, _, _, tri_hit = ray_triangle(o, d, v0, v1, v2, 0.0, jnp.inf)
        gn = vmath.cross(v1 - v0, v2 - v0)
        front = vmath.dot(d, gn) < 0.0
        newly = is_leaf & tri_hit & front & (t < t_max)
        blocked = blocked | newly

        nxt = jnp.where(box_hit, bvh.hit_link[ni], bvh.miss_link[ni])
        nxt = jnp.where(blocked, -1, nxt)          # early out
        node = jnp.where(live, nxt, node)
        return node, blocked

    _, blocked = jax.lax.while_loop(cond, body, state)
    return blocked
