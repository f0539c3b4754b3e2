"""Ray-triangle intersection and brute-force scene intersection.

Replaces the hardware `traceRayEXT`/`rayQueryEXT` traversal the reference
outsources to RT cores (raygen.rgen:129, :207-231; SURVEY.md par.2.2 "GPU
driver AS"). This module holds:

- `ray_triangle`: batched Moller-Trumbore (no backface culling, to match
  the opaque any-orientation hits of the reference's trace flags).
- `intersect_brute`: O(rays x tris) closest-hit - the exactness oracle for
  BVH property tests (SURVEY.md par.4.1) and the fallback for tiny scenes.
- `occluded_brute`: shadow-ray visibility with the reference's backface-skip
  policy (raygen.rgen:214-218: back-facing occluders are ignored).

Both brute-force variants are lax.scan-chunked over triangles so peak memory
stays at rays x chunk instead of rays x tris.

The Hit record convention used across the framework:
  t: f32[N] hit distance (t_max if miss), tri: i32[N] triangle id (-1 miss),
  u, v: f32[N] barycentrics of corners 1 and 2 (closesthit.rchit:75 maps
  bary = (1-u-v, u, v)).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pathtracer.utils import vmath


class Hit(NamedTuple):
    t: jnp.ndarray      # f32 [N]
    tri: jnp.ndarray    # i32 [N], -1 = miss
    u: jnp.ndarray      # f32 [N]
    v: jnp.ndarray      # f32 [N]

    @property
    def valid(self):
        return self.tri >= 0


DET_EPS = 1e-12


def ray_triangle(o, d, v0, v1, v2, t_min, t_max):
    """Moller-Trumbore for broadcastable batches.

    o, d: [..., 3]; v0/v1/v2: [..., 3] (broadcast against rays).
    Returns (t, u, v, hit_mask) with t = +inf where hit_mask is False.
    """
    e1 = v1 - v0
    e2 = v2 - v0
    pvec = vmath.cross(d, e2)
    det = vmath.dot(e1, pvec)
    inv_det = jnp.where(jnp.abs(det) > DET_EPS, 1.0 / det, 0.0)
    tvec = o - v0
    u = vmath.dot(tvec, pvec) * inv_det
    qvec = vmath.cross(tvec, e1)
    v = vmath.dot(d, qvec) * inv_det
    t = vmath.dot(e2, qvec) * inv_det
    hit = ((jnp.abs(det) > DET_EPS)
           & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
           & (t > t_min) & (t < t_max))
    t = jnp.where(hit, t, jnp.inf)
    return t, u, v, hit


def intersect_brute(o, d, tri_v0, tri_v1, tri_v2, t_min, t_max,
                    tri_chunk: int = 256) -> Hit:
    """Closest hit of rays [N,3] against all triangles [T,3] by O(N*T) scan.

    t_max may be a scalar or per-ray [N] (the priming path passes verified
    per-ray bounds).
    """
    n = o.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    n_tris = tri_v0.shape[0]
    pad = (-n_tris) % tri_chunk
    if pad:
        padv = jnp.full((pad, 3), jnp.inf, tri_v0.dtype)
        tri_v0 = jnp.concatenate([tri_v0, padv])
        tri_v1 = jnp.concatenate([tri_v1, padv])
        tri_v2 = jnp.concatenate([tri_v2, padv])
    n_chunks = tri_v0.shape[0] // tri_chunk
    tv0 = tri_v0.reshape(n_chunks, tri_chunk, 3)
    tv1 = tri_v1.reshape(n_chunks, tri_chunk, 3)
    tv2 = tri_v2.reshape(n_chunks, tri_chunk, 3)

    # Carry inits derive data-dependence from the rays (same pattern as
    # render.py's bounce carries): under shard_map with check_vma the
    # scan carry must enter with the same varying-manual-axes type the
    # body produces, and constant inits are unvarying.
    vary = o[:, 0] * 0.0
    init = Hit(
        t=t_max + vary,
        tri=jnp.full((n,), -1, jnp.int32) + vary.astype(jnp.int32),
        u=vary,
        v=vary,
    )

    def body(best, chunk):
        ci, v0c, v1c, v2c = chunk
        # [N, C] tests: rays broadcast against the triangle chunk.
        t, u, v, hit = ray_triangle(
            o[:, None, :], d[:, None, :],
            v0c[None, :, :], v1c[None, :, :], v2c[None, :, :],
            t_min, t_max[:, None])
        t = jnp.where(hit, t, jnp.inf)
        j = jnp.argmin(t, axis=1)
        rows = jnp.arange(n)
        tj = t[rows, j]
        better = tj < best.t
        return Hit(
            t=jnp.where(better, tj, best.t),
            tri=jnp.where(better, (ci * tri_chunk + j).astype(jnp.int32), best.tri),
            u=jnp.where(better, u[rows, j], best.u),
            v=jnp.where(better, v[rows, j], best.v),
        ), None

    chunks = (jnp.arange(n_chunks), tv0, tv1, tv2)
    best, _ = jax.lax.scan(body, init, chunks)
    return best


def occluded_brute(o, d, t_max, tri_v0, tri_v1, tri_v2,
                   tri_chunk: int = 256,
                   want_blocker: bool = False):
    """Any-hit visibility test with backface skip (raygen.rgen:210-230).

    Returns bool[N]: True where the segment (o, d*t_max) is blocked by a
    front-facing triangle. Back-facing occluders are ignored, matching the
    reference's shadow-walk policy (raygen.rgen:215-218).

    want_blocker: also return i32[N] = the id of SOME blocking triangle
    (-1 where unblocked) - the shadow-priming hint (any-hit semantics:
    which blocker is unspecified).
    """
    n_tris = tri_v0.shape[0]
    pad = (-n_tris) % tri_chunk
    if pad:
        padv = jnp.full((pad, 3), jnp.inf, tri_v0.dtype)
        tri_v0 = jnp.concatenate([tri_v0, padv])
        tri_v1 = jnp.concatenate([tri_v1, padv])
        tri_v2 = jnp.concatenate([tri_v2, padv])
    n_chunks = tri_v0.shape[0] // tri_chunk
    tv0 = tri_v0.reshape(n_chunks, tri_chunk, 3)
    tv1 = tri_v1.reshape(n_chunks, tri_chunk, 3)
    tv2 = tri_v2.reshape(n_chunks, tri_chunk, 3)

    def body(carry, chunk):
        blocked, btri = carry
        ci, v0c, v1c, v2c = chunk
        t, _, _, hit = ray_triangle(
            o[:, None, :], d[:, None, :],
            v0c[None, :, :], v1c[None, :, :], v2c[None, :, :],
            0.0, jnp.inf)
        # front-facing to the shadow ray: geometric normal opposes d.
        gn = vmath.cross(v1c - v0c, v2c - v0c)[None, :, :]
        front = vmath.dot(d[:, None, :], gn) < 0.0
        hit = hit & front & (t < t_max[:, None])
        any_hit = jnp.any(hit, axis=1)
        new = any_hit & ~blocked
        j = jnp.argmax(hit, axis=1).astype(jnp.int32)
        btri = jnp.where(new, ci * tri_chunk + j, btri)
        return (blocked | any_hit, btri), None

    # ray-derived carry init: see intersect_brute (shard_map check_vma)
    ivary = (o[:, 0] * 0.0).astype(jnp.int32)
    init = (jnp.zeros(o.shape[0], bool) | (ivary != 0),
            jnp.full(o.shape[0], -1, jnp.int32) + ivary)
    (blocked, btri), _ = jax.lax.scan(
        body, init, (jnp.arange(n_chunks), tv0, tv1, tv2))
    return (blocked, btri) if want_blocker else blocked
