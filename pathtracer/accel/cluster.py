"""Cluster acceleration structure for packet (tile) traversal.

The TPU-native replacement for the driver-built BVH (core/accel.h:21-45)
shaped by measured v5e microbenchmarks (benchmarks/micro_tpu.py):

- dense ray-AABB slab tests run at ~256 Gtests/s on the VPU;
- gathers of WIDE rows from SMALL tables run near memory speed
  (~290 GB/s from a 1024-row table), while per-ray gathers from large
  tables crawl at ~9 GB/s;
- therefore: keep the spatial index SMALL and FLAT (<= ~2048 clusters),
  test it densely, and fetch triangle data in large per-TILE blocks
  instead of per-ray pointers.

Build (all jittable XLA ops, runs on-device - the "driver" is XLA):
1. Morton-sort triangles by centroid (accel/morton.py), so consecutive
   triangles are spatially local.
2. Chunk the sorted order into clusters of K triangles (K chosen so the
   cluster count C <= max_clusters). Cluster AABBs are reshape+min/max.
3. Pre-bake each cluster's triangles as one wide row:
   [C, K, 12] f32 = (v0, e1, e2, orig_tri_id + 1, pad2) per triangle -
   the Moller-Trumbore-ready layout fetched per (tile, cluster) visit.

Padding triangles are placed at +1e30 with zero edges: their AABB never
passes a slab test against any finite ray segment and their determinant is
exactly 0, so they can never produce hits.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from pathtracer.accel import morton as morton_mod
from pathtracer.scene.types import Scene

_PAD_POS = 1e30


def _choose_k(n_tris: int, max_clusters: int, min_k: int = 128) -> int:
    """Smallest power-of-two cluster size >= min_k with <= max_clusters.

    min_k defaults to 128 = the VPU lane width: the Pallas sweep kernel
    DMAs one [12, K] block per visit and tests it as a full-width
    [R, K] vector op, so K < 128 only wastes lanes and forces unaligned
    lane-sliced DMAs (which Mosaic rejects).
    """
    k = min_k
    while (n_tris + k - 1) // k > max_clusters:
        k *= 2
    return k


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ClusterAccel:
    """Flat two-level accel: C cluster AABBs + pre-baked triangle blocks."""

    aabb_lo: jnp.ndarray   # f32 [C, 3]
    aabb_hi: jnp.ndarray   # f32 [C, 3]
    blocks: jnp.ndarray    # f32 [C, K, 12]: v0, e1, e2, tri_id+1, pad, pad
    # Component-major copy for the Pallas sweep kernel: triangles on the
    # lane axis, one [16, K] block DMA'd per (tile, cluster) visit (rows
    # 0-9 = v0, e1, e2, id_bits; rows 10-15 pad to the 8-sublane tiling).
    blocks_t: jnp.ndarray  # f32 [C, 16, K]

    @property
    def n_clusters(self) -> int:
        return self.aabb_lo.shape[0]

    @property
    def tris_per_cluster(self) -> int:
        return self.blocks.shape[1]


def build_clusters(v0, v1, v2, max_clusters: int = 512,
                   min_k: int = 128) -> ClusterAccel:
    """Build the cluster accel over triangles v0/v1/v2: f32[T, 3]."""
    t = v0.shape[0]
    k = _choose_k(t, max_clusters, min_k)
    pad = (-t) % k

    centroids = (v0 + v1 + v2) / 3.0
    codes = morton_mod.morton_codes(centroids)
    order = jnp.argsort(codes, stable=True).astype(jnp.int32)

    sv0 = v0[order]
    sv1 = v1[order]
    sv2 = v2[order]
    sid = order

    if pad:
        padv = jnp.full((pad, 3), _PAD_POS, jnp.float32)
        pad0 = jnp.full((pad, 3), _PAD_POS, jnp.float32)
        sv0 = jnp.concatenate([sv0, padv])
        sv1 = jnp.concatenate([sv1, pad0])   # e1 = v1 - v0 = 0 for pads
        sv2 = jnp.concatenate([sv2, pad0])
        sid = jnp.concatenate(
            [sid, jnp.full((pad,), -1, jnp.int32)])
        # make pad edges exactly zero
        sv1 = sv1.at[t:].set(sv0[t:])
        sv2 = sv2.at[t:].set(sv0[t:])

    c = sv0.shape[0] // k

    lo = jnp.minimum(jnp.minimum(sv0, sv1), sv2).reshape(c, k, 3)
    hi = jnp.maximum(jnp.maximum(sv0, sv1), sv2).reshape(c, k, 3)
    # padded tris sit at +1e30: exclude them from real clusters' bounds by
    # construction (they only share a cluster with real tris in the last
    # cluster; their AABB inflates it to 1e30 - avoid by masking).
    if pad:
        valid = (sid >= 0).reshape(c, k, 1)
        lo = jnp.where(valid, lo, jnp.inf)
        hi = jnp.where(valid, hi, -jnp.inf)
    aabb_lo = jnp.min(lo, axis=1)
    aabb_hi = jnp.max(hi, axis=1)
    if pad:
        # fully-padded clusters (when pad >= k): finite far-away box
        empty = jnp.all(~valid, axis=1)[..., 0] if pad else None
        aabb_lo = jnp.where(empty[:, None], _PAD_POS, aabb_lo)
        aabb_hi = jnp.where(empty[:, None], _PAD_POS, aabb_hi)

    # Triangle ids ride as FLOAT VALUES (id + 1; exact below 2^24), never
    # as bitcast integers: small int bit patterns are f32 denormals and
    # TPU vector units flush denormals to zero (and canonicalize NaNs),
    # silently corrupting bit-smuggled payloads.
    id_val = (sid + 1).astype(jnp.float32)
    rows = jnp.concatenate(
        [sv0, sv1 - sv0, sv2 - sv0, id_val[:, None],
         jnp.zeros((sv0.shape[0], 2), jnp.float32)], axis=1)
    blocks = rows.reshape(c, k, 12)

    bt = jnp.swapaxes(blocks, 1, 2)                     # [C, 12, K]
    bt = jnp.concatenate(
        [bt, jnp.zeros((c, 4, k), jnp.float32)], axis=1)  # row-pad to 16
    return ClusterAccel(aabb_lo=aabb_lo, aabb_hi=aabb_hi, blocks=blocks,
                        blocks_t=bt)


def build_scene_clusters(scene: Scene, max_clusters: int = 512) -> Scene:
    """Attach a ClusterAccel to the scene (packet-traversal accel)."""
    tri_ids = jnp.arange(scene.n_tris)
    v0, v1, v2 = scene.tri_vertices(tri_ids)
    return dataclasses.replace(
        scene, clusters=build_clusters(v0, v1, v2, max_clusters))
