"""CPU analysis: would sibling-paired DMA fetches pay in the sweep kernel?

The sweep's remaining per-iteration fixed cost (after the slot-coalesced
semaphore wait) is ~cpi DMA *starts*. Fetching aligned PAIRS of fine
clusters (ids 2j, 2j+1 are contiguous in blocks[C,16,K]) would halve the
start count per tested triangle, at the cost of fetching+testing an
unvisited sibling whenever only one member of a pair is scheduled.

This measures, on the true workload shape (sponza_like interior, camera
tiles and scattered bounce tiles after the production coherence sort):
  - sibling coincidence: P(sibling also visited | cluster visited)
  - ALU/DMA-byte inflation of pair granularity: 2*pairs / visited
  - schedule column counts at cpi=12 singles vs cpi=6 pairs

Run on CPU: JAX_PLATFORMS='' python benchmarks/pair_stats.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402


def stats(tile_tnear, cpi_single=12):
    """tile_tnear f32[tiles, C] -> grouping stats dict (g = 1, 2, 4)."""
    vis = np.isfinite(np.asarray(tile_tnear))          # [tiles, C]
    tiles, c = vis.shape
    visited = vis.sum()
    out = {"visited/tile": visited / tiles,
           "cols/tile g=1 cpi=12": np.ceil(vis.sum(axis=1)
                                           / cpi_single).sum() / tiles,
           "dma_starts/tile g=1": visited / tiles}
    for g in (2, 4):
        pad = (-c) % g
        v = np.concatenate([vis, np.zeros((tiles, pad), bool)], axis=1) \
            if pad else vis
        vg = v.reshape(tiles, -1, g)
        grp = vg.any(axis=2)                           # [tiles, C/g]
        fetched = grp.sum()
        out[f"alu_inflation g={g}"] = g * fetched / max(visited, 1)
        out[f"cols/tile g={g} cpi={cpi_single // g}"] = \
            np.ceil(grp.sum(axis=1) / (cpi_single // g)).sum() / tiles
        out[f"dma_starts/tile g={g}"] = fetched / tiles
    return out


def main():
    from pathtracer.accel.cluster import build_scene_clusters
    from pathtracer.kernels import packet
    from pathtracer.scene.procedural import sponza_like

    tris = int(os.environ.get("BENCH_TRIS", 50_000))
    n = int(os.environ.get("BENCH_RAYS", 1 << 15))
    tile_rays = packet.TILE_RAYS

    scene = build_scene_clusters(sponza_like(target_tris=tris).finalize())
    accel = scene.clusters
    c = accel.aabb_lo.shape[0]
    print(f"{scene.n_tris} tris, {c} clusters, {n} rays, "
          f"tile={tile_rays}", flush=True)

    rng = np.random.default_rng(0)

    # camera-like rays: one origin, directions through a grid
    o_cam = np.broadcast_to(np.array([3.0, 4.5, 6.0], np.float32), (n, 3))
    yaw = np.linspace(-0.4, 0.4, 256)
    pitch = np.linspace(-0.25, 0.25, n // 256)
    yy, pp = np.meshgrid(yaw, pitch, indexing="ij")
    base = np.array([0.88, -0.12, 0.0])
    d_cam = np.stack([np.cos(pp.ravel()) * np.cos(yy.ravel() + 0.0),
                      np.sin(pp.ravel()),
                      np.cos(pp.ravel()) * np.sin(yy.ravel())], axis=1)
    d_cam = (d_cam / np.linalg.norm(d_cam, axis=1, keepdims=True)
             ).astype(np.float32)
    _ = base

    # bounce-like rays: cosine hemispheres from random surface points
    idx = rng.integers(0, scene.n_tris, n)
    v0, v1, v2 = (np.asarray(x) for x in
                  scene.tri_vertices(jnp.asarray(idx)))
    b1 = rng.random((n, 1), np.float32)
    b2 = rng.random((n, 1), np.float32) * (1 - b1)
    p = v0 + b1 * (v1 - v0) + b2 * (v2 - v0)
    nrm = np.cross(v1 - v0, v2 - v0)
    nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-20)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    flip = np.sign(np.sum(dirs * nrm, axis=1, keepdims=True))
    d_b = (dirs * np.where(flip == 0, 1.0, flip)).astype(np.float32)
    o_b = (p + 1e-3 * nrm * flip).astype(np.float32)

    for name, o, d, db in (("camera", o_cam, d_cam, 3),
                           ("bounce", o_b, d_b, 3)):
        o, d = jnp.asarray(o), jnp.asarray(d)
        order, _ = packet._coherence_order(accel, o, d, db)
        o, d = o[order], d[order]
        tt = packet._tile_cull(accel, o, d, 1e-3, 1e9, n // tile_rays,
                               tile_rays)
        print(f"-- {name} (dir_bits={db})")
        for k, v in stats(tt).items():
            print(f"   {k}: {v:.2f}", flush=True)


if __name__ == "__main__":
    main()
