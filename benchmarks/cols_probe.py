"""Quantify packet-sweep waste: columns a tile visits vs what its rays need.

For a REAL bounce-1 batch (cosine-scattered around true geometric normals
of first hits), computes from the schedule + final best_t:
  - per-tile visited-columns LOWER bound  = #(st_col < max_ray best_t)
  - per-ray needed-columns               = #(st_col < best_t_ray)
The gap between tile-visited and mean ray-needed is the straggler/union
waste a two-phase re-queued sweep could reclaim (docs/PERF.md 0.15).

Usage: python benchmarks/cols_probe.py   (TPU; BENCH_* env to scale)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    if os.environ.get("PT_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("PATHTRACER_CACHE",
                       os.path.expanduser("~/.cache/pathtracer-jax")))

    w = int(os.environ.get("BENCH_WIDTH", 1920))
    h = int(os.environ.get("BENCH_HEIGHT", 1080))
    tris = int(os.environ.get("BENCH_TRIS", 262_000))

    from pathtracer.accel.cluster import build_scene_clusters
    from pathtracer.integrator import camera as cam_mod
    from pathtracer.integrator.camera import Camera
    from pathtracer.kernels import packet
    from pathtracer.sampling import rng as rng_mod
    from pathtracer.scene.procedural import sponza_like
    from pathtracer.utils import vmath

    scene = build_scene_clusters(sponza_like(target_tris=tris).finalize())
    cam = Camera(position=(3.0, 4.5, 6.0))
    cam.look_at((14.0, 3.0, 6.0))
    cs = cam.state()
    n = w * h
    pix = jnp.arange(n, dtype=jnp.int32)
    samp = jnp.zeros((n,), jnp.uint32)
    o, d = cam_mod.generate_primary_rays(cs, w, h, 70.0, pix, samp, 0)

    accel = scene.clusters_fine  # bounce rays ride the median accel now

    @jax.jit
    def bounce_batch(o, d):
        hit = packet.intersect_clusters(accel, o, d, 1e-3, 1e20,
                                        backend="pallas", sort_rays=False)
        live = jnp.isfinite(hit.t)
        tri = jnp.maximum(hit.tri, 0)
        v0, v1, v2 = scene.tri_vertices(tri)
        gn = vmath.normalize(jnp.cross(v1 - v0, v2 - v0))
        gn = jnp.where(jnp.sum(gn * d, axis=-1, keepdims=True) > 0, -gn, gn)
        p = o + hit.t[:, None] * d
        u1, u2 = rng_mod.uniform2(pix.astype(jnp.uint32), samp, 7, 0, 0)
        t_, b_ = vmath.onb(gn)
        r = jnp.sqrt(u1)
        phi = 2 * jnp.pi * u2
        local = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi),
                           jnp.sqrt(jnp.maximum(0.0, 1 - u1))], axis=-1)
        d2 = vmath.normalize(local[:, 0:1] * t_ + local[:, 1:2] * b_
                             + local[:, 2:3] * gn)
        o2 = jnp.where(live[:, None], p + gn * 1e-3, jnp.full_like(p, 1e30))
        d2 = jnp.where(live[:, None], d2, jnp.array([[0.0, 0.0, 1.0]]))
        return o2, d2

    o2, d2 = jax.block_until_ready(bounce_batch(o, d))

    tile_rays = packet.TILE_RAYS

    @jax.jit
    def schedule_stats(o2, d2):
        order, _ = packet._coherence_order(accel, o2, d2, 2)
        o_s = o2[order]
        d_s = d2[order]
        n_tiles = n // tile_rays
        tile_tnear = packet._tile_cull(accel, o_s, d_s, 1e-3, 1e20,
                                       n_tiles, tile_rays)
        st, _ = packet._sorted_schedule(tile_tnear, 1)
        hit = packet.intersect_clusters(accel, o_s, d_s, 1e-3, 1e20,
                                        backend="pallas", sort_rays=False)
        cap = packet._scene_exit(accel, o_s, d_s, 1e20)
        best = jnp.minimum(jnp.where(jnp.isfinite(hit.t), hit.t, jnp.inf),
                           cap).reshape(n_tiles, tile_rays)
        live = (o_s[:, 0] < 1e29).reshape(n_tiles, tile_rays)
        tile_live = jnp.any(live, axis=1)
        # per-tile visited lower bound: columns whose entry < max best_t
        vis = jnp.sum(st < jnp.max(jnp.where(live, best, 0.0), axis=1,
                                   keepdims=True), axis=1)

        # per-ray needed columns, chunked over tiles to bound transients
        def need_block(args):
            st_b, best_b = args
            return jnp.sum(st_b[:, None, :] < best_b[:, :, None], axis=2)

        cb = 512
        pad = (-n_tiles) % cb
        st_p = jnp.concatenate(
            [st, jnp.full((pad, st.shape[1]), jnp.inf)], 0) if pad else st
        best_p = jnp.concatenate(
            [best, jnp.zeros((pad, tile_rays))], 0) if pad else best
        nb = st_p.shape[0] // cb
        need = jax.lax.map(
            need_block,
            (st_p.reshape(nb, cb, -1), best_p.reshape(nb, cb, tile_rays)))
        need = need.reshape(-1, tile_rays)[:n_tiles]
        return (jnp.where(tile_live, vis, 0),
                jnp.where(live, need, 0), tile_live, live)

    vis, need, tile_live, live = jax.block_until_ready(
        schedule_stats(o2, d2))
    vis = np.asarray(vis)[np.asarray(tile_live)]
    need = np.asarray(need)[np.asarray(live)]
    print(f"tiles live {vis.size}, rays live {need.size}")
    print(f"tile visited-cols LB: mean {vis.mean():.1f}  p50 "
          f"{np.percentile(vis, 50):.0f}  p90 {np.percentile(vis, 90):.0f}"
          f"  p99 {np.percentile(vis, 99):.0f}  max {vis.max()}")
    print(f"ray needed-cols:      mean {need.mean():.1f}  p50 "
          f"{np.percentile(need, 50):.0f}  p90 {np.percentile(need, 90):.0f}"
          f"  p99 {np.percentile(need, 99):.0f}")
    print(f"per-ray columns: packet {vis.sum() / max(1, need.size) * tile_rays:.1f}"
          f" (tile cols amortized over live rays) vs ideal {need.mean():.1f}"
          f"  -> waste x{vis.sum() * tile_rays / max(1, need.size) / max(1e-9, need.mean()):.2f}")


if __name__ == "__main__":
    main()
