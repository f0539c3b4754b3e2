"""Schedule-quality A/B across accel builds, platform-independent.

The binding frame cost is (swept columns) x (fixed cost/column)
(docs/PERF.md 0.10/0.21), and the COLUMN COUNT a build+schedule yields
is a pure function of geometry - it is identical on CPU and TPU. So
this probe compares cluster builds (median / sahleaf / morton / sah) by
their per-tile visited-column totals on the true workload (primary +
bounce-1 batches of the headline scene) WITHOUT needing the chip: run
it on CPU to pick the build, confirm ms/frame on TPU once.

Usage:
  JAX_PLATFORMS=cpu python benchmarks/quality_ab.py
  env: BENCH_WIDTH/HEIGHT/TRIS, QUALITY_METHODS=median,sahleaf
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def batch_stats(accel, o, d, scene, label):
    """Total/mean visited sweep columns for one ray batch on one accel.

    QUALITY_DB sets the coherence-key dir_bits (production: closest
    bounce batches use PT_CLOSEST_DB=3); QUALITY_STAGES filters which
    batches run (comma list of primary,bounce1,shadow0)."""
    from pathtracer.kernels import packet

    db = int(os.environ.get("QUALITY_DB", "2"))

    tile_rays = packet.TILE_RAYS
    n = o.shape[0]
    n_tiles = n // tile_rays

    nosort = os.environ.get("QUALITY_NOSORT") == "1"

    @jax.jit
    def stats(o, d):
        if nosort:
            order = jnp.arange(o.shape[0], dtype=jnp.int32)
        else:
            order, _ = packet._coherence_order(accel, o, d, db)
        o_s, d_s = o[order], d[order]
        tile_tnear = packet._tile_cull(accel, o_s, d_s, 1e-3, 1e20,
                                       n_tiles, tile_rays)
        st, _ = packet._sorted_schedule(tile_tnear, 1)
        hit = packet.intersect_clusters(accel, o_s, d_s, 1e-3, 1e20,
                                        backend="xla", sort_rays=False)
        cap = packet._scene_exit(accel, o_s, d_s, 1e20)
        best = jnp.minimum(jnp.where(jnp.isfinite(hit.t), hit.t, jnp.inf),
                           cap).reshape(n_tiles, tile_rays)
        live = (o_s[:, 0] < 1e29).reshape(n_tiles, tile_rays)
        tile_live = jnp.any(live, axis=1)
        vis = jnp.sum(st < jnp.max(jnp.where(live, best, 0.0), axis=1,
                                   keepdims=True), axis=1)
        return jnp.where(tile_live, vis, 0), tile_live

    vis, tile_live = jax.block_until_ready(stats(o, d))
    vis = np.asarray(vis)[np.asarray(tile_live)]
    print(f"  {label}: total cols {vis.sum()}  mean/tile {vis.mean():.1f}"
          f"  p90 {np.percentile(vis, 90):.0f}  live tiles {vis.size}")
    return int(vis.sum())


def occl_stats(accel, o, d, t_max, label):
    """Finite schedule length per live tile on a shadow batch.

    The occlusion sweep walks its whole finite schedule for any tile
    with one open ray (ordering is a dead axis, docs/PERF.md 0.23) and
    only ~4% of tiles fully block, so the t_max-capped cull length IS
    the occlusion column count to ~4%."""
    from pathtracer.kernels import packet

    tile_rays = packet.TILE_RAYS
    n = o.shape[0] - (o.shape[0] % packet.TILE_RAYS)
    o, d, t_max = o[:n], d[:n], t_max[:n]
    n_tiles = n // tile_rays

    @jax.jit
    def stats(o, d, tm):
        order, _ = packet._coherence_order(
            accel, o, d, 2, scheme=os.environ.get("PT_KEY_SCHEME_OCCL", "firstcluster"))
        o_s, d_s, t_s = o[order], d[order], tm[order]
        tile_tnear = packet._tile_cull(accel, o_s, d_s, 0.0, t_s,
                                       n_tiles, tile_rays)
        live = jnp.any((o_s[:, 0] < 1e29).reshape(n_tiles, tile_rays),
                       axis=1)
        fn = jnp.sum(jnp.isfinite(tile_tnear), axis=1)
        return jnp.where(live, fn, 0), live

    vis, tile_live = jax.block_until_ready(stats(o, d, t_max))
    vis = np.asarray(vis)[np.asarray(tile_live)]
    print(f"  {label}: total cols {vis.sum()}  mean/tile {vis.mean():.1f}"
          f"  p90 {np.percentile(vis, 90):.0f}  live tiles {vis.size}")
    return int(vis.sum())


def main():
    # Column counts are platform-independent; ALWAYS run off-chip. The
    # axon plugin overrides the JAX_PLATFORMS env var, so force it here.
    jax.config.update("jax_platforms",
                      os.environ.get("PT_PLATFORM", "cpu"))
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("PATHTRACER_CACHE",
                       os.path.expanduser("~/.cache/pathtracer-jax")))

    w = int(os.environ.get("BENCH_WIDTH", 640))
    h = int(os.environ.get("BENCH_HEIGHT", 360))
    tris = int(os.environ.get("BENCH_TRIS", 262_000))
    methods = os.environ.get("QUALITY_METHODS",
                             "median,sahleaf,sahdeep").split(",")

    from pathtracer.accel.cluster import build_clusters
    from pathtracer.integrator import camera as cam_mod
    from pathtracer.integrator.camera import Camera
    from pathtracer.kernels import packet
    from pathtracer.sampling import rng as rng_mod
    from pathtracer.scene.procedural import sponza_like
    from pathtracer.utils import vmath

    scene = sponza_like(target_tris=tris).finalize()
    cam = Camera(position=(3.0, 4.5, 6.0))
    cam.look_at((14.0, 3.0, 6.0))
    cs = cam.state()
    n = w * h
    # production pixel order: swizzled 8x8 blocks (render.py), so the
    # QUALITY_NOSORT=1 baseline measures the true unsorted-primary path
    from pathtracer.render import _swizzled_pixel_ids
    pix = _swizzled_pixel_ids(w, h)
    if pix is None:
        pix = jnp.arange(n, dtype=jnp.int32)
    samp = jnp.zeros((n,), jnp.uint32)
    o, d = cam_mod.generate_primary_rays(cs, w, h, 70.0, pix, samp, 0)

    tri_ids = jnp.arange(scene.n_tris)
    v0a, v1a, v2a = scene.tri_vertices(tri_ids)

    # bounce batch from EXACT hits (method-independent): cosine-scatter
    # around geometric normals of the first hits, dead lanes parked
    accel0 = build_clusters(v0a, v1a, v2a, 2048, method=methods[0])

    @jax.jit
    def bounce_batch(o, d):
        hit = packet.intersect_clusters(accel0, o, d, 1e-3, 1e20,
                                        backend="xla")
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

    # bounce-0 NEE shadow batch for the occlusion-accel comparison
    # (hits are exact, so the batch is method-independent)
    import dataclasses

    import occl_order_ab
    scene_s = dataclasses.replace(scene, clusters_fine=accel0)
    so, sd, stx = occl_order_ab.shadow_batch(scene_s, w, h)

    stages = os.environ.get("QUALITY_STAGES",
                            "primary,bounce1,shadow0").split(",")
    results = {}
    for m in methods:
        accel = build_clusters(v0a, v1a, v2a, 2048, method=m)
        c = accel.n_clusters
        k = accel.tris_per_cluster
        fill = scene.n_tris / (c * k)
        print(f"method={m}: C={c} K={k} fill={fill:.2f}")
        p = batch_stats(accel, o, d, scene, "primary") \
            if "primary" in stages else 1
        b = batch_stats(accel, o2, d2, scene, "bounce1") \
            if "bounce1" in stages else 1
        s = occl_stats(accel, so, sd, stx, "shadow0") \
            if "shadow0" in stages else 1
        results[m] = (p, b, s)

    base = methods[0]
    for m in methods[1:]:
        p0, b0, s0 = results[base]
        p1, b1, s1 = results[m]
        print(f"{m} vs {base}: primary x{p0 / max(1, p1):.2f} "
              f"bounce x{b0 / max(1, b1):.2f} "
              f"shadow x{s0 / max(1, s1):.2f}")


if __name__ == "__main__":
    main()
