"""Does batching spp samples into ONE wavefront improve tile quality?

The integrator traces each spp sample as its own 2M-lane wavefront
(render.py fori over spp). Batching S samples multiplies the coherence
sort's pool by S: more similar rays to group into tiles. This probe
measures the tile-quality side off-chip (visited columns per RAY, the
platform-independent cost driver - docs/PERF.md 0.22/0.24): bounce-1
batches for S samples, sorted per-sample (sum of columns) vs sorted as
one pool.

Usage: python benchmarks/sppbatch_probe.py
  env: BENCH_WIDTH/HEIGHT/TRIS, SPP_BATCH (default 4)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def columns(accel, o, d, db):
    from pathtracer.kernels import packet

    tile_rays = packet.TILE_RAYS
    n = o.shape[0] - (o.shape[0] % tile_rays)
    o, d = o[:n], d[:n]
    n_tiles = n // tile_rays

    @jax.jit
    def stats(o, d):
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
        vis = jnp.sum(st < jnp.max(jnp.where(live, best, 0.0), axis=1,
                                   keepdims=True), axis=1)
        return jnp.sum(jnp.where(jnp.any(live, axis=1), vis, 0))

    return int(jax.block_until_ready(stats(o, d)))


def main():
    jax.config.update("jax_platforms",
                      os.environ.get("PT_PLATFORM", "cpu"))
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("PATHTRACER_CACHE",
                       os.path.expanduser("~/.cache/pathtracer-jax")))

    w = int(os.environ.get("BENCH_WIDTH", 480))
    h = int(os.environ.get("BENCH_HEIGHT", 272))
    tris = int(os.environ.get("BENCH_TRIS", 262_000))
    spp = int(os.environ.get("SPP_BATCH", 4))

    from pathtracer.accel.cluster import build_clusters
    from pathtracer.integrator import camera as cam_mod
    from pathtracer.integrator.camera import Camera
    from pathtracer.kernels import packet
    from pathtracer.render import _swizzled_pixel_ids
    from pathtracer.sampling import rng as rng_mod
    from pathtracer.scene.procedural import sponza_like
    from pathtracer.utils import vmath

    scene = sponza_like(target_tris=tris).finalize()
    tri_ids = jnp.arange(scene.n_tris)
    v0a, v1a, v2a = scene.tri_vertices(tri_ids)
    accel = build_clusters(v0a, v1a, v2a, 2048, method="sahsplit")

    cam = Camera(position=(3.0, 4.5, 6.0))
    cam.look_at((14.0, 3.0, 6.0))
    cs = cam.state()
    n = w * h
    pix = _swizzled_pixel_ids(w, h)
    if pix is None:
        pix = jnp.arange(n, dtype=jnp.int32)

    @jax.jit
    def bounce_batch(s):
        samp = jnp.full((n,), s, jnp.uint32)
        o, d = cam_mod.generate_primary_rays(cs, w, h, 70.0, pix, samp, 0)
        hit = packet.intersect_clusters(accel, o, d, 1e-3, 1e20,
                                        backend="xla")
        live = jnp.isfinite(hit.t)
        tri = jnp.maximum(hit.tri, 0)
        tv0, tv1, tv2 = scene.tri_vertices(tri)
        gn = vmath.normalize(jnp.cross(tv1 - tv0, tv2 - tv0))
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
        o2 = jnp.where(live[:, None], p + gn * 1e-3,
                       jnp.full_like(p, 1e30))
        d2 = jnp.where(live[:, None], d2, jnp.array([[0.0, 0.0, 1.0]]))
        return o2, d2

    batches = [jax.block_until_ready(bounce_batch(s)) for s in range(spp)]

    db = 3  # production closest-bounce dir_bits (PT_CLOSEST_DB)
    per = [columns(accel, o, d, db) for o, d in batches]
    o_all = jnp.concatenate([b[0] for b in batches])
    d_all = jnp.concatenate([b[1] for b in batches])
    joint = columns(accel, o_all, d_all, db)
    rays = spp * n
    print(f"bounce1 x{spp} samples, {n} rays each (db={db}):")
    print(f"  per-sample sort: {sum(per)} cols total "
          f"({sum(per) / rays:.4f}/ray)  {per}")
    print(f"  joint sort:      {joint} cols ({joint / rays:.4f}/ray)")
    print(f"  joint vs per-sample: x{sum(per) / max(1, joint):.3f}")

    # --- bounce-0 NEE shadow batches: the same pool question ---
    @jax.jit
    def shadow_batch(s):
        samp = jnp.full((n,), s, jnp.uint32)
        o, d = cam_mod.generate_primary_rays(cs, w, h, 70.0, pix, samp, 0)
        hit = packet.intersect_clusters(accel, o, d, 1e-3, 1e20,
                                        backend="xla")
        live = jnp.isfinite(hit.t)
        tri = jnp.maximum(hit.tri, 0)
        tv0, tv1, tv2 = scene.tri_vertices(tri)
        gn = vmath.normalize(jnp.cross(tv1 - tv0, tv2 - tv0))
        gn = jnp.where(jnp.sum(gn * d, axis=-1, keepdims=True) > 0, -gn, gn)
        p = o + hit.t[:, None] * d + gn * 1e-3
        pixu = pix.astype(jnp.uint32)
        u_sel = rng_mod.uniform1(pixu, samp, 0,
                                 rng_mod.SALT_LIGHT_SELECT, 0)
        li = jnp.clip(jnp.searchsorted(scene.light_cdf, u_sel,
                                       side="left"),
                      0, scene.light_cdf.shape[0] - 1).astype(jnp.int32)
        r1, r2 = rng_mod.uniform2(pixu, samp, 0, rng_mod.SALT_LIGHT_UV, 0)
        sr1 = jnp.sqrt(r1)
        b0 = (1.0 - sr1)[..., None]
        b1 = (r2 * sr1)[..., None]
        lp = (scene.light_v0[li] * b0 + scene.light_v1[li] * b1
              + scene.light_v2[li] * (1.0 - b0 - b1))
        to_l = lp - p
        dist = jnp.linalg.norm(to_l, axis=-1)
        sd = to_l / jnp.maximum(dist, 1e-12)[:, None]
        so = jnp.where(live[:, None], p, jnp.full_like(p, 1e30))
        sd = jnp.where(live[:, None], sd, jnp.array([[0.0, 0.0, 1.0]]))
        st = jnp.where(live, dist * (1.0 - 1e-3), 0.0)
        return so, sd, st

    def occl_columns(o, d, tm):
        from pathtracer.kernels import packet as pk

        tile_rays = pk.TILE_RAYS
        m = o.shape[0] - (o.shape[0] % tile_rays)
        o, d, tm = o[:m], d[:m], tm[:m]
        n_tiles = m // tile_rays

        @jax.jit
        def stats(o, d, tm):
            order, _ = pk._coherence_order(
                accel, o, d, 2,
                scheme=os.environ.get("PT_KEY_SCHEME_OCCL", "firstcluster"))
            o_s, d_s, t_s = o[order], d[order], tm[order]
            tt = pk._tile_cull(accel, o_s, d_s, 0.0, t_s, n_tiles,
                               tile_rays)
            live = jnp.any((o_s[:, 0] < 1e29).reshape(n_tiles, tile_rays),
                           axis=1)
            return jnp.sum(jnp.where(live,
                                     jnp.sum(jnp.isfinite(tt), axis=1), 0))

        return int(jax.block_until_ready(stats(o, d, tm)))

    sbatches = [jax.block_until_ready(shadow_batch(s)) for s in range(spp)]
    sper = [occl_columns(o, d, t) for o, d, t in sbatches]
    sjoint = occl_columns(jnp.concatenate([b[0] for b in sbatches]),
                          jnp.concatenate([b[1] for b in sbatches]),
                          jnp.concatenate([b[2] for b in sbatches]))
    print(f"shadow0 x{spp} samples:")
    print(f"  per-sample sort: {sum(sper)} cols ({sum(sper) / rays:.4f}"
          f"/ray)  {sper}")
    print(f"  joint sort:      {sjoint} cols ({sjoint / rays:.4f}/ray)")
    print(f"  joint vs per-sample: x{sum(sper) / max(1, sjoint):.3f}")


if __name__ == "__main__":
    main()
