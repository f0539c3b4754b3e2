"""Does a termination-depth proxy in the coherence key cut swept columns?

The packet sweep's binding waste is the stop-tail: a tile sweeps until
its SLOWEST ray stops (visited-cols mean 54.8 vs per-ray needed 26.7,
docs/PERF.md 0.33). Tiles group rays by (direction bin, origin Morton) -
nothing aligns their STOP columns. A ray's stop column is #(schedule
entries < t_hit); t_hit is unknown pre-sweep, but the first-cluster
entry distance (packet._first_cluster, already computed for the
firstcluster key) is a cheap lower-bound proxy: rays that enter geometry
early tend to hit early.

This probe ranks key schemes by EXACT visited-column counts (platform-
independent; runs fine on TPU - counts are data, not timings) on the
true bounce-1 and shadow-0 batches of the headline scene:

  dirmajor        dbin | morton                     (production)
  dirt<q>         dbin | qt(t_first, q bits) | morton
  dirmt<q>        dbin | morton_hi(8) | qt | morton_lo
  fc              firstcluster | dbin | morton       (production option)
  fct<q>          firstcluster | qt | dbin

Usage: python benchmarks/key_t_probe.py   (env: BENCH_WIDTH/HEIGHT/TRIS,
  PT_FORCE_CPU=1 to keep it off the chip)
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

    w = int(os.environ.get("BENCH_WIDTH", 640))
    h = int(os.environ.get("BENCH_HEIGHT", 368))
    tris = int(os.environ.get("BENCH_TRIS", 262_000))

    from pathtracer.accel.cluster import build_clusters
    from pathtracer.accel import morton as morton_mod
    from pathtracer.integrator import camera as cam_mod
    from pathtracer.integrator.camera import Camera
    from pathtracer.kernels import packet
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
    pix = jnp.arange(n, dtype=jnp.int32)
    samp = jnp.zeros((n,), jnp.uint32)
    o, d = cam_mod.generate_primary_rays(cs, w, h, 70.0, pix, samp, 0)

    finite = accel.aabb_lo[:, 0] < 1e29
    lo = jnp.min(jnp.where(finite[:, None], accel.aabb_lo, jnp.inf), axis=0)
    hi = jnp.max(jnp.where(finite[:, None], accel.aabb_hi, -jnp.inf),
                 axis=0)
    diag = float(jnp.linalg.norm(hi - lo))

    @jax.jit
    def surface(o, d):
        hit = packet.intersect_clusters(accel, o, d, 1e-3, 1e20,
                                        backend="xla")
        live = jnp.isfinite(hit.t)
        tri = jnp.maximum(hit.tri, 0)
        tv0, tv1, tv2 = scene.tri_vertices(tri)
        gn = vmath.normalize(jnp.cross(tv1 - tv0, tv2 - tv0))
        gn = jnp.where(jnp.sum(gn * d, axis=-1, keepdims=True) > 0, -gn, gn)
        p = o + hit.t[:, None] * d
        return live, p, gn, tri

    live0, p0, gn0, tri0 = jax.block_until_ready(surface(o, d))

    # tri -> (one containing) cluster: SBVH duplicates a tri into several
    # clusters; any of them is a valid key (last scatter writer wins)
    blk_tri = accel.blocks[:, :, 9].astype(jnp.int32) - 1    # [C, K]
    c_ids = jnp.broadcast_to(
        jnp.arange(accel.n_clusters, dtype=jnp.int32)[:, None],
        blk_tri.shape)
    tri2cl = jnp.zeros((scene.n_tris,), jnp.int32).at[
        jnp.maximum(blk_tri.reshape(-1), 0)].set(
            jnp.where(blk_tri.reshape(-1) >= 0, c_ids.reshape(-1), 0))
    oc0 = tri2cl[tri0]          # origin cluster of every secondary ray

    @jax.jit
    def bounce_batch():
        u1, u2 = rng_mod.uniform2(pix.astype(jnp.uint32), samp, 7, 0, 0)
        t_, b_ = vmath.onb(gn0)
        r = jnp.sqrt(u1)
        phi = 2 * jnp.pi * u2
        local = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi),
                           jnp.sqrt(jnp.maximum(0.0, 1 - u1))], axis=-1)
        d2 = vmath.normalize(local[:, 0:1] * t_ + local[:, 1:2] * b_
                             + local[:, 2:3] * gn0)
        o2 = jnp.where(live0[:, None], p0 + gn0 * 1e-3,
                       jnp.full_like(p0, 1e30))
        d2 = jnp.where(live0[:, None], d2, jnp.array([[0.0, 0.0, 1.0]]))
        return o2, d2

    @jax.jit
    def shadow_batch():
        # aim at the emissive panel area like the NEE stage: sample a
        # point on the brightest emitter's AABB center region
        u1, u2 = rng_mod.uniform2(pix.astype(jnp.uint32), samp, 11, 0, 0)
        lp = jnp.stack([6.0 + 8.0 * u1, jnp.full_like(u1, 7.8),
                        4.0 + 4.0 * u2], axis=-1)
        dv = lp - p0
        dist = jnp.linalg.norm(dv, axis=-1, keepdims=True)
        d2 = dv / jnp.maximum(dist, 1e-8)
        o2 = jnp.where(live0[:, None], p0 + gn0 * 1e-3,
                       jnp.full_like(p0, 1e30))
        d2 = jnp.where(live0[:, None], d2, jnp.array([[0.0, 0.0, 1.0]]))
        return o2, d2

    def coarse_first(o, d, g):
        """Per-ray nearest GROUP id + entry over G-grouped union AABBs."""
        c = accel.aabb_lo.shape[0]
        pad = (-c) % g
        alo, ahi = accel.aabb_lo, accel.aabb_hi
        if pad:
            alo = jnp.concatenate([alo, jnp.full((pad, 3), 1e30)])
            ahi = jnp.concatenate([ahi, jnp.full((pad, 3), -1e30)])
        glo = jnp.min(alo.reshape(-1, g, 3), axis=1)
        ghi = jnp.max(ahi.reshape(-1, g, 3), axis=1)
        inv = packet._safe_inv(d)
        t1 = (glo[None] - o[:, None, :]) * inv[:, None, :]
        t2 = (ghi[None] - o[:, None, :]) * inv[:, None, :]
        tn = jnp.max(jnp.minimum(t1, t2), axis=-1)
        tf = jnp.min(jnp.maximum(t1, t2), axis=-1)
        tn = jnp.where((tf >= jnp.maximum(tn, 0.0)) & (tf > 0.0),
                       jnp.maximum(tn, 0.0), jnp.inf)
        j = jnp.argmin(tn, axis=1).astype(jnp.int32)
        return j, tn[jnp.arange(o.shape[0]), j]

    def keys_for(o, d, db, scheme):
        levels = jnp.float32((1 << db) - 1e-3)
        q = jnp.clip((d * 0.5 + 0.5) * levels, 0,
                     (1 << db) - 1).astype(jnp.uint32)
        dbin = ((q[:, 0] << jnp.uint32(2 * db))
                | (q[:, 1] << jnp.uint32(db)) | q[:, 2])
        db3 = 3 * db
        m = morton_mod.morton_codes(o, lo=lo, hi=hi)  # 30-bit
        need_t = scheme.startswith("dirt") or scheme.startswith("dirmt") \
            or scheme.startswith("fct")
        fc = tf = None
        if need_t or scheme.startswith("fc"):
            fc, tf = packet._first_cluster(accel, o, d)
        if need_t:
            qb = int(scheme[len(scheme.rstrip("0123456789")):] or 4)
            tn = jnp.clip(jnp.where(jnp.isfinite(tf), tf, diag) / diag,
                          0.0, 1.0)
            qt = jnp.minimum((jnp.sqrt(tn)
                              * ((1 << qb) - 1e-3)).astype(jnp.uint32),
                             jnp.uint32((1 << qb) - 1))
        if scheme == "dirmajor":
            key = (dbin << jnp.uint32(32 - db3)) | (m >> jnp.uint32(db3 - 2))
        elif scheme.startswith("dirmt"):
            mh = m >> jnp.uint32(22)                      # top 8 of 30
            rest = 32 - db3 - 8 - qb
            key = ((dbin << jnp.uint32(32 - db3))
                   | (mh << jnp.uint32(32 - db3 - 8))
                   | (qt << jnp.uint32(rest))
                   | ((m & jnp.uint32((1 << 22) - 1))
                      >> jnp.uint32(22 - rest)))
        elif scheme.startswith("dirt"):
            rest = 32 - db3 - qb
            key = ((dbin << jnp.uint32(32 - db3))
                   | (qt << jnp.uint32(rest))
                   | (m >> jnp.uint32(30 - rest)))
        elif scheme == "fc":
            cb = max(1, int(accel.aabb_lo.shape[0] - 1).bit_length())
            rest = max(0, 32 - cb - db3)
            key = ((fc.astype(jnp.uint32) << jnp.uint32(32 - cb))
                   | (dbin << jnp.uint32(rest))
                   | (m >> jnp.uint32(30 - rest if rest < 30 else 0)))
        elif scheme.startswith("fct"):
            cb = max(1, int(accel.aabb_lo.shape[0] - 1).bit_length())
            rest = max(0, 32 - cb - qb)
            key = ((fc.astype(jnp.uint32) << jnp.uint32(32 - cb))
                   | (qt << jnp.uint32(rest))
                   | (dbin << jnp.uint32(max(0, rest - db3))))
        elif scheme in ("oc", "doc"):
            # origin-cluster key: the cluster containing the hit triangle
            # this secondary ray starts on - FREE from the previous
            # traversal (tri2cl gather), no extra slab pass at all
            cb = max(1, int(accel.aabb_lo.shape[0] - 1).bit_length())
            rest = max(0, 32 - cb - db3)
            if scheme == "oc":
                key = ((oc0.astype(jnp.uint32) << jnp.uint32(32 - cb))
                       | (dbin << jnp.uint32(rest))
                       | (m >> jnp.uint32(30 - rest if rest < 30 else 0)))
            else:
                key = ((dbin << jnp.uint32(32 - db3))
                       | (oc0.astype(jnp.uint32)
                          << jnp.uint32(32 - db3 - cb))
                       | (m >> jnp.uint32(30 - max(0, 32 - db3 - cb))))
        elif scheme in ("ocmin", "ocmind"):
            # HYPOTHESIS probe (r5, VERDICT #4): the TRUE-firstcluster
            # shadow win (fc x1.505, PERF 0.39) may be nothing but a
            # CONSISTENT tie-break - a secondary ray's origin lies
            # inside its own cluster's AABB (entry 0), so fc's argmin
            # resolves to the MIN-INDEX cluster CONTAINING the origin,
            # direction-blind; oc (x0.998) picks an arbitrary
            # duplicate. If min-index containment reproduces fc's
            # columns, the win is FREE (no slab pass).
            c = accel.aabb_lo.shape[0]

            def min_containing(o):
                def blk(args):
                    ob, = args
                    inside = jnp.all(
                        (ob[:, None, :] >= accel.aabb_lo[None])
                        & (ob[:, None, :] <= accel.aabb_hi[None]),
                        axis=-1)                       # [B, C]
                    idx = jnp.where(
                        inside,
                        jnp.arange(c, dtype=jnp.int32)[None], c)
                    return jnp.min(idx, axis=1)

                bs = 8192
                pad = (-o.shape[0]) % bs
                op = jnp.concatenate(
                    [o, jnp.full((pad, 3), 1e30)], 0) if pad else o
                nb = op.shape[0] // bs
                mc = jax.lax.map(blk, (op.reshape(nb, bs, 3),))
                return mc.reshape(-1)[:o.shape[0]].astype(jnp.int32)

            mc = jnp.minimum(min_containing(o), c - 1)
            cb = max(1, int(c - 1).bit_length())
            rest = max(0, 32 - cb - db3)
            if scheme == "ocmin":
                key = ((mc.astype(jnp.uint32) << jnp.uint32(32 - cb))
                       | (dbin << jnp.uint32(rest))
                       | (m >> jnp.uint32(30 - rest if rest < 30 else 0)))
            else:   # ocmind: direction major, containment second
                key = ((dbin << jnp.uint32(32 - db3))
                       | (mc.astype(jnp.uint32)
                          << jnp.uint32(32 - db3 - cb))
                       | (m >> jnp.uint32(30 - max(0, 32 - db3 - cb))))
        elif scheme == "dird":
            # shadow-only free key: quantized distance-to-target (the
            # shadow t_max, known exactly pre-sort) aligns the rays'
            # CULL bounds so tile union schedules stay tight. Uses the
            # probe's light-panel target distance.
            dist = jnp.linalg.norm(
                jnp.stack([6.0 + 8.0 * 0.5, 7.8, 6.0], 0)[None] - o,
                axis=-1)   # coarse: panel-center distance (free proxy)
            qb = 6
            dn = jnp.clip(dist / diag, 0.0, 1.0)
            qd = jnp.minimum((jnp.sqrt(dn)
                              * ((1 << qb) - 1e-3)).astype(jnp.uint32),
                             jnp.uint32((1 << qb) - 1))
            rest = 32 - db3 - qb
            key = ((dbin << jnp.uint32(32 - db3))
                   | (qd << jnp.uint32(rest))
                   | (m >> jnp.uint32(30 - rest)))
        elif scheme.startswith("fcc"):
            # coarse first-GROUP id major (g clusters per union AABB),
            # then dbin, then origin-Morton detail - the 16x cheaper key
            g = int(scheme[3:] or 16)
            fg, _ = coarse_first(o, d, g)
            ng = -(-accel.aabb_lo.shape[0] // g)
            cb = max(1, int(ng - 1).bit_length())
            rest = max(0, 32 - cb - db3)
            key = ((fg.astype(jnp.uint32) << jnp.uint32(32 - cb))
                   | (dbin << jnp.uint32(rest))
                   | (m >> jnp.uint32(30 - rest if rest < 30 else 0)))
        else:
            raise SystemExit(f"unknown scheme {scheme}")
        return jnp.where(o[:, 0] >= 1e29, jnp.uint32(0xFFFFFFFF), key)

    tile_rays = packet.TILE_RAYS
    n_tiles = n // tile_rays

    def columns(o, d, db, scheme):
        @jax.jit
        def stats(o, d):
            key = keys_for(o, d, db, scheme)
            order = jnp.argsort(key).astype(jnp.int32)
            o_s, d_s = o[order], d[order]
            tile_tnear = packet._tile_cull(accel, o_s, d_s, 1e-3, 1e20,
                                           n_tiles, tile_rays)
            st, _ = packet._sorted_schedule(tile_tnear, 1)
            hit = packet.intersect_clusters(accel, o_s, d_s, 1e-3, 1e20,
                                            backend="xla", sort_rays=False)
            cap = packet._scene_exit(accel, o_s, d_s, 1e20)
            best = jnp.minimum(
                jnp.where(jnp.isfinite(hit.t), hit.t, jnp.inf),
                cap).reshape(n_tiles, tile_rays)
            lv = (o_s[:, 0] < 1e29).reshape(n_tiles, tile_rays)
            vis = jnp.sum(st < jnp.max(jnp.where(lv, best, 0.0), axis=1,
                                       keepdims=True), axis=1)
            return jnp.sum(jnp.where(jnp.any(lv, axis=1), vis, 0))

        return int(jax.block_until_ready(stats(o, d)))

    schemes = os.environ.get(
        "SCHEMES", "dirmajor,dirt3,dirt4,dirt6,dirmt4,fc,fct4").split(",")
    for name, (o_b, d_b), db in (
            ("bounce1", jax.block_until_ready(bounce_batch()), 3),
            ("shadow0", jax.block_until_ready(shadow_batch()), 2)):
        base = None
        print(f"{name} ({n} rays, db={db}):")
        for s in schemes:
            c = columns(o_b, d_b, db, s)
            if base is None:
                base = c
            print(f"  {s:10s} {c:9d} cols  ({c / n:.4f}/ray)  "
                  f"x{base / max(1, c):.3f} vs {schemes[0]}")


if __name__ == "__main__":
    main()
