"""Occlusion schedule-ORDER A/B, platform-independent.

The occlusion sweep visits a tile's culled clusters in a precomputed
order and stops when EVERY lane is blocked (kernels/pallas_sweep.py);
because it is any-hit, the order is a free choice. The current order is
entry-near-first (shared with closest-hit). For a tile that fully
blocks, the visited-column count is set by the LAST ray to find a
blocker - so an order that front-loads high-coverage / likely-blocking
clusters can stop sooner. Tiles with any truly-open ray walk their whole
finite schedule under EVERY order, so only all-blocked tiles move.

This probe computes, per tile, the exact stop column under several
orders using the true ray-cluster blocking matrix (brute-force MT,
front-facing, within t_max - the shadow policy of raygen.rgen:214-218),
on the headline scene's bounce-0 NEE shadow batch. Column counts are a
pure function of geometry + schedule: identical on CPU and TPU
(docs/PERF.md 0.21 - frame cost = columns x fixed cost/column).

Orders compared:
  near     entry distance ascending (production today)
  coverage number of tile rays whose segment enters the AABB, descending
  covnear  coverage descending, entry as tiebreak (lexicographic)

Usage: JAX_PLATFORMS=cpu python benchmarks/occl_order_ab.py
  env: BENCH_WIDTH/HEIGHT/TRIS (default 320x180, 65k)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def shadow_batch(scene, w, h):
    """Bounce-0 NEE shadow rays of the headline view (true workload)."""
    from pathtracer.integrator import camera as cam_mod
    from pathtracer.integrator.camera import Camera
    from pathtracer.kernels import packet
    from pathtracer.sampling import rng as rng_mod
    from pathtracer.utils import vmath

    cam = Camera(position=(3.0, 4.5, 6.0))
    cam.look_at((14.0, 3.0, 6.0))
    n = w * h
    pix = jnp.arange(n, dtype=jnp.int32)
    samp = jnp.zeros((n,), jnp.uint32)
    o, d = cam_mod.generate_primary_rays(cam.state(), w, h, 70.0, pix,
                                         samp, 0)
    hit = packet.intersect_clusters(scene.clusters_fine, o, d, 1e-3, 1e20,
                                    backend="xla")
    live = jnp.isfinite(hit.t)
    tri = jnp.maximum(hit.tri, 0)
    v0, v1, v2 = scene.tri_vertices(tri)
    gn = vmath.normalize(jnp.cross(v1 - v0, v2 - v0))
    gn = jnp.where(jnp.sum(gn * d, axis=-1, keepdims=True) > 0, -gn, gn)
    p = o + hit.t[:, None] * d + gn * 1e-3

    # NEE light sample, same scheme as integrator/path._nee
    pixu = pix.astype(jnp.uint32)
    u_sel = rng_mod.uniform1(pixu, samp, 0, rng_mod.SALT_LIGHT_SELECT, 0)
    li = jnp.clip(jnp.searchsorted(scene.light_cdf, u_sel, side="left"),
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
    t_max = dist * (1.0 - 1e-3)
    so = jnp.where(live[:, None], p, jnp.full_like(p, packet._PARK))
    sd = jnp.where(live[:, None], sd, jnp.array([[0.0, 0.0, 1.0]]))
    st = jnp.where(live, t_max, 0.0)
    return so, sd, st


def block_matrix(scene, accel, o, d, t_max, chunk=4096):
    """True ray-cluster blocking: any front-facing MT hit within t_max.

    Returns bool[N, C] via brute-force per-tri tests segment-reduced to
    the accel's cluster assignment (accel.blocks [C, K, 12] rows carry
    v0/e1/e2 + id+1 at row 9).
    """
    blk = np.asarray(accel.blocks)                      # [C, K, 12]
    c, k, _ = blk.shape
    v0 = blk[..., 0:3].reshape(-1, 3)
    e1 = blk[..., 3:6].reshape(-1, 3)
    e2 = blk[..., 6:9].reshape(-1, 3)
    real = np.round(blk[..., 9].reshape(-1)) >= 1.0     # pad rows: id 0

    v0j, e1j, e2j = map(jnp.asarray, (v0, e1, e2))
    realj = jnp.asarray(real)

    @jax.jit
    def chunk_block(o, d, tm):
        ob = o[:, None, :]
        db = d[:, None, :]
        pvec = jnp.cross(db, e2j[None])
        det = jnp.sum(e1j[None] * pvec, axis=-1)
        inv = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        tvec = ob - v0j[None]
        u = jnp.sum(tvec * pvec, axis=-1) * inv
        qvec = jnp.cross(tvec, e1j[None])
        v = jnp.sum(db * qvec, axis=-1) * inv
        t = jnp.sum(e2j[None] * qvec, axis=-1) * inv
        gn = jnp.cross(e1j, e2j)[None]
        front = jnp.sum(db * gn, axis=-1) < 0.0
        ok = ((jnp.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1)
              & (t > 0.0) & (t < tm[:, None]) & front & realj[None])
        return jnp.any(ok.reshape(-1, c, k), axis=2)    # [chunk, C]

    n = o.shape[0]
    out = np.zeros((n, c), bool)
    for i in range(0, n, chunk):
        j = min(n, i + chunk)
        pad = chunk - (j - i)
        oc = jnp.concatenate([o[i:j], jnp.full((pad, 3), 1e30)]) \
            if pad else o[i:j]
        dc = jnp.concatenate([d[i:j], jnp.ones((pad, 3))]) if pad else d[i:j]
        tc = jnp.concatenate([t_max[i:j], jnp.zeros((pad,))]) \
            if pad else t_max[i:j]
        out[i:j] = np.asarray(chunk_block(oc, dc, tc))[:j - i]
    return out


def stop_columns(order_ids, finite_n, blocks_tile):
    """Visited columns for one tile given a schedule order.

    order_ids: i32[C'] cluster ids in visit order (first finite_n real).
    blocks_tile: bool[R, C] ray-cluster blocking. A ray is blocked at the
    first order position whose cluster blocks it; the tile stops after
    the position where the LAST ray gets blocked, or walks all finite_n.
    """
    if finite_n == 0:
        return 0
    sched = blocks_tile[:, order_ids[:finite_n]]        # [R, n]
    anyb = sched.any(axis=1)
    if not anyb.all():
        return finite_n
    first = np.argmax(sched, axis=1)                    # per-ray block pos
    return int(first.max()) + 1


def main():
    # Stop-column counts are platform-independent; ALWAYS run off-chip.
    # The axon plugin overrides the JAX_PLATFORMS env var, so force it.
    jax.config.update("jax_platforms",
                      os.environ.get("PT_PLATFORM", "cpu"))
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("PATHTRACER_CACHE",
                       os.path.expanduser("~/.cache/pathtracer-jax")))
    w = int(os.environ.get("BENCH_WIDTH", 320))
    h = int(os.environ.get("BENCH_HEIGHT", 180))
    tris = int(os.environ.get("BENCH_TRIS", 65_000))

    from pathtracer.accel.cluster import build_scene_clusters
    from pathtracer.kernels import packet
    from pathtracer.scene.procedural import sponza_like

    scene = build_scene_clusters(sponza_like(target_tris=tris).finalize())
    accel = scene.clusters                              # occlusion accel
    o, d, t_max = (np.asarray(x) for x in shadow_batch(scene, w, h))
    print(f"scene {scene.n_tris} tris, C={accel.n_clusters} "
          f"K={accel.tris_per_cluster}, rays {o.shape[0]}")

    # production tile assembly: global coherence sort, occl keys
    oj, dj, tj = map(jnp.asarray, (o, d, t_max))
    order, _ = packet._coherence_order(
        accel, oj, dj, 2,
        scheme=os.environ.get("PT_KEY_SCHEME_OCCL", "firstcluster"))
    o_s, d_s, t_s = (np.asarray(x[order]) for x in (oj, dj, tj))

    tile_rays = packet.TILE_RAYS
    n = o.shape[0] - (o.shape[0] % tile_rays)
    o_s, d_s, t_s = o_s[:n], d_s[:n], t_s[:n]
    n_tiles = n // tile_rays

    tile_tnear = np.asarray(packet._tile_cull(
        accel, jnp.asarray(o_s), jnp.asarray(d_s), 0.0,
        jnp.asarray(t_s), n_tiles, tile_rays))          # [tiles, C]

    # per-(ray, cluster) AABB coverage for the coverage key
    inv = np.asarray(packet._safe_inv(jnp.asarray(d_s)))
    lo = np.asarray(accel.aabb_lo)[None, :, :]
    hi = np.asarray(accel.aabb_hi)[None, :, :]
    cover = np.zeros((n_tiles, lo.shape[1]), np.int32)
    for t0 in range(0, n_tiles, 64):
        t1 = min(n_tiles, t0 + 64)
        ot = o_s[t0 * tile_rays:t1 * tile_rays].reshape(-1, 1, 3)
        it = inv[t0 * tile_rays:t1 * tile_rays].reshape(-1, 1, 3)
        tm = t_s[t0 * tile_rays:t1 * tile_rays].reshape(-1, 1)
        a = (lo - ot) * it
        b = (hi - ot) * it
        tn = np.maximum.reduce(np.minimum(a, b), axis=2)
        tf = np.minimum.reduce(np.maximum(a, b), axis=2)
        hitm = (tn <= tf) & (tf >= 0.0) & (tn <= tm)
        cover[t0:t1] = hitm.reshape(t1 - t0, tile_rays, -1).sum(axis=1)

    print("building true blocking matrix (brute MT)...")
    bm = block_matrix(scene, accel, jnp.asarray(o_s), jnp.asarray(d_s),
                      jnp.asarray(t_s))

    live = (o_s[:, 0] < 1e29).reshape(n_tiles, tile_rays)
    totals = {}
    for name in ("near", "coverage", "covnear"):
        tot = 0
        blocked_tiles = 0
        for ti in range(n_tiles):
            if not live[ti].any():
                continue
            tn = tile_tnear[ti]
            finite = np.isfinite(tn)
            fn = int(finite.sum())
            if name == "near":
                ids = np.argsort(np.where(finite, tn, np.inf),
                                 kind="stable")
            elif name == "coverage":
                key = np.where(finite, -cover[ti].astype(np.float64),
                               np.inf)
                ids = np.argsort(key, kind="stable")
            else:
                key = np.where(finite,
                               -cover[ti] * 1e6 + np.minimum(tn, 1e5),
                               np.inf)
                ids = np.argsort(key, kind="stable")
            bt = bm[ti * tile_rays:(ti + 1) * tile_rays][live[ti]]
            sc = stop_columns(ids, fn, bt)
            if bt.any(axis=1).all():
                blocked_tiles += 1
            tot += sc
        totals[name] = tot
        print(f"  order={name:9s} total cols {tot}"
              f"  (fully-blocked tiles {blocked_tiles}/{n_tiles})")

    base = totals["near"]
    for name, tot in totals.items():
        if name != "near":
            print(f"{name} vs near: x{base / max(1, tot):.3f}")


if __name__ == "__main__":
    main()
