"""Off-chip estimate: what would per-granule LANE-MASK skipping save?

The sweep kernels walk a tile's near-to-far schedule in granules of
cpi clusters and test EVERY granule until the tile-level stop rule
fires (closest: nearest remaining entry >= max best_t; occlusion: all
lanes blocked or schedule end). cols_probe measured packet waste x2.05:
the tile pays for the union of its rays' needs. A cheap per-granule
LANE MASK (which rays hit ANY cluster in the granule - one u32x2 row
per granule, written by the cull) would let the kernel skip a granule's
whole [R, cpi*K] body when no still-relevant ray hits it:

  closest: skip if no ray has (mask AND best_t > granule entry st)
  occl:    skip if no OPEN ray has mask

Skip/walk ratios are a pure function of geometry + schedule =
platform-independent. This probe simulates both kernels exactly (true
per-(ray, cluster) min-t / blocking matrices via brute MT) on the
headline scene's bounce-1 closest batch and bounce-0 NEE shadow batch,
and reports walked vs maskable granules. The in-kernel branch costs
~0.3-0.4 us vs ~1 us of body ALU at cpi=8 (PERF.md 0.5/0.31), so the
lever pays iff the skippable fraction is large (>~40%).

Usage: python benchmarks/mask_skip_probe.py   (forces CPU; BENCH_* env)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def tmin_matrix(accel, o, d, t_max, chunk=2048):
    """Per-(ray, cluster) closest-hit t via brute MT (inf = none)."""
    blk = np.asarray(accel.blocks)                      # [C, K, 12]
    c, k, _ = blk.shape
    v0 = jnp.asarray(blk[..., 0:3].reshape(-1, 3))
    e1 = jnp.asarray(blk[..., 3:6].reshape(-1, 3))
    e2 = jnp.asarray(blk[..., 6:9].reshape(-1, 3))
    real = jnp.asarray(np.round(blk[..., 9].reshape(-1)) >= 1.0)

    @jax.jit
    def chunk_t(o, d, tm):
        ob = o[:, None, :]
        db = d[:, None, :]
        pvec = jnp.cross(db, e2[None])
        det = jnp.sum(e1[None] * pvec, axis=-1)
        inv = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        tvec = ob - v0[None]
        u = jnp.sum(tvec * pvec, axis=-1) * inv
        qvec = jnp.cross(tvec, e1[None])
        v = jnp.sum(db * qvec, axis=-1) * inv
        t = jnp.sum(e2[None] * qvec, axis=-1) * inv
        ok = ((jnp.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1)
              & (t > 1e-3) & (t < tm[:, None]) & real[None])
        t = jnp.where(ok, t, jnp.inf)
        return jnp.min(t.reshape(-1, c, k), axis=2)     # [chunk, C]

    n = o.shape[0]
    out = np.full((n, c), np.inf, np.float32)
    for i in range(0, n, chunk):
        j = min(n, i + chunk)
        out[i:j] = np.asarray(chunk_t(o[i:j], d[i:j], t_max[i:j]))
    return out


def entry_mask(accel, o, d, t_max, t_min):
    """Per-(ray, cluster) slab-hit mask + entry distance (numpy)."""
    from pathtracer.kernels import packet

    inv = np.asarray(packet._safe_inv(jnp.asarray(d)))
    lo = np.asarray(accel.aabb_lo)[None]
    hi = np.asarray(accel.aabb_hi)[None]
    n = o.shape[0]
    c = lo.shape[1]
    hitm = np.zeros((n, c), bool)
    ent = np.full((n, c), np.inf, np.float32)
    for i in range(0, n, 4096):
        j = min(n, i + 4096)
        a = (lo - o[i:j, None, :]) * inv[i:j, None, :]
        b = (hi - o[i:j, None, :]) * inv[i:j, None, :]
        tn = np.maximum.reduce(np.minimum(a, b), axis=2)
        tf = np.minimum.reduce(np.maximum(a, b), axis=2)
        hm = (tn <= tf) & (tf >= t_min) & (tn <= t_max[i:j, None])
        hitm[i:j] = hm
        ent[i:j] = np.where(hm, np.maximum(tn, 0.0), np.inf)
    return hitm, ent


def simulate(kind, st, si, finite_n, hitm, ent, tmat, cap, live, cpi):
    """Walk one tile's schedule at granule granularity.

    Returns (walked, tested): granules the current kernel walks vs
    granules a lane-mask kernel would actually test.
    """
    r = hitm.shape[0]
    if finite_n == 0 or not live.any():
        return 0, 0
    ng = (finite_n + cpi - 1) // cpi
    walked = tested = 0
    if kind == "closest":
        best = cap.copy()
        for g in range(ng):
            cols = si[g * cpi:min((g + 1) * cpi, finite_n)]
            st_g = st[g * cpi]
            if not (st_g < best.max()):                 # kernel stop rule
                break
            walked += 1
            mask = hitm[:, cols].any(axis=1)
            if (mask & (best > st_g)).any():
                tested += 1
                best = np.minimum(best, tmat[:, cols].min(axis=1))
    else:
        open_ = live.copy()
        for g in range(ng):
            cols = si[g * cpi:min((g + 1) * cpi, finite_n)]
            if not open_.any():                         # kernel stop rule
                break
            walked += 1
            mask = hitm[:, cols].any(axis=1)
            if (mask & open_).any():
                tested += 1
                blocked = np.isfinite(tmat[:, cols]).any(axis=1)
                open_ &= ~blocked
    return walked, tested


def main():
    jax.config.update("jax_platforms",
                      os.environ.get("PT_PLATFORM", "cpu"))
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("PATHTRACER_CACHE",
                       os.path.expanduser("~/.cache/pathtracer-jax")))
    w = int(os.environ.get("BENCH_WIDTH", 320))
    h = int(os.environ.get("BENCH_HEIGHT", 180))
    tris = int(os.environ.get("BENCH_TRIS", 65_000))
    cpi = int(os.environ.get("PT_SWEEP_CPI", 8))

    from benchmarks.occl_order_ab import shadow_batch
    from pathtracer.accel.cluster import build_scene_clusters
    from pathtracer.integrator import camera as cam_mod
    from pathtracer.integrator.camera import Camera
    from pathtracer.kernels import packet
    from pathtracer.sampling import rng as rng_mod
    from pathtracer.utils import vmath

    scene = build_scene_clusters(sponza := __import__(
        "pathtracer.scene.procedural", fromlist=["sponza_like"]
    ).sponza_like(target_tris=tris).finalize())
    accel = scene.clusters
    print(f"scene {scene.n_tris} tris, C={accel.aabb_lo.shape[0]}, "
          f"cpi={cpi}", flush=True)

    cam = Camera(position=(3.0, 4.5, 6.0))
    cam.look_at((14.0, 3.0, 6.0))
    n = w * h
    pix = jnp.arange(n, dtype=jnp.int32)
    samp = jnp.zeros((n,), jnp.uint32)
    o0, d0 = cam_mod.generate_primary_rays(cam.state(), w, h, 70.0, pix,
                                           samp, 0)
    hit = packet.intersect_clusters(accel, o0, d0, 1e-3, 1e20,
                                    backend="xla")
    livep = jnp.isfinite(hit.t)
    tri = jnp.maximum(hit.tri, 0)
    v0, v1, v2 = scene.tri_vertices(tri)
    gn = vmath.normalize(jnp.cross(v1 - v0, v2 - v0))
    gn = jnp.where(jnp.sum(gn * d0, axis=-1, keepdims=True) > 0, -gn, gn)
    p = o0 + hit.t[:, None] * d0
    u1, u2 = rng_mod.uniform2(pix.astype(jnp.uint32), samp, 7, 0, 0)
    t_, b_ = vmath.onb(gn)
    rr = jnp.sqrt(u1)
    phi = 2 * jnp.pi * u2
    loc = jnp.stack([rr * jnp.cos(phi), rr * jnp.sin(phi),
                     jnp.sqrt(jnp.maximum(0.0, 1 - u1))], axis=-1)
    db = vmath.normalize(loc[:, 0:1] * t_ + loc[:, 1:2] * b_
                         + loc[:, 2:3] * gn)
    ob = jnp.where(livep[:, None], p + gn * 1e-3,
                   jnp.full_like(p, packet._PARK))
    db = jnp.where(livep[:, None], db, jnp.array([[0.0, 0.0, 1.0]]))
    tb = jnp.where(livep, 1e20, 0.0).astype(jnp.float32)

    so, sd, stx = shadow_batch(scene, w, h)

    batches = [("closest", ob, db, tb, 3, None),
               ("occl", so, sd, stx, 2,
                os.environ.get("PT_KEY_SCHEME_OCCL", "dirmajor"))]
    for kind, o, d, tm, dbits, scheme in batches:
        key = packet._coherence_key(accel, o, d, dbits, scheme=scheme)
        order = np.asarray(jnp.argsort(key))
        o_s, d_s, t_s = (np.asarray(x)[order] for x in (o, d, tm))
        tr = packet.TILE_RAYS
        nn = o_s.shape[0] - (o_s.shape[0] % tr)
        o_s, d_s, t_s = o_s[:nn], d_s[:nn], t_s[:nn]
        n_tiles = nn // tr

        print(f"[{kind}] building exact matrices...", flush=True)
        tmat = tmin_matrix(accel, jnp.asarray(o_s), jnp.asarray(d_s),
                           jnp.asarray(t_s))
        hitm, ent = entry_mask(accel, o_s, d_s, t_s,
                               1e-3 if kind == "closest" else 0.0)
        ttn = np.asarray(packet._tile_cull(
            accel, jnp.asarray(o_s), jnp.asarray(d_s),
            1e-3 if kind == "closest" else 0.0, jnp.asarray(t_s),
            n_tiles, tr))
        cap = np.asarray(packet._scene_exit(
            accel, jnp.asarray(o_s), jnp.asarray(d_s), jnp.asarray(t_s)))
        live = (o_s[:, 0] < 1e29)

        tot_w = tot_t = 0
        for ti in range(n_tiles):
            tn = ttn[ti]
            finite = np.isfinite(tn)
            fn = int(finite.sum())
            ids = np.argsort(np.where(finite, tn, np.inf), kind="stable")
            stv = np.where(finite, tn, np.inf)[ids]
            sl = slice(ti * tr, (ti + 1) * tr)
            wk, ts = simulate(kind, stv, ids, fn, hitm[sl], ent[sl],
                              tmat[sl], cap[sl], live[sl], cpi)
            tot_w += wk
            tot_t += ts
        frac = 1.0 - tot_t / max(1, tot_w)
        print(f"[{kind}] granules walked {tot_w}  tested {tot_t}  "
              f"SKIPPABLE {frac:.1%}", flush=True)


if __name__ == "__main__":
    main()
