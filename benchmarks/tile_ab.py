"""Off-chip tile-size (TILE_RAYS) study on the EXACT stop rules.

PERF.md 0.33 measured packet waste x2.05: a 64-ray tile walks the
near-to-far schedule until its LAST ray is satisfied (closest:
st >= max best_t; occlusion: all lanes blocked), so every ray pays the
union of its tile-mates' needs. Smaller tiles shrink the union (and the
occlusion all-blocked rule fires much earlier), but double the tile
count: per-tile grid overhead, the cull (cost ~ tiles x C), and the
per-iteration FIXED cost are paid more often while the per-iteration
ALU cost scales with R (rays ride the sublane axis of the [R, cpi*K]
test).

This probe replays the exact kernel stop rules (true per-(ray, cluster)
min-t/entry matrices, as mask_skip_probe) on the headline scene's
bounce-1 closest and bounce-0 NEE batches at R in {64, 32, 16}, then
prices each leg with the sweep_attrib-measured constants:

  iter cost(R) = FIXED + ALU64 * R/64      (ALU64 = 1.021 us, cpi=8)
  tile cost    = T0 per grid step           (prefetch+drain+writes)
  cull cost    ~ tiles (x2 tiles = x2 cull; 45 ms/call at R=64)

Walk counts are pure geometry + schedule = platform-independent; run on
CPU, chip-confirm only a predicted winner. Env: BENCH_* to scale,
TILE_SIZES=64,32,16, PT_SWEEP_CPI, TILE_T0_US (default sweep 0,1,2 us
sensitivity row).

Usage: python benchmarks/tile_ab.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mask_skip_probe import entry_mask, tmin_matrix


def walk_tile(kind, ent_t, tmat_t, cap_t, live_t, cpi):
    """Iterations the kernel walks for ONE tile of rays (exact rules)."""
    tn = np.where(ent_t.any(axis=0), 0.0, np.inf)  # placeholder
    tn = ent_t.min(axis=0)                          # [C] tile entry
    finite = np.isfinite(tn)
    fn = int(finite.sum())
    if fn == 0 or not live_t.any():
        return 0
    ids = np.argsort(np.where(finite, tn, np.inf), kind="stable")
    stv = np.where(finite, tn, np.inf)[ids]
    ng = (fn + cpi - 1) // cpi
    it = 0
    if kind == "closest":
        best = cap_t.copy()
        for g in range(ng):
            if not (stv[g * cpi] < best.max()):
                break
            it += 1
            cols = ids[g * cpi:min((g + 1) * cpi, fn)]
            best = np.minimum(best, tmat_t[:, cols].min(axis=1))
    else:
        open_ = live_t.copy()
        for g in range(ng):
            if not open_.any():
                break
            it += 1
            cols = ids[g * cpi:min((g + 1) * cpi, fn)]
            open_ &= ~np.isfinite(tmat_t[:, cols]).any(axis=1)
    return it


def walk_dual(kind, ent_t, tmat_t, cap_t, live_t, cpi, halves=2):
    """Shared-schedule dual-stop variant: ONE parent tile schedule, the
    kernel carries `halves` independent sub-carries; each half stops by
    its own rule, the loop runs to the max, and a finished half skips
    its ALU. Returns (loop_iters, half_iters_total) where half ALU cost
    = half_iters * ALU64/halves."""
    tn = ent_t.min(axis=0)
    finite = np.isfinite(tn)
    fn = int(finite.sum())
    if fn == 0 or not live_t.any():
        return 0, 0
    ids = np.argsort(np.where(finite, tn, np.inf), kind="stable")
    stv = np.where(finite, tn, np.inf)[ids]
    ng = (fn + cpi - 1) // cpi
    r = ent_t.shape[0]
    hs = r // halves
    subs = [slice(i * hs, (i + 1) * hs) for i in range(halves)]
    if kind == "closest":
        best = [cap_t[s].copy() for s in subs]
        done = [not live_t[s].any() for s in subs]
    else:
        open_ = [live_t[s].copy() for s in subs]
        done = [not o.any() for o in open_]
    loop_it = half_it = 0
    for g in range(ng):
        cols = ids[g * cpi:min((g + 1) * cpi, fn)]
        st_g = stv[g * cpi]
        if kind == "closest":
            act = [i for i in range(halves)
                   if not done[i] and st_g < best[i].max()]
        else:
            act = [i for i in range(halves) if not done[i]]
        if not act:
            break
        loop_it += 1
        half_it += len(act)
        for i in act:
            s = subs[i]
            if kind == "closest":
                best[i] = np.minimum(best[i], tmat_t[s][:, cols].min(axis=1))
            else:
                open_[i] &= ~np.isfinite(tmat_t[s][:, cols]).any(axis=1)
                done[i] = not open_[i].any()
    return loop_it, half_it


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
    sizes = [int(x) for x in
             os.environ.get("TILE_SIZES", "64,32,16").split(",")]
    alu64 = float(os.environ.get("TILE_ALU64_US", "1.021"))
    fixed = float(os.environ.get("TILE_FIXED_US", "0.40"))

    from benchmarks.occl_order_ab import shadow_batch
    from pathtracer.accel.cluster import build_scene_clusters
    from pathtracer.integrator import camera as cam_mod
    from pathtracer.integrator.camera import Camera
    from pathtracer.kernels import packet
    from pathtracer.sampling import rng as rng_mod
    from pathtracer.scene.procedural import sponza_like
    from pathtracer.utils import vmath

    scene = build_scene_clusters(sponza_like(target_tris=tris).finalize())
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
    results = {}
    for kind, o, d, tm, dbits, scheme in batches:
        key = packet._coherence_key(accel, o, d, dbits, scheme=scheme)
        order = np.asarray(jnp.argsort(key))
        o_s, d_s, t_s = (np.asarray(x)[order] for x in (o, d, tm))
        base = max(sizes)
        nn = o_s.shape[0] - (o_s.shape[0] % base)
        o_s, d_s, t_s = o_s[:nn], d_s[:nn], t_s[:nn]

        print(f"[{kind}] building exact matrices...", flush=True)
        tmat = tmin_matrix(accel, jnp.asarray(o_s), jnp.asarray(d_s),
                           jnp.asarray(t_s))
        _, ent = entry_mask(accel, o_s, d_s, t_s,
                            1e-3 if kind == "closest" else 0.0)
        cap = np.asarray(packet._scene_exit(
            accel, jnp.asarray(o_s), jnp.asarray(d_s), jnp.asarray(t_s)))
        live = (o_s[:, 0] < 1e29)

        for r in sizes:
            n_tiles = nn // r
            iters = 0
            for ti in range(n_tiles):
                sl = slice(ti * r, (ti + 1) * r)
                iters += walk_tile(kind, ent[sl], tmat[sl], cap[sl],
                                   live[sl], cpi)
            results[(kind, r)] = (iters, n_tiles)
            print(f"[{kind}] R={r}: iters {iters}  tiles {n_tiles}",
                  flush=True)

        base_r = sizes[0]
        n_tiles = nn // base_r
        for halves in (2, 4):
            li = hi = 0
            for ti in range(n_tiles):
                sl = slice(ti * base_r, (ti + 1) * base_r)
                a, b = walk_dual(kind, ent[sl], tmat[sl], cap[sl],
                                 live[sl], cpi, halves)
                li += a
                hi += b
            cost = li * fixed + hi * (alu64 / halves)
            base_cost = results[(kind, base_r)][0] * (fixed + alu64)
            print(f"[{kind}] dual{halves} (shared sched, R={base_r}): "
                  f"loop {li}  half-iters {hi}  modeled "
                  f"{cost / 1e3:.1f}ms  x{base_cost / max(cost, 1e-9):.2f} "
                  f"vs R={base_r}", flush=True)

    print("\ncost model (us, per batch; sweep-only + tile overhead):")
    print(f"  iter(R) = {fixed} + {alu64}*R/64;  T0 = per-grid-step us")
    for kind in ("closest", "occl"):
        for t0 in (0.0, 1.0, 2.0):
            row = []
            for r in sizes:
                iters, tiles = results[(kind, r)]
                cost = iters * (fixed + alu64 * r / 64.0) + tiles * t0
                row.append(f"R={r}: {cost / 1e3:8.1f}ms")
            base_cost = (results[(kind, sizes[0])][0]
                         * (fixed + alu64 * sizes[0] / 64.0)
                         + results[(kind, sizes[0])][1] * t0)
            best = min(
                results[(kind, r)][0] * (fixed + alu64 * r / 64.0)
                + results[(kind, r)][1] * t0 for r in sizes)
            print(f"  [{kind}] T0={t0}: " + "  ".join(row)
                  + f"   best x{base_cost / max(best, 1e-9):.2f} vs R={sizes[0]}")
    print("\nNOTE: cull cost ~ tiles (45 ms/call at R=64 headline) and "
          "permutes are R-independent; add cull x(64/R scale) mentally.")


if __name__ == "__main__":
    main()
