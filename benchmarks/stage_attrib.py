"""Frame-stage attribution at HEADLINE scale: where do 7 s/sample go?

The r2 sweep-attrib microbench shows the Pallas kernel runs at ~82% of
VPU speed-of-light per iteration (1.42 us for a 64x1536 Baldwin-Weber
body), and the 0.21 pair model predicts only ~1.4 s/sample of sweep
time - yet the banked frame costs ~7.2 s/sample. This probe times the
XLA-side stages AROUND the kernel, per real bounce batch, at the full
2.07M-lane wavefront:

  sortperm   coherence argsort (order+inv) over the wavefront
  permute    the [n,7] ray gather by the permutation
  cull       per-chunk dense per-ray slab test -> tile_tnear [tiles, C]
  schedule   per-chunk lax.sort of tile_tnear (the [tiles, C] sort)
  closest    full intersect_clusters (prep + Pallas sweep)
  prep-only  the same minus the sweep (cull+schedule composed, chunked)
  occluded   full occluded_clusters on a shadow-like batch
  fetch      pack_surface_rows + fetch_surface on the hits

Usage (TPU; serialize with other chip jobs!):
  BENCH_TRIS=262000 BENCH_WIDTH=1920 BENCH_HEIGHT=1080 \
      python benchmarks/stage_attrib.py
Scale down with the BENCH_* envs for smoke runs (PT_FORCE_CPU=1 ok).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(fn, *args, reps=3):
    out = jax.block_until_ready(fn(*args))
    jax.tree_util.tree_map(
        lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.tree_util.tree_map(
            lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
    return (time.perf_counter() - t0) / reps


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
    from pathtracer.integrator import path as path_mod
    from pathtracer.integrator.camera import Camera
    from pathtracer.kernels import packet
    from pathtracer.sampling import rng as rng_mod
    from pathtracer.scene.procedural import sponza_like
    from pathtracer.utils import vmath

    scene = build_scene_clusters(sponza_like(target_tris=tris).finalize())
    accel = scene.clusters
    C = int(accel.aabb_lo.shape[0])
    cam = Camera(position=(3.0, 4.5, 6.0))
    cam.look_at((14.0, 3.0, 6.0))
    cs = cam.state()
    n = w * h
    print(f"devices: {jax.devices()}  n={n}  C={C}", flush=True)

    pix = jnp.arange(n, dtype=jnp.int32)
    samp = jnp.zeros((n,), jnp.uint32)
    o, d = cam_mod.generate_primary_rays(cs, w, h, 70.0, pix, samp, 0)

    # --- build a TRUE bounce-1 batch (cosine about geometric normals) ---
    @jax.jit
    def bounce_batch(o, d):
        hit = packet.intersect_clusters(accel, o, d, 1e-3, 1e20,
                                        backend="pallas")
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
        o2 = jnp.where(live[:, None], p + gn * 1e-3,
                       jnp.full_like(p, packet._PARK))
        d2 = jnp.where(live[:, None], d2, jnp.array([[0.0, 0.0, 1.0]]))
        return o2, d2, p, gn, live

    o2, d2, p, gn, live = jax.block_until_ready(bounce_batch(o, d))
    tmax2 = jnp.where(live, 1e20, 0.0).astype(jnp.float32)

    tile_rays = packet.TILE_RAYS
    chunk_rays = packet.CHUNK_TILES * tile_rays
    dir_bits = int(os.environ.get("PT_CLOSEST_DB", "3"))

    # --- stage: coherence argsort over the whole wavefront ---
    sortperm = jax.jit(lambda o, d: packet._coherence_order(
        accel, o, d, dir_bits)[0])
    dt_sort = timed(sortperm, o2, d2)
    print(f"sortperm  [{n}]:        {dt_sort*1e3:9.1f} ms", flush=True)

    @jax.jit
    def permute(o, d, tm):
        order, inv = packet._coherence_order(accel, o, d, dir_bits)
        odt = jnp.concatenate([o, d, tm[:, None]], axis=1)[order]
        return odt, inv

    dt_perm = timed(permute, o2, d2, tmax2)
    print(f"sort+permute:           {dt_perm*1e3:9.1f} ms", flush=True)

    # --- stage: per-chunk cull + schedule (prep minus the sweep) ---
    def _prep_chunk(rays):
        o, d, tm = rays
        n_tiles = o.shape[0] // tile_rays
        tile_tnear = packet._tile_cull(accel, o, d, 1e-3, tm, n_tiles,
                                       tile_rays)
        st, si = packet._sorted_schedule(tile_tnear, 1)
        # consume st/si so the sort can't be DCE'd; cheap reduction,
        # broadcast back to per-RAY shape (_chunk_map flattens outputs
        # by ray count)
        s = jnp.sum(jnp.where(jnp.isfinite(st), st, 0.0), axis=1) + \
            jnp.sum(si, axis=1).astype(jnp.float32)
        return jnp.broadcast_to(s[:, None],
                                (s.shape[0], tile_rays)).reshape(-1)

    @jax.jit
    def prep_only(o, d, tm):
        # sort+permute, then chunked cull+schedule - the closest call's
        # exact prep path minus the Pallas sweep
        order, _ = packet._coherence_order(accel, o, d, dir_bits)
        odt = jnp.concatenate([o, d, tm[:, None]], axis=1)[order]
        rays = (odt[:, 0:3], odt[:, 3:6], odt[:, 6])
        return packet._chunk_map(_prep_chunk, rays, o.shape[0], tile_rays,
                                 chunk_rays)

    dt_prep = timed(prep_only, o2, d2, tmax2)
    print(f"prep-only (sort+cull+sched): {dt_prep*1e3:6.1f} ms", flush=True)

    # --- stage: cull alone / schedule-sort alone at one chunk ---
    m = min(chunk_rays, n)
    oc, dc = o2[:m], d2[:m]
    tmc = tmax2[:m]
    n_tiles_c = m // tile_rays
    cull1 = jax.jit(lambda o, d, tm: packet._tile_cull(
        accel, o, d, 1e-3, tm, n_tiles_c, tile_rays))
    dt_cull = timed(cull1, oc, dc, tmc)
    ttn = jax.block_until_ready(cull1(oc, dc, tmc))
    sched1 = jax.jit(lambda t: packet._sorted_schedule(t, 1)[0])
    dt_sched = timed(sched1, ttn)
    n_chunks = (n + chunk_rays - 1) // chunk_rays
    print(f"cull [chunk {n_tiles_c}x{C}]:  {dt_cull*1e3:9.1f} ms "
          f"(x{n_chunks} chunks = {dt_cull*n_chunks*1e3:.0f} ms)",
          flush=True)
    print(f"sched sort [chunk]:     {dt_sched*1e3:9.1f} ms "
          f"(x{n_chunks} = {dt_sched*n_chunks*1e3:.0f} ms)", flush=True)

    # --- full traversal calls ---
    closest = jax.jit(lambda o, d, tm: packet.intersect_clusters(
        accel, o, d, 1e-3, tm, backend="pallas").t)
    dt_closest = timed(closest, o2, d2, tmax2)
    print(f"closest (full):         {dt_closest*1e3:9.1f} ms  "
          f"[sweep ~= {max(0.0, dt_closest-dt_prep)*1e3:.0f} ms]",
          flush=True)

    # shadow-like batch: from the hit points toward one light-ish corner
    Lpos = jnp.array([10.0, 7.5, 6.0], jnp.float32)
    to_l = Lpos[None, :] - p
    dist = jnp.linalg.norm(to_l, axis=1)
    dl = to_l / jnp.maximum(dist, 1e-6)[:, None]
    os_ = jnp.where(live[:, None], p + gn * 1e-3,
                    jnp.full_like(p, packet._PARK))
    tl = jnp.where(live, dist - 2e-3, 0.0)
    occl = jax.jit(lambda o, d, tm: packet.occluded_clusters(
        accel, o, d, tm, backend="pallas").astype(jnp.float32))
    dt_occl = timed(occl, os_, dl, tl)
    print(f"occluded (full):        {dt_occl*1e3:9.1f} ms", flush=True)

    # --- fetch_surface on the primary hits ---
    @jax.jit
    def fetch(o, d):
        hit = packet.intersect_clusters(accel, o, d, 1e-3, 1e20,
                                        backend="pallas")
        sr = path_mod.pack_surface_rows(scene)
        s = path_mod.fetch_surface(scene, sr, hit, o, d, False)
        return s.albedo

    dt_fetch = timed(fetch, o, d)
    print(f"closest+fetch:          {dt_fetch*1e3:9.1f} ms  "
          f"[fetch ~= {max(0.0, dt_fetch-dt_closest)*1e3:.0f} ms]",
          flush=True)

    print("\nmodel: 6 bounces x (closest + occluded) + fetch/bsdf glue; "
          "compare vs the banked ms/sample.", flush=True)


if __name__ == "__main__":
    main()
