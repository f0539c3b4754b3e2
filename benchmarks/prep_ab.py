"""Attribute traversal time: per-chunk prep vs sweep, at full 1080p scale.

Times (all jitted, fully synced, on-chip):
  1. intersect_clusters sorted vs unsorted on 2M bounce-like rays
  2. occluded_clusters sorted vs unsorted
  3. prep-only (coherence sort + permutes + cull + schedule) over all chunks
  4. 32k-chunk micro: argsort-based inverse vs scatter-based inverse

Bounce-like rays = primary hits + cosine-sampled continuation directions,
the incoherent regime that dominates deep-bounce frames.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=3):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.tree_util.tree_map(
            lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
    return (time.perf_counter() - t0) / reps


def main():
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("PATHTRACER_CACHE",
                       os.path.expanduser("~/.cache/pathtracer-jax")))

    from pathtracer.accel.cluster import build_scene_clusters
    from pathtracer.integrator import camera as cam_mod
    from pathtracer.integrator.camera import Camera
    from pathtracer.kernels import packet
    from pathtracer.scene.procedural import sponza_like
    from pathtracer.utils import vmath

    w = int(os.environ.get("BENCH_WIDTH", 1920))
    h = int(os.environ.get("BENCH_HEIGHT", 1080))
    tris = int(os.environ.get("BENCH_TRIS", 262_000))
    n = w * h

    scene = sponza_like(target_tris=tris).finalize()
    scene = build_scene_clusters(scene)
    accel = scene.clusters
    cam = Camera(position=(3.0, 4.5, 6.0))
    cam.look_at((14.0, 3.0, 6.0))
    cs = cam.state()

    pix = jnp.arange(n, dtype=jnp.int32)
    samp = jnp.zeros((n,), jnp.uint32)
    o0, d0 = cam_mod.generate_primary_rays(cs, w, h, 70.0, pix, samp, 0)

    # bounce-like rays: move to the primary hit, cosine-sample a new dir
    @jax.jit
    def make_bounce(o0, d0):
        hit = packet.intersect_clusters(accel, o0, d0, 1e-3, 1e20,
                                        backend="pallas")
        t = jnp.where(jnp.isfinite(hit.t), hit.t, 5.0)
        o1 = o0 + d0 * t[:, None]
        key = jax.random.PRNGKey(7)
        u = jax.random.uniform(key, (n, 2))
        r = jnp.sqrt(u[:, 0])
        phi = 2 * jnp.pi * u[:, 1]
        local = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi),
                           jnp.sqrt(1 - u[:, 0])], axis=1)
        nrm = -d0  # stand-in shading normal
        t0b, b0 = vmath.onb(nrm)
        d1 = (local[:, 0:1] * t0b + local[:, 1:2] * b0
              + local[:, 2:3] * nrm)
        return o1 + 1e-3 * d1, d1

    o1, d1 = make_bounce(o0, d0)
    o1, d1 = jax.block_until_ready((o1, d1))
    tmax = jnp.full((n,), 4.0, jnp.float32)

    for name, fn in [
        ("closest sorted  ", jax.jit(lambda o, d: packet.intersect_clusters(
            accel, o, d, 1e-3, 1e20, sort_rays=True, backend="pallas").t)),
        ("closest unsorted", jax.jit(lambda o, d: packet.intersect_clusters(
            accel, o, d, 1e-3, 1e20, sort_rays=False, backend="pallas").t)),
    ]:
        dt = timed(fn, o1, d1)
        print(f"{name}: {dt*1e3:8.1f} ms  ({n/dt/1e6:5.2f} Mrays/s)",
              flush=True)

    for name, fn in [
        ("occluded sorted  ", jax.jit(lambda o, d, tm:
            packet.occluded_clusters(accel, o, d, tm, sort_rays=True,
                                     backend="pallas").astype(jnp.float32))),
        ("occluded unsorted", jax.jit(lambda o, d, tm:
            packet.occluded_clusters(accel, o, d, tm, sort_rays=False,
                                     backend="pallas").astype(jnp.float32))),
    ]:
        dt = timed(fn, o1, d1, tmax)
        print(f"{name}: {dt*1e3:8.1f} ms  ({n/dt/1e6:5.2f} Mrays/s)",
              flush=True)

    # prep-only: sort + permute + cull + schedule, mapped over chunks
    chunk = packet.CHUNK_TILES * packet.TILE_RAYS

    def prep_chunk(rays):
        o, d = rays
        order, inv = packet._coherence_order(accel, o, d)
        o = o[order]
        d = d[order]
        n_tiles = o.shape[0] // packet.TILE_RAYS
        tile_tnear = packet._tile_cull(accel, o, d, 1e-3, 1e20, n_tiles,
                                       packet.TILE_RAYS)
        st, si = packet._sorted_schedule(tile_tnear, 2)
        # touch everything so nothing is DCE'd
        return (jnp.sum(st[:, 0]) + jnp.sum(si[:, 0])
                + jnp.sum(inv[:128]) + jnp.sum(o[:8]))

    def prep_all(o, d):
        nc = n // chunk
        oc = o[:nc * chunk].reshape(nc, chunk, 3)
        dc = d[:nc * chunk].reshape(nc, chunk, 3)
        return jax.lax.map(lambda r: prep_chunk(r), (oc, dc))

    prep = jax.jit(prep_all)
    dt = timed(prep, o1, d1)
    print(f"prep-only (sort+cull+schedule): {dt*1e3:8.1f} ms", flush=True)

    # micro: inverse permutation, argsort vs scatter, chunk-local
    m = chunk
    keys = jax.random.randint(jax.random.PRNGKey(1), (m,), 0, 1 << 30,
                              jnp.uint32)

    @jax.jit
    def inv_argsort(k):
        order = jnp.argsort(k).astype(jnp.int32)
        for _ in range(19):
            order = jnp.argsort(order.astype(jnp.uint32)).astype(jnp.int32)
        return order

    @jax.jit
    def inv_scatter(k):
        order = jnp.argsort(k).astype(jnp.int32)
        iota = jnp.arange(m, dtype=jnp.int32)
        inv = order
        for _ in range(19):
            inv = jnp.zeros((m,), jnp.int32).at[inv].set(
                iota, unique_indices=True)
        return inv

    t_a = timed(inv_argsort, keys) / 20
    t_s = timed(inv_scatter, keys) / 20
    print(f"32k inverse-perm: argsort {t_a*1e6:7.1f} us  "
          f"scatter {t_s*1e6:7.1f} us", flush=True)


if __name__ == "__main__":
    main()
