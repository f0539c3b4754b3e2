"""Minimal on-chip probe for sweep-kernel changes.

Small scene + small ray batch, stage-by-stage flush prints so a hang is
attributable. Compares closest-hit & occlusion results against the
XLA reference path (intersect_bruteforce) on the same rays.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("PATHTRACER_CACHE",
                       os.path.expanduser("~/.cache/pathtracer-jax")))
    print("devices:", jax.devices(), flush=True)

    from pathtracer.accel.cluster import build_scene_clusters
    from pathtracer.kernels import packet
    from pathtracer.kernels.intersect import intersect_brute
    from pathtracer.scene.procedural import sponza_like

    tris = int(os.environ.get("BENCH_TRIS", 20_000))
    n = int(os.environ.get("BENCH_RAYS", 1 << 15))

    scene = build_scene_clusters(sponza_like(target_tris=tris).finalize())
    accel = scene.cluster_accel
    print("scene built:", scene.n_tris, "tris", flush=True)

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    o = jax.random.uniform(k1, (n, 3), minval=jnp.array([1.0, 0.5, 1.0]),
                           maxval=jnp.array([19.0, 7.0, 11.0]))
    d = jax.random.normal(k2, (n, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)

    t0 = time.perf_counter()
    hit = packet.intersect_clusters(accel, o, d, 1e-3, 1e9)
    t, tri = hit.t, hit.tri
    s = float(jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0)))
    print(f"closest: compile+run {time.perf_counter()-t0:.1f}s "
          f"sum_t={s:.3f} hits={int(jnp.sum(tri >= 0))}", flush=True)

    t0 = time.perf_counter()
    for _ in range(3):
        hit = packet.intersect_clusters(accel, o, d, 1e-3, 1e9)
        t = hit.t
        float(jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0)))
    print(f"closest warm: {(time.perf_counter()-t0)/3*1e3:.1f} ms", flush=True)

    t0 = time.perf_counter()
    blocked = packet.occluded_clusters(accel, o, d, 4.0)
    nb = int(jnp.sum(blocked))
    print(f"occl: compile+run {time.perf_counter()-t0:.1f}s blocked={nb}",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(3):
        blocked = packet.occluded_clusters(accel, o, d, 4.0)
        float(jnp.sum(blocked))
    print(f"occl warm: {(time.perf_counter()-t0)/3*1e3:.1f} ms", flush=True)

    # correctness vs brute force on a small slice
    m = 2048
    v0, v1, v2 = scene.tri_vertices(jnp.arange(scene.n_tris))
    bhit = intersect_brute(o[:m], d[:m], v0, v1, v2, 1e-3, 1e9)
    tb = jnp.where(bhit.tri >= 0, bhit.t, jnp.inf)
    t_s = t[:m]
    mism = int(jnp.sum(jnp.abs(jnp.where(jnp.isfinite(t_s), t_s, 0.0)
                               - jnp.where(jnp.isfinite(tb), tb, 0.0))
                       > 1e-3))
    print(f"vs bruteforce: {mism} t-mismatches / {m}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
