"""Sweep max_clusters (cluster granularity) on the bounce-ray workload.

Finer clusters = the per-ray cull + sorted schedule filter triangles at
finer granularity (fewer wasted MT tests per visit), at the cost of more
columns (more per-column fixed cost) and a bigger cull/schedule. The
round-1 value (512 clusters of K=512 tris at 262k) predates the Pallas
sweep's low per-column cost - re-sweep on hardware.

Usage: CLUSTERS=512,1024,2048,4096 python benchmarks/cluster_sweep.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


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

    from pathtracer.accel.cluster import build_clusters
    from pathtracer.integrator import camera as cam_mod
    from pathtracer.integrator.camera import Camera
    from pathtracer.kernels import packet
    from pathtracer.scene.procedural import sponza_like
    from pathtracer.utils import vmath

    w = int(os.environ.get("BENCH_WIDTH", 1920))
    h = int(os.environ.get("BENCH_HEIGHT", 1080))
    tris = int(os.environ.get("BENCH_TRIS", 262_000))
    cs = [int(x) for x in os.environ.get(
        "CLUSTERS", "512,1024,2048,4096").split(",")]
    method = os.environ.get("METHOD", "morton")
    n = w * h

    scene = sponza_like(target_tris=tris).finalize()
    tri_ids = jnp.arange(scene.n_tris)
    v0, v1, v2 = scene.tri_vertices(tri_ids)
    cam = Camera(position=(3.0, 4.5, 6.0))
    cam.look_at((14.0, 3.0, 6.0))

    pix = jnp.arange(n, dtype=jnp.int32)
    samp = jnp.zeros((n,), jnp.uint32)
    o0, d0 = cam_mod.generate_primary_rays(cam.state(), w, h, 70.0, pix,
                                           samp, 0)
    accel0 = build_clusters(v0, v1, v2, cs[0])

    @jax.jit
    def make_bounce(o0, d0):
        hit = packet.intersect_clusters(accel0, o0, d0, 1e-3, 1e20,
                                        backend="pallas")
        t = jnp.where(jnp.isfinite(hit.t), hit.t, 5.0)
        o1 = o0 + d0 * t[:, None]
        key = jax.random.PRNGKey(7)
        u = jax.random.uniform(key, (n, 2))
        r = jnp.sqrt(u[:, 0])
        phi = 2 * jnp.pi * u[:, 1]
        local = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi),
                           jnp.sqrt(1 - u[:, 0])], axis=1)
        nrm = -d0
        t0b, b0 = vmath.onb(nrm)
        d1 = local[:, 0:1] * t0b + local[:, 1:2] * b0 + local[:, 2:3] * nrm
        return o1 + 1e-3 * d1, d1

    o1, d1 = jax.block_until_ready(make_bounce(o0, d0))
    tmax = jnp.full((n,), 4.0, jnp.float32)

    for mc in cs:
        accel = build_clusters(v0, v1, v2, mc, method=method)
        c, k = accel.n_clusters, accel.tris_per_cluster
        f_p = jax.jit(lambda o, d, a=accel: packet.intersect_clusters(
            a, o, d, 1e-3, 1e20, backend="pallas").t)
        f_b = jax.jit(lambda o, d, a=accel: packet.intersect_clusters(
            a, o, d, 1e-3, 1e20, backend="pallas").t)
        f_o = jax.jit(lambda o, d, tm, a=accel: packet.occluded_clusters(
            a, o, d, tm, backend="pallas").astype(jnp.float32))
        tp = timed(f_p, o0, d0)
        tb = timed(f_b, o1, d1)
        to = timed(f_o, o1, d1, tmax)
        print(f"{method} C={c:5d} K={k:4d}: primary {tp*1e3:7.1f} ms "
              f"({n/tp/1e6:5.2f} Mr/s)  bounce {tb*1e3:7.1f} ms "
              f"({n/tb/1e6:5.2f})  occl {to*1e3:7.1f} ms ({n/to/1e6:5.2f})",
              flush=True)


if __name__ == "__main__":
    main()
