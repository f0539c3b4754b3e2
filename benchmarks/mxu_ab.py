"""A/B the MXU sweep kernel variants on hardware (precision, ring depth).

Usage: BENCH_TRIS=262000 BENCH_RAYS=524288 python benchmarks/mxu_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(fn, *args, reps=5):
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
    from pathtracer.kernels import packet, pallas_sweep
    from pathtracer.render import _swizzled_pixel_ids
    from pathtracer.scene.procedural import sponza_like

    tris = int(os.environ.get("BENCH_TRIS", 262_000))
    n = int(os.environ.get("BENCH_RAYS", 1 << 19))

    scene = sponza_like(target_tris=tris).finalize()
    v0, v1, v2 = scene.tri_vertices(jnp.arange(scene.n_tris))
    accel = build_clusters(v0, v1, v2)
    print(f"tris={scene.n_tris} C={accel.n_clusters} "
          f"K={accel.tris_per_cluster}", flush=True)

    cam = Camera(position=(3.0, 4.5, 6.0))
    cam.look_at((14.0, 3.0, 6.0))
    w, h = 1024, n // 1024
    pix = _swizzled_pixel_ids(w, h)
    samp = jnp.zeros((n,), jnp.uint32)
    o, d = cam_mod.generate_primary_rays(cam.state(), w, h, 70.0, pix,
                                         samp, 0)
    # bounce-like rays: origins at hits, cosine-ish dirs
    t = packet.intersect_clusters(accel, o, d, 1e-3, 1e20).t
    hp = o + d * jnp.where(jnp.isfinite(t), t - 1e-3, 1.0)[:, None]
    nd = jax.random.normal(jax.random.PRNGKey(0), (n, 3), jnp.float32)
    nd = nd / jnp.linalg.norm(nd, axis=1, keepdims=True)

    mrays = n / 1e6

    for prec_name, prec in (("HIGHEST", jax.lax.Precision.HIGHEST),
                            ("DEFAULT", jax.lax.Precision.DEFAULT)):
        for slots in (4, 8):
            pallas_sweep._MXU_PRECISION = prec
            pallas_sweep.SLOTS = slots

            def closest(o_, d_):
                return packet.intersect_clusters(
                    accel, o_, d_, 1e-3, 1e20, backend="pallas").t

            def occl(o_, d_):
                return packet.occluded_clusters(
                    accel, o_, d_, 1e18, backend="pallas")

            cj = jax.jit(closest)
            oj = jax.jit(occl)
            tp = timed(cj, o, d)
            tb = timed(cj, hp, nd)
            to = timed(oj, hp, nd)
            print(f"prec={prec_name} slots={slots}: "
                  f"primary {mrays / tp:7.2f} Mrays/s  "
                  f"bounce {mrays / tb:7.2f}  occl {mrays / to:7.2f}",
                  flush=True)


if __name__ == "__main__":
    main()
