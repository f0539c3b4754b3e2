"""Sweep packet-traversal parameters (tile size, CPI, sort) on hardware."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(fn, *args, reps=3):
    float(jnp.sum(fn(*args)))
    t0 = time.perf_counter()
    for _ in range(reps):
        float(jnp.sum(fn(*args)))
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

    tris = int(os.environ.get("BENCH_TRIS", 20_000))
    n = int(os.environ.get("BENCH_RAYS", 1 << 19))

    from pathtracer.render import _swizzled_pixel_ids

    scene = sponza_like(target_tris=tris).finalize()
    tri_ids = jnp.arange(scene.n_tris)
    v0, v1, v2 = scene.tri_vertices(tri_ids)

    cam = Camera(position=(3.0, 4.5, 6.0))
    cam.look_at((14.0, 3.0, 6.0))
    cs = cam.state()
    w, h = 1024, n // 1024
    pix = _swizzled_pixel_ids(w, h)            # block order, like render.py
    samp = jnp.zeros((n,), jnp.uint32)
    o, d = cam_mod.generate_primary_rays(cs, w, h, 70.0, pix, samp, 0)

    accels = {mc: build_clusters(v0, v1, v2, max_clusters=mc)
              for mc in (1024, 2048)}
    for mc, a in accels.items():
        print(f"max_clusters={mc}: C={a.n_clusters} K={a.tris_per_cluster}",
              flush=True)

    # bounce-like: origins at primary hits, random hemisphere dirs
    key = jax.random.PRNGKey(0)
    t = packet.intersect_clusters(accels[1024], o, d, 1e-3, 1e20).t
    hp = o + d * jnp.where(jnp.isfinite(t), t, 1.0)[:, None]
    nd = jax.random.normal(key, (n, 3), jnp.float32)
    nd = nd / jnp.linalg.norm(nd, axis=1, keepdims=True)
    hp, nd = jax.block_until_ready((hp, nd))

    for mc in (1024, 2048):
        for cpi in (1, 2, 4):
            for chunk in (16384, 32768):
                accel = accels[mc]
                fn = jax.jit(
                    lambda o, d, a=accel, cpi=cpi, chunk=chunk:
                    packet.intersect_clusters(
                        a, o, d, 1e-3, 1e20, sort_rays=True,
                        tile_rays=256, cpi=cpi, chunk_rays=chunk,
                        cull="ray").t)
                dtp = timed(fn, o, d)
                dtb = timed(fn, hp, nd)
                print(f"K={accel.tris_per_cluster:3d} cpi={cpi} "
                      f"chunk={chunk:5d}: "
                      f"primary {n/dtp/1e6:7.1f} Mrays/s   "
                      f"bounce {n/dtb/1e6:7.1f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
