"""Decompose one rendered frame into stage timings on real hardware."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(fn, *args, reps=2):
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
        os.path.expanduser("~/.cache/pathtracer-jax"))

    from pathtracer.accel.cluster import build_scene_clusters
    from pathtracer.config import RenderConfig
    from pathtracer.integrator import camera as cam_mod
    from pathtracer.integrator import path as path_mod
    from pathtracer.integrator.camera import Camera
    from pathtracer.kernels.packet import intersect_clusters, occluded_clusters
    from pathtracer.render import make_intersectors, render_frame_with_stats
    from pathtracer.scene.procedural import sponza_like

    w, h = 320, 180
    n = w * h
    scene = sponza_like(target_tris=20000).finalize()
    scene = build_scene_clusters(scene)
    cam = Camera(position=(3.0, 4.5, 6.0))
    cam.look_at((14.0, 3.0, 6.0))
    cs = cam.state()

    accel = scene.clusters
    pix = jnp.arange(n, dtype=jnp.int32)
    samp = jnp.zeros((n,), jnp.uint32)
    o, d = cam_mod.generate_primary_rays(cs, w, h, 70.0, pix, samp, 0)
    o, d = jax.block_until_ready((o, d))

    isect = jax.jit(lambda o, d: intersect_clusters(accel, o, d, 1e-3, 1e20).t)
    dt = timed(isect, o, d)
    print(f"intersect alone [{n}]: {dt*1e3:9.1f} ms", flush=True)

    occ = jax.jit(lambda o, d: occluded_clusters(
        accel, o, d, jnp.full((n,), 5.0, jnp.float32)).astype(jnp.float32))
    dt = timed(occ, o, d)
    print(f"occluded alone  [{n}]: {dt*1e3:9.1f} ms", flush=True)

    # surface fetch alone
    ifn, ofn = make_intersectors(scene, RenderConfig(width=w, height=h))
    rows = jax.jit(lambda: path_mod.pack_surface_rows(scene))
    dt = timed(rows)
    print(f"pack_surface_rows:    {dt*1e3:9.1f} ms", flush=True)

    @jax.jit
    def surf_fetch(o, d):
        hit = intersect_clusters(accel, o, d, 1e-3, 1e20)
        sr = path_mod.pack_surface_rows(scene)
        s = path_mod.fetch_surface(scene, sr, hit, o, d, False)
        return s.albedo

    dt = timed(surf_fetch, o, d)
    print(f"intersect+fetch:      {dt*1e3:9.1f} ms", flush=True)

    for depth in (1, 2, 6):
        cfg = RenderConfig(width=w, height=h, spp=1, max_depth=depth)
        fn = jax.jit(lambda s, c, f, cfg=cfg:
                     render_frame_with_stats(s, cfg, c, f))
        dt = timed(fn, scene, cs, 0)
        print(f"render_frame depth={depth}: {dt*1e3:9.1f} ms", flush=True)


if __name__ == "__main__":
    main()
