"""A/B: verified primary-hit priming across the progressive spp loop.

Priming feeds sample s's primary hits (i32 per pixel) to sample s+1 as
per-ray t_max bounds (re-verified, exact - see path.trace_paths). Only
the PRIMARY segment shrinks its schedule, so the expected win is bounded
by the primary trace's share of the frame; this measures it end-to-end.

Usage: BENCH_SPP=4 python benchmarks/priming_ab.py
"""

import dataclasses
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
    w = int(os.environ.get("BENCH_WIDTH", 1920))
    h = int(os.environ.get("BENCH_HEIGHT", 1080))
    tris = int(os.environ.get("BENCH_TRIS", 262_000))
    spp = int(os.environ.get("BENCH_SPP", 4))

    from pathtracer.accel.cluster import build_scene_clusters
    from pathtracer.config import RenderConfig
    from pathtracer.integrator.camera import Camera
    from pathtracer.render import render_frame_with_stats
    from pathtracer.scene.procedural import sponza_like

    scene = build_scene_clusters(sponza_like(target_tris=tris).finalize())
    cam = Camera(position=(3.0, 4.5, 6.0))
    cam.look_at((14.0, 3.0, 6.0))
    cs = cam.state()
    base = RenderConfig(width=w, height=h, spp=spp, max_depth=6,
                        intersector="cluster")

    for name, cfg in (("off", base),
                      ("primed", dataclasses.replace(
                          base, primary_priming=True))):
        prime = None
        img, rays, prime = render_frame_with_stats(scene, cfg, cs, 0,
                                                   prime, True)
        float(jnp.sum(img))
        for _ in range(2):
            img, rays, prime = render_frame_with_stats(
                scene, cfg, cs, 0, prime, True)
            float(jnp.sum(img))
        t0 = time.perf_counter()
        reps = 2
        for _ in range(reps):
            img, rays, prime = render_frame_with_stats(
                scene, cfg, cs, 0, prime, True)
            s = float(jnp.sum(img))
        dt = (time.perf_counter() - t0) / reps
        r = float(rays)
        stats = ""
        if prime is not None:
            frac = [float(jnp.mean((prime[:, i] >= 0))) for i in range(3)]
            stats = (f" hints: tri={frac[0]:.2f}"
                     f" blk={frac[1]:.2f} envb={frac[2]:.2f}")
        print(f"{name}: {dt*1000:.0f} ms/frame ({dt*1000/spp:.0f} ms/sample)"
              f" rays/sample={r/spp/1e6:.2f}M"
              f" Mrays/s={r/dt/1e6:.2f} mean={s/(w*h*3):.4f}{stats}",
              flush=True)


if __name__ == "__main__":
    main()
