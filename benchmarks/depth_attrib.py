"""Depth x NEE attribution of the true multi-bounce headline frame.

Renders the 1080p/262k sponza_like frame at several max_depths with and
without NEE shadow rays (cfg.skip_nee, bench-only) to attribute the
frame cost: primary trace vs per-bounce closest-hit vs shadow batches.

Usage: COMBOS="6:0,6:1,1:0,3:0" python benchmarks/depth_attrib.py
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

    combos = [tuple(int(v) for v in c.split(":"))
              for c in os.environ.get("COMBOS", "6:0,6:1,1:0,3:0").split(",")]
    w = int(os.environ.get("BENCH_WIDTH", 1920))
    h = int(os.environ.get("BENCH_HEIGHT", 1080))
    tris = int(os.environ.get("BENCH_TRIS", 262_000))
    reps = int(os.environ.get("BENCH_REPS", 2))

    from pathtracer.accel.cluster import build_scene_clusters
    from pathtracer.config import RenderConfig
    from pathtracer.integrator.camera import Camera
    from pathtracer.render import render_sample
    from pathtracer.scene.procedural import sponza_like

    scene = build_scene_clusters(
        sponza_like(target_tris=tris).finalize())
    cam = Camera(position=(3.0, 4.5, 6.0))
    cam.look_at((14.0, 3.0, 6.0))
    cs = cam.state()

    for depth, skip_nee in combos:
        cfg = RenderConfig(width=w, height=h, spp=1, max_depth=depth,
                           intersector="cluster", skip_nee=bool(skip_nee))
        render_sample.clear_cache()
        img, rays = render_sample(scene, cfg, cs, 0, 0)
        float(jnp.sum(img))
        for _ in range(2):
            img, rays = render_sample(scene, cfg, cs, 0, 0)
            float(jnp.sum(img))
        t0 = time.perf_counter()
        for _ in range(reps):
            img, rays = render_sample(scene, cfg, cs, 0, 0)
            s = float(jnp.sum(img))
        dt = (time.perf_counter() - t0) / reps
        mr = float(rays) / 1e6
        print(f"depth={depth} skip_nee={skip_nee}: {dt*1e3:8.1f} ms/sample  "
              f"{mr:6.2f} Mrays  {mr/dt:5.2f} Mrays/s  mean={s/(w*h*3):.5f}",
              flush=True)


if __name__ == "__main__":
    main()
