"""A/B: forward vs REVERSED shadow rays (cfg.shadow_from_light).

Reversed NEE shadow rays originate on the emitter area instead of the
scattered surface points, turning the occlusion batch from bounce-class
(incoherent origins, measured docs/PERF.md 0.9 addendum) into
camera-class (tight origins, direction cone). Sweeps the occl dir_bits
and accel routing for the reversed geometry on the real headline frame.

Usage: GRID="fwd:2:morton,rev:2:morton,rev:3:morton,rev:2:fine,rev:3:fine"
       python benchmarks/shadow_ab.py
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

    grid = os.environ.get(
        "GRID", "fwd:2:morton,rev:2:morton,rev:3:morton,rev:2:fine,rev:3:fine")
    w = int(os.environ.get("BENCH_WIDTH", 1920))
    h = int(os.environ.get("BENCH_HEIGHT", 1080))
    tris = int(os.environ.get("BENCH_TRIS", 262_000))
    textured = os.environ.get("BENCH_TEXTURED", "0") != "0"

    from pathtracer.accel.cluster import build_scene_clusters
    from pathtracer.config import RenderConfig
    from pathtracer.integrator.camera import Camera
    from pathtracer.render import render_sample
    from pathtracer.scene.procedural import sponza_like

    scene = build_scene_clusters(
        sponza_like(target_tris=tris, textured=textured).finalize())
    cam = Camera(position=(3.0, 4.5, 6.0))
    cam.look_at((14.0, 3.0, 6.0))
    cs = cam.state()

    for entry in grid.split(","):
        scheme, db, acc = entry.split(":")
        os.environ["PT_OCCL_DB"] = db
        if acc == "fine":
            os.environ["PT_OCCL_ACCEL"] = "fine"
        else:
            os.environ.pop("PT_OCCL_ACCEL", None)
        render_sample.clear_cache()   # env knobs are read at trace time

        cfg = RenderConfig(width=w, height=h, spp=1, max_depth=6,
                           intersector="cluster",
                           shadow_from_light=(scheme == "rev"))

        img, rays = render_sample(scene, cfg, cs, 0, 0)
        float(jnp.sum(img))
        for _ in range(2):
            img, rays = render_sample(scene, cfg, cs, 0, 0)
            float(jnp.sum(img))
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            img, rays = render_sample(scene, cfg, cs, 0, 0)
            s = float(jnp.sum(img))
        dt = (time.perf_counter() - t0) / reps
        mr = float(rays) / 1e6
        print(f"{scheme} occl_db={db} accel={acc:6s}: {dt*1e3:7.1f} "
              f"ms/sample  {mr/dt:5.2f} Mrays/s  mean={s/(w*h*3):.5f}",
              flush=True)


if __name__ == "__main__":
    main()
