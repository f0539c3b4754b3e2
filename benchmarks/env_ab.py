"""Generic end-to-end A/B over environment knobs (trace-time env vars).

GRID is a comma-separated list of configs; each config is a
semicolon-separated list of VAR=VALUE assignments (empty string = all
defaults). Each config re-traces render_sample (clear_cache) so
trace-time env reads (PT_SWEEP_GATE, PT_OCCL_DB, PT_CLOSEST_DB,
PT_OCCL_ACCEL, PT_SKIP_NEE, ...) take effect. CHUNK_TILES is
import-time - use frame_ab.py for chunk sweeps.

Usage: GRID="PT_SWEEP_GATE=0,PT_SWEEP_GATE=1" python benchmarks/env_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

_MANAGED = ["PT_SWEEP_GATE", "PT_OCCL_DB", "PT_CLOSEST_DB",
            "PT_OCCL_ACCEL", "PT_DIR_BITS",
            "PT_BOUNCE_ACCEL", "PT_TILE_RAYS"]


def main():
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("PATHTRACER_CACHE",
                       os.path.expanduser("~/.cache/pathtracer-jax")))

    grid = os.environ.get("GRID", "PT_SWEEP_GATE=0,PT_SWEEP_GATE=1")
    w = int(os.environ.get("BENCH_WIDTH", 1920))
    h = int(os.environ.get("BENCH_HEIGHT", 1080))
    tris = int(os.environ.get("BENCH_TRIS", 262_000))
    depth = int(os.environ.get("BENCH_DEPTH", 6))
    textured = os.environ.get("BENCH_TEXTURED", "0") != "0"
    reps = int(os.environ.get("BENCH_REPS", 3))

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
    cfg = RenderConfig(width=w, height=h, spp=1, max_depth=depth,
                       intersector="cluster")

    for entry in grid.split(","):
        for var in _MANAGED:
            os.environ.pop(var, None)
        label = entry.strip() or "defaults"
        skip_nee = False
        for assign in entry.split(";"):
            if assign.strip():
                k, v = assign.strip().split("=")
                if k == "PT_SKIP_NEE":   # special: cfg.skip_nee
                    skip_nee = v != "0"
                else:
                    os.environ[k] = v
        cfg = RenderConfig(width=w, height=h, spp=1, max_depth=depth,
                           intersector="cluster", skip_nee=skip_nee)
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
        print(f"{label:40s}: {dt*1e3:7.1f} ms/sample  {mr/dt:5.2f} Mrays/s"
              f"  mean={s/(w*h*3):.5f}", flush=True)


if __name__ == "__main__":
    main()
