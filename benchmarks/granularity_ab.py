"""Cluster granularity (C x K) A/B on the REAL multi-bounce frame.

The pre-winding-fix sweep (docs/PERF.md 0.6) picked C=512/K=512 on
synthetic bounce batches; with the true workload, the extraction gate,
and the median accel serving bounce rays, the optimum may shift: smaller
K cuts per-column MT cost while the gate already cut the extraction
share.

Usage: SIZES="512,1024" python benchmarks/granularity_ab.py
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

    sizes = [int(s) for s in os.environ.get("SIZES", "512,1024").split(",")]
    w = int(os.environ.get("BENCH_WIDTH", 1920))
    h = int(os.environ.get("BENCH_HEIGHT", 1080))
    tris = int(os.environ.get("BENCH_TRIS", 262_000))
    reps = int(os.environ.get("BENCH_REPS", 2))

    from pathtracer.accel.cluster import build_scene_clusters
    from pathtracer.config import RenderConfig
    from pathtracer.integrator.camera import Camera
    from pathtracer.render import render_sample
    from pathtracer.scene.procedural import sponza_like

    base = sponza_like(target_tris=tris).finalize()
    cam = Camera(position=(3.0, 4.5, 6.0))
    cam.look_at((14.0, 3.0, 6.0))
    cs = cam.state()
    cfg = RenderConfig(width=w, height=h, spp=1, max_depth=6,
                       intersector="cluster")

    fine_method = os.environ.get("FINE_METHOD")  # e.g. "sah"

    for mc in sizes:
        scene = build_scene_clusters(base, max_clusters=mc)
        if fine_method:
            import dataclasses

            from pathtracer.accel.cluster import build_clusters
            v0, v1, v2 = base.tri_vertices(jnp.arange(base.n_tris))
            scene = dataclasses.replace(
                scene, clusters_fine=build_clusters(
                    v0, v1, v2, mc, method=fine_method))
        k = scene.clusters.blocks_t.shape[2]
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
        print(f"C={mc:5d} K={k:4d}: {dt*1e3:8.1f} ms/sample  "
              f"{mr/dt:5.2f} Mrays/s  mean={s/(w*h*3):.5f}", flush=True)


if __name__ == "__main__":
    main()
