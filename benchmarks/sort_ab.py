"""3-way A/B of ray-ordering schemes at full scale (1080p, 262k tris).

(a) wavefront: integrator per-bounce global sort + compaction (round-2)
(b) chunk:     packet per-chunk sort per traversal call (round-1)
(c) none:      no sorting anywhere; lanes stay in swizzled pixel order,
               dead lanes parked in place.

Usage: MODES=chunk,none python benchmarks/sort_ab.py
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

    from pathtracer.accel.cluster import build_scene_clusters
    from pathtracer.config import RenderConfig
    from pathtracer.integrator.camera import Camera
    from pathtracer.render import render_sample
    from pathtracer.scene.procedural import sponza_like

    tris = int(os.environ.get("BENCH_TRIS", 262_000))
    w = int(os.environ.get("BENCH_WIDTH", 1920))
    h = int(os.environ.get("BENCH_HEIGHT", 1080))
    modes = os.environ.get("MODES", "chunk,none,wavefront").split(",")

    scene = sponza_like(target_tris=tris).finalize()
    scene = build_scene_clusters(scene)
    cam = Camera(position=(3.0, 4.5, 6.0))
    cam.look_at((14.0, 3.0, 6.0))
    cs = cam.state()

    opts = {
        "wavefront": dict(wavefront_sort=True),
        "chunk": dict(wavefront_sort=False, packet_sort=True),
        "none": dict(wavefront_sort=False, packet_sort=False),
    }
    for mode in modes:
        cfg = RenderConfig(width=w, height=h, spp=1, max_depth=6,
                           intersector="cluster", **opts[mode])

        def run(scene, cs):
            return render_sample(scene, cfg, cs, 0, 0)

        img, rays = run(scene, cs)      # compile + warm
        float(jnp.sum(img))
        for _ in range(2):
            img, rays = run(scene, cs)
            float(jnp.sum(img))
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            img, rays = run(scene, cs)
            s = float(jnp.sum(img))
        dt = (time.perf_counter() - t0) / reps
        mr = float(rays) / 1e6
        print(f"{mode:10s}: {dt*1e3:8.1f} ms/sample  {mr/dt:6.2f} Mrays/s"
              f"  mean={s/(w*h*3):.5f}", flush=True)


if __name__ == "__main__":
    main()
