"""A/B: cell-interleaved env-NEE draws (cfg.env_nee_cell) on config 4.

The r5 attribution (benchmarks/env_attrib.py) measured env shadow rays
at 2.4 us/query = 69.5% of the envmap frame - incoherent per-lane sky
directions defeat the occlusion sort. env_nee_cell=N shares one drawn
direction per NxN screen cell per (sample, depth): same per-pixel
estimator, direction-coherent shadow tiles.

Runs the EXACT config-4 workload (1024x1024@1spp depth 6, bunny + tex +
HDR env) at a grid of cell sizes. Usage (TPU; serialize chip jobs):
  python benchmarks/env_cell_ab.py            # cells 1, 4, 8, 16
  CELLS=1,8 BENCH_FRAMES=4 python benchmarks/env_cell_ab.py
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    if os.environ.get("PT_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("PATHTRACER_CACHE",
                       os.path.expanduser("~/.cache/pathtracer-jax")))

    from benchmarks.run_configs import build_configs
    from pathtracer.accel.cluster import build_scene_clusters
    from pathtracer.bench.harness import bench_scene

    scale = float(os.environ.get("BENCH_SCALE", "1.0"))
    frames = int(os.environ.get("BENCH_FRAMES", "6"))
    cells = [int(c) for c in os.environ.get("CELLS", "1,4,8,16").split(",")]

    name, scene_fn, cfg, camera = build_configs(scale)[3]
    assert name == "envmap_textured_1024", name
    cfg = dataclasses.replace(cfg, frame_batch=1)
    scene = build_scene_clusters(scene_fn())
    print(f"devices: {jax.devices()}  cells={cells}", flush=True)

    for cell in cells:
        c = dataclasses.replace(cfg, env_nee_cell=cell)
        r = bench_scene(scene, c, camera, warmup=3, frames=frames)
        print(json.dumps({"cell": cell,
                          "ms_per_frame": round(r.ms_per_frame, 2),
                          "mrays_s": round(r.mrays_per_sec, 3),
                          "rays_per_frame": round(r.rays_per_frame / 1e6,
                                                  3)}), flush=True)


if __name__ == "__main__":
    main()
