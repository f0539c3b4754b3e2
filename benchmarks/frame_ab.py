"""End-to-end frame A/B over (chunk size x closest dir_bits).

The isolated bounce/occl micro-benchmarks (chunk_sweep.py,
bounce_sweep.py) run FULLY-LIVE ray batches; real frames carry dead
lanes whose skipping granularity is the chunk. This sweeps the real
render_sample at 1080p/262k to pick production defaults.

Usage: GRID="512:2,512:3,2048:2,2048:3" python benchmarks/frame_ab.py
(each entry = CHUNK_TILES:closest_dir_bits[:sweep_cpi[:fetch_group]];
occl dir_bits fixed at 2; sweep_cpi sets PT_SWEEP_CPI and fetch_group
sets PT_FETCH_GROUP - use "-" to keep a default)
"""

import importlib
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

    grid = os.environ.get("GRID", "512:2,512:3,2048:2,2048:3")
    w = int(os.environ.get("BENCH_WIDTH", 1920))
    h = int(os.environ.get("BENCH_HEIGHT", 1080))
    tris = int(os.environ.get("BENCH_TRIS", 262_000))

    from pathtracer.accel.cluster import build_scene_clusters
    from pathtracer.config import RenderConfig
    from pathtracer.integrator.camera import Camera
    from pathtracer.scene.procedural import sponza_like

    scene = build_scene_clusters(sponza_like(target_tris=tris).finalize())
    cam = Camera(position=(3.0, 4.5, 6.0))
    cam.look_at((14.0, 3.0, 6.0))
    cs = cam.state()
    cfg = RenderConfig(width=w, height=h, spp=1, max_depth=6,
                       intersector="cluster")

    for entry in grid.split(","):
        parts = entry.split(":")
        ct, cdb = parts[0], parts[1]
        os.environ["PT_CHUNK_TILES"] = ct
        os.environ["PT_CLOSEST_DB"] = cdb
        if len(parts) > 2 and parts[2] != "-":
            os.environ["PT_SWEEP_CPI"] = parts[2]
        else:
            os.environ.pop("PT_SWEEP_CPI", None)
        if len(parts) > 3 and parts[3] != "-":
            os.environ["PT_FETCH_GROUP"] = parts[3]
        else:
            os.environ.pop("PT_FETCH_GROUP", None)
        # CHUNK_TILES is read at import time - reload the module chain
        import pathtracer.kernels.packet as packet
        import pathtracer.render as render_mod
        importlib.reload(packet)
        importlib.reload(render_mod)

        def run(scene, cs):
            return render_mod.render_sample(scene, cfg, cs, 0, 0)

        img, rays = run(scene, cs)
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
        cpi = os.environ.get("PT_SWEEP_CPI", "-")
        grp = os.environ.get("PT_FETCH_GROUP", "1")
        print(f"chunk={int(ct)*64:7d} closest_db={cdb} cpi={cpi} g={grp}: "
              f"{dt*1e3:7.1f} ms/sample  {mr/dt:5.2f} Mrays/s  "
              f"mean={s/(w*h*3):.5f}", flush=True)


if __name__ == "__main__":
    main()
