"""Prove the compiled Mosaic (Pallas) backend composes with shard_map.

VERDICT r2 item 5: the Pallas sweep/cull kernels had only ever run inside
a plain jit on TPU; off-TPU dryruns silently fall back to the XLA sweep
(render.py), so "sharded + pallas" was an untested composition. This
probe builds a 1-device mesh ON THE REAL CHIP, renders via
render_frame_sharded with traversal_backend='pallas', and pins the image
against the single-chip render_frame at the same config.

Run (serialize with other TPU jobs):
    timeout 900 python benchmarks/shard_tpu_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from pathtracer.accel.cluster import build_scene_clusters
from pathtracer.config import RenderConfig
from pathtracer.integrator.camera import Camera
from pathtracer.parallel.sharding import make_mesh, render_frame_sharded
from pathtracer.render import render_frame
from pathtracer.scene.procedural import sponza_like


def main():
    dev = jax.devices()
    print(f"platform={dev[0].platform} n={len(dev)}")
    # >256 tris so make_intersectors routes to the cluster/Pallas path
    # (tiny scenes fall back to brute, render.py:35-36).
    scene = build_scene_clusters(sponza_like(target_tris=20_000).finalize())
    cam = Camera(position=(0.0, 3.0, 12.0))
    cam.look_at((0.0, 2.0, 0.0))
    cfg = RenderConfig(width=64, height=64, spp=2, max_depth=3,
                       intersector="cluster", traversal_backend="pallas")

    mesh = make_mesh(dev[:1], tile=1, sample=1)
    t0 = time.time()
    sharded = np.asarray(render_frame_sharded(scene, cfg, cam.state(), 0,
                                              mesh))
    print(f"sharded+pallas compiled+ran in {time.time() - t0:.1f}s "
          f"mean={sharded.mean():.6f}")
    single = np.asarray(render_frame(scene, cfg, cam.state(), 0))
    print(f"single-chip mean={single.mean():.6f}")
    err = np.abs(sharded - single).max()
    print(f"max|diff|={err:.3e}")
    assert err < 1e-4, "sharded pallas image diverged from single-chip"
    print("OK: Mosaic kernel composes with shard_map on TPU")


if __name__ == "__main__":
    main()
