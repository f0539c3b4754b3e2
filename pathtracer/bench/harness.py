"""Benchmark harness: Mrays/s + ms/frame with exact ray counts.

The reference measures frame time but never prints it (SURVEY.md par.5
"Tracing": glfwGetTime only feeds camera delta-time). This harness times
jitted frames with block_until_ready and reports throughput from the
integrator's exact ray counters.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import jax
import numpy as np

from pathtracer.config import RenderConfig
from pathtracer.integrator.camera import Camera
from pathtracer.render import render_frame_with_stats
from pathtracer.scene.types import Scene


@dataclass
class BenchResult:
    mrays_per_sec: float
    ms_per_frame: float
    rays_per_frame: float
    frames: int
    width: int
    height: int
    spp: int

    def as_dict(self):
        return {
            "mrays_per_sec": self.mrays_per_sec,
            "ms_per_frame": self.ms_per_frame,
            "rays_per_frame": self.rays_per_frame,
            "frames": self.frames,
            "resolution": [self.width, self.height],
            "spp": self.spp,
        }


def bench_scene(scene: Scene, cfg: RenderConfig, camera: Camera,
                warmup: int = 4, frames: int = 8) -> BenchResult:
    """Time progressive frames; returns throughput stats.

    Warmup frames trigger compilation AND flush first-run effects - on the
    axon tunnel the first executed frames after a compile run up to 30x
    slower than steady state (deferred initialization / data upload), so
    warmup frames are individually host-synced and excluded.
    """
    cam = camera.state()

    prime = None   # priming hints chain across frames (Renderer.step)
    for i in range(warmup):
        img, rays, prime = render_frame_with_stats(scene, cfg, cam, i,
                                                   prime, True)
        float(rays)                    # full sync: flush first-run effects
    jax.block_until_ready(img)

    total_rays = 0.0
    t0 = time.perf_counter()
    for i in range(frames):
        img, rays, prime = render_frame_with_stats(
            scene, cfg, cam, warmup + i, prime, True)
        total_rays += float(rays)  # blocks on the scalar; frame-granular
    jax.block_until_ready(img)
    dt = time.perf_counter() - t0

    return BenchResult(
        mrays_per_sec=total_rays / dt / 1e6,
        ms_per_frame=dt / frames * 1e3,
        rays_per_frame=total_rays / frames,
        frames=frames,
        width=cfg.width, height=cfg.height, spp=cfg.spp,
    )
