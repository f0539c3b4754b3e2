"""Command-line frame driver - the headless "app orchestrator".

Replaces the reference's GLFW interactive loop (main.cpp:653-731) with a
scriptable driver: load a scene (glTF/OBJ/procedural), fly a parametric
camera path (the analog of WASD/mouse input), render progressively with
move-resets, and write PNG frames + a structured per-frame log
(SURVEY.md par.5 "Metrics": ms/frame, Mrays/s, spp accumulated).

Usage:
  python -m pathtracer.app --scene cornell --frames 16 --out out.png
  python -m pathtracer.app --scene path/to/scene.gltf --width 1280 \
      --height 720 --spp 4 --frames 60 --orbit --out frames/
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import jax
import numpy as np

# Persistent compilation cache: first-frame jit costs minutes on slow hosts;
# cache compilations across CLI invocations (per-config).
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("PATHTRACER_CACHE",
                                 os.path.expanduser("~/.cache/pathtracer-jax")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pathtracer import film as fm
from pathtracer.config import RenderConfig
from pathtracer.integrator.camera import Camera
from pathtracer.render import Renderer
from pathtracer.scene import procedural


def load_scene(spec: str):
    """Scene from a spec: procedural name or a .gltf/.glb/.obj path."""
    if spec == "cornell":
        return procedural.cornell_box().finalize()
    if spec == "cornell-spheres":
        return procedural.cornell_box(spheres=True).finalize()
    if spec == "materials":
        return procedural.cornell_box(materials_suite=True).finalize()
    if spec == "bunny":
        return procedural.bunny_like().finalize()
    if spec == "sponza":
        return procedural.sponza_like().finalize()
    ext = os.path.splitext(spec)[1].lower()
    if ext in (".gltf", ".glb"):
        from pathtracer.scene.gltf import load_gltf

        return load_gltf(spec).finalize()
    if ext == ".obj":
        from pathtracer.scene.objload import load_obj

        return load_obj(spec).finalize()
    raise SystemExit(f"unknown scene: {spec}")


def default_camera(spec: str) -> Camera:
    presets = {
        "cornell": ((0.5, 0.5, 2.2), (0.5, 0.5, 0.0)),
        "cornell-spheres": ((0.5, 0.5, 2.2), (0.5, 0.5, 0.0)),
        "materials": ((0.5, 0.5, 2.2), (0.5, 0.5, 0.0)),
        "bunny": ((0.0, 2.0, 5.0), (0.0, 1.0, 0.0)),
        "sponza": ((3.0, 4.5, 6.0), (14.0, 3.0, 6.0)),
    }
    pos, tgt = presets.get(spec, ((0, 1, 4), (0, 0, 0)))
    cam = Camera(position=pos)
    cam.look_at(tgt)
    return cam


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scene", default="cornell")
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--max-depth", type=int, default=6)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--sky", default="gradient",
                    choices=["gradient", "black", "hosek", "envmap"])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--intersector", default="cluster",
                    choices=["cluster", "bvh", "brute"])
    ap.add_argument("--traversal-backend", default="pallas",
                    choices=["pallas", "xla"],
                    help="cluster-sweep execution engine")
    ap.add_argument("--orbit", action="store_true",
                    help="orbit the camera (resets accumulation per frame)")
    ap.add_argument("--out", default="out.png",
                    help="output PNG (or directory with --orbit)")
    ap.add_argument("--checkpoint", default=None,
                    help="film checkpoint to save/resume (.npz)")
    ap.add_argument("--quiet", action="store_true")
    args = ap.parse_args(argv)

    scene = load_scene(args.scene)
    cfg = RenderConfig(width=args.width, height=args.height, spp=args.spp,
                       max_depth=args.max_depth, sky=args.sky,
                       seed=args.seed, intersector=args.intersector,
                       traversal_backend=args.traversal_backend)
    cam = default_camera(args.scene)
    r = Renderer(scene, cfg, cam)

    if args.checkpoint and os.path.exists(args.checkpoint):
        r.film = fm.load_checkpoint(args.checkpoint)
        r.camera.moved = False
        if not args.quiet:
            print(f"resumed at frame {int(r.film.frame)}")

    orbit_dir = None
    if args.orbit:
        orbit_dir = args.out
        os.makedirs(orbit_dir, exist_ok=True)
        center = np.asarray(cam.position) * 0  # orbit scene origin-ish
        radius = float(np.linalg.norm(cam.position))

    for i in range(args.frames):
        if args.orbit:
            ang = 2 * math.pi * i / args.frames
            r.camera.position = np.array(
                [radius * math.cos(ang), cam.position[1],
                 radius * math.sin(ang)], np.float32)
            r.camera.look_at(center)
        t0 = time.perf_counter()
        film = r.step()
        jax.block_until_ready(film.accum)
        dt = time.perf_counter() - t0
        if not args.quiet:
            print(json.dumps({
                "frame": int(film.frame),
                "ms": round(dt * 1e3, 2),
                "spp_accumulated": int(film.frame) * cfg.spp,
                "mean_radiance": round(float(np.asarray(film.accum).mean()), 5),
            }))
        if args.orbit:
            fm.write_png(os.path.join(orbit_dir, f"frame_{i:04d}.png"),
                         r.display())

    if not args.orbit:
        r.save_png(args.out)
        if not args.quiet:
            print(f"wrote {args.out}")
    if args.checkpoint:
        fm.save_checkpoint(args.checkpoint, r.film)

    return 0


if __name__ == "__main__":
    sys.exit(main())
