"""Config-4 (envmap_textured_1024) stage attribution — VERDICT r4 item 2.

Config 4 is the slowest bench config by ~4.6x (1.32 Mrays/s vs 6.10
headline) and never had a stage breakdown: all prior attribution ran on
sponza-class closed scenes. This probe times the EXACT config-4 workload
(bunny-class open scene + checkerboard texture + HDR envmap + env NEE,
1024x1024 @ 1 spp, depth 6) under feature-toggle legs; leg differences
give the stage shares:

  full        config 4 exactly (envmap sky + env NEE + emissive NEE + tex)
  no_env_nee  env_importance_sampling=False  -> cost of env shadow rays
  no_nee      cfg.skip_nee                   -> cost of ALL shadow rays
  grad_sky    sky=gradient                   -> cost of env lookups + NEE
  no_tex      texture removed                -> cost of texture taps
  depth1/3    max_depth sweep               -> pool-decay / fixed-cost
                                               amortization profile

Each leg reports ms/frame, exact rays traced and Mrays/s; ray-count
differences between depth legs give per-bounce active-lane decay (open
scene: most lanes escape to the sky after 1-2 bounces).

Usage (TPU; serialize with other chip jobs!):
  python benchmarks/env_attrib.py
  BENCH_SCALE=0.25 BENCH_FRAMES=2 PT_FORCE_CPU=1 python benchmarks/env_attrib.py
"""

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

    import dataclasses

    from benchmarks.run_configs import build_configs
    from pathtracer.accel.cluster import build_scene_clusters
    from pathtracer.bench.harness import bench_scene
    from pathtracer.scene.build import MaterialDesc

    scale = float(os.environ.get("BENCH_SCALE", "1.0"))
    frames = int(os.environ.get("BENCH_FRAMES", "6"))
    depth_legs = os.environ.get("BENCH_DEPTH_LEGS", "1,3") != "0"

    name, scene_fn, cfg, camera = build_configs(scale)[3]
    assert name == "envmap_textured_1024", name
    # Attribute at frame_batch=1 (chip A/B 2026-08-21: fb neutral on this
    # config, 1.323 vs 1.321 — PERF.md 0.43), so legs stay one compile
    # each and comparable to the historical per-frame numbers.
    cfg = dataclasses.replace(cfg, frame_batch=1)

    scene = build_scene_clusters(scene_fn())
    print(f"devices: {jax.devices()}", flush=True)
    print(f"scene: tris={scene.n_tris} envmap={scene.has_envmap} "
          f"lights={scene.has_lights} cfg={cfg.width}x{cfg.height} "
          f"spp={cfg.spp} depth={cfg.max_depth}", flush=True)

    # scene variant without the checkerboard texture (same geometry)
    def untextured():
        # same geometry/envmap as config 4 (scene_fn above has already
        # written bench_env.hdr), body material flat instead of textured
        import pathtracer.scene.procedural as procedural
        from pathtracer.scene.hdr import read_hdr
        b = procedural.bunny_like(subdivisions=5)
        b.materials[1] = MaterialDesc(albedo=(0.62, 0.62, 0.62),
                                      roughness=0.4)
        hdr_path = os.path.join(os.environ.get("TMPDIR", "/tmp"),
                                "bench_env.hdr")
        b.set_envmap(read_hdr(hdr_path))
        return build_scene_clusters(b.finalize())

    legs = [
        ("full", scene, cfg),
        ("rr_off", scene, dataclasses.replace(cfg, env_shadow_rr=0.0)),
        ("rr_strong", scene,
         dataclasses.replace(cfg, env_shadow_rr=0.25)),
        ("cell_off", scene, dataclasses.replace(cfg, env_nee_cell=1)),
        ("no_env_nee", scene,
         dataclasses.replace(cfg, env_importance_sampling=False)),
        ("no_nee", scene, dataclasses.replace(cfg, skip_nee=True)),
        ("grad_sky", scene,
         dataclasses.replace(cfg, sky="gradient",
                             env_importance_sampling=False)),
        ("no_tex", None, cfg),   # scene built lazily below
    ]
    if depth_legs:
        for dleg in os.environ.get("BENCH_DEPTH_LEGS", "1,3").split(","):
            d = int(dleg)
            legs.append((f"depth{d}", scene,
                         dataclasses.replace(cfg, max_depth=d)))

    only = os.environ.get("BENCH_LEGS")
    if only:
        want = set(only.split(","))
        legs = [leg for leg in legs if leg[0] in want]

    results = {}
    for leg_name, leg_scene, leg_cfg in legs:
        if leg_scene is None:
            leg_scene = untextured()
        r = bench_scene(leg_scene, leg_cfg, camera, warmup=3,
                        frames=frames)
        results[leg_name] = {
            "ms_per_frame": round(r.ms_per_frame, 2),
            "mrays_s": round(r.mrays_per_sec, 3),
            "rays_per_frame": round(r.rays_per_frame / 1e6, 3),
        }
        print(json.dumps({"leg": leg_name, **results[leg_name]}),
              flush=True)

    # Derived shares (of the full leg's frame time)
    full_ms = results["full"]["ms_per_frame"]
    print("\n--- attribution (share of full frame) ---", flush=True)
    for a, b, what in [
            ("full", "no_env_nee", "env NEE shadow rays"),
            ("no_env_nee", "no_nee", "emissive NEE shadow rays"),
            ("full", "no_nee", "ALL shadow rays"),
            ("no_env_nee", "grad_sky", "env lookup (miss shader)"),
            ("full", "no_tex", "texture taps")]:
        if a in results and b in results:
            d = results[a]["ms_per_frame"] - results[b]["ms_per_frame"]
            print(f"{what:32s} {d:8.1f} ms  ({100*d/full_ms:5.1f}%)",
                  flush=True)
    for d in (1, 3):
        k = f"depth{d}"
        if k in results:
            print(f"{'depth '+str(d)+' / depth 6':32s} "
                  f"{results[k]['ms_per_frame']:8.1f} ms  "
                  f"({100*results[k]['ms_per_frame']/full_ms:5.1f}%)  "
                  f"rays {results[k]['rays_per_frame']:.2f}M vs "
                  f"{results['full']['rays_per_frame']:.2f}M", flush=True)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results", "env_attrib_latest.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
