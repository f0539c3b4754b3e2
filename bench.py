#!/usr/bin/env python
"""Headline benchmark: Sponza-class interior (~262k tris) at 1920x1080, 4spp
progressive loop on one chip (BASELINE.json config 5).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is the ratio against the 300 Mrays/s/chip north-star target.

Scale down with env vars for smoke runs:
  BENCH_WIDTH/BENCH_HEIGHT/BENCH_TRIS/BENCH_FRAMES
"""

import json
import os
import sys


def _enable_compile_cache():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("PATHTRACER_CACHE",
                       os.path.expanduser("~/.cache/pathtracer-jax")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    if os.environ.get("PT_PLATFORM"):     # off-chip smoke runs (app.py:37)
        import jax

        jax.config.update("jax_platforms", os.environ["PT_PLATFORM"])
    _enable_compile_cache()
    width = int(os.environ.get("BENCH_WIDTH", 1920))
    height = int(os.environ.get("BENCH_HEIGHT", 1080))
    tris = int(os.environ.get("BENCH_TRIS", 262_000))
    frames = int(os.environ.get("BENCH_FRAMES", 8))
    # 4 spp/frame mirrors the reference's per-frame workload
    # (assets/shaders/raygen.rgen:100); override for smoke runs.
    spp = int(os.environ.get("BENCH_SPP", 4))
    # Textured headline by default (round 2): sRGB albedo + metal-rough +
    # normal maps + alpha-cutout banners - the reference's real workload
    # class (closesthit.rchit:88-112), not an untextured stand-in.
    textured = os.environ.get("BENCH_TEXTURED", "1") != "0"

    from pathtracer.accel.cluster import build_scene_clusters
    from pathtracer.bench.harness import bench_scene
    from pathtracer.config import RenderConfig
    from pathtracer.integrator.camera import Camera
    from pathtracer.scene.procedural import sponza_like

    # BENCH_SCENE=path.glb|.gltf|.obj benches a FILE-loaded asset through
    # the full loader + native-unpack + texture path (the reference's
    # production input class, model_loader.cpp:253-289) instead of the
    # in-memory procedural build. BENCH_SCENE=export roundtrips the
    # procedural headline through export_glb -> load_gltf first.
    scene_file = os.environ.get("BENCH_SCENE")
    if scene_file == "export":
        import tempfile

        from pathtracer.scene.export import export_glb
        from pathtracer.scene.gltf import load_gltf

        path = os.path.join(tempfile.gettempdir(),
                            f"bench_sponza_{tris}_{int(textured)}.glb")
        if not os.path.exists(path):
            export_glb(sponza_like(target_tris=tris, textured=textured),
                       path)
        scene = load_gltf(path).finalize()
    elif scene_file:
        from pathtracer.app import load_scene

        scene = load_scene([scene_file]).finalize()
    else:
        scene = sponza_like(target_tris=tris, textured=textured).finalize()
    scene = build_scene_clusters(scene)

    # BENCH_PRIMING=1 enables verified primary-hit + blocker priming
    # (config.primary_priming) - flip the default once the on-chip A/B
    # (benchmarks/priming_ab.py) lands.
    cfg = RenderConfig(width=width, height=height, spp=spp, max_depth=6,
                       intersector="cluster",
                       # BENCH_SAMPLER=sobol measures the Owen-scrambled
                       # Sobol draw cost (sampling/sobol.py) on the real
                       # workload; estimator quality is pinned off-chip
                       sampler=os.environ.get("BENCH_SAMPLER", "pcg"),
                       primary_priming=os.environ.get(
                           "BENCH_PRIMING", "0") != "0",
                       # one wavefront for all spp samples: chip-confirmed
                       # winner 2026-08-19 (2.644 vs 2.595 Mrays/s looped,
                       # PERF.md 0.31) on top of x1.49 fewer bounce
                       # columns/ray off-chip (0.27) - default ON
                       spp_batch=os.environ.get(
                           "BENCH_SPP_BATCH", "1") != "0",
                       # cross-frame sample batching (cfg.frame_batch):
                       # BENCH_FRAME_BATCH frames' spp pools as one
                       # wavefront (default 1; A/B knob for the S=8 pool)
                       frame_batch=int(os.environ.get(
                           "BENCH_FRAME_BATCH", "1")))
    cam = Camera(position=(3.0, 4.5, 6.0))
    cam.look_at((14.0, 3.0, 6.0))

    untex_ref = (textured
                 and os.environ.get("BENCH_UNTEXTURED_REF", "1") != "0")
    detail = {
        "tris": tris,
        "textured": textured,
        "resolution": [width, height],
        "spp": cfg.spp,
        "max_depth": cfg.max_depth,
    }
    if untex_ref:
        # companion number on the round-1 (untextured) workload, with the
        # legs' windows INTERLEAVED so both sample the same tunnel weather
        # (the r2 banked run had untextured slower than textured only
        # because the legs ran back-to-back on a degrading link).
        from pathtracer.bench.harness import bench_interleaved

        plain = sponza_like(target_tris=tris, textured=False).finalize()
        plain = build_scene_clusters(plain)
        both = bench_interleaved({"tex": scene, "untex": plain}, cfg, cam,
                                 warmup=4, frames=frames)
        result, ref = both["tex"], both["untex"]
        detail["untextured_mrays_per_sec"] = round(ref.mrays_per_sec, 3)
        detail["untextured_ms_per_frame"] = round(ref.ms_per_frame, 3)
        # sanity: texture fetch adds work; untextured slower means the
        # run is internally inconsistent (tunnel degradation) - flag it.
        if ref.ms_per_frame > result.ms_per_frame * 1.05:
            detail["anomaly"] = "untextured_slower_than_textured"
            print("BENCH ANOMALY: untextured leg slower than textured "
                  f"({ref.ms_per_frame:.0f} vs {result.ms_per_frame:.0f} "
                  "ms/frame) - run is suspect", file=sys.stderr)
    else:
        result = bench_scene(scene, cfg, cam, warmup=4, frames=frames)
    detail["ms_per_frame"] = round(result.ms_per_frame, 3)
    detail["rays_per_frame"] = result.rays_per_frame
    detail["window_ms"] = [round(w, 1) for w in result.window_ms]
    detail["ms_std"] = round(result.ms_std, 1)

    # Auditable roofline (VERDICT r4 #5): exact visited-vs-needed column
    # counts + the measured kernel-rate model, computed ON this scene's
    # real bounce-1 batch (pathtracer/bench/pair_metrics.py). Makes the
    # "headline is at the pair roofline x structural waste" claim one
    # checkable dict instead of a PERF.md archaeology exercise.
    if os.environ.get("BENCH_PAIR_METRICS", "1") != "0":
        try:
            from pathtracer.bench.pair_metrics import bounce1_pair_metrics

            pm = bounce1_pair_metrics(scene, cfg, cam)
            detail["pair_metrics"] = pm
            # end-to-end fraction of the measured VPU-bound design
            # ceiling (~18 Mrays/s at zero fixed cost + zero waste,
            # docs/PERF.md 0.21)
            detail["vs_design_ceiling_18mrays"] = round(
                result.mrays_per_sec / 18.0, 3)
        except Exception as e:  # metrics must never kill the bench
            detail["pair_metrics"] = {"error": repr(e)}

    # attach the latest full-config sweep (benchmarks/run_configs.py
    # --out benchmarks/results/configs_latest.json) so the driver's
    # BENCH_r*.json carries all 5 BASELINE configs, not just the headline
    cfg_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "benchmarks", "results",
                            "configs_latest.json")
    if os.path.exists(cfg_path):
        try:
            with open(cfg_path) as f:
                detail["configs_sweep"] = json.load(f)
        except (OSError, ValueError):
            pass

    baseline = 300.0  # Mrays/s/chip north-star (BASELINE.json)
    print(json.dumps({
        "metric": "sponza_1080p_mrays_per_sec_per_chip",
        "value": round(result.mrays_per_sec, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(result.mrays_per_sec / baseline, 4),
        "detail": detail,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
