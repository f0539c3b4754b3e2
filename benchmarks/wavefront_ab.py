"""A/B the integrator wavefront-sort restructure at full scale on TPU.

Measures: (1) micro costs of the new per-bounce global ops (argsort,
permute-gather, scatter) at 2M lanes; (2) one full render_sample at
1080p/262k tris with wavefront_sort on/off; (3) occlusion-call cost with
inherited order vs per-chunk re-sort.
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=3):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.tree_util.tree_map(
            lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
    return (time.perf_counter() - t0) / reps


def main():
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("PATHTRACER_CACHE",
                       os.path.expanduser("~/.cache/pathtracer-jax")))

    n = 1920 * 1080
    key = jax.random.PRNGKey(0)
    keys = jax.random.randint(key, (n,), 0, 1 << 30, jnp.uint32)
    row = jax.random.normal(key, (n, 14), jnp.float32)
    rad = jax.random.normal(key, (n, 3), jnp.float32)
    perm = jax.random.permutation(key, n)

    t_sort = timed(jax.jit(lambda k: jnp.argsort(k)), keys)
    t_sort_stable = timed(jax.jit(lambda k: jnp.argsort(k, stable=True)),
                          keys)
    t_gather = timed(jax.jit(lambda r, p: r[p]), row, perm)
    t_scatter = timed(jax.jit(
        lambda r, p: jnp.zeros((n, 3), jnp.float32).at[p].set(
            r, unique_indices=True)), rad, perm)
    print(f"2M lanes: argsort {t_sort*1e3:.2f} ms  stable "
          f"{t_sort_stable*1e3:.2f} ms  gather[2M,14] {t_gather*1e3:.2f} ms"
          f"  scatter[2M,3] {t_scatter*1e3:.2f} ms", flush=True)

    from pathtracer.accel.cluster import build_scene_clusters
    from pathtracer.config import RenderConfig
    from pathtracer.integrator.camera import Camera
    from pathtracer.render import render_sample
    from pathtracer.scene.procedural import sponza_like

    scene = sponza_like(target_tris=262_000).finalize()
    scene = build_scene_clusters(scene)
    cam = Camera(position=(3.0, 4.5, 6.0))
    cam.look_at((14.0, 3.0, 6.0))
    cs = cam.state()

    for ws in (True, False):
        cfg = RenderConfig(width=1920, height=1080, spp=1, max_depth=6,
                           intersector="cluster", wavefront_sort=ws)

        def run(scene, cs):
            img, rays = render_sample(scene, cfg, cs, 0, 0)
            return img, rays

        t = timed(run, scene, cs, reps=3)
        img, rays = run(scene, cs)
        mr = float(rays) / 1e6
        print(f"wavefront_sort={ws}: {t*1e3:7.1f} ms/sample  "
              f"{mr / t:6.2f} Mrays/s  mean={float(jnp.mean(img)):.5f}",
              flush=True)


if __name__ == "__main__":
    main()
