"""Where do deep-bounce env-occlusion calls spend? Width vs queries.

The r5 RR result is paradoxical: env-NEE costs ~1.4 s/frame on config 4
but skipping 8-70% of the queries (shadow RR) barely moves the time.
Hypothesis: the occl calls at deep bounces run on the FULL-width
wavefront (1M lanes) with few live queries, and their cost scales with
WIDTH (sort + chunk structure), not with live queries.

This probe builds the REAL config-4 bounce-k env shadow batches (k = 0,
1, 2: trace k path segments from the camera, cosine-scatter, then draw
cell-interleaved env directions at the surviving vertices) and times
`occluded_clusters` on chip:

  legs per bounce batch:
    fullw   the production call: full-width wavefront, dead lanes parked
    livew   same live rays compacted to a 1/8-width wavefront
            (exactness-equivalent for the probe: we slice after the
            same parking sort the production path applies)

If fullw >> livew at equal live queries, the cost is width-bound and
the lever is static per-depth wavefront narrowing; if fullw ~= livew,
the chunk-skip already absorbs the dead width and the cost is in the
live tiles' schedules.

Usage (TPU; serialize): python benchmarks/env_deep_probe.py
  BENCH_SCALE=0.5 for a quarter-size smoke run.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    if os.environ.get("PT_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("PATHTRACER_CACHE",
                       os.path.expanduser("~/.cache/pathtracer-jax")))

    from benchmarks.run_configs import build_configs
    from pathtracer.accel.cluster import build_scene_clusters
    from pathtracer.integrator import camera as cam_mod
    from pathtracer.kernels import packet
    from pathtracer.sampling import rng as rng_mod
    from pathtracer.scene import envlight
    from pathtracer.utils import vmath

    scale = float(os.environ.get("BENCH_SCALE", "1.0"))
    name, scene_fn, cfg, camera = build_configs(scale)[3]
    scene = build_scene_clusters(scene_fn())
    accel = scene.clusters
    w, h = cfg.width, cfg.height
    n = w * h
    print(f"devices: {jax.devices()} n={n} C={accel.n_clusters}",
          flush=True)

    cs = camera.state()
    pix = jnp.arange(n, dtype=jnp.int32)
    samp = jnp.zeros((n,), jnp.uint32)

    import functools

    @functools.partial(jax.jit, static_argnames=("k",))
    def walk(k):
        """Trace k path segments; return (live, position, normal)."""
        o, d = cam_mod.generate_primary_rays(cs, w, h, cfg.fov_deg, pix,
                                             samp, 0)
        live = jnp.ones((n,), bool)
        p = o
        gn = d
        for depth in range(k + 1):
            o_eff = jnp.where(live[:, None], o, 1e30)
            hit = packet.intersect_clusters(accel, o_eff, d, 1e-3, 1e20,
                                            sort_rays=False)
            live = live & jnp.isfinite(hit.t)
            tri = jnp.maximum(hit.tri, 0)
            v0, v1, v2 = scene.tri_vertices(tri)
            g = vmath.normalize(jnp.cross(v1 - v0, v2 - v0))
            g = jnp.where(jnp.sum(g * d, axis=-1, keepdims=True) > 0,
                          -g, g)
            p = o + hit.t[:, None] * d
            gn = g
            if depth < k:       # cosine-scatter for the next segment
                u1, u2 = rng_mod.uniform2(pix.astype(jnp.uint32), samp,
                                          depth, 6, 0)
                t_, b_ = vmath.onb(g)
                r = jnp.sqrt(u1)
                phi = 2 * jnp.pi * u2
                loc = jnp.stack(
                    [r * jnp.cos(phi), r * jnp.sin(phi),
                     jnp.sqrt(jnp.maximum(0.0, 1 - u1))], -1)
                d = vmath.normalize(loc[:, 0:1] * t_ + loc[:, 1:2] * b_
                                    + loc[:, 2:3] * g)
                o = p + g * 1e-3
        return live, p, gn

    def shadow(k):
        live, p, gn = jax.block_until_ready(walk(k=k))
        cell = 8
        cells_x = -(-w // cell)
        key_pix = ((pix // w) // cell * cells_x
                   + (pix % w) // cell).astype(jnp.uint32)
        u = rng_mod.uniform4(key_pix, samp, k, rng_mod.SALT_ENV_SELECT,
                             cfg.seed, cfg.sampler)
        l_dir, _, _ = envlight.sample_env(
            scene.env_marginal_cdf, scene.env_cond_cdf,
            u[..., 0], u[..., 1], u[..., 2], u[..., 3])
        valid = live & (vmath.dot(gn, l_dir) > 0)
        o2 = jnp.where(valid[:, None], p + gn * 1e-4,
                       jnp.full_like(p, 1e30))
        d2 = jnp.where(valid[:, None], l_dir, 1.0)
        return (jax.device_put(o2), jax.device_put(d2),
                int(jnp.sum(valid)))

    tile = packet.TILE_RAYS

    def timed_occl(o2, d2, reps=3):
        fn = jax.jit(lambda a, b: packet.occluded_clusters(
            accel, a, b, 1e18, backend="pallas"))
        out = fn(o2, d2)
        float(jnp.sum(out.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(o2, d2)
            float(jnp.sum(out.astype(jnp.float32)))
        return (time.perf_counter() - t0) / reps * 1e3

    for k in (0, 1, 2):
        o2, d2, nvalid = shadow(k)
        ms_full = timed_occl(o2, d2)
        # live-compacted leg: park-sort then slice to the smallest
        # tile-aligned width holding every live lane
        park = np.asarray(o2[:, 0] >= 1e29)
        order = np.argsort(park, kind="stable")
        nw = max(tile, int(-(-max(1, (~park).sum()) // tile) * tile))
        o2c = jnp.asarray(np.asarray(o2)[order][:nw])
        d2c = jnp.asarray(np.asarray(d2)[order][:nw])
        ms_live = timed_occl(o2c, d2c)
        print(json.dumps({
            "bounce": k, "valid_queries": nvalid,
            "full_width": int(o2.shape[0]), "live_width": int(nw),
            "ms_fullw": round(ms_full, 2),
            "ms_livew": round(ms_live, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
