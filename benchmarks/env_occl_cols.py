"""Exact occlusion-schedule column counts for config-4's env shadow batch.

The r5 attribution (env_attrib.py) puts env-NEE shadow rays at 69.5% of
the envmap frame (~2.4 us/query, ~8x every other ray class). This probe
explains the cost OFF-CHIP with exact counts: for the bounce-0 env
shadow batch (primary hits + cell-interleaved env directions), it
reports per-tile finite schedule entries (the occlusion sweep visits ~all
of them when rays are mostly unblocked - the all-blocked early exit
never fires on an open scene) under a grid of coherence keys:

  cell  = cfg.env_nee_cell (1 = independent per-lane draws)
  db    = PT_OCCL_DB direction bits/axis in the dirmajor key

Also prints the blocked fraction (how often the early exit could help).

Usage: PT_FORCE_CPU=1 python benchmarks/env_occl_cols.py
  (exact counts - platform independent; CELLS/DBS env to change grid)
"""

import os
import sys

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

    scale = float(os.environ.get("BENCH_SCALE", "0.5"))
    cells = [int(c) for c in os.environ.get("CELLS", "1,8").split(",")]
    dbs = [int(c) for c in os.environ.get("DBS", "2,4,5").split(",")]

    name, scene_fn, cfg, camera = build_configs(scale)[3]
    scene = build_scene_clusters(scene_fn())
    accel = scene.clusters
    w, h = cfg.width, cfg.height
    n = w * h
    tile_rays = packet.TILE_RAYS
    n_tiles = n // tile_rays
    print(f"devices: {jax.devices()} n={n} C={accel.n_clusters}",
          flush=True)

    cs = camera.state()
    pix = jnp.arange(n, dtype=jnp.int32)
    samp = jnp.zeros((n,), jnp.uint32)

    @jax.jit
    def primary():
        o, d = cam_mod.generate_primary_rays(cs, w, h, cfg.fov_deg, pix,
                                             samp, 0)
        hit = packet.intersect_clusters(accel, o, d, 1e-3, 1e20,
                                        sort_rays=False)
        live = jnp.isfinite(hit.t)
        tri = jnp.maximum(hit.tri, 0)
        v0, v1, v2 = scene.tri_vertices(tri)
        gn = vmath.normalize(jnp.cross(v1 - v0, v2 - v0))
        gn = jnp.where(jnp.sum(gn * d, axis=-1, keepdims=True) > 0,
                       -gn, gn)
        p = o + hit.t[:, None] * d
        return live, p, gn

    live, p, gn = jax.block_until_ready(primary())

    def shadow_batch(cell):
        if cell > 1:
            cells_x = -(-w // cell)
            key_pix = ((pix // w) // cell * cells_x
                       + (pix % w) // cell).astype(jnp.uint32)
        else:
            key_pix = pix.astype(jnp.uint32)
        u = rng_mod.uniform4(key_pix, samp, 0, rng_mod.SALT_ENV_SELECT,
                             cfg.seed, cfg.sampler)
        l_dir, _, _ = envlight.sample_env(
            scene.env_marginal_cdf, scene.env_cond_cdf,
            u[..., 0], u[..., 1], u[..., 2], u[..., 3])
        ndl = jnp.maximum(vmath.dot(gn, l_dir), 0.0)
        valid = live & (ndl > 0.0)
        o2 = jnp.where(valid[:, None], p + gn * 1e-4,
                       jnp.full_like(p, 1e30))
        d2 = jnp.where(valid[:, None], l_dir, 1.0)
        return o2, d2, valid

    import functools

    @functools.partial(jax.jit, static_argnames=("db",))
    def stats(o2, d2, valid, db):
        key = packet._coherence_key(accel, o2, d2, db, scheme="dirmajor")
        order = jnp.argsort(key).astype(jnp.int32)
        o_s, d_s = o2[order], d2[order]
        tile_tnear = packet._tile_cull(accel, o_s, d_s, 0.0, 1e18,
                                       n_tiles, tile_rays)
        finite = jnp.isfinite(tile_tnear)
        lv = (o_s[:, 0] < 1e29).reshape(n_tiles, tile_rays)
        tl = jnp.any(lv, axis=1)
        cols = jnp.sum(jnp.where(tl, jnp.sum(finite, axis=1), 0))
        blocked = packet.occluded_clusters(accel, o_s, d_s, 1e18,
                                           sort_rays=False)
        blk = jnp.sum(jnp.where(lv.reshape(-1), blocked, 0))
        return cols, blk, jnp.sum(valid), jnp.sum(tl)

    base = None
    for cell in cells:
        o2, d2, valid = shadow_batch(cell)
        for db in dbs:
            cols, blk, nvalid, ntl = jax.block_until_ready(
                stats(o2, d2, valid, db=db))
            cols, nvalid, ntl = int(cols), int(nvalid), int(ntl)
            if base is None:
                base = cols
            print(f"cell={cell:2d} db={db}: {cols:9d} sched cols "
                  f"({cols / max(1, nvalid):7.2f}/valid-ray, "
                  f"{cols / max(1, ntl):6.1f}/tile, live tiles {ntl}) "
                  f"blocked {int(blk) / max(1, nvalid):.3f}  "
                  f"x{base / max(1, cols):.3f} vs first", flush=True)


if __name__ == "__main__":
    main()
