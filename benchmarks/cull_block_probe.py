"""Cull lane-block skip rates: how gateable is the Pallas cull?

The fused cull (kernels/pallas_cull.py) slab-tests every (ray, cluster)
pair. Clusters are Morton-ordered (accel/cluster.py), so a tile's ~50-70
finite clusters concentrate in a few 128-cluster lane blocks; a
conservative supercluster pre-test (union AABB per block) can skip the
whole [R, 128] body for blocks no ray hits (_cull_kernel_skip). The skip
RATE is pure geometry = platform-independent; this probe measures it on
the headline scene's primary / bounce-1 / shadow-0 batches at block
widths 128 and 256.

Measured 2026-08-19 (640x360, 262k tris, C=2816, sahsplit):
  primary  block=128 skip 87.0%   block=256 skip 79.3%
  bounce1  block=128 skip 68.0%   block=256 skip 57.6%
  shadow0  block=128 skip 82.1%   block=256 skip 69.2%

Usage: python benchmarks/cull_block_probe.py   (forces CPU; BENCH_* env)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    jax.config.update("jax_platforms",
                      os.environ.get("PT_PLATFORM", "cpu"))
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("PATHTRACER_CACHE",
                       os.path.expanduser("~/.cache/pathtracer-jax")))
    w = int(os.environ.get("BENCH_WIDTH", 640))
    h = int(os.environ.get("BENCH_HEIGHT", 360))
    tris = int(os.environ.get("BENCH_TRIS", 262_000))

    from benchmarks.occl_order_ab import shadow_batch
    from pathtracer.accel.cluster import build_scene_clusters
    from pathtracer.integrator import camera as cam_mod
    from pathtracer.integrator.camera import Camera
    from pathtracer.kernels import packet
    from pathtracer.sampling import rng as rng_mod
    from pathtracer.scene.procedural import sponza_like
    from pathtracer.utils import vmath

    scene = build_scene_clusters(sponza_like(target_tris=tris).finalize())
    accel = scene.clusters
    c = accel.aabb_lo.shape[0]
    cam = Camera(position=(3.0, 4.5, 6.0))
    cam.look_at((14.0, 3.0, 6.0))
    n = w * h
    pix = jnp.arange(n, dtype=jnp.int32)
    samp = jnp.zeros((n,), jnp.uint32)
    o, d = cam_mod.generate_primary_rays(cam.state(), w, h, 70.0, pix,
                                         samp, 0)
    hit = packet.intersect_clusters(accel, o, d, 1e-3, 1e20,
                                    backend="xla")
    live = jnp.isfinite(hit.t)
    tri = jnp.maximum(hit.tri, 0)
    v0, v1, v2 = scene.tri_vertices(tri)
    gn = vmath.normalize(jnp.cross(v1 - v0, v2 - v0))
    gn = jnp.where(jnp.sum(gn * d, axis=-1, keepdims=True) > 0, -gn, gn)
    p = o + hit.t[:, None] * d
    u1, u2 = rng_mod.uniform2(pix.astype(jnp.uint32), samp, 7, 0, 0)
    t_, b_ = vmath.onb(gn)
    r = jnp.sqrt(u1)
    phi = 2 * jnp.pi * u2
    loc = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi),
                     jnp.sqrt(jnp.maximum(0.0, 1 - u1))], axis=-1)
    d2 = vmath.normalize(loc[:, 0:1] * t_ + loc[:, 1:2] * b_
                         + loc[:, 2:3] * gn)
    o2 = jnp.where(live[:, None], p + gn * 1e-3,
                   jnp.full_like(p, packet._PARK))
    d2 = jnp.where(live[:, None], d2, jnp.array([[0.0, 0.0, 1.0]]))
    tb = jnp.where(live, 1e20, 0.0).astype(jnp.float32)
    so, sd, stx = shadow_batch(scene, w, h)
    t_inf = jnp.full((n,), 1e20, jnp.float32)

    batches = [("primary", o, d, t_inf, 3, None, 1e-3),
               ("bounce1", o2, d2, tb, 3, None, 1e-3),
               ("shadow0", so, sd, stx, 2,
                os.environ.get("PT_KEY_SCHEME_OCCL", "dirmajor"), 0.0)]
    for label, oo, dd, tm, dbits, scheme, tmn in batches:
        key = packet._coherence_key(accel, oo, dd, dbits, scheme=scheme)
        order = np.asarray(jnp.argsort(key))
        nn = (oo.shape[0] // 64) * 64
        o_s = jnp.asarray(np.asarray(oo)[order][:nn])
        d_s = jnp.asarray(np.asarray(dd)[order][:nn])
        t_s = jnp.asarray(np.asarray(tm)[order][:nn])
        nt = nn // 64
        tn = np.asarray(packet._tile_cull(accel, o_s, d_s, tmn, t_s,
                                          nt, 64))
        fin = np.isfinite(tn)
        for b in (128, 256):
            nb = (c + b - 1) // b
            pad = nb * b - c
            f = np.pad(fin, ((0, 0), (0, pad))) if pad else fin
            blk = f.reshape(nt, nb, b).any(axis=2)
            cnt = blk.sum(axis=1)           # surviving blocks per tile
            print(f"[{label}] block={b:4d}: blocks hit {blk.mean():.3f}"
                  f"  (skip {1 - blk.mean():.1%})  per-tile survivors of "
                  f"{nb}: mean {cnt.mean():.1f} p50 "
                  f"{np.percentile(cnt, 50):.0f} p90 "
                  f"{np.percentile(cnt, 90):.0f} p99 "
                  f"{np.percentile(cnt, 99):.0f} max {cnt.max()}",
                  flush=True)
        print(f"[{label}] finite clusters/tile mean {fin.sum(1).mean():.1f}",
              flush=True)


if __name__ == "__main__":
    main()
