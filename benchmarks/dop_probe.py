"""Headroom probe: 4 extra diagonal slabs (14-DOP) in the tile cull.

The cull is exact w.r.t. cluster AABBs; remaining schedule waste
includes clusters whose AABB straddles the ray segment but whose
GEOMETRY is off-axis (cylinders, diagonal beams). Adding the four
diagonal k-DOP axes (+-1,+-1,+-1) tightens entry distances and rejects
some columns outright. Column counts are platform-independent
(docs/PERF.md 0.22/0.24) - measure the win off-chip before paying for
the build + cull plumbing.

Usage: python benchmarks/dop_probe.py
  env: BENCH_WIDTH/HEIGHT/TRIS, QUALITY_DB (closest key bits, default 3)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# the four diagonal k-DOP axes (unnormalized: slab math is scale-free)
DOP_AXES = np.array([[1.0, 1.0, 1.0],
                     [1.0, -1.0, 1.0],
                     [1.0, 1.0, -1.0],
                     [1.0, -1.0, -1.0]], np.float32)


def cluster_dops(accel):
    """Per-cluster min/max projections of block verts onto DOP_AXES.

    blocks[:, :, 0:9] = v0, e1, e2; row 9 = tri_id+1 (0 for pads).
    Conservative for sahsplit (verts of clipped refs extend past the
    clipped AABB; the combined AABB^DOP test remains correct).
    """
    b = accel.blocks
    v0 = b[:, :, 0:3]
    v1 = v0 + b[:, :, 3:6]
    v2 = v0 + b[:, :, 6:9]
    valid = b[:, :, 9] > 0.0                       # [C, K]
    ax = jnp.asarray(DOP_AXES)                     # [4, 3]
    p = jnp.stack([v0 @ ax.T, v1 @ ax.T, v2 @ ax.T], axis=0)  # [3, C, K, 4]
    lo = jnp.min(jnp.where(valid[None, :, :, None], p, jnp.inf), axis=(0, 2))
    hi = jnp.max(jnp.where(valid[None, :, :, None], p, -jnp.inf), axis=(0, 2))
    # empty clusters: park far away like _PAD_POS
    empty = ~jnp.any(valid, axis=1)
    lo = jnp.where(empty[:, None], 3e30, lo)
    hi = jnp.where(empty[:, None], 3e30, hi)
    return lo, hi                                   # [C, 4] each


def tile_cull_dop(accel, dop_lo, dop_hi, o, d, t_min, t_max, n_tiles,
                  tile_rays, use_dop=True):
    """_tile_cull with 4 extra diagonal slabs folded into near/far."""
    from pathtracer.kernels import packet

    inv_d = packet._safe_inv(d)
    ot = o.reshape(n_tiles, tile_rays, 1, 3)
    it = inv_d.reshape(n_tiles, tile_rays, 1, 3)
    ax = jnp.asarray(DOP_AXES)
    od = (o @ ax.T).reshape(n_tiles, tile_rays, 1, 4)
    dd = d @ ax.T
    idd = jnp.where(jnp.abs(dd) < 1e-12,
                    jnp.where(dd < 0, -1e12, 1e12), 1.0 / dd) \
        .reshape(n_tiles, tile_rays, 1, 4)
    tmx = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (o.shape[0],)) \
        .reshape(n_tiles, tile_rays, 1)

    c = accel.aabb_lo.shape[0]
    cb = packet.CULL_BLOCK
    pad = (-c) % cb
    lo_all, hi_all = accel.aabb_lo, accel.aabb_hi
    dlo_all, dhi_all = dop_lo, dop_hi
    if pad:
        far = jnp.full((pad, 3), 1e30, jnp.float32)
        lo_all = jnp.concatenate([lo_all, far])
        hi_all = jnp.concatenate([hi_all, far])
        dfar = jnp.full((pad, 4), 3e30, jnp.float32)
        dlo_all = jnp.concatenate([dlo_all, dfar])
        dhi_all = jnp.concatenate([dhi_all, dfar])
    nb = lo_all.shape[0] // cb

    def block(args):
        lo, hi, dlo, dhi = args
        t1 = (lo[None, None] - ot) * it
        t2 = (hi[None, None] - ot) * it
        t_near = jnp.max(jnp.minimum(t1, t2), axis=-1)
        t_far = jnp.min(jnp.maximum(t1, t2), axis=-1)
        if use_dop:
            s1 = (dlo[None, None] - od) * idd
            s2 = (dhi[None, None] - od) * idd
            t_near = jnp.maximum(t_near,
                                 jnp.max(jnp.minimum(s1, s2), axis=-1))
            t_far = jnp.minimum(t_far,
                                jnp.min(jnp.maximum(s1, s2), axis=-1))
        hit = (t_near <= t_far) & (t_far >= t_min) & (t_near <= tmx)
        entry = jnp.where(hit, jnp.maximum(t_near, 0.0), jnp.inf)
        return jnp.min(entry, axis=1)

    args = (lo_all.reshape(nb, cb, 3), hi_all.reshape(nb, cb, 3),
            dlo_all.reshape(nb, cb, 4), dhi_all.reshape(nb, cb, 4))
    if nb == 1:
        tt = block(tuple(a[0] for a in args))
    else:
        tt = jax.lax.map(block, args)
        tt = jnp.moveaxis(tt, 0, 1).reshape(n_tiles, nb * cb)
    return tt[:, :c]


def closest_cols(accel, dop, o, d, db, use_dop, nosort=False):
    from pathtracer.kernels import packet

    tile_rays = packet.TILE_RAYS
    n = o.shape[0] - (o.shape[0] % tile_rays)
    o, d = o[:n], d[:n]
    n_tiles = n // tile_rays

    @jax.jit
    def stats(o, d):
        if nosort:
            order = jnp.arange(o.shape[0], dtype=jnp.int32)
        else:
            order, _ = packet._coherence_order(accel, o, d, db)
        o_s, d_s = o[order], d[order]
        tt = tile_cull_dop(accel, dop[0], dop[1], o_s, d_s, 1e-3, 1e20,
                           n_tiles, tile_rays, use_dop)
        st, _ = packet._sorted_schedule(tt, 1)
        hit = packet.intersect_clusters(accel, o_s, d_s, 1e-3, 1e20,
                                        backend="xla", sort_rays=False)
        cap = packet._scene_exit(accel, o_s, d_s, 1e20)
        best = jnp.minimum(jnp.where(jnp.isfinite(hit.t), hit.t, jnp.inf),
                           cap).reshape(n_tiles, tile_rays)
        live = (o_s[:, 0] < 1e29).reshape(n_tiles, tile_rays)
        vis = jnp.sum(st < jnp.max(jnp.where(live, best, 0.0), axis=1,
                                   keepdims=True), axis=1)
        return jnp.sum(jnp.where(jnp.any(live, axis=1), vis, 0))

    return int(jax.block_until_ready(stats(o, d)))


def occl_cols(accel, dop, o, d, t_max, use_dop):
    from pathtracer.kernels import packet

    tile_rays = packet.TILE_RAYS
    n = o.shape[0] - (o.shape[0] % tile_rays)
    o, d, t_max = o[:n], d[:n], t_max[:n]
    n_tiles = n // tile_rays

    @jax.jit
    def stats(o, d, tm):
        order, _ = packet._coherence_order(
            accel, o, d, 2, scheme=os.environ.get("PT_KEY_SCHEME_OCCL", "firstcluster"))
        o_s, d_s, t_s = o[order], d[order], tm[order]
        tt = tile_cull_dop(accel, dop[0], dop[1], o_s, d_s, 0.0, t_s,
                           n_tiles, tile_rays, use_dop)
        live = jnp.any((o_s[:, 0] < 1e29).reshape(n_tiles, tile_rays),
                       axis=1)
        return jnp.sum(jnp.where(live, jnp.sum(jnp.isfinite(tt), axis=1),
                                 0))

    return int(jax.block_until_ready(stats(o, d, t_max)))


def main():
    jax.config.update("jax_platforms",
                      os.environ.get("PT_PLATFORM", "cpu"))
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("PATHTRACER_CACHE",
                       os.path.expanduser("~/.cache/pathtracer-jax")))

    w = int(os.environ.get("BENCH_WIDTH", 480))
    h = int(os.environ.get("BENCH_HEIGHT", 272))
    tris = int(os.environ.get("BENCH_TRIS", 262_000))
    db = int(os.environ.get("QUALITY_DB", "3"))

    from pathtracer.accel.cluster import build_clusters
    from pathtracer.integrator import camera as cam_mod
    from pathtracer.integrator.camera import Camera
    from pathtracer.kernels import packet
    from pathtracer.render import _swizzled_pixel_ids
    from pathtracer.sampling import rng as rng_mod
    from pathtracer.scene.procedural import sponza_like
    from pathtracer.utils import vmath

    scene = sponza_like(target_tris=tris).finalize()
    tri_ids = jnp.arange(scene.n_tris)
    v0a, v1a, v2a = scene.tri_vertices(tri_ids)
    accel = build_clusters(v0a, v1a, v2a, 2048, method="sahsplit")
    dop = jax.block_until_ready(cluster_dops(accel))

    cam = Camera(position=(3.0, 4.5, 6.0))
    cam.look_at((14.0, 3.0, 6.0))
    cs = cam.state()
    n = w * h
    pix = _swizzled_pixel_ids(w, h)
    if pix is None:
        pix = jnp.arange(n, dtype=jnp.int32)
    samp = jnp.zeros((n,), jnp.uint32)
    o, d = cam_mod.generate_primary_rays(cs, w, h, 70.0, pix, samp, 0)

    @jax.jit
    def bounce_batch(o, d):
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
        local = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi),
                           jnp.sqrt(jnp.maximum(0.0, 1 - u1))], axis=-1)
        d2 = vmath.normalize(local[:, 0:1] * t_ + local[:, 1:2] * b_
                             + local[:, 2:3] * gn)
        o2 = jnp.where(live[:, None], p + gn * 1e-3,
                       jnp.full_like(p, 1e30))
        d2 = jnp.where(live[:, None], d2, jnp.array([[0.0, 0.0, 1.0]]))
        return o2, d2

    o2, d2 = jax.block_until_ready(bounce_batch(o, d))

    import dataclasses

    import occl_order_ab
    scene_s = dataclasses.replace(scene, clusters_fine=accel)
    so, sd, stx = occl_order_ab.shadow_batch(scene_s, w, h)

    for label, fn in [
        ("primary (nosort)",
         lambda u: closest_cols(accel, dop, o, d, db, u, nosort=True)),
        ("bounce1", lambda u: closest_cols(accel, dop, o2, d2, db, u)),
        ("shadow0", lambda u: occl_cols(accel, dop, so, sd, stx, u)),
    ]:
        a = fn(False)
        b = fn(True)
        print(f"{label}: aabb {a}  +dop {b}  x{a / max(1, b):.3f}")


if __name__ == "__main__":
    main()
