"""Standalone traversal kernel timing: Mrays/s of closest-hit + occlusion.

Times the packet traversal in isolation on the bench scene (sponza-class),
for primary rays (coherent) and hemisphere bounce rays (incoherent) -
isolates the accel-structure lever from the integrator.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=3):
    out = jax.block_until_ready(fn(*args))
    # force a real sync through the tunnel with a scalar readback
    float(jnp.sum(out[0] if isinstance(out, tuple) else out.t
                  if hasattr(out, "t") else out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out.t
                      if hasattr(out, "t") else out))
    return (time.perf_counter() - t0) / reps


def main():
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("PATHTRACER_CACHE",
                       os.path.expanduser("~/.cache/pathtracer-jax")))

    from pathtracer.accel.cluster import build_clusters
    from pathtracer.integrator import camera as cam_mod
    from pathtracer.integrator.camera import Camera
    from pathtracer.kernels import packet
    from pathtracer.scene.procedural import sponza_like

    tris = int(os.environ.get("BENCH_TRIS", 262_000))
    n = int(os.environ.get("BENCH_RAYS", 1 << 20))

    scene = sponza_like(target_tris=tris).finalize()
    tri_ids = jnp.arange(scene.n_tris)
    v0, v1, v2 = scene.tri_vertices(tri_ids)
    accel = build_clusters(v0, v1, v2)
    print(f"tris={scene.n_tris} clusters={accel.n_clusters} "
          f"K={accel.tris_per_cluster}")

    cam = Camera(position=(3.0, 4.5, 6.0))
    cam.look_at((14.0, 3.0, 6.0))
    cs = cam.state()
    pix = jnp.arange(n, dtype=jnp.int32)
    samp = jnp.zeros((n,), jnp.uint32)
    o, d = cam_mod.generate_primary_rays(cs, 1920, n // 1920, 70.0, pix,
                                         samp, 0)

    isect = jax.jit(
        lambda o, d: packet.intersect_clusters(accel, o, d, 1e-3, 1e20))
    hit_t = jax.jit(lambda o, d: isect(o, d).t)

    dt = timed(hit_t, o, d)
    print(f"primary closest-hit  [{n}]: {dt*1e3:8.2f} ms "
          f"({n/dt/1e6:7.1f} Mrays/s)")

    # incoherent bounce-like rays: origins at hit points, random dirs
    key = jax.random.PRNGKey(0)
    t = isect(o, d).t
    hp = o + d * jnp.where(jnp.isfinite(t), t, 1.0)[:, None]
    nd = jax.random.normal(key, (n, 3), jnp.float32)
    nd = nd / jnp.linalg.norm(nd, axis=1, keepdims=True)
    hp, nd = jax.block_until_ready((hp, nd))

    dt = timed(hit_t, hp, nd)
    print(f"bounce closest-hit   [{n}]: {dt*1e3:8.2f} ms "
          f"({n/dt/1e6:7.1f} Mrays/s)")

    occ = jax.jit(lambda o, d: packet.occluded_clusters(
        accel, o, d, jnp.full((n,), 8.0, jnp.float32)).astype(jnp.float32))
    dt = timed(occ, hp, nd)
    print(f"bounce occlusion     [{n}]: {dt*1e3:8.2f} ms "
          f"({n/dt/1e6:7.1f} Mrays/s)")

    # sorted bounce rays: direction octant + origin morton
    oct_ = ((nd[:, 0] > 0).astype(jnp.int32)
            + 2 * (nd[:, 1] > 0).astype(jnp.int32)
            + 4 * (nd[:, 2] > 0).astype(jnp.int32))
    order = jnp.argsort(oct_, stable=True)
    hp2, nd2 = jax.block_until_ready((hp[order], nd[order]))
    dt = timed(hit_t, hp2, nd2)
    print(f"octant-sorted bounce [{n}]: {dt*1e3:8.2f} ms "
          f"({n/dt/1e6:7.1f} Mrays/s)")


if __name__ == "__main__":
    main()
