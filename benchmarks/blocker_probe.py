"""Standalone compile+correctness probe for the want_blocker occlusion
kernel on the REAL chip.

The want_blocker variant of kernels/pallas_sweep._occl_kernel (the
shadow-priming hint path) has only ever run in interpret mode on CPU;
CLAUDE.md requires validating it compiles under Mosaic before priming is
flipped on. This probe builds a tiny scene, runs occluded_clusters with
want_blocker=True on whatever platform JAX resolves, and cross-checks
blocked flags + hint semantics against the brute-force oracle.

Usage: timeout 600 python benchmarks/blocker_probe.py
Prints PROBE OK / PROBE FAIL.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("PATHTRACER_CACHE",
                       os.path.expanduser("~/.cache/pathtracer-jax")))
    print("platform:", jax.devices()[0].platform)

    from pathtracer.accel.cluster import build_clusters
    from pathtracer.kernels import packet
    from pathtracer.kernels.intersect import intersect_brute

    rng = np.random.default_rng(7)
    n_tris, n_rays = 700, 1024
    base = rng.uniform(-4, 4, (n_tris, 3)).astype(np.float32)
    v0 = jnp.asarray(base)
    v1 = jnp.asarray(base + rng.uniform(-0.6, 0.6, (n_tris, 3)))
    v2 = jnp.asarray(base + rng.uniform(-0.6, 0.6, (n_tris, 3)))
    accel = build_clusters(v0, v1, v2, 8)

    o = jnp.asarray(rng.uniform(-5, 5, (n_rays, 3)).astype(np.float32))
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    t_max = jnp.full((n_rays,), 6.0, jnp.float32)

    t0 = time.time()
    blocked, btri = jax.block_until_ready(
        packet.occluded_clusters(accel, o, d, t_max, want_blocker=True))
    print(f"first call (compile) {time.time() - t0:.1f}s")
    t0 = time.time()
    jax.block_until_ready(
        packet.occluded_clusters(accel, o, d, t_max, want_blocker=True))
    print(f"steady call {time.time() - t0 :.3f}s")

    # oracle: front-facing any-hit within t_max
    hit = intersect_brute(o, d, v0, v1, v2, 0.0, 1e30)
    gn = jnp.cross(v1 - v0, v2 - v0)
    tri = jnp.maximum(hit.tri, 0)
    front = jnp.sum(gn[tri] * d, axis=1) < 0.0
    ref_blocked = jnp.isfinite(hit.t) & (hit.t < t_max) & front

    blocked = np.asarray(blocked, bool)
    btri = np.asarray(btri)
    ref_blocked = np.asarray(ref_blocked)

    ok = True
    # any-hit may find a DIFFERENT front-facing blocker than the closest
    # hit; verify flags exactly and hints by re-intersecting the hinted tri
    if not (blocked == ref_blocked).all():
        # blocked may legitimately differ from the closest-hit oracle when
        # the closest hit is back-facing but a farther front-face blocks;
        # recheck disagreements with a full per-tri sweep
        tm = np.asarray(t_max)
        on, dn = np.asarray(o), np.asarray(d)
        v0n, v1n, v2n = map(np.asarray, (v0, v1, v2))
        for i in np.nonzero(blocked != ref_blocked)[0]:
            any_front = False
            for a, b, c in ((v0n, v1n, v2n),):
                e1, e2 = b - a, c - a
                n = np.cross(e1, e2)
                den = dn[i] @ n.T
                with np.errstate(divide="ignore", invalid="ignore"):
                    t = np.einsum("tj,tj->t", a - on[i][None, :], n) / den
                p = on[i][None, :] + t[:, None] * dn[i][None, :]
                # barycentric via areas
                w0 = np.einsum("tj,tj->t", np.cross(b - p, c - p), n)
                w1 = np.einsum("tj,tj->t", np.cross(c - p, a - p), n)
                w2 = np.einsum("tj,tj->t", np.cross(a - p, b - p), n)
                nn = np.einsum("tj,tj->t", n, n)
                inside = (np.sign(w0) == np.sign(nn)) \
                    & (np.sign(w1) == np.sign(nn)) \
                    & (np.sign(w2) == np.sign(nn))
                any_front |= bool(np.any(
                    inside & (t > 0) & (t < tm[i]) & (den < 0)))
            if any_front != blocked[i]:
                print(f"FLAG MISMATCH ray {i}: kernel {blocked[i]} "
                      f"oracle {any_front}")
                ok = False

    # hint semantics: blocked => a valid tri id; open => -1
    if not ((btri >= 0) == blocked).all():
        print("HINT/FLAG INCONSISTENT:",
              int(((btri >= 0) != blocked).sum()), "rays")
        ok = False

    print("PROBE OK" if ok else "PROBE FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
