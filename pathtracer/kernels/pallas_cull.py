"""Pallas TPU cull kernel: fused per-tile slab test + ray-min reduction.

Why this exists (measured, benchmarks/stage_attrib.py 2026-08-19, PERF.md
0.33): at the r3 defaults a 2.07M-lane bounce-1 closest call spends ~190 ms
in cull+schedule prep vs ~270 ms in the sweep itself, and the schedule
lax.sort is ~1 ms of that - the XLA `_tile_cull` is nearly the whole prep
bill. Its [tiles, R, CULL_BLOCK] slab-test transients defeat fusion (the
three-tensor min/max reduce chain materializes between ops), so it runs
~6x above its compute roofline.

This kernel computes tile_tnear[tiles, C] (min over the tile's hitting
rays of the cluster-entry distance, +inf where no ray hits - bit-for-bit
the `_tile_cull` contract) with ZERO HBM transients: the whole transposed
AABB set ([6, C] f32 = 67 KB at C=2816) sits VMEM-resident across grid
steps (constant index_map), each grid step streams one 64-ray tile in and
one [1, C] output row out, and the [R, C] slab test + sublane min-reduce
never leaves VMEM. Arithmetic is ~30 VPU ops per (ray, cluster) pair ->
~45 ms/call at VPU peak for the same batch.

Falls back to interpret mode off-TPU (CPU tests run the same kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _cull_kernel(ab_ref, rays_ref, tmx_ref, out_ref, *, t_min):
    r = rays_ref.shape[2]
    rays = rays_ref[0]                       # [6, R]: o(3) then 1/d(3)
    ab = ab_ref[...]                         # [6, C]: lo(3) then hi(3)

    def rc(i):
        return rays[i, :].reshape(r, 1)

    def ac(i):
        return ab[i, :].reshape(1, -1)

    tn = None
    tf = None
    for a in range(3):
        oa = rc(a)
        ia = rc(3 + a)
        t1 = (ac(a) - oa) * ia
        t2 = (ac(3 + a) - oa) * ia
        lo_a = jnp.minimum(t1, t2)
        hi_a = jnp.maximum(t1, t2)
        tn = lo_a if tn is None else jnp.maximum(tn, lo_a)
        tf = hi_a if tf is None else jnp.minimum(tf, hi_a)

    tmx = tmx_ref[0, 0, :].reshape(r, 1)
    # EXACTLY _tile_cull's accept test (packet.py): (tn <= tf) &
    # (tf >= t_min) & (tn <= t_max); entry = max(tn, 0) where hit.
    hit = (tn <= tf) & (tf >= t_min) & (tn <= tmx)
    entry = jnp.where(hit, jnp.maximum(tn, 0.0), jnp.inf)
    out_ref[0, 0, :] = jnp.min(entry, axis=0)


def _cull_kernel_skip(mask_ref, ab_ref, rays_ref, tmx_ref, out_ref, *,
                      t_min, nb, blk):
    """Block-gated cull: skip whole 128-cluster lane blocks.

    mask_ref (SMEM, i32 [1, 1, NBp]) holds per-(tile, block) any-hit
    flags from the supercluster pre-cull (_sc_mask): a block's union
    AABB misses every ray => no child can pass the accept test (child
    box is a subset, so child tn >= super tn, child tf <= super tf),
    so the whole [R, blk] slab test is skipped. Measured skip rates on
    the headline scene (Morton-ordered sahsplit clusters, block=128):
    primary 87%, bounce-1 68%, shadow 82% (PERF.md 0.37).
    """
    r = rays_ref.shape[2]
    rays = rays_ref[0]                       # [6, R]
    tmx = tmx_ref[0, 0, :].reshape(r, 1)

    def rc(i):
        return rays[i, :].reshape(r, 1)

    for i in range(nb):
        @pl.when(mask_ref[0, 0, i] != 0)
        def _(i=i):
            ab = ab_ref[:, i * blk:(i + 1) * blk]    # [6, blk]
            tn = None
            tf = None
            for a in range(3):
                oa = rc(a)
                ia = rc(3 + a)
                t1 = (ab[a, :].reshape(1, -1) - oa) * ia
                t2 = (ab[3 + a, :].reshape(1, -1) - oa) * ia
                lo_a = jnp.minimum(t1, t2)
                hi_a = jnp.maximum(t1, t2)
                tn = lo_a if tn is None else jnp.maximum(tn, lo_a)
                tf = hi_a if tf is None else jnp.minimum(tf, hi_a)
            hit = (tn <= tf) & (tf >= t_min) & (tn <= tmx)
            entry = jnp.where(hit, jnp.maximum(tn, 0.0), jnp.inf)
            out_ref[0, 0, i * blk:(i + 1) * blk] = jnp.min(entry, axis=0)

        @pl.when(mask_ref[0, 0, i] == 0)
        def _(i=i):
            out_ref[0, 0, i * blk:(i + 1) * blk] = jnp.full(
                (blk,), jnp.inf, jnp.float32)


def _sc_mask(ab, o, inv_d, t_max, t_min, n_tiles, tile_rays, blk):
    """Per-(tile, 128-cluster block) conservative any-hit mask, XLA-side.

    ab: f32 [6, Cp] (lo rows 0-2, hi rows 3-5, Cp % blk == 0). Builds the
    union AABB of each block of blk clusters and slab-tests every ray
    against the NB boxes (NB = Cp/blk ~ 22: ~1/blk of the full cull's
    work). Returns i32 [n_tiles, NBp] with NBp lane-padded, SMEM-ready.
    """
    cp = ab.shape[1]
    nb = cp // blk
    lo = jnp.min(ab[0:3].reshape(3, nb, blk), axis=2)   # [3, NB]
    hi = jnp.max(ab[3:6].reshape(3, nb, blk), axis=2)
    o3 = o.reshape(n_tiles, tile_rays, 3)
    i3 = inv_d.reshape(n_tiles, tile_rays, 3)
    tmx = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                           (n_tiles * tile_rays,)) \
        .reshape(n_tiles, tile_rays, 1)
    tn = None
    tf = None
    for a in range(3):
        oa = o3[:, :, a:a + 1]
        ia = i3[:, :, a:a + 1]
        t1 = (lo[a][None, None, :] - oa) * ia            # [tiles, R, NB]
        t2 = (hi[a][None, None, :] - oa) * ia
        lo_a = jnp.minimum(t1, t2)
        hi_a = jnp.maximum(t1, t2)
        tn = lo_a if tn is None else jnp.maximum(tn, lo_a)
        tf = hi_a if tf is None else jnp.minimum(tf, hi_a)
    hit = (tn <= tf) & (tf >= t_min) & (tn <= tmx)
    mask = jnp.any(hit, axis=1).astype(jnp.int32)        # [tiles, NB]
    nbp = -(-nb // LANES) * LANES
    if nbp != nb:
        mask = jnp.concatenate(
            [mask, jnp.zeros((n_tiles, nbp - nb), jnp.int32)], axis=1)
    return mask


def tile_cull(aabb_lo, aabb_hi, o, inv_d, t_max, *, t_min, n_tiles,
              tile_rays, interpret=False):
    """Fused tile cull: returns tile_tnear f32[n_tiles, C].

    aabb_lo/hi: f32[C, 3]; o/inv_d: f32[n, 3] (inv_d = packet._safe_inv);
    t_max: f32[n]. Semantically identical to packet._tile_cull (same
    accept condition, same entry clamp, same +inf fill); the C axis is
    zero-padded to a lane multiple with far boxes that can never pass the
    t_near <= t_max test.

    PT_CULL_SKIP=1 (default OFF — measured rejection, PERF.md 0.37) adds
    the supercluster block gate (_cull_kernel_skip); PT_CULL_BLK sets the
    gated lane-block width.
    Env is read HERE (outside jit) so it participates in the jit cache
    key via the static args.
    """
    import os

    blk = int(os.environ.get("PT_CULL_BLK", "128"))
    # default OFF: measured -12% at blk=128 / -4% at blk=256 on the
    # headline frame despite 68-87% block skip rates - the ~44 scalar
    # branches + 22 small [R, 128] vector bodies per tile cost more than
    # the monolithic [R, C] op they replace (PERF.md 0.37)
    skip = os.environ.get("PT_CULL_SKIP", "0") != "0"
    return _tile_cull_impl(aabb_lo, aabb_hi, o, inv_d, t_max,
                           t_min=t_min, n_tiles=n_tiles,
                           tile_rays=tile_rays, interpret=interpret,
                           skip=skip, blk=blk)


@functools.partial(jax.jit,
                   static_argnames=("t_min", "n_tiles", "tile_rays",
                                    "interpret", "skip", "blk"))
def _tile_cull_impl(aabb_lo, aabb_hi, o, inv_d, t_max, *, t_min, n_tiles,
                    tile_rays, interpret=False, skip=True, blk=128):
    c = aabb_lo.shape[0]
    pad = (-c) % LANES
    if pad:
        far = jnp.full((pad, 3), 1e30, jnp.float32)
        aabb_lo = jnp.concatenate([aabb_lo, far])
        aabb_hi = jnp.concatenate([aabb_hi, far])
    cp = c + pad
    ab = jnp.concatenate([aabb_lo.T, aabb_hi.T])     # [6, Cp]

    r = tile_rays
    rays = jnp.concatenate([o, inv_d], axis=1)       # [n, 6]
    rays = jnp.swapaxes(rays.reshape(n_tiles, r, 6), 1, 2)  # [tiles, 6, R]
    tmx = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                           (n_tiles * r,)).reshape(n_tiles, 1, r)

    skip = skip and cp % blk == 0 and cp // blk >= 2
    if skip:
        mask = _sc_mask(ab, o, inv_d, t_max, float(t_min), n_tiles, r,
                        blk)
        nbp = mask.shape[1]
        kern = functools.partial(_cull_kernel_skip, t_min=float(t_min),
                                 nb=cp // blk, blk=blk)
        out = pl.pallas_call(
            kern,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, 1, nbp), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((6, cp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 6, r), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, r), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, cp), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_tiles, 1, cp), jnp.float32),
            interpret=interpret,
        )(mask[:, None, :], ab, rays, tmx)
        return out[:, 0, :c]

    kern = functools.partial(_cull_kernel, t_min=float(t_min))
    out = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            # AABBs VMEM-resident across all grid steps
            pl.BlockSpec((6, cp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 6, r), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, r), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # Mosaic block rule: last two dims divisible by (8, 128) or equal
        # to the array dims -> unit middle axis (same trick as the sweep)
        out_specs=pl.BlockSpec((1, 1, cp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 1, cp), jnp.float32),
        interpret=interpret,
    )(ab, rays, tmx)
    return out[:, 0, :c]
