"""On-chip attribution of the sweep kernel's per-iteration cost.

The frame is ~(columns) x (per-iteration cost), and the per-iteration
cost is known to be dominated by FIXED work, not the [R, cpi*K]
Baldwin-Weber ALU (docs/PERF.md 0.16/0.18/0.20: the machine runs at
~1/3 of pure-ALU accounting). This probe decomposes that fixed cost by
running structurally-degenerate variants of the production kernel
(kernels/pallas_sweep._sweep_kernel) on a synthetic column stream where
EVERY variant walks exactly n_cols iterations (no early exit):

  empty   bare while_loop + SMEM cond read        -> F_loop
  nodma   + full BW ALU on a static VMEM block    -> F_loop + A
  noalu   + DMA ring (cpi starts + 1 wait), no BW -> F_loop + F_dma
  dma1    like noalu but ONE contiguous cpi*K DMA -> start-count share
  full    production structure                    -> everything

us/iteration per variant => how much a column actually costs and where:
  A          = nodma - empty
  F_dma      = noalu - empty        (starts + wait + ring bookkeeping)
  start_cost = (noalu - dma1) / (cpi - 1) per extra DMA start
  overlap    = full - noalu - A     (<0 means DMA hides under ALU)

The answer picks the next lever: if start_cost * cpi dominates, chase
coalesced fetches (PT_FETCH_GROUP, weakened by 0.30); if F_loop
dominates, chase fewer/wider iterations (PT_SWEEP_CPI); if A dominates,
the VPU ceiling (0.21) is near and only column counts help.

Timing: two schedule lengths per variant; cost/iter = dt/dcols removes
launch + pallas_call overhead. Warm-up run per config before timing;
host-synced via float(jnp.sum(.)) (CLAUDE.md: block_until_ready does
not reliably block through the tunnel).

Run on TPU:  python benchmarks/sweep_attrib.py
Off-chip:    SWEEP_ATTRIB_INTERPRET=1 (compile/shape validation only).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pathtracer.kernels.pallas_sweep import LANES, SLOTS, _bw_lane

R = 64          # rays per tile (production TILE_RAYS)
K = 128         # triangles per cluster (production fine accel)


def _kernel(st_ref, si_ref, rays_ref, blocks_ref, out_ref, scratch, sems,
            *, cpi, n_cols, variant):
    rays = rays_ref[0]

    def start_dma(slot, col):
        if variant == "dma1":
            # one contiguous cpi-cluster slab per iteration: the id
            # stream is ignored; this bounds what PERFECT start
            # coalescing could buy (fetch-group upper bound). The
            # scratch for this variant is [SLOTS, cpi, 16, K].
            cid = jax.lax.rem(col, jnp.int32(max(1, 1024 // cpi))) * cpi
            pltpu.make_async_copy(
                blocks_ref.at[pl.ds(cid, cpi)],
                scratch.at[slot],
                sems.at[slot],
            ).start()
        else:
            for q in range(cpi):
                cid = si_ref[0, 0, col * cpi + q]
                pltpu.make_async_copy(
                    blocks_ref.at[cid],
                    scratch.at[slot, :, q * K:(q + 1) * K],
                    sems.at[slot],
                ).start()

    def wait_dma(slot):
        pltpu.make_async_copy(
            scratch.at[slot], scratch.at[slot], sems.at[slot]).wait()

    use_dma = variant in ("noalu", "dma1", "full")
    use_alu = variant in ("nodma", "full")

    if not use_dma:
        # the DMA-less variants read scratch; uninitialized VMEM can hold
        # inf/NaN bit patterns that would poison the acc carry and end
        # the loop early, corrupting the F_loop baseline
        scratch[0] = jnp.zeros_like(scratch[0])

    if use_dma:
        for c0 in range(SLOTS - 1):
            if c0 == 0:
                start_dma(0, 0)
            else:
                @pl.when(jnp.int32(c0) < n_cols)
                def _(c0=c0):
                    start_dma(c0 % SLOTS, c0)

    def cond(carry):
        col, best_t, acc = carry
        # same SMEM schedule read as production (clamped index)
        col_c = jnp.minimum(col, n_cols - 1)
        return (col < n_cols) & (st_ref[0, 0, col_c * cpi] < jnp.inf) \
            & (acc < jnp.float32(3e38))

    def body(carry):
        col, best_t, acc = carry
        slot = jax.lax.rem(col, SLOTS)
        if use_dma:
            @pl.when(col + (SLOTS - 1) < n_cols)
            def _():
                start_dma(jax.lax.rem(col + (SLOTS - 1), SLOTS),
                          col + (SLOTS - 1))

            wait_dma(slot)
            block = scratch[slot]
        else:
            block = scratch[0]          # static VMEM, no copies
        if use_alu:
            for q in range(cpi):
                t, u, v, _ = _bw_lane(block[:, q * K:(q + 1) * K], rays,
                                      1e-3, best_t)
                tj = jnp.min(t, axis=1, keepdims=True)
                best_t = jnp.where(tj < best_t, tj, best_t)
        else:
            # touch one row so the DMA isn't dead-code eliminated
            row = block[0, 0, :] if variant == "dma1" else block[0, :]
            acc = acc + jnp.sum(row) * 1e-30
        return col + 1, best_t, acc + 1.0

    init = (jnp.int32(0), jnp.full((R, 1), jnp.inf, jnp.float32),
            jnp.float32(0))
    col_f, best_t, acc = jax.lax.while_loop(cond, body, init)

    if use_dma:
        for off in range(SLOTS - 1):
            @pl.when(col_f + off < n_cols)
            def _(off=off):
                wait_dma(jax.lax.rem(col_f + off, SLOTS))

    out_ref[0, 0, :] = best_t[:, 0] + acc


def run_variant(variant, tiles, n_cols, cpi, c_clusters, blocks, rays,
                interpret):
    cs = n_cols * cpi
    mult = cpi * LANES // np.gcd(cpi, LANES)
    cs_pad = int(-(-cs // mult) * mult)
    st = np.zeros((tiles, 1, cs_pad), np.float32)
    st[:, :, cs:] = np.inf
    rng = np.random.default_rng(0)
    si = rng.integers(0, c_clusters, (tiles, 1, cs_pad)).astype(np.int32)

    kern = functools.partial(_kernel, cpi=cpi, n_cols=cs_pad // cpi,
                             variant=variant)
    vspec = lambda d2, d3: pl.BlockSpec(  # noqa: E731
        (1, d2, d3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    sspec = lambda d3: pl.BlockSpec(  # noqa: E731
        (1, 1, d3), lambda i: (i, 0, 0), memory_space=pltpu.SMEM)
    fn = pl.pallas_call(
        kern,
        grid=(tiles,),
        in_specs=[sspec(cs_pad), sspec(cs_pad), vspec(6, R),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[vspec(1, R)],
        out_shape=[jax.ShapeDtypeStruct((tiles, 1, R), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((SLOTS, cpi, 16, K) if variant == "dma1"
                       else (SLOTS, 16, cpi * K), jnp.float32),
            pltpu.SemaphoreType.DMA((SLOTS,)),
        ],
        interpret=interpret,
    )
    call = fn
    fn = jax.jit(lambda a, b, c, d: call(a, b, c, d)[0])
    args = (jnp.asarray(st), jnp.asarray(si), rays, blocks)
    for _ in range(1 if interpret else 3):   # CLAUDE.md: >= 3 host-synced
        float(jnp.sum(fn(*args)))            # warm-up runs before timing
    t0 = time.time()
    reps = 1 if interpret else 3
    for _ in range(reps):
        out = fn(*args)
    s = float(jnp.sum(out))
    dt = (time.time() - t0) / reps
    return dt, s


def main():
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("PATHTRACER_CACHE",
                       os.path.expanduser("~/.cache/pathtracer-jax")))
    interpret = os.environ.get("SWEEP_ATTRIB_INTERPRET", "0") != "0"
    if interpret:
        jax.config.update("jax_platforms", "cpu")
    print("devices:", jax.devices(), flush=True)

    tiles = int(os.environ.get("ATTRIB_TILES", "256"))
    cpi = int(os.environ.get("ATTRIB_CPI", "12"))
    c_clusters = 2048
    cols_a = 16 if interpret else 64
    cols_b = 24 if interpret else 192

    rng = np.random.default_rng(1)
    blocks = jnp.asarray(rng.normal(size=(c_clusters, 16, K))
                         .astype(np.float32))
    rays = jnp.asarray(rng.normal(size=(tiles, 6, R)).astype(np.float32))

    results = {}
    per_tile = {}
    for variant in ("empty", "nodma", "noalu", "dma1", "full"):
        dta, _ = run_variant(variant, tiles, cols_a, cpi, c_clusters,
                             blocks, rays, interpret)
        dtb, _ = run_variant(variant, tiles, cols_b, cpi, c_clusters,
                             blocks, rays, interpret)
        per_iter = (dtb - dta) / ((cols_b - cols_a) * tiles) * 1e6
        results[variant] = per_iter
        # per-TILE fixed cost (grid-step pipeline + ring warm-up/drain +
        # dispatch, amortized): the intercept of the cols->time line.
        # At the production ~7 iterations/tile this is a first-order
        # share that the per-iteration number hides.
        per_tile[variant] = dta / tiles * 1e6 - cols_a * per_iter
        print(f"{variant:6s}: {per_iter:8.3f} us/iter  "
              f"per-tile fixed {per_tile[variant]:8.3f} us "
              f"(dt {dta * 1e3:.1f} -> {dtb * 1e3:.1f} ms)", flush=True)

    if not interpret:
        e = results["empty"]
        print(f"\nattribution (cpi={cpi}, {cpi * K} tris/iter):")
        print(f"  loop floor          {e:8.3f} us")
        print(f"  BW ALU              {results['nodma'] - e:8.3f} us")
        print(f"  DMA ({cpi} starts)  {results['noalu'] - e:8.3f} us")
        print(f"  DMA (1 start)       {results['dma1'] - e:8.3f} us")
        print(f"  per-extra-start     "
              f"{(results['noalu'] - results['dma1']) / max(cpi - 1, 1):8.3f} us")
        print(f"  full                {results['full']:8.3f} us "
              f"(overlap {results['full'] - results['noalu'] - (results['nodma'] - e):+.3f})")


if __name__ == "__main__":
    main()
