"""Pallas TPU sweep kernel: the packet-traversal inner loop as ONE kernel.

Why this exists (measured, benchmarks/micro_tpu.py + packet sweeps): the
XLA while_loop implementation of the per-tile cluster sweep pays a ~40 us
fixed cost per loop iteration (the body is ~a dozen small dispatched ops),
which caps traversal at ~6 Mrays/s regardless of how little work each
iteration does. Moving the whole sweep into a single Pallas kernel makes
an iteration a few VPU ops + one double-buffered DMA - and, because the
grid walks tiles SEQUENTIALLY, each tile pays for ITS OWN schedule length
(sum of unions) instead of the lockstep maximum across the chunk.

Kernel layout per grid step (= one tile of R rays):
  rays   f32[6, R]    VMEM  (ox oy oz dx dy dz - components on sublanes)
  st     f32[1, Cs]   VMEM  per-tile near-to-far schedule entry distances
  si     i32[1, Cs]   VMEM  matching cluster ids
  blocks f32[C,16,K]  ANY   component-major Baldwin-Weber triangle
                            blocks (accel/cluster._finish_build), DMA'd
                            CPI=128/K clusters per iteration into a
                            prefetch-ring [16, 128] VMEM scratch
  out    best (t, u, v, tri) f32/i32 [1, R]

The in-kernel loop is a lax.while_loop whose carry is (column, live
scalar); triangle tests are dense [R, 128] Moller-Trumbore on the VPU with
argmin + iota-select extraction (no gathers anywhere).

Falls back to interpret mode off-TPU (tests run it on CPU).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pathtracer.kernels.intersect import DET_EPS

LANES = 128
# DMA prefetch ring depth. 4 measured perf-neutral at K=512 (the sweep is
# VPU-compute-bound), but at the production cpi=8/K=128 constants a tile
# sweeps only ~7 columns (54.8 schedule entries / cpi, PERF.md 0.33), so
# the SLOTS-1-column warm-up is a large fraction of a tile's DMA work and
# rides the per-TILE (not per-iteration) fixed cost. PT_SWEEP_SLOTS=2/3
# A/Bs a shallower ring (import-time; separate process per leg).
SLOTS = max(2, int(os.environ.get("PT_SWEEP_SLOTS", "4")))
# Dead-tile prefetch gate: skip the warm-up ring + drain for tiles that
# sweep zero columns. Chip A/B (PERF.md 0.45): the headline is live-tile
# dominated and the extra per-tile predicate costs ~0.8% end-to-end,
# while all-dead tiles inside live chunks are rare (the XLA chunk-skip
# already absorbs fully-dead chunks) - so the gate defaults OFF.
# PT_SWEEP_DEADGATE=1 enables it for sparse-shadow workloads.
DEADGATE = os.environ.get("PT_SWEEP_DEADGATE", "0") != "0"


def _bw_lane(block, rays, t_min, best_t):
    """Dense Baldwin-Weber test: block f32[16, L], rays f32[6, R].

    Returns (t, u, v, denom) each f32[R, L]; t = +inf where no valid hit.
    Block rows (accel/cluster._finish_build): n(3), d(1), r1(3), c1(1),
    r2(3), c2(1), id+1, pad(3). denom = n . dir equals the classic MT
    determinant (n = e1 x e2), so DET_EPS semantics are unchanged, and
    its sign gives the facing test for free (front = denom < 0).
    ~46 VPU ops/pair vs ~59 for inline MT: the two cross products move
    to build time as the precomputed barycentric rows r1/r2.
    """
    r = rays.shape[1]

    def rcomp(i):
        return rays[i, :].reshape(r, 1)

    def tcomp(i):
        return block[i, :].reshape(1, -1)

    ox, oy, oz = rcomp(0), rcomp(1), rcomp(2)
    dx, dy, dz = rcomp(3), rcomp(4), rcomp(5)
    nx, ny, nz = tcomp(0), tcomp(1), tcomp(2)
    dpl = tcomp(3)
    r1x, r1y, r1z, c1 = tcomp(4), tcomp(5), tcomp(6), tcomp(7)
    r2x, r2y, r2z, c2 = tcomp(8), tcomp(9), tcomp(10), tcomp(11)

    denom = dx * nx + dy * ny + dz * nz
    inv = jnp.where(jnp.abs(denom) > DET_EPS, 1.0 / denom, 0.0)
    t = (dpl - (ox * nx + oy * ny + oz * nz)) * inv
    hx = ox + t * dx
    hy = oy + t * dy
    hz = oz + t * dz
    u = r1x * hx + r1y * hy + r1z * hz + c1
    v = r2x * hx + r2y * hy + r2z * hz + c2
    ok = ((jnp.abs(denom) > DET_EPS)
          & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
          & (t > t_min) & (t < best_t))
    return jnp.where(ok, t, jnp.inf), u, v, denom


def _sweep_kernel(st_ref, si_ref, rays_ref, tcap_ref, blocks_ref,
                  t_ref, tri_ref, u_ref, v_ref,
                  scratch, sems, *, cpi, k, t_min, n_cols,
                  gate_extract=False):
    r = rays_ref.shape[2]
    rays = rays_ref[0]                      # [6, R]

    def start_dma(slot, col):
        # all cpi copies signal ONE semaphore cell per slot; the matching
        # wait blocks for the slot's total byte count in a single op
        # (cpi separate waits cost ~cpi semaphore round-trips per
        # iteration - measurable at cpi=12)
        for q in range(cpi):
            cid = si_ref[0, 0, col * cpi + q]
            pltpu.make_async_copy(
                blocks_ref.at[cid],
                scratch.at[slot, :, q * k:(q + 1) * k],
                sems.at[slot],
            ).start()

    def wait_dma(slot):
        # equal-TOTAL-size descriptor; .wait() blocks on the semaphore
        # for the byte count (source/dest ids irrelevant to the wait)
        pltpu.make_async_copy(
            scratch.at[slot], scratch.at[slot], sems.at[slot]).wait()

    # Dead-tile gate (PT_SWEEP_DEADGATE, default off - see DEADGATE): a
    # tile whose NEAREST schedule entry is already past its farthest ray
    # cap sweeps zero columns - skip the whole prefetch ring, not just
    # the loop. The same predicate gates the drain below so starts and
    # waits stay paired. Mirrors the while cond at col=0.
    t_cap = tcap_ref[0, 0, :].reshape(r, 1)
    live = (st_ref[0, 0, 0] < jnp.max(t_cap) if DEADGATE
            else jnp.bool_(True))

    # prefetch ring: columns 0..SLOTS-1 in flight before the loop
    for c0 in range(SLOTS - 1):
        @pl.when(live & (jnp.int32(c0) < n_cols))
        def _(c0=c0):
            start_dma(c0 % SLOTS, c0)

    tid_row = 12  # block row holding tri-id (+1, as a float value)

    def cond(carry):
        col, best_t, best_tri, best_u, best_v, max_best = carry
        # & is not short-circuit: clamp the SMEM index so col == n_cols
        # never reads past the (1, 1, cs) block
        col_c = jnp.minimum(col, n_cols - 1)
        return (col < n_cols) & (st_ref[0, 0, col_c * cpi] < max_best)

    def body(carry):
        col, best_t, best_tri, best_u, best_v, max_best = carry
        slot = jax.lax.rem(col, SLOTS)

        @pl.when(col + (SLOTS - 1) < n_cols)
        def _():
            start_dma(jax.lax.rem(col + (SLOTS - 1), SLOTS),
                      col + (SLOTS - 1))

        wait_dma(slot)
        block = scratch[slot]
        t, u, v, _ = _bw_lane(block, rays, t_min, best_t)
        # id+1 as float value (accel/cluster.py: denormal-flush hazard)
        tid = jnp.round(block[tid_row, :].reshape(1, -1)).astype(jnp.int32)             - 1

        tj = jnp.min(t, axis=1, keepdims=True)        # [R, 1]

        def extract(args):
            best_t, best_tri, best_u, best_v, max_best = args
            j = jnp.argmin(t, axis=1, keepdims=True)
            lane = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
            sel = (lane == j).astype(jnp.float32)
            uj = jnp.sum(u * sel, axis=1, keepdims=True)
            vj = jnp.sum(v * sel, axis=1, keepdims=True)
            idj = jnp.sum(jnp.where(lane == j, tid, 0), axis=1,
                          keepdims=True)

            better = (tj < best_t) & jnp.isfinite(tj) & (idj >= 0)
            best_t = jnp.where(better, tj, best_t)
            best_tri = jnp.where(better, idj, best_tri)
            best_u = jnp.where(better, uj, best_u)
            best_v = jnp.where(better, vj, best_v)
            return best_t, best_tri, best_u, best_v, jnp.max(best_t)

        hit_state = (best_t, best_tri, best_u, best_v, max_best)
        if gate_extract:
            # _mt_lane already gates ok on t < best_t, so a finite tj
            # means this column improves SOME ray; most near-to-far
            # columns improve none and skip the argmin + one-hot
            # extraction entirely (a real scf.if branch).
            hit_state = jax.lax.cond(
                jnp.any(jnp.isfinite(tj)), extract, lambda a: a, hit_state)
        else:
            hit_state = extract(hit_state)
        best_t, best_tri, best_u, best_v, max_best = hit_state
        return col + 1, best_t, best_tri, best_u, best_v, max_best

    # best_t starts at the per-ray scene-exit cap (not t_max): rays that
    # miss everything then stop steering the sweep past the scene bounds.
    init = (
        jnp.int32(0),
        t_cap,
        jnp.full((r, 1), -1, jnp.int32),
        jnp.zeros((r, 1), jnp.float32),
        jnp.zeros((r, 1), jnp.float32),
        jnp.max(t_cap),
    )
    col_f, best_t, best_tri, best_u, best_v, _ = jax.lax.while_loop(
        cond, body, init)

    # Drain in-flight prefetches so the next grid step starts clean: on
    # exit at column col_f, DMAs were issued for columns col_f ..
    # min(col_f + SLOTS - 2, n_cols - 1) (the SLOTS-1 deep ring) - but
    # only if the tile was live (the gate above skipped the ring else).
    for off in range(SLOTS - 1):
        @pl.when(live & (col_f + off < n_cols))
        def _(off=off):
            wait_dma(jax.lax.rem(col_f + off, SLOTS))

    t_ref[0, 0, :] = best_t[:, 0]
    tri_ref[0, 0, :] = best_tri[:, 0]
    u_ref[0, 0, :] = best_u[:, 0]
    v_ref[0, 0, :] = best_v[:, 0]


def _occl_kernel(st_ref, si_ref, rays_ref, tm_ref, blocks_ref,
                 out_ref, *rest, cpi, k, n_cols,
                 want_blocker=False):
    """Occlusion sweep. With want_blocker, a second output carries the id
    of SOME blocking triangle per ray (-1 open) - the shadow-priming hint
    (any-hit semantics: which blocker is unspecified). The id extraction
    is gated on "some lane newly blocked" so the steady-state iteration
    cost is unchanged."""
    if want_blocker:
        btri_ref, scratch, sems = rest
    else:
        scratch, sems = rest
    r = rays_ref.shape[2]
    rays = rays_ref[0]                      # [6, R]
    t_max = tm_ref[0, 0, :].reshape(r, 1)
    tid_row = 12                            # id+1 as a float value

    def start_dma(slot, col):
        # one semaphore cell per slot; see _sweep_kernel.start_dma
        for q in range(cpi):
            cid = si_ref[0, 0, col * cpi + q]
            pltpu.make_async_copy(
                blocks_ref.at[cid],
                scratch.at[slot, :, q * k:(q + 1) * k],
                sems.at[slot],
            ).start()

    def wait_dma(slot):
        pltpu.make_async_copy(
            scratch.at[slot], scratch.at[slot], sems.at[slot]).wait()

    # Dead-tile gate (see _sweep_kernel; PT_SWEEP_DEADGATE): an empty
    # schedule (first entry inf) sweeps zero columns - skip the ring and
    # its drain entirely.
    live = (st_ref[0, 0, 0] < jnp.inf if DEADGATE
            else jnp.bool_(True))

    for c0 in range(SLOTS - 1):
        @pl.when(live & (jnp.int32(c0) < n_cols))
        def _(c0=c0):
            start_dma(c0 % SLOTS, c0)

    def cond(carry):
        col, blocked, n_open = carry[:3]
        col_c = jnp.minimum(col, n_cols - 1)   # keep SMEM read in bounds
        return (col < n_cols) & (st_ref[0, 0, col_c * cpi] < jnp.inf) \
            & (n_open > 0)

    def body(carry):
        if want_blocker:
            col, blocked, n_open, btri = carry
        else:
            col, blocked, n_open = carry
        slot = jax.lax.rem(col, SLOTS)

        @pl.when(col + (SLOTS - 1) < n_cols)
        def _():
            start_dma(jax.lax.rem(col + (SLOTS - 1), SLOTS),
                      col + (SLOTS - 1))

        wait_dma(slot)
        block = scratch[slot]
        t, u, v, denom = _bw_lane(block, rays, 0.0, jnp.inf)
        # denom = dir . (e1 x e2): its sign IS the facing test - no
        # geometric-normal recompute (kernels/packet._mt_any_front).
        front = denom < 0.0
        hit = jnp.isfinite(t) & front & (t < t_max)
        any_hit = jnp.any(hit, axis=1, keepdims=True).astype(jnp.int32)
        if want_blocker:
            new = (any_hit > 0) & (blocked == 0)

            def record(btri):
                # mirror _sweep_kernel's extraction pattern exactly
                # (f32 argmin + iota one-hot): argmax over an i1 vector
                # is not a Mosaic-proven idiom
                th = jnp.where(hit, t, jnp.inf)
                j = jnp.argmin(th, axis=1, keepdims=True)
                lane = jax.lax.broadcasted_iota(jnp.int32, hit.shape, 1)
                tid = jnp.round(block[tid_row, :].reshape(1, -1)) \
                    .astype(jnp.int32) - 1
                idj = jnp.sum(jnp.where(lane == j, tid, 0), axis=1,
                              keepdims=True)
                return jnp.where(new, idj, btri)

            btri = jax.lax.cond(jnp.any(new), record, lambda b: b, btri)
        # blocked is carried as i32: i1 vectors in while-carries fail to
        # legalize in Mosaic
        blocked = jnp.maximum(blocked, any_hit)
        n_open = jnp.sum(1 - blocked)
        out = (col + 1, blocked, n_open)
        return out + (btri,) if want_blocker else out

    init = (
        jnp.int32(0),
        jnp.zeros((r, 1), jnp.int32),
        jnp.int32(r),
    )
    if want_blocker:
        init = init + (jnp.full((r, 1), -1, jnp.int32),)
    fin = jax.lax.while_loop(cond, body, init)
    col_f, blocked = fin[0], fin[1]

    for off in range(SLOTS - 1):
        @pl.when(live & (col_f + off < n_cols))
        def _(off=off):
            wait_dma(jax.lax.rem(col_f + off, SLOTS))

    out_ref[0, 0, :] = blocked[:, 0]
    if want_blocker:
        btri_ref[0, 0, :] = fin[3][:, 0]


def _cpi_mult(k: int, c: int) -> int:
    """Clusters tested per while-loop iteration (as a multiplier).

    The per-iteration fixed cost (loop branch + DMA semaphore ops + SMEM
    schedule read) is first-order on v5e (docs/PERF.md 0.16/0.18), so
    each body tests ~1024 triangles' worth of clusters at the price of a
    coarser early-exit granule. Swept on the true headline frame TWICE:
    at the r2 constants, K=128 gave 3:7280 / 8:5891 / 12:5855 / 16:6077
    ms/sample (~1536 optimum); re-swept 2026-08-19 at the r3 defaults
    (sahsplit accel + dirmajor occl keys, docs/PERF.md 0.31) the optimum
    moved to cpi=8: 8:4531 / 12:4603 / 16:4725. Re-swept AGAIN after the
    Pallas cull + sortnet landed (0.33 balance): the 1-spp wavefront
    probe marginally favors cpi=12 (3567 vs 3603/3604 ms/sample) but the
    full 4-spp-batched bench - the production shape, with bigger ray
    pools and therefore shorter schedules where early-exit granularity
    matters more - favors cpi=8 (textured 6.098 vs 6.065, untextured
    6.765 vs 6.548 Mrays/s; interleaved windows, std 2-4 ms). Frame
    scale wins: target stays 1024 tris/iteration. Small scenes cap at ~C/4
    clusters per body so the early exit keeps at least a few granules
    (a 21-cluster materials scene regressed 25% testing 12
    clusters/iteration). PT_SWEEP_CPI overrides.
    """
    import os

    env = os.environ.get("PT_SWEEP_CPI")
    if env:
        return int(env)
    return max(1, min(1024 // max(k, LANES), c // 4))


def _pad_cols(st, si, cpi):
    """Pad the schedule's column axis to a multiple of lcm(cpi, 128).

    Must be a multiple of BOTH: Mosaic wants 128-aligned SMEM blocks, and
    n_cols = cs // cpi floors - a max() here silently dropped the tail
    schedule entries for cpi values that don't divide 128 (found when
    cpi=12 shifted the headline image mean).
    """
    import math

    tiles, cs = st.shape
    mult = cpi * LANES // math.gcd(cpi, LANES)
    pad = (-cs) % mult
    if pad:
        st = jnp.concatenate(
            [st, jnp.full((tiles, pad), jnp.inf, jnp.float32)], axis=1)
        si = jnp.concatenate(
            [si, jnp.zeros((tiles, pad), jnp.int32)], axis=1)
    return st, si


def sweep_closest(st, si, rays, t_cap, blocks_t, t_min,
                  interpret=False):
    """Run the closest-hit sweep kernel over all tiles.

    st: f32[tiles, Cs] sorted schedule distances (inf-padded, Cs % cpi == 0)
    si: i32[tiles, Cs] matching cluster ids (pads clamped to 0)
    rays: f32[tiles, 6, R]; blocks_t: f32[C, 16, K] (Baldwin-Weber rows).
    Returns (t, tri, u, v) each [tiles, R]. The per-ray upper bound rides
    in t_cap (best_t is seeded from it); there is no scalar t_max.
    """
    import os

    k = blocks_t.shape[2]
    cpi = max(1, LANES // k) * _cpi_mult(k, blocks_t.shape[0])
    st, si = _pad_cols(st, si, cpi)
    tiles, cs = st.shape
    r = rays.shape[2]
    n_cols = cs // cpi

    # Extraction gating defaults ON: on the true multi-bounce headline
    # (post winding fix) it measures 22.1 -> 18.7 s/sample - deep-bounce
    # sweeps test many columns that improve no ray, and each skip saves
    # the argmin + three one-hot reductions for a ~0.4us branch.
    kern = functools.partial(_sweep_kernel, cpi=cpi, k=k,
                             t_min=float(t_min),
                             n_cols=n_cols,
                             gate_extract=os.environ.get(
                                 "PT_SWEEP_GATE", "1") != "0")
    grid = (tiles,)
    # Mosaic block rule: last two dims divisible by (8, 128) or equal to
    # the array dims -> give every per-tile operand a unit middle axis.
    vspec = lambda d2, d3: pl.BlockSpec(  # noqa: E731
        (1, d2, d3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    sspec = lambda d3: pl.BlockSpec(  # noqa: E731
        (1, 1, d3), lambda i: (i, 0, 0), memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            sspec(cs),          # schedule scalars: dynamic per-column reads
            sspec(cs),
            vspec(6, r),
            vspec(1, r),        # per-ray scene-exit cap on best_t
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[vspec(1, r), vspec(1, r), vspec(1, r), vspec(1, r)],
        out_shape=[
            jax.ShapeDtypeStruct((tiles, 1, r), jnp.float32),
            jax.ShapeDtypeStruct((tiles, 1, r), jnp.int32),
            jax.ShapeDtypeStruct((tiles, 1, r), jnp.float32),
            jax.ShapeDtypeStruct((tiles, 1, r), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((SLOTS, 16, cpi * k), jnp.float32),
            pltpu.SemaphoreType.DMA((SLOTS,)),
        ],
        interpret=interpret,
    )(st[:, None, :], si[:, None, :], rays.reshape(tiles, 6, r),
      t_cap[:, None, :], blocks_t)
    return tuple(x[:, 0, :] for x in out)


def sweep_occluded(st, si, rays, t_max_rays, blocks_t, interpret=False,
                   want_blocker=False):
    """Run the occlusion sweep kernel. Returns blocked i32[tiles, R];
    with want_blocker, (blocked, blocker_tri i32[tiles, R], -1 open)."""
    k = blocks_t.shape[2]
    cpi = max(1, LANES // k) * _cpi_mult(k, blocks_t.shape[0])
    st, si = _pad_cols(st, si, cpi)
    tiles, cs = st.shape
    r = rays.shape[2]
    n_cols = cs // cpi

    kern = functools.partial(_occl_kernel, cpi=cpi, k=k, n_cols=n_cols,
                             want_blocker=want_blocker)
    vspec = lambda d2, d3: pl.BlockSpec(  # noqa: E731
        (1, d2, d3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    sspec = lambda d3: pl.BlockSpec(  # noqa: E731
        (1, 1, d3), lambda i: (i, 0, 0), memory_space=pltpu.SMEM)
    n_out = 2 if want_blocker else 1
    out = pl.pallas_call(
        kern,
        grid=(tiles,),
        in_specs=[
            sspec(cs),
            sspec(cs),
            vspec(6, r),
            vspec(1, r),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[vspec(1, r)] * n_out,
        out_shape=[
            jax.ShapeDtypeStruct((tiles, 1, r), jnp.int32),
        ] * n_out,
        scratch_shapes=[
            pltpu.VMEM((SLOTS, 16, cpi * k), jnp.float32),
            pltpu.SemaphoreType.DMA((SLOTS,)),
        ],
        interpret=interpret,
    )(st[:, None, :], si[:, None, :], rays.reshape(tiles, 6, r),
      t_max_rays[:, None, :], blocks_t)
    if want_blocker:
        return out[0][:, 0, :], out[1][:, 0, :]
    return out[0][:, 0, :]
