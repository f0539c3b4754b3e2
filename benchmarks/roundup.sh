#!/bin/bash
# One-window measurement roundup: runs every pending A/B serially on the
# chip (NEVER run two TPU jobs at once - CLAUDE.md) and logs to
# /tmp/roundup_<ts>.log. Designed to survive tunnel flakiness: each stage
# is bounded and failures don't stop later stages.
#
# Usage: bash benchmarks/roundup.sh [quick]
#   quick = smaller frame counts for a fast first pass.

set -u
cd "$(dirname "$0")/.."
TS=$(date +%H%M%S)
LOG=${ROUNDUP_LOG:-/tmp/roundup_$TS.log}
Q=${1:-full}
echo "roundup -> $LOG (mode=$Q)" | tee "$LOG"

run() {  # run <label> <timeout_s> <cmd...>
    local label=$1 to=$2; shift 2
    echo "=== $label ($(date +%T)) ===" | tee -a "$LOG"
    timeout "$to" "$@" >> "$LOG" 2>&1
    echo "--- rc=$? ---" | tee -a "$LOG"
}

# 0. chip sanity (fail fast if the tunnel is down)
run chip-sanity 180 python -c "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones((8,128)))))" || true
grep -q "1024.0" "$LOG" || { echo "TUNNEL DOWN - aborting" | tee -a "$LOG"; exit 1; }

# 0.5 BANK A HEADLINE NUMBER FIRST: a short textured bench at the new
#     defaults (sahsplit + firstcluster occl key, PERF.md 0.22-0.25).
#     If the tunnel dies mid-roundup we still have the judged metric.
run bench-bank 4200 env BENCH_FRAMES=3 python bench.py

# 0.7 per-iteration cost ATTRIBUTION (loop / DMA starts / wait / ALU):
#     decides which fixed-cost lever the grid results mean (PERF.md 0.30)
run sweep-attrib 1800 python benchmarks/sweep_attrib.py

# 1. fetch-group grid on the headline frame (1 spp; ~6 entries)
#    entries: CHUNK_TILES:closest_db:cpi:fetch_group
# CPI legs first: pair_stats on the sahsplit accel predicts the g=2/4
# legs lose (PERF.md 0.30) - confirm cheaply at the tail
GRID_FG="2048:3:-:-,2048:3:8:-,2048:3:16:-,2048:3:24:-,2048:3:-:2,2048:3:16:2,2048:3:-:4"
run fetch-group-grid 5400 env GRID="$GRID_FG" python benchmarks/frame_ab.py

# 2. on-chip confirmation of the off-chip column-count flips
#    (PERF.md 0.22/0.24/0.25). New defaults = sahsplit accel +
#    firstcluster occlusion key; legs revert one axis each.
run new-defaults 2700 env GRID="2048:3:-:-" python benchmarks/frame_ab.py
run occl-key-revert 2700 env GRID="2048:3:-:-" PT_KEY_SCHEME_OCCL=dirmajor python benchmarks/frame_ab.py
run sahleaf-accel 2700 env GRID="2048:3:-:-" PT_FINE_METHOD=sahleaf PT_COARSE_METHOD=sahleaf python benchmarks/frame_ab.py
run old-builds 2700 env GRID="2048:3:-:-" PT_FINE_METHOD=median PT_COARSE_METHOD=morton PT_KEY_SCHEME_OCCL=dirmajor python benchmarks/frame_ab.py
# closest-bounce key candidate (x1.10 columns, below the chip-gate
# threshold - PERF.md 0.26)
run fc-bounce-key 2700 env GRID="2048:3:-:-" PT_KEY_SCHEME=firstcluster python benchmarks/frame_ab.py

# 2.7 spp-batched wavefront (all 4 spp in one wavefront: x1.49 fewer
#     bounce columns/ray off-chip, PERF.md 0.27; estimator-identical)
run spp-batch 3600 env BENCH_FRAMES=4 BENCH_SPP_BATCH=1 BENCH_UNTEXTURED_REF=0 python bench.py
run spp-loop 3600 env BENCH_FRAMES=4 BENCH_UNTEXTURED_REF=0 python bench.py

# 2.8 Owen-scrambled Sobol draw-cost check (quality pinned off-chip by
#     tests/test_sobol.py; this measures the ALU cost of the 32-step
#     direction-vector loop on the true workload)
run sobol-cost 3600 env BENCH_FRAMES=3 BENCH_SAMPLER=sobol BENCH_UNTEXTURED_REF=0 python bench.py

# 3. want_blocker Mosaic compile validation, THEN priming A/B
run blocker-probe 900 python benchmarks/blocker_probe.py
SPP=4; [ "$Q" = quick ] && SPP=2
run priming 4500 env BENCH_SPP=$SPP python benchmarks/priming_ab.py

# 4. headline bench refresh (textured, default knobs)
FRAMES=8; [ "$Q" = quick ] && FRAMES=3
run bench-textured 5400 env BENCH_FRAMES=$FRAMES python bench.py
run bench-untextured 5400 env BENCH_FRAMES=$FRAMES BENCH_TEXTURED=0 python bench.py

# 5. full-scale BASELINE config sweep (VERDICT r1 item 8: all five
#    configs at their specified resolutions; quick mode halves scale)
SCALE=1.0; [ "$Q" = quick ] && SCALE=0.5
run baseline-configs 10800 python benchmarks/run_configs.py --scale "$SCALE" --frames 3

echo "ROUNDUP DONE $(date +%T)" | tee -a "$LOG"
