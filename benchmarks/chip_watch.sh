#!/bin/bash
# Single-poller chip watcher (CLAUDE.md: leave at most ONE of ours).
# Probes the TPU every POLL_S seconds with a bounded one-liner; on two
# consecutive successes (60 s apart, to ride out collisions with the
# driver's own ~20-min probe) fires benchmarks/roundup.sh and exits.
set -u
cd "$(dirname "$0")/.."
POLL_S=${POLL_S:-600}
MODE=${1:-full}
probe() {
    timeout 150 python -c \
        "import jax, jax.numpy as jnp; assert jax.devices()[0].platform != 'cpu'; print(float(jnp.sum(jnp.ones((8,128)))))" \
        2>/dev/null | grep -q "1024.0"
}
echo "chip_watch: polling every ${POLL_S}s (mode=$MODE)"
while true; do
    if probe; then
        echo "chip_watch: probe 1 OK $(date +%T); confirming in 60s"
        sleep 60
        if probe; then
            echo "chip_watch: chip is BACK $(date +%T) - running roundup"
            bash benchmarks/roundup.sh "$MODE"
            echo "chip_watch: roundup finished $(date +%T)"
            exit 0
        fi
        echo "chip_watch: confirmation failed (collision?); backing off"
    fi
    sleep "$POLL_S"
done
