#!/bin/bash
# Poll the axon TPU tunnel; run the round-3 on-chip runbook when it's up.
# Designed to live in a tmux session:  bash scripts/poll_then_onchip.sh
# Probe timeouts are generous (>120 s) because black-hole mode makes even
# import-time hangs look like failures (see memory: axon-tunnel-failure-modes).
set -u
cd "$(dirname "$0")/.."
FLAG=/tmp/tpu_up.flag
rm -f "$FLAG"
i=0
while true; do
    i=$((i + 1))
    echo "[poll $i] $(date -u +%H:%M:%S) probing TPU..."
    if timeout 300 python -c "import jax; d=jax.devices(); assert d[0].platform=='tpu', d; print('TPU UP:', d)"; then
        touch "$FLAG"
        echo "[poll $i] TPU is up — starting r4_onchip.sh"
        bash scripts/r4_onchip.sh scripts/r4_onchip_logs
        rc=$?
        echo "RUNBOOK DONE rc=$rc"
        # nonzero = steps incomplete (tunnel died mid-run); resume polling
        # — the runbook skips finished steps on the next attempt
        [ "$rc" -eq 0 ] && break
    fi
    echo "[poll $i] down; sleeping 180 s"
    sleep 180
done
