#!/bin/bash
# Round-3 on-chip runbook: everything that was blocked on the TPU tunnel,
# in one pass, each step logged.  Run from the repo root when
# `python -c "import jax; jax.devices()"` shows the TPU again.
#
#   bash scripts/r3_onchip.sh [logdir]
#
# Steps (each independent; failures don't stop later steps):
#   1. tpu_check.py           -> byte-exactness gate incl. the new
#                                frame-stacked batched cases (artifact)
#   2. check_relaxed_tpu.py   -> relaxed-mode error-bound artifact
#   3. bench_video64.py A/B   -> stacked grid (LIBIQO_TPU_BF) vs auto
#   4. exp_ablate_stages.py   -> per-stage cost of the 4K luma kernel
#   5. exp_dma_ceiling.py     -> u8/i32 HBM streaming ceiling vs the kernel
#   6. bench.py               -> the driver metric JSON line
set -u
cd "$(dirname "$0")/.."
LOG=${1:-scripts/r3_onchip_logs}
mkdir -p "$LOG"

run() {  # run <name> <cmd...>
    local name=$1; shift
    echo "=== $name: $*" | tee -a "$LOG/summary.txt"
    ( time timeout 3600 "$@" ) >"$LOG/$name.log" 2>&1
    local rc=$?
    echo "--- $name exit=$rc" | tee -a "$LOG/summary.txt"
    tail -n 20 "$LOG/$name.log" | sed 's/^/    /'
}

run tpu_check      python scripts/tpu_check.py
run relaxed        python scripts/check_relaxed_tpu.py
run video64_auto   python scripts/bench_video64.py
run video64_bf1    env LIBIQO_TPU_BF=1 python scripts/bench_video64.py
run ablate_luma    python scripts/exp_ablate_stages.py luma
run dma_ceiling    python scripts/exp_dma_ceiling.py
run configs        python scripts/bench_configs.py
run bench          python bench.py
echo "DONE — read $LOG/summary.txt, update BASELINE.md/NOTES.md, commit artifacts."
