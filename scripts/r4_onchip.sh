#!/bin/bash
# Round-4 on-chip runbook (supersedes r3_onchip.sh): everything blocked on
# the TPU tunnel, one pass, each step logged and independent.
#
#   bash scripts/r4_onchip.sh [logdir]
#
# Steps:
#   1. tpu_check.py        -> byte-exactness gate: exact sweep (36 cases,
#                             now incl. the strength-reduced border divide
#                             and frame-stacked batches) + NEW relaxed
#                             sweep (graded + px2 fuzz + forced residual
#                             plane)  [artifact: tpu_check_result.json]
#   2. relaxed             -> regenerate check_relaxed_result.json post-fix
#                             (the committed one predates the residual-
#                             plane fix and contains a stale FAIL row)
#   3. div A/B             -> the round-4 multiply-based exact division vs
#                             LIBIQO_TPU_REAL_DIV=1 (jax.lax.div) on the
#                             headline + upsample configs: keep or revert
#   4. ablation            -> per-stage exposed cost, luma AND upsample
#                             (locates the non-X wall; VERDICT r3 #3/#4)
#   5. video64 A/B         -> frame stacking bf=auto vs bf=1 (keep or kill)
#   6. dma_ceiling         -> u8/i32 HBM streaming ceiling vs the kernel
#   7. configs (+relaxed)  -> all graded config rows for BASELINE.md
#   8. bench.py            -> the driver metric JSON line
set -u
cd "$(dirname "$0")/.."
LOG=${1:-scripts/r4_onchip_logs}
mkdir -p "$LOG"

run() {  # run <name> <cmd...> — resumable: a step that already succeeded
         # (done-file present) is skipped, so a tunnel death mid-runbook
         # doesn't burn the next uptime window repeating finished steps.
    local name=$1; shift
    if [ -e "$LOG/$name.done" ]; then
        echo "=== $name: already done, skipping" | tee -a "$LOG/summary.txt"
        return 0
    fi
    echo "=== $name: $*" | tee -a "$LOG/summary.txt"
    ( time timeout 7200 "$@" ) >"$LOG/$name.log" 2>&1
    local rc=$?
    echo "--- $name exit=$rc" | tee -a "$LOG/summary.txt"
    [ $rc -eq 0 ] && touch "$LOG/$name.done"
    tail -n 20 "$LOG/$name.log" | sed 's/^/    /'
}

# Ordered by value-if-the-tunnel-dies-mid-run: correctness record first,
# then the driver metric, then the measurement campaign.
run tpu_check        python scripts/tpu_check.py
run bench            python bench.py
run relaxed          python scripts/check_relaxed_tpu.py
run configs          python scripts/bench_configs.py
run div_lax          env LIBIQO_TPU_REAL_DIV=1 python scripts/bench_configs.py luma4k upsample chroma
run ablate_luma      python scripts/exp_ablate_stages.py luma
run ablate_upsample  python scripts/exp_ablate_stages.py upsample
run tiles_upsample   python scripts/tile_sweep.py upsample
run carry1           env LIBIQO_TPU_CARRY=1 python scripts/bench_configs.py luma4k chroma upsample
run video64_carry    env LIBIQO_TPU_CARRY=1 python scripts/bench_video64.py
run video64_auto     python scripts/bench_video64.py
run video64_bf1      env LIBIQO_TPU_BF=1 python scripts/bench_video64.py
run dma_ceiling      python scripts/exp_dma_ceiling.py
run configs_relaxed  python scripts/bench_configs.py --relaxed

missing=0
for s in tpu_check bench relaxed configs div_lax ablate_luma ablate_upsample \
         tiles_upsample carry1 video64_carry video64_auto video64_bf1 \
         dma_ceiling configs_relaxed; do
    [ -e "$LOG/$s.done" ] || { echo "INCOMPLETE: $s"; missing=$((missing+1)); }
done
echo "DONE ($missing incomplete) — read $LOG/summary.txt, update BASELINE.md/NOTES.md, commit artifacts."
exit $missing
