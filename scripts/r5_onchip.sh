#!/bin/bash
# Round-5 on-chip runbook (supersedes r4_onchip.sh): the steps that close
# the round-4 VERDICT, one pass, each step logged, resumable.
#
#   bash scripts/r5_onchip.sh [logdir]
#
# Steps (the sharded gate + wheel validation already ran and committed
# earlier this round: tpu_check_result.json `sharded` rows,
# check_wheel_result.json):
#   1. tpu_check      -> full byte-exactness gate incl. the round-5
#                        sharded section (rerun so the committed artifact
#                        is end-of-round fresh)  [tpu_check_result.json]
#   2. bench          -> the driver metric JSON line
#   3. cli_protocol   -> reference-protocol CLI row: construct-per-cycle
#                        (VERDICT r4 #5; tunnel-dominated, recorded as such)
#   4. cli_amortized  -> construct-once CLI row (serving mode)
#   5. configs        -> all graded config rows for BASELINE.md
#   6. dma_ceiling    -> checksum-verified HBM/VMEM stream rates
#                        (VERDICT r4 #2; replaces the INVALID r4 rows)
#   7. blocked_halo   -> Blocked main+halo vs Element band A/B
#                        (VERDICT r4 #7; third run = the tiebreaker)
set -u
cd "$(dirname "$0")/.."
LOG=${1:-scripts/r5_onchip_logs}
mkdir -p "$LOG"

run() {  # resumable: a step that already succeeded is skipped
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

run tpu_check      python scripts/tpu_check.py --fuzz 40
run bench          python bench.py
run cli_protocol   python -m libiqo_tpu.cli.benchmark -m lanczos3 \
                       -iw 3840 -ih 2160 -ow 1920 -oh 1080 --cycles 64
run cli_amortized  python -m libiqo_tpu.cli.benchmark -m lanczos3 \
                       -iw 3840 -ih 2160 -ow 1920 -oh 1080 --cycles 64 \
                       --amortized
run configs        python scripts/bench_configs.py
run configs_rel    python scripts/bench_configs.py --relaxed
run video64        python scripts/bench_video64.py
run ablate_luma    python scripts/exp_ablate_stages.py luma
run ablate_upsample python scripts/exp_ablate_stages.py upsample
run dma_ceiling    python scripts/exp_dma_ceiling.py
run blocked_halo   python scripts/exp_blocked_halo.py
