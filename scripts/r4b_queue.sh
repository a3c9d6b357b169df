#!/bin/bash
# Post-kalign measurement queue (resumable, done-files). Waits for any
# running tpu_check to finish first, then refreshes every perf artifact
# the kalign-32 default touches.  Logs+markers in scripts/r4_onchip_logs/.
cd /root/repo
LOGD=scripts/r4_onchip_logs
wait_tpu_check() {
  while pgrep -f -x "python scripts/tpu_check.py --fuzz 20" >/dev/null 2>&1; do sleep 30; done
}
step() {  # step <name> <cmd...>
  local name=$1; shift
  [ -f "$LOGD/$name.r4b.done" ] && { echo "== $name: done (skip)"; return; }
  echo "== $name: $*"
  if timeout 2400 "$@" > "$LOGD/$name.r4b.log" 2>&1; then
    touch "$LOGD/$name.r4b.done"; echo "-- $name ok"
  else
    echo "-- $name FAILED rc=$?"
  fi
}
# don't contend with the gate for the chip
while [ -n "$(ps ax -o args= | grep -F 'scripts/tpu_check.py' | grep -v grep)" ]; do sleep 30; done
step configs  python scripts/bench_configs.py
step configs_relaxed python scripts/bench_configs.py --relaxed
step bench    python bench.py
step video64  python scripts/bench_video64.py
step tiles_luma python scripts/tile_sweep.py luma
step ablate_upsample python scripts/exp_ablate_stages.py upsample
echo ALL DONE
