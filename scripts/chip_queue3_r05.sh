#!/bin/bash
# Round-5 chip queue, part 3 — fresh single-MSM sweep with the vectorized
# pair engine + tuned windows (programs cached by the earlier autotune
# jobs), re-benching the sizes whose newest numbers were round-3.
cd /root/repo || exit 1
mkdir -p .chiplogs
Q=.chiplogs/queue.log

note() { echo "[$(date +%H:%M:%S)] $*" >> "$Q"; }

run() {
  local name=$1 tmo=$2; shift 2
  note "START $name: $*"
  timeout "$tmo" "$@" > ".chiplogs/$name.log" 2>&1
  note "END $name rc=$?"
}

while ! grep -q "queue2 complete" "$Q" 2>/dev/null; do sleep 30; done
note "queue3 starting"

# 12. single-MSM sweep 2^14-2^22 with the vmapped windows + tuned table
run msm_sweep 14400 python -u scripts/bench_msm_tpu.py 14 16 18 20 22

note "queue3 complete"
