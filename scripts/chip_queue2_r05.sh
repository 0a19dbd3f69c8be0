#!/bin/bash
# Round-5 chip queue, part 2 — waits for part 1 to finish, then runs the
# remaining chip jobs.  Same conventions as chip_queue_r05.sh.
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

while ! grep -q "queue complete" "$Q" 2>/dev/null; do sleep 30; done
note "queue2 starting"

# 8. full-layer end-to-end drive on the chip (verify recipe)
run drive_verify 1800 python -u scripts/drive_verify.py

# 9. 2^26 NTT: memory-budget analysis + timed run if it fits  [VERDICT #7]
run ntt26 10800 python -u scripts/bench_ntt26_r05.py 26

# 10. more pair autotune rows at sizes whose programs are now cached
#     (2^16 compiled by the pipeline job; span=0 = the model window)
run autotune_pair2 10800 env TPU_EC_AUTOTUNE_SPAN=0 \
  python -u scripts/autotune_msm_tpu.py --method pair 16 18 22

# 11. headline bench warm (also re-populates the digit-NTT compile cache
#     for the driver's end-of-round bench.py run)
run bench_headline 3600 python -u bench.py

note "queue2 complete"
