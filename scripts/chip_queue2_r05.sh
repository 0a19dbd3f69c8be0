#!/bin/bash
# Round-5 chip queue, part 2 (final order) — runs after part 1's marker.
# Cheap cache-reusing jobs come before the expensive 2^26 analysis so a
# wall-clock cut costs the least-bad tail.
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

# AMT batch MSM via pair, chunk-vmapped slab (window-serial) [VERDICT #2]
run amt_pair2 7200 python -u scripts/bench_amt_tpu.py 10 10 pair

# commit pipeline retry (programs cached by the first run)   [VERDICT #1]
run pipeline16b 3600 python -u scripts/evidence_tpu.py pipeline

# full-layer end-to-end drive on the chip (verify recipe)
run drive_verify 2400 python -u scripts/drive_verify.py

# EC-FFT re-sweep with the recalibrated Pallas gate (256)    [VERDICT #8]
run ecfft_lowmin 7200 python -u scripts/bench_ec_fft_tpu.py 7 8 9 10

# pair autotune rows at model windows (cached by design)     [VERDICT #3]
run autotune_pair2 10800 env TPU_EC_AUTOTUNE_SPAN=0 \
  python -u scripts/autotune_msm_tpu.py --method pair 16 18 22

# fresh single-MSM sweep (mostly cache hits from autotune)   [VERDICT #5]
run msm_sweep 14400 python -u scripts/bench_msm_tpu.py 14 16 18 20 22

# 2^24 with the recalibrated 2^22 chunks (2^22 prog cached)  [VERDICT #5]
run msm24b 10800 python -u scripts/bench_msm_tpu.py 24

# scan-engine real grid search at one size                   [VERDICT #3]
run autotune_scan2 7200 env TPU_EC_AUTOTUNE_SPAN=1 \
  python -u scripts/autotune_msm_tpu.py --method scan 14

# headline bench warm (driver cache) — cheap
run bench_headline 3600 python -u bench.py

# 2^26 NTT memory-budget analysis, incremental writes        [VERDICT #7]
run ntt26 10800 python -u scripts/bench_ntt26_r05.py 26

note "queue2 complete"
