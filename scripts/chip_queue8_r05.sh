#!/bin/bash
# Round-5 chip queue, part 8 — final schedule: waits for the in-flight
# drive_verify (PID $1), then runs the remaining jobs with the FLAT batch
# engine's AMT number first (the round's #2 verdict item).
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
while kill -0 "$1" 2>/dev/null; do sleep 15; done
note "queue8 starting (drive_verify released the chip)"

# AMT via the flat one-sort batch engine                     [VERDICT #2]
run amt_flat 7200 env TPU_EC_BATCH_MSM_SLAB=128 \
  python -u scripts/bench_amt_tpu.py 10 10 pair

# EC-FFT re-sweep with the recalibrated Pallas gate (256)    [VERDICT #8]
run ecfft_lowmin 7200 python -u scripts/bench_ec_fft_tpu.py 7 8 9 10

# pair autotune rows at model windows                        [VERDICT #3]
run autotune_pair2 10800 env TPU_EC_AUTOTUNE_SPAN=0 \
  python -u scripts/autotune_msm_tpu.py --method pair 16 18 22

# fresh single-MSM sweep (cache hits from autotune)          [VERDICT #5]
run msm_sweep 14400 python -u scripts/bench_msm_tpu.py 14 16 18 20 22

# 2^24 with the recalibrated 2^22 chunks                     [VERDICT #5]
run msm24b 10800 python -u scripts/bench_msm_tpu.py 24

# headline bench warm (driver cache) — cheap
run bench_headline 3600 python -u bench.py

# 2^26 NTT memory-budget analysis, incremental writes        [VERDICT #7]
run ntt26 10800 python -u scripts/bench_ntt26_r05.py 26

note "queue8 complete"
