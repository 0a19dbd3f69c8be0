#!/bin/bash
# Round-5 serial chip-job queue (single-tenant TPU behind the axon tunnel).
# Each job runs under `timeout` with its own log in .chiplogs/; the queue
# never kills by pattern.  Order = VERDICT r4 priority, cheapest-first
# within ties so an early death still leaves artifacts.
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

# wait for the cache probe to release the chip
while ! grep -q "probe rc=" /tmp/probe_r05.log 2>/dev/null; do sleep 20; done
note "probe finished; queue starting"

# 1. G2 TPU evidence at 2^12 (scan engine, compile-light)     [VERDICT #6]
run g2_tpu 2400 python -u scripts/evidence_g2.py 12

# 2. measured autotune rows, scan engine, span=1              [VERDICT #3]
run autotune_scan 7200 env TPU_EC_AUTOTUNE_SPAN=1 \
  python -u scripts/autotune_msm_tpu.py --method scan 14 16 18 20

# 3. AMT-shape batch MSM through the pair engine              [VERDICT #2]
run amt_pair 7200 python -u scripts/bench_amt_tpu.py 10 10 pair

# 4. commit pipeline at 2^16 on the digit-NTT library path    [VERDICT #1]
run pipeline16 7200 python -u scripts/evidence_tpu.py pipeline

# 5. single-chip MSM 2^24 (chunked 2x 2^23 pair)              [VERDICT #5]
run msm24 10800 python -u scripts/bench_msm_tpu.py 24

# 6. EC-FFT sweep 2^4-2^11 with native-CPU column             [VERDICT #8]
run ecfft 7200 python -u scripts/bench_ec_fft_tpu.py

# 7. pair-engine autotune at the headline size (model window) [VERDICT #3]
run autotune_pair 7200 env TPU_EC_AUTOTUNE_SPAN=0 \
  python -u scripts/autotune_msm_tpu.py --method pair 14 20

note "queue complete"
