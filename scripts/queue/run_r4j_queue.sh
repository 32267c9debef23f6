#!/bin/bash
# Round-4 continuation: land the rows PERF.md promised ("re-measured below")
# after the /tmp + compile-cache wipe ate the r4i results.
#   1. bf16 full state with the hardware-RNG SR noise (the round-4 change)
#   2. the shipped default combo (auto_layout + bf16_full_state, hw noise)
#   3. convergence gate (500 steps) on that shipped combo
set -u
cd /root/repo
LOG=/tmp/r4j_queue.log
echo "=== r4j queue start $(date -u +%FT%TZ) ===" >> $LOG

runt() {
  local name="$1"; shift
  echo "--- $name [$*] $(date -u +%T) ---" >> $LOG
  env "$@" timeout 2400 python bench_train.py >> $LOG 2>&1
  echo "rc=$? $(date -u +%T)" >> $LOG
}

runt bf16_hw      BENCH_BF16_STATE=1
runt al_bf16_hw   BENCH_AUTO_LAYOUT=1 BENCH_BF16_STATE=1

echo "--- converge al+bf16_hw $(date -u +%T) ---" >> $LOG
BENCH_AUTO_LAYOUT=1 BENCH_BF16_STATE=1 BENCH_TRAIN_CONVERGE=500 \
  timeout 2400 python bench_train.py >> $LOG 2>&1
echo "rc=$? $(date -u +%T)" >> $LOG

runt nu_bf16      BENCH_NU_BF16=1

echo "=== r4j queue done $(date -u +%FT%TZ) ===" >> $LOG
