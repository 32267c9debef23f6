#!/bin/bash
# Round-4 non-auto-layout lever rows re-measured on the dynamic-fori bench
# (single executable for every n) so the whole table shares one
# measurement harness.
set -u
cd /root/repo
LOG=/tmp/r4i_queue.log
echo "=== r4i queue start $(date -u +%FT%TZ) ===" >> $LOG

runt() {
  local name="$1"; shift
  echo "--- $name [$*] $(date -u +%T) ---" >> $LOG
  env "$@" timeout 2400 python bench_train.py >> $LOG 2>&1
  echo "rc=$? $(date -u +%T)" >> $LOG
}

runt baseline     BENCH_X=0
runt nu_bf16      BENCH_NU_BF16=1
runt bf16_hw      BENCH_BF16_STATE=1
runt bf16_t8      BENCH_BF16_STATE=1 BENCH_SR_NOISE=threefry8

# convergence gate on the shipped default combo (al + bf16_hw), fori bench
echo "--- converge al+bf16_hw $(date -u +%T) ---" >> $LOG
BENCH_AUTO_LAYOUT=1 BENCH_BF16_STATE=1 BENCH_TRAIN_CONVERGE=500 \
  timeout 2400 python bench_train.py >> $LOG 2>&1
echo "rc=$? $(date -u +%T)" >> $LOG

echo "=== r4i queue done $(date -u +%FT%TZ) ===" >> $LOG
