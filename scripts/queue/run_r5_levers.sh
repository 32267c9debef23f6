#!/bin/bash
# Canonical train-lever sweep: the four measured combos + the 500-step
# convergence smoke on the SHIPPED combo, appended to the committed queue
# log and harvested into BENCH_TRAIN_r05.json by scripts/harvest_train_bench.py
# (run both via `make bench-train-record`). ~45 min on the chip.
set -u
cd /root/repo
LOG=/root/repo/R5_TRAIN_QUEUE.log
echo "=== train lever sweep $(date -u +%FT%TZ) ===" >> $LOG

runt() {
  local name="$1"; shift
  echo "--- $name [$*] $(date -u +%T) ---" >> $LOG
  env "$@" timeout 2400 python bench_train.py >> $LOG 2>&1
  echo "rc=$? $(date -u +%T)" >> $LOG
}

runt baseline     BENCH_TRAIN_ITERS=6
runt bf16_hw      BENCH_BF16_STATE=1
runt al_bf16_hw   BENCH_AUTO_LAYOUT=1 BENCH_BF16_STATE=1
runt al_nu_bf16   BENCH_AUTO_LAYOUT=1 BENCH_NU_BF16=1

echo "--- converge al+bf16_hw $(date -u +%T) ---" >> $LOG
BENCH_AUTO_LAYOUT=1 BENCH_BF16_STATE=1 BENCH_TRAIN_CONVERGE=500 \
  timeout 3000 python bench_train.py >> $LOG 2>&1
echo "rc=$? $(date -u +%T)" >> $LOG
echo "=== train lever sweep done $(date -u +%FT%TZ) ===" >> $LOG
