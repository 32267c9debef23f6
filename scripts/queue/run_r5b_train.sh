#!/bin/bash
# Round-5 train-lever queue, continuation: the baseline leg landed in
# R5_TRAIN_QUEUE.log (82.1 ms) before the first run was interrupted; this
# re-runs the remaining legs. Logs stay in the committed repo (advisor r4).
set -u
cd /root/repo
LOG=/root/repo/R5_TRAIN_QUEUE.log
echo "=== r5b train queue resume $(date -u +%FT%TZ) ===" >> $LOG

runt() {
  local name="$1"; shift
  echo "--- $name [$*] $(date -u +%T) ---" >> $LOG
  env "$@" timeout 2400 python bench_train.py >> $LOG 2>&1
  echo "rc=$? $(date -u +%T)" >> $LOG
}

runt bf16_hw      BENCH_BF16_STATE=1
runt al_bf16_hw   BENCH_AUTO_LAYOUT=1 BENCH_BF16_STATE=1
runt al_nu_bf16   BENCH_AUTO_LAYOUT=1 BENCH_NU_BF16=1

echo "--- converge al+bf16_hw $(date -u +%T) ---" >> $LOG
BENCH_AUTO_LAYOUT=1 BENCH_BF16_STATE=1 BENCH_TRAIN_CONVERGE=500 \
  timeout 2400 python bench_train.py >> $LOG 2>&1
echo "rc=$? $(date -u +%T)" >> $LOG

echo "=== r5b train queue done $(date -u +%FT%TZ) ===" >> $LOG
