#!/bin/bash
# Round-4 train-lever sweep (VERDICT r3 #1). Runs each bench_train config
# sequentially on the real chip, appending results to /tmp/levers.log.
set -u
cd /root/repo
LOG=/tmp/levers.log
echo "=== lever sweep start $(date -u +%FT%TZ) ===" >> $LOG

run() {
  local name="$1"; shift
  echo "--- $name [$*] $(date -u +%T) ---" >> $LOG
  env "$@" timeout 2400 python bench_train.py >> $LOG 2>&1
  echo "rc=$? $(date -u +%T)" >> $LOG
}

run baseline BENCH_X=0
run auto_layout BENCH_AUTO_LAYOUT=1
run nu_bf16 BENCH_NU_BF16=1
run remat_off BENCH_REMAT=0
run bf16_state BENCH_BF16_STATE=1
run al+bf16_state BENCH_AUTO_LAYOUT=1 BENCH_BF16_STATE=1
run al+bf16_state+remat_off BENCH_AUTO_LAYOUT=1 BENCH_BF16_STATE=1 BENCH_REMAT=0
run al+nu_bf16 BENCH_AUTO_LAYOUT=1 BENCH_NU_BF16=1
echo "=== lever sweep done $(date -u +%FT%TZ) ===" >> $LOG
