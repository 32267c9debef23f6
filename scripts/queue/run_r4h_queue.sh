#!/bin/bash
# Round-4 final lever legs on committed code (86b1908): the rows the
# mid-edit races invalidated, plus the winner's device trace.
set -u
cd /root/repo
LOG=/tmp/r4h_queue.log
echo "=== r4h queue start $(date -u +%FT%TZ) ===" >> $LOG

runt() {
  local name="$1"; shift
  echo "--- $name [$*] $(date -u +%T) ---" >> $LOG
  env "$@" timeout 2400 python bench_train.py >> $LOG 2>&1
  echo "rc=$? $(date -u +%T)" >> $LOG
}

runt al             BENCH_AUTO_LAYOUT=1
runt al+bf16_hw     BENCH_AUTO_LAYOUT=1 BENCH_BF16_STATE=1
runt al+bf16_hw_b   BENCH_AUTO_LAYOUT=1 BENCH_BF16_STATE=1
runt al+nu_bf16     BENCH_AUTO_LAYOUT=1 BENCH_NU_BF16=1
runt al+bf16_t8     BENCH_AUTO_LAYOUT=1 BENCH_BF16_STATE=1 BENCH_SR_NOISE=threefry8

echo "--- trace al+bf16_hw $(date -u +%T) ---" >> $LOG
BENCH_AUTO_LAYOUT=1 BENCH_BF16_STATE=1 TRACE_DIR=/tmp/tt_hw \
  timeout 2400 python bench_train_trace.py >> $LOG 2>&1
echo "rc=$? $(date -u +%T)" >> $LOG

echo "=== r4h queue done $(date -u +%FT%TZ) ===" >> $LOG
