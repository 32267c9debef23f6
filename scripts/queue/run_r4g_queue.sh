#!/bin/bash
# Round-4 queue: re-run the sweep legs that failed or flaked, now with the
# concrete-state recompile fallback (entry layouts = what the state already
# has; sidesteps the donation byte-size mismatch that 500'd the pinned
# recompile: chosen T(4,128) conv1 layout is 100352B vs default 86016B).
set -u
cd /root/repo
LOG=/tmp/r4g_queue.log
echo "=== r4g queue start $(date -u +%FT%TZ) ===" >> $LOG

runt() {
  local name="$1"; shift
  echo "--- $name [$*] $(date -u +%T) ---" >> $LOG
  env "$@" timeout 2400 python bench_train.py >> $LOG 2>&1
  echo "rc=$? $(date -u +%T)" >> $LOG
}

runt al             BENCH_AUTO_LAYOUT=1
runt al+nu_bf16     BENCH_AUTO_LAYOUT=1 BENCH_NU_BF16=1
runt bf16_hw_retry  BENCH_BF16_STATE=1 BENCH_SR_NOISE=hw
runt al+bf16_hw_2   BENCH_AUTO_LAYOUT=1 BENCH_BF16_STATE=1 BENCH_SR_NOISE=hw
runt al+bf16_t8_2   BENCH_AUTO_LAYOUT=1 BENCH_BF16_STATE=1 BENCH_SR_NOISE=threefry8

echo "--- trace al+bf16_hw $(date -u +%T) ---" >> $LOG
BENCH_AUTO_LAYOUT=1 BENCH_BF16_STATE=1 BENCH_SR_NOISE=hw \
  TRACE_DIR=/tmp/tt_hw timeout 2400 python bench_train_trace.py >> $LOG 2>&1
echo "rc=$? $(date -u +%T)" >> $LOG

echo "=== r4g queue done $(date -u +%FT%TZ) ===" >> $LOG
