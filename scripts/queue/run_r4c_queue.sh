#!/bin/bash
# Round-4 chip queue #4: the auto-layout legs with the honored-relayout fix
# (jitted-identity fallback for layouts the axon device_put silently
# ignores) + the re-trace of the winning combo.
set -u
cd /root/repo
LOG=/tmp/r4c_queue.log
echo "=== r4c queue start $(date -u +%FT%TZ) ===" >> $LOG

runt() {
  local name="$1"; shift
  echo "--- $name [$*] $(date -u +%T) ---" >> $LOG
  env "$@" timeout 2400 python bench_train.py >> $LOG 2>&1
  echo "rc=$? $(date -u +%T)" >> $LOG
}

runt al_only          BENCH_AUTO_LAYOUT=1
runt al+bf16_state    BENCH_AUTO_LAYOUT=1 BENCH_BF16_STATE=1
runt al+nu_bf16       BENCH_AUTO_LAYOUT=1 BENCH_NU_BF16=1

echo "--- trace al+bf16_state $(date -u +%T) ---" >> $LOG
BENCH_AUTO_LAYOUT=1 BENCH_BF16_STATE=1 TRACE_DIR=/tmp/tt_r4c \
  timeout 2400 python bench_train_trace.py >> $LOG 2>&1
echo "rc=$? $(date -u +%T)" >> $LOG

echo "=== r4c queue done $(date -u +%FT%TZ) ===" >> $LOG
