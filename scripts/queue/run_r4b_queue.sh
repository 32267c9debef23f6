#!/bin/bash
# Round-4 chip queue #3: re-run the two train legs that flaked on the
# closure-captured-batch-constant fetch (now fixed: the raw batch is an
# explicit jit argument), plus a re-trace of the winning combo.
set -u
cd /root/repo
LOG=/tmp/r4b_queue.log
echo "=== r4b queue start $(date -u +%FT%TZ) ===" >> $LOG

runt() {
  local name="$1"; shift
  echo "--- $name [$*] $(date -u +%T) ---" >> $LOG
  env "$@" timeout 2400 python bench_train.py >> $LOG 2>&1
  echo "rc=$? $(date -u +%T)" >> $LOG
}

# the shipped-default candidate, with the round-4 fast SR noise
runt al+bf16_state    BENCH_AUTO_LAYOUT=1 BENCH_BF16_STATE=1
# the flaked lever row
runt al+nu_bf16       BENCH_AUTO_LAYOUT=1 BENCH_NU_BF16=1
# sanity: auto-layout alone with the fixed script (was 63.8 ms)
runt al_only          BENCH_AUTO_LAYOUT=1

# device-trace the winning config (the 13:50 trace of this config read
# 70.1 ms/step vs the sweep's 50.4 ms bench — re-trace with the fixed
# script to see which number is real)
echo "--- trace al+bf16_state $(date -u +%T) ---" >> $LOG
BENCH_AUTO_LAYOUT=1 BENCH_BF16_STATE=1 TRACE_DIR=/tmp/tt_r4b \
  timeout 2400 python bench_train_trace.py >> $LOG 2>&1
echo "rc=$? $(date -u +%T)" >> $LOG

echo "=== r4b queue done $(date -u +%FT%TZ) ===" >> $LOG
