#!/bin/bash
# Round-5 train-lever queue (VERDICT r4 #1): land the rows PERF.md promised,
# IN THE COMMITTED REPO this time (advisor r4: /tmp logs were wiped before
# harvest in r4i).
#   0. baseline re-anchor (f32 state, default layouts) — same-session anchor
#   1. bf16 full state with the hardware-RNG SR noise (round-4 change)
#   2. the shipped default combo (auto_layout + bf16_full_state, hw noise)
#   3. AUTO_LAYOUT + NU_BF16 (the r4 backend-flake retry)
#   4. convergence gate (500 steps) on the shipped combo
set -u
cd /root/repo
LOG=/root/repo/R5_TRAIN_QUEUE.log
echo "=== r5 train queue start $(date -u +%FT%TZ) ===" >> $LOG

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
  timeout 2400 python bench_train.py >> $LOG 2>&1
echo "rc=$? $(date -u +%T)" >> $LOG

echo "=== r5 train queue done $(date -u +%FT%TZ) ===" >> $LOG
