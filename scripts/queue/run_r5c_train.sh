#!/bin/bash
# Round-5 train queue, leg 3: the 500-step convergence smoke on the SHIPPED
# combo (auto_layout + bf16_full_state + hw-RNG SR). The r5b attempt died on
# a transient axon relayout INVALID_ARGUMENT between fori_loop chunks;
# loop.py now retries that chain (see _relayout_via_jit).
set -u
cd /root/repo
LOG=/root/repo/R5_TRAIN_QUEUE.log
echo "=== r5c converge leg $(date -u +%FT%TZ) ===" >> $LOG
echo "--- converge al+bf16_hw (retry) $(date -u +%T) ---" >> $LOG
BENCH_AUTO_LAYOUT=1 BENCH_BF16_STATE=1 BENCH_TRAIN_CONVERGE=500 \
  timeout 3000 python bench_train.py >> $LOG 2>&1
echo "rc=$? $(date -u +%T)" >> $LOG
echo "=== r5c done $(date -u +%FT%TZ) ===" >> $LOG
