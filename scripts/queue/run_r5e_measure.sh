#!/bin/bash
# Round-5 measurement queue: the sigma-table glue elimination (bench.py
# b=128 headline + b=1 latency rides along) and the GroupNorm train lever
# (bench_train BENCH_GN=1, alone and on the shipped combo).
set -u
cd /root/repo
LOG=/root/repo/R5_MEASURE.log
echo "=== r5e measure $(date -u +%FT%TZ) ===" >> $LOG

echo "--- bench b=128 (sigma-table glue) $(date -u +%T) ---" >> $LOG
timeout 3600 python bench.py >> $LOG 2>&1
echo "rc=$? $(date -u +%T)" >> $LOG

echo "--- bench_train GN $(date -u +%T) ---" >> $LOG
BENCH_GN=1 timeout 2400 python bench_train.py >> $LOG 2>&1
echo "rc=$? $(date -u +%T)" >> $LOG

echo "--- bench_train GN+AL+bf16_hw $(date -u +%T) ---" >> $LOG
BENCH_GN=1 BENCH_AUTO_LAYOUT=1 BENCH_BF16_STATE=1 \
  timeout 2400 python bench_train.py >> $LOG 2>&1
echo "rc=$? $(date -u +%T)" >> $LOG

echo "=== r5e done $(date -u +%FT%TZ) ===" >> $LOG
