#!/bin/bash
# Round-4 chip queue: inference profiles with the fixed profiler options
# (python tracer off — the old traces drowned the device lane at the
# 1M-event cap), feeding the >=1800 chunks/s push, plus a default bench run
# that both previews the round-4 headline and warms the persistent compile
# cache for the driver's end-of-round bench.
set -u
cd /root/repo
LOG=/tmp/r4f_queue.log
echo "=== r4f queue start $(date -u +%FT%TZ) ===" >> $LOG

echo "--- profile b128 default $(date -u +%T) ---" >> $LOG
BENCH_ITERS=8 BENCH_LATENCY=0 BENCH_PROFILE=/tmp/b128_prof \
  timeout 2400 python bench.py >> $LOG 2>&1
echo "rc=$? $(date -u +%T)" >> $LOG

echo "--- profile b1 $(date -u +%T) ---" >> $LOG
BENCH_BATCH=1 BENCH_ITERS=8 BENCH_LATENCY=0 BENCH_PROFILE=/tmp/b1_prof \
  timeout 2400 python bench.py >> $LOG 2>&1
echo "rc=$? $(date -u +%T)" >> $LOG

echo "--- bench default (cache warm + r4 preview) $(date -u +%T) ---" >> $LOG
timeout 2400 python bench.py >> $LOG 2>&1
echo "rc=$? $(date -u +%T)" >> $LOG

echo "=== r4f queue done $(date -u +%FT%TZ) ===" >> $LOG
