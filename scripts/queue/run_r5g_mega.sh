#!/bin/bash
# Round-5 leg: measure the DiT megakernel (whole 12-layer stack in one
# launch per denoise step) at b=128 and b=1. Waits on a prior pid file.
set -u
cd /root/repo
[ -n "${1:-}" ] && while kill -0 "$(cat "$1" 2>/dev/null)" 2>/dev/null; do
  sleep 20
done
LOG=/root/repo/R5_MEASURE.log
echo "--- bench MEGAKERNEL b=128 $(date -u +%T) ---" >> $LOG
BENCH_MEGA=1 timeout 3600 python bench.py >> $LOG 2>&1
echo "rc=$? $(date -u +%T)" >> $LOG
echo "=== r5g done $(date -u +%FT%TZ) ===" >> $LOG
