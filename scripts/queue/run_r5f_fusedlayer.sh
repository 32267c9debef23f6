#!/bin/bash
# Round-5 leg: measure the whole-layer fused kernel (attn + MoE in one
# pallas launch) at b=128 and b=1. Waits for any prior queue (pid file arg).
set -u
cd /root/repo
[ -n "${1:-}" ] && while kill -0 "$(cat "$1" 2>/dev/null)" 2>/dev/null; do
  sleep 20
done
LOG=/root/repo/R5_MEASURE.log
echo "--- bench fused-layer b=128 $(date -u +%T) ---" >> $LOG
BENCH_FUSED_LAYER=1 timeout 3600 python bench.py >> $LOG 2>&1
echo "rc=$? $(date -u +%T)" >> $LOG
echo "=== r5f done $(date -u +%FT%TZ) ===" >> $LOG
