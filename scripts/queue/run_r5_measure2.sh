#!/bin/bash
# Round-5 second-half measurement legs (r5h..r5r), as run inline on the
# chip — kept as the reproducible record of every row cited in
# docs/PERF.md round-5 sections. Each leg appends to R5_MEASURE.log with
# the same section headers the docs cite. ~2.5 h total on one v5e through
# the axon relay (first compiles dominate; the committed .jax_cache
# warm-starts the default programs).
set -u
cd /root/repo
LOG=/root/repo/R5_MEASURE.log
leg() {  # leg <header> <env...>
  local hdr=$1; shift
  echo "--- $hdr $(date -u +%T) ---" >> "$LOG"
  env "$@" timeout 3600 python bench.py >> "$LOG" 2>&1
  echo "rc=$? $(date -u +%T)" >> "$LOG"
}

# r5h: quant-scratch kernel fix, default parity config
leg "bench fused-layer+quant-scratch b=128"

# r5i: max-throughput pairings (first read — superseded by the r5r A/B)
leg "bench max-throughput A: fused-layer + int8 encoders" BENCH_INT8_ENC=1
leg "bench max-throughput B: int8 attn (two-kernel) + int8 encoders" \
    BENCH_INT8_ENC=1 BENCH_INT8_ATTN=1 BENCH_FUSED_LAYER=0

# r5j: decomposition + fused-layer block sweep (sweep script was a /tmp
# one-shot; rows recorded in the log and layer_kernel.py's default comment)
leg "bench max-throughput C: int8 attn (two-kernel), bf16 encoders" \
    BENCH_INT8_ATTN=1 BENCH_FUSED_LAYER=0

# r5l/r5m/r5o/r5p: tight b=1 ladder (50-iter in-jit differencing)
leg "tight b=1: fused layer" BENCH_BATCH=1 BENCH_ITERS=50 BENCH_LATENCY=0
leg "tight b=1: MEGA" BENCH_MEGA=1 BENCH_BATCH=1 BENCH_ITERS=50 \
    BENCH_LATENCY=0
leg "tight b=1: int8-attn fused layer" BENCH_INT8_ATTN=1 BENCH_BATCH=1 \
    BENCH_ITERS=50 BENCH_LATENCY=0
leg "tight b=1: int8 MEGA" BENCH_MEGA=1 BENCH_INT8_ATTN=1 BENCH_BATCH=1 \
    BENCH_ITERS=50 BENCH_LATENCY=0

# r5r: interleaved same-session A/B for the max-throughput pairing
for rep in 1 2; do
  leg "[A$rep two-kernel int8+enc]" BENCH_INT8_ATTN=1 BENCH_FUSED_LAYER=0 \
      BENCH_INT8_ENC=1 BENCH_LATENCY=0
  leg "[B$rep fused int8+enc]" BENCH_INT8_ATTN=1 BENCH_INT8_ENC=1 \
      BENCH_LATENCY=0
done
echo "=== r5 measure2 done $(date -u +%FT%TZ) ===" >> "$LOG"
