#!/bin/bash
# Round-4 chip queue #2 (after the train-lever sweep): b=1 latency bisection
# with tight measurement (ITERS=50 differencing), b=128 unroll profile, and
# the train-step trace on the winning lever combo.
set -u
cd /root/repo
LOG=/tmp/r4_queue.log
echo "=== r4 queue start $(date -u +%FT%TZ) ===" >> $LOG

run() {
  local name="$1"; shift
  echo "--- $name [$*] $(date -u +%T) ---" >> $LOG
  env "$@" timeout 2400 python bench.py >> $LOG 2>&1
  echo "rc=$? $(date -u +%T)" >> $LOG
}

# b=1 latency bisection (VERDICT r3 #2). BENCH_BATCH=1 makes the MAIN loop
# the latency measurement (50-iter differencing, much tighter than the
# 10-iter latency section); BENCH_LATENCY=0 skips the duplicate section.
# new round-4 default: host-side weight precast + fused attention
run lat_fused_hostcast   BENCH_BATCH=1 BENCH_ITERS=50 BENCH_LATENCY=0
# r3 default shape (in-jit per-chunk cast, unfused attn): expect ~9.1 ms
run lat_unfused_r3shape  BENCH_BATCH=1 BENCH_ITERS=50 BENCH_LATENCY=0 BENCH_HOSTCAST=0 BENCH_PALLAS_ATTN=0
# r2 shape (no hoist at all, unfused): expect ~8.1 ms
run lat_unfused_r2shape  BENCH_BATCH=1 BENCH_ITERS=50 BENCH_LATENCY=0 BENCH_HOSTCAST=0 BENCH_HOIST=0 BENCH_PALLAS_ATTN=0
# hoist kept but NO weight cast anywhere: isolates the cast cost inside hoist
run lat_unfused_nocast   BENCH_BATCH=1 BENCH_ITERS=50 BENCH_LATENCY=0 BENCH_HOSTCAST=0 BENCH_PRECAST=0 BENCH_PALLAS_ATTN=0
# stretch: hostcast + fused + fully unrolled sampler
run lat_fused_unroll     BENCH_BATCH=1 BENCH_ITERS=50 BENCH_LATENCY=0 BENCH_UNROLL=10

# b=128 throughput with the hostcast default (VERDICT r3 #3a)
run b128_default_tight   BENCH_ITERS=20 BENCH_LATENCY=0
run b128_unroll10_tight  BENCH_ITERS=20 BENCH_LATENCY=0 BENCH_UNROLL=10

# where does the remaining unroll=10 glue go? (feeds VERDICT r3 #3b)
echo "--- profile unroll10 $(date -u +%T) ---" >> $LOG
BENCH_UNROLL=10 BENCH_LATENCY=0 BENCH_PROFILE=/tmp/unroll_trace \
  timeout 2400 python bench.py >> $LOG 2>&1
echo "rc=$? $(date -u +%T)" >> $LOG

# where does the b=1 chunk go? (feeds the <=6.5 ms stretch, VERDICT r3 #2)
echo "--- profile b1 $(date -u +%T) ---" >> $LOG
BENCH_BATCH=1 BENCH_ITERS=8 BENCH_LATENCY=0 BENCH_PROFILE=/tmp/b1_trace \
  timeout 2400 python bench.py >> $LOG 2>&1
echo "rc=$? $(date -u +%T)" >> $LOG

# train levers with the round-4 fast stochastic-rounding noise source
# (lax.rng_bit_generator instead of threefry — the old-SR numbers for these
# configs are in /tmp/levers.log for comparison)
runt() {
  local name="$1"; shift
  echo "--- $name [$*] $(date -u +%T) ---" >> $LOG
  env "$@" timeout 2400 python bench_train.py >> $LOG 2>&1
  echo "rc=$? $(date -u +%T)" >> $LOG
}
runt bf16_state_fastsr    BENCH_BF16_STATE=1
runt al+bf16_state_fastsr BENCH_AUTO_LAYOUT=1 BENCH_BF16_STATE=1
# the sweep's al+nu_bf16 leg died on a backend INVALID_ARGUMENT flake: retry
runt al+nu_bf16_retry     BENCH_AUTO_LAYOUT=1 BENCH_NU_BF16=1

# convergence gate for adopting bf16_full_state + auto_layout as the shipped
# default (VERDICT r3 #1): 500 real-shape optimizer steps, loss must fall
runt converge_al_bf16  BENCH_AUTO_LAYOUT=1 BENCH_BF16_STATE=1 BENCH_TRAIN_CONVERGE=500

# device-trace the winning config: what remains after the adopted levers
# (feeds the BN/FiLM grad-reduction decision, VERDICT r3 #4)
echo "--- trace al+bf16_state_fastsr $(date -u +%T) ---" >> $LOG
BENCH_AUTO_LAYOUT=1 BENCH_BF16_STATE=1 TRACE_DIR=/tmp/tt_r4 \
  timeout 2400 python bench_train_trace.py >> $LOG 2>&1
echo "rc=$? $(date -u +%T)" >> $LOG

echo "=== r4 queue done $(date -u +%FT%TZ) ===" >> $LOG
