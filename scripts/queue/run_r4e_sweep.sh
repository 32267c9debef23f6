#!/bin/bash
# Round-4 consistent lever sweep: ALL rows on the explicit-batch-arg
# bench_train.py (the closure-constant version let XLA fold the batch into
# the program and under-reported the step — numbers across the two scripts
# are not comparable, so the whole table is re-measured here), with the
# honored-relayout + reuse_formats fixes.
set -u
cd /root/repo
LOG=/tmp/r4e_sweep.log
echo "=== r4e sweep start $(date -u +%FT%TZ) ===" >> $LOG

runt() {
  local name="$1"; shift
  echo "--- $name [$*] $(date -u +%T) ---" >> $LOG
  env "$@" timeout 2400 python bench_train.py >> $LOG 2>&1
  echo "rc=$? $(date -u +%T)" >> $LOG
}

runt baseline     BENCH_X=0
runt al           BENCH_AUTO_LAYOUT=1
runt nu_bf16      BENCH_NU_BF16=1
runt bf16_hw      BENCH_BF16_STATE=1 BENCH_SR_NOISE=hw
runt bf16_t8      BENCH_BF16_STATE=1 BENCH_SR_NOISE=threefry8
runt al+bf16_hw   BENCH_AUTO_LAYOUT=1 BENCH_BF16_STATE=1 BENCH_SR_NOISE=hw
runt al+bf16_t8   BENCH_AUTO_LAYOUT=1 BENCH_BF16_STATE=1 BENCH_SR_NOISE=threefry8
runt al+nu_bf16   BENCH_AUTO_LAYOUT=1 BENCH_NU_BF16=1

# trace the two SR contenders on the combo config
echo "--- trace al+bf16_t8 $(date -u +%T) ---" >> $LOG
BENCH_AUTO_LAYOUT=1 BENCH_BF16_STATE=1 BENCH_SR_NOISE=threefry8 \
  TRACE_DIR=/tmp/tt_t8 timeout 2400 python bench_train_trace.py >> $LOG 2>&1
echo "rc=$? $(date -u +%T)" >> $LOG

echo "=== r4e sweep done $(date -u +%FT%TZ) ===" >> $LOG
