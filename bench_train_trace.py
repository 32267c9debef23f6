"""Device-trace profile of the flagship train step (jax.profiler + analysis).

The stage-differencing profiler (bench_train_profile.py) measures nested
subsets of the step, but XLA optimizes each subset differently (e.g. a
grad-only program skips remat and schedules reductions elsewhere), so the
stage deltas do not add up — the round-3 differencing run attributed 64 ms
to "optimizer" when the device trace shows 28.7 ms. This tool instead
captures a jax.profiler device trace of the REAL step (scanned N times in
one jit, state donated) and reports wall-accurate per-category timings via
interval-union math (trace spans nest/overlap; naive duration sums
overcount ~2x).

Output (b=32 flagship, round 3): per-step wall and a table like
    optimizer+EMA fused update   28.7 ms   518 leaf fusions, ~88% HBM roofline
    model fwd+bwd fusions        27.7 ms
    BN/FiLM grad reductions      10.7 ms   convert+reduce over [B,H,W]
    layout-transpose copies      13.6 ms   expert w1/w2 {2,1,0}<->{1,2,0}
    remat recompute               6.6 ms

Run: python bench_train_trace.py   [BENCH_TRAIN_BATCH=32 TRACE_DIR=/tmp/tt]
Env: BENCH_AUTO_LAYOUT=1 lets XLA pick entry layouts (kills the transpose
copies — see docs/PERF.md "train step"); BENCH_NU_BF16=1 bf16 second moment.
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys
import time

os.makedirs(os.path.expanduser("~/.cache/jax_mode_tpu"), exist_ok=True)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_mode_tpu"))
import numpy as np  # noqa: E402


def log(msg):
    print(msg, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# trace analysis
# ---------------------------------------------------------------------------

def _union_us(intervals):
    total, cur_s, cur_e = 0.0, None, None
    for s, e in sorted(intervals):
        if cur_s is None:
            cur_s, cur_e = s, e
        elif s <= cur_e:
            cur_e = max(cur_e, e)
        else:
            total += cur_e - cur_s
            cur_s, cur_e = s, e
    if cur_s is not None:
        total += cur_e - cur_s
    return total


_CATEGORIES = (
    ("optimizer+EMA fused update", r"^subtract_convert_fusion"),
    ("grad reductions (convert_reduce)", r"^convert_reduce_fusion"),
    ("remat recompute", r"remat"),
    ("layout/carry copies", r"^(copy|slice-done|bitcast)"),
    ("dynamic-update-slice", r"dynamic-update-slice"),
    ("model fwd/bwd fusions", r"^(fusion|convolution|loop_|add_|multiply_"
                              r"|divide_|broadcast_|negate_|constant_"
                              r"|select|reduce|transpose|dot|rsqrt|top_k)"),
)


def analyze(trace_dir: str, n_steps: int):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        log(f"no trace file under {trace_dir}")
        return
    with gzip.open(sorted(paths)[-1]) as f:
        data = json.load(f)
    pid = None
    for e in data["traceEvents"]:
        if (e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in e["args"].get("name", "")):
            pid = e["pid"]
    # category accounting uses ONLY the "XLA Ops" thread: the "XLA Modules"
    # lane holds one enclosing event per executable that spans the whole
    # step (including bubbles) and would otherwise land in "other" with a
    # union equal to the wall (observed on the 2026-08-19 tt_r4 trace)
    ops_tid = None
    for e in data["traceEvents"]:
        if (e.get("ph") == "M" and e.get("name") == "thread_name"
                and e.get("pid") == pid
                and e["args"].get("name") == "XLA Ops"):
            ops_tid = e["tid"]
    dev = [e for e in data["traceEvents"]
           if e.get("ph") == "X" and e.get("pid") == pid and e.get("name")]
    # drop enclosing control-flow spans (the lax.scan `while` covers the
    # whole step and would make "other" == wall) but keep them in `dev`
    # for the wall union
    ops = [e for e in dev
           if (e.get("tid") == ops_tid if ops_tid is not None
               else True)
           and not e["name"].startswith(("jit_", "while"))]
    if not ops:
        log("no device op events (CPU backend traces lack an XLA Ops lane)")
        return
    wall = _union_us([(e["ts"], e["ts"] + e["dur"]) for e in dev])
    busy = _union_us([(e["ts"], e["ts"] + e["dur"]) for e in ops])
    print(f"per-step device wall: {wall / n_steps / 1e3:.2f} ms "
          f"(op-busy {busy / n_steps / 1e3:.2f} ms, N={n_steps} steps traced)")
    seen = set()
    rows = []
    for label, pat in _CATEGORIES:
        rx = re.compile(pat)
        sel = [e for e in ops
               if rx.search(e["name"]) and id(e) not in seen]
        for e in sel:
            seen.add(id(e))
        t = _union_us([(e["ts"], e["ts"] + e["dur"]) for e in sel])
        rows.append((label, t / n_steps / 1e3, len(sel) // n_steps))
    other = [e for e in ops if id(e) not in seen]
    rows.append(("other", _union_us(
        [(e["ts"], e["ts"] + e["dur"]) for e in other]) / n_steps / 1e3,
        len(other) // n_steps))
    for label, ms, n in sorted(rows, key=lambda r: -r[1]):
        print(f"  {ms:7.2f} ms/step  n/step={n:6d}  {label}")
    # biggest individual copies — the layout-transpose fingerprints
    cops = {}
    for e in ops:
        if e["name"].startswith("copy") and e.get("args", {}).get("long_name"):
            m = re.match(r"%\S+ = (\S+?)\{", e["args"]["long_name"])
            if m:
                k = m.group(1)
                t, n = cops.get(k, (0.0, 0))
                cops[k] = (t + e["dur"], n + 1)
    top = sorted(cops.items(), key=lambda kv: -kv[1][0])[:6]
    if top:
        print("top copy shapes:")
        for shape, (t, n) in top:
            print(f"  {t / n_steps / 1e3:7.3f} ms/step  "
                  f"n/step={n // n_steps:4d}  {shape}")


# ---------------------------------------------------------------------------
# capture
# ---------------------------------------------------------------------------

def main():
    # identical model/optimizer/batch setup to bench_train.py (same BENCH_*
    # env knobs) so the trace profiles exactly the program the bench times
    from bench_train import setup_flagship_train

    import jax.numpy as jnp

    N = int(os.environ.get("BENCH_TRAIN_ITERS", "4"))
    trace_dir = os.environ.get("TRACE_DIR", "/tmp/train_trace")
    state, raw, train_n, _ = setup_flagship_train()

    if os.environ.get("BENCH_AUTO_LAYOUT") == "1":
        from mode_diffusion_policy_tpu.training.loop import jit_auto_layout
        fn, state = jit_auto_layout(train_n, state,
                                    example_args=(raw, jnp.int32(N)),
                                    rest_shardings=(None, None))
    else:
        fn = jax.jit(train_n, donate_argnums=(0,))
        state = jax.device_put(state)

    t0 = time.time()
    state, l = fn(state, raw, jnp.int32(N))
    jax.block_until_ready(l)
    log(f"warm n={N} {time.time() - t0:.0f}s mean loss="
        f"{float(np.asarray(l[0])):.4f}")
    # python/host tracing OFF: the python tracer can flood the 1M-event cap
    # and drop the device op lane (observed on the axon relay)
    opts = jax.profiler.ProfileOptions()
    opts.python_tracer_level = 0
    opts.host_tracer_level = 1
    jax.profiler.start_trace(trace_dir, profiler_options=opts)
    state, l = fn(state, raw, jnp.int32(N))
    np.asarray(l[0])
    jax.profiler.stop_trace()
    log(f"traced n={N} -> {trace_dir}")
    analyze(trace_dir, N)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "analyze":
        analyze(sys.argv[2] if len(sys.argv) > 2 else "/tmp/train_trace",
                int(sys.argv[3]) if len(sys.argv) > 3 else 4)
    else:
        main()
