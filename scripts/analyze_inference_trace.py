"""Analyze a bench.py BENCH_PROFILE device trace: where the 10-step chunk
spends its time, grouped op-by-op (interval-union math, XLA Ops lane only —
reuses bench_train_trace's parsing; same caveats).

Usage: python scripts/analyze_inference_trace.py [trace_dir] [n_steps]
(bench.py's BENCH_PROFILE capture scans the pipeline twice -> n_steps=2)
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_train_trace import _union_us  # noqa: E402


def main(trace_dir="/tmp/prof_inf", n=2):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print(f"no trace under {trace_dir}")
        return
    with gzip.open(sorted(paths)[-1]) as f:
        data = json.load(f)
    pid = ops_tid = None
    for e in data["traceEvents"]:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name" and "TPU" in e["args"].get(
                "name", ""):
            pid = e["pid"]
    for e in data["traceEvents"]:
        if (e.get("ph") == "M" and e.get("name") == "thread_name"
                and e.get("pid") == pid
                and e["args"].get("name") == "XLA Ops"):
            ops_tid = e["tid"]
    dev = [e for e in data["traceEvents"]
           if e.get("ph") == "X" and e.get("pid") == pid and e.get("name")]
    ops = [e for e in dev if e.get("tid") == ops_tid
           and not e["name"].startswith(("jit_", "while"))]
    wall = _union_us([(e["ts"], e["ts"] + e["dur"]) for e in dev])
    busy = _union_us([(e["ts"], e["ts"] + e["dur"]) for e in ops])
    print(f"per-chunk device wall: {wall/n/1e3:.2f} ms  "
          f"(op-busy {busy/n/1e3:.2f} ms, N={n})")

    # group by base op name (strip .N / fusion numbering)
    groups = {}
    for e in ops:
        base = re.sub(r"[.\d]+$", "", e["name"])
        groups.setdefault(base, []).append((e["ts"], e["ts"] + e["dur"]))
    rows = sorted(((k, _union_us(v) / n / 1e3, len(v) // n)
                   for k, v in groups.items()), key=lambda r: -r[1])
    for k, ms, cnt in rows[:25]:
        print(f"  {ms:7.2f} ms  n/chunk={cnt:5d}  {k}")

    # pallas custom-calls carry the kernel name in long_name — split out
    kern = {}
    for e in ops:
        ln = e.get("args", {}).get("long_name", "")
        m = re.search(r"custom_call_target=\"([^\"]+)\"", ln)
        tag = None
        if "custom-call" in e["name"]:
            mm = re.search(r"(_mega_kernel|_kernel|fused_\w+)", ln)
            tag = (m.group(1) if m else None) or (mm.group(1) if mm else None)
        if tag:
            t, c = kern.get(tag, (0.0, 0))
            kern[tag] = (t + e["dur"], c + 1)
    if kern:
        print("custom-call split:")
        for k, (t, c) in sorted(kern.items(), key=lambda kv: -kv[1][0]):
            print(f"  {t/n/1e3:7.2f} ms  n/chunk={c//n:5d}  {k}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof_inf",
         int(sys.argv[2]) if len(sys.argv) > 2 else 2)
