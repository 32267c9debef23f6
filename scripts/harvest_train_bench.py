"""Harvest the train-lever queue log into the committed BENCH_TRAIN_r05.json.

Reads the measurement logs, keeps ONE JSON result line per knob
combination plus the last convergence line, and rewrites the
driver-checkable record. Run via `make bench-train-record`.

Merge rule: within a log later lines win; across logs R5_TRAIN_QUEUE.log
(where `make bench-train-record` re-measure legs land) overrides
R5_MEASURE.log's ad-hoc rows — so a fresh re-measurement always replaces
the older ad-hoc number for the same knob combination.
"""
from __future__ import annotations

import json
import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
LOGS = [REPO / "R5_MEASURE.log", REPO / "R5_TRAIN_QUEUE.log"]
OUT = REPO / "BENCH_TRAIN_r05.json"

LABELS = {
    (): "baseline (f32 state, remat, default layouts)",
    ("BENCH_BF16_STATE",): "bf16_full_state (hw-RNG SR)",
    ("BENCH_AUTO_LAYOUT", "BENCH_BF16_STATE"):
        "SHIPPED: auto_layout + bf16_full_state (hw-RNG SR)",
    ("BENCH_AUTO_LAYOUT", "BENCH_NU_BF16"):
        "auto_layout + nu_bf16 (f32 params, bf16 second moment)",
    ("BENCH_GN",): "GroupNorm encoders (measured NEGATIVE; default stays BN)",
    ("BENCH_AUTO_LAYOUT", "BENCH_BF16_STATE", "BENCH_GN"):
        "GroupNorm + shipped combo (measured experiment)",
}


def main():
    rows = {}
    converge = None
    lines = []
    for log in LOGS:
        if log.exists():
            lines.extend(log.read_text().splitlines())
    for line in lines:
        if line.startswith("{") and '"metric"' in line:
            rec = json.loads(line)
            if not rec.get("metric", "").startswith("flagship train step"):
                continue   # R5_MEASURE.log also carries bench.py JSON lines
            knobs = {k: v for k, v in rec.get("knobs", {}).items()
                     if k != "BENCH_TRAIN_ITERS"}
            key = tuple(sorted(knobs))
            rows[key] = {
                "config": LABELS.get(key, " + ".join(key) or "baseline"),
                "knobs": rec.get("knobs", {}),
                "ms_per_step": rec["value"],
                "samples_per_s_chip": rec.get("samples_per_s_chip"),
                "loss_mean": rec.get("loss_mean"),
            }
        m = re.match(r"convergence: (\d+) steps in (\d+)s, loss ([\d.]+) -> "
                     r"([\d.]+) \((OK|NO DECREASE)\)", line)
        if m:
            converge = {
                "steps": int(m.group(1)), "wall_s": int(m.group(2)),
                "loss_first_window": float(m.group(3)),
                "loss_last_window": float(m.group(4)),
                "verdict": m.group(5),
                "combo": "auto_layout + bf16_full_state (hw-RNG SR)",
            }
    base = rows.get((), {}).get("ms_per_step")
    for key, row in rows.items():
        if base and row["ms_per_step"]:
            row["vs_baseline"] = round(base / row["ms_per_step"], 3)
    out = {
        "comment": "Train-step lever table, round 5 (R5_TRAIN_QUEUE.log). "
                   "bench_train.py with the batch passed as a jit ARGUMENT "
                   "(the 2026-08-19 sweep closure-captured it, which let XLA "
                   "constant-fold per-step batch work and skewed every row "
                   "low — see CLAUDE.md). SR noise: hardware RNG "
                   "(lax.rng_bit_generator). Refresh: make bench-train-record.",
        "metric": "flagship train step (739M params, b=32, aug + 2x "
                  "FiLM-ResNet50 remat + EDM loss + AdamW + EMA), one v5e "
                  "chip",
        "unit": "ms/step",
        "rows": [rows[k] for k in sorted(rows, key=lambda k: (len(k), k))],
        "convergence": converge,
    }
    OUT.write_text(json.dumps(out, indent=2) + "\n")
    print(f"wrote {OUT} ({len(rows)} rows, convergence="
          f"{converge['verdict'] if converge else None})")


if __name__ == "__main__":
    main()
