#!/usr/bin/env python
"""Bench regression gate: run bench.py and compare per-query wall times to a
baseline (default: the committed full battery BENCH_FULL.json — the driver
line rotates its reported subset per round, so BENCH_r{N}.json files from
different rounds share few or no query names; the full battery always
covers everything).

    python tools/bench_compare.py [--baseline BENCH_r01.json] [--threshold 2.0]

The current run's numbers come from the full battery bench.py writes to
BENCH_FULL_last_run.json, not the subset stdout line.  Exit 1 if any
query regressed beyond the threshold.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_baseline(path: str) -> dict[str, float]:
    with open(path) as f:
        doc = json.load(f)
    if "parsed" in doc:
        doc = doc["parsed"]
    return doc["queries"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--baseline", default=None)
    ap.add_argument("--threshold", type=float, default=2.0)
    args = ap.parse_args()

    baseline_path = args.baseline
    if baseline_path is None:
        full = os.path.join(ROOT, "BENCH_FULL.json")
        if os.path.exists(full):
            baseline_path = full
        else:
            candidates = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
            if not candidates:
                print("no BENCH_FULL.json / BENCH_r*.json baseline found")
                return 1
            baseline_path = candidates[-1]
    base = load_baseline(baseline_path)

    subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        capture_output=True, text=True, check=True, cwd=ROOT,
    )
    # bench.py honors SPARK_GRAFT_BENCH_OUT; read the same path it writes
    out_name = os.environ.get("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL_last_run.json")
    with open(os.path.join(ROOT, out_name)) as f:
        now = json.load(f)["queries"]

    regressed = []
    print(f"{'query':<28}{'base':>8}{'now':>8}{'ratio':>8}")
    for name, t in now.items():
        b = base.get(name)
        ratio = (t / b) if b else float("nan")
        flag = ""
        if b and ratio > args.threshold:
            regressed.append((name, b, t))
            flag = "  << REGRESSED"
        if b is None:
            flag = "  (new)"
        print(f"{name:<28}{b if b else 0:>8.2f}{t:>8.2f}{ratio:>8.2f}{flag}")
    # both totals over the SHARED key set — summing all current queries
    # would inflate the ratio whenever new queries exist
    total_b = sum(v for k, v in base.items() if k in now)
    total_n = sum(v for k, v in now.items() if k in base)
    print(f"\ntotal (shared queries): base {total_b:.1f}s -> now {total_n:.1f}s "
          f"({total_n / total_b:.2f}x)  baseline={os.path.basename(baseline_path)}")
    if regressed:
        print(f"\n{len(regressed)} regression(s) beyond {args.threshold}x:")
        for name, b, t in regressed:
            print(f"  {name}: {b:.2f}s -> {t:.2f}s")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
