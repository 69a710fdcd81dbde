#!/usr/bin/env python
"""Quiet re-run of specific bench rows (VERDICT r9 task #3): median-of-N
batteries over a named query subset, compared against BOTH the r8 and r9
committed batteries, to split real drift from shared-host jitter.

The r9 battery showed seven sub-second rows at ratio >= 1.30 vs r8 (all
inside their spread-aware gates, all noise-dominated magnitudes); this
re-measures exactly those rows on a quiet machine with the same protocol
as bench.py (warm-up, best-of-2 per battery, median battery by subset
total) and writes BENCH_QUIET7_r10.json with the verdict per row.

    python tools/bench_quiet_rows.py [--rows q_a,q_b] [--batteries 3] \
        [--out BENCH_QUIET7_r10.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

DEFAULT_ROWS = [
    "q_value_outliers",
    "q_funnel_by_cohort",
    "q_mock_match_scores",
    "q_multimodal_features",
    "q_dedup_containment",
    "q_fuzzy_er_names",
    "q_perplexity_buckets",
]
R8_BATTERY_COMMIT = "27b56f3"  # round-8 BENCH_FULL.json


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", default=",".join(DEFAULT_ROWS))
    ap.add_argument("--batteries", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(ROOT, "BENCH_QUIET7_r10.json"))
    args = ap.parse_args()
    rows = [r for r in args.rows.split(",") if r]

    r9 = json.load(open(os.path.join(ROOT, "BENCH_FULL.json")))
    r8 = json.loads(
        subprocess.check_output(
            ["git", "-C", ROOT, "show", f"{R8_BATTERY_COMMIT}:BENCH_FULL.json"]
        )
    )

    from scalable_data_integration_with_llms_spark.queries import QUERIES
    from scalable_data_integration_with_llms_spark.session import get_spark

    spark = get_spark("sdi-bench-quiet")
    spark.sparkContext.setLogLevel("ERROR")
    # same warm-up as bench.py: codegen/JIT + Arrow worker pool
    for warm in ("q1_pricing_summary", "q3_shipping_priority", "q5_region_revenue"):
        QUERIES[warm](spark, "/root/testdata/sf0.001").collect()
    spark.createDataFrame([(1,)], "x int").mapInPandas(
        lambda it: (pdf for pdf in it), "x int"
    ).collect()
    for name in rows:  # per-row warm-up: these rows are the measurement
        QUERIES[name](spark, "/root/testdata/sf0.001").collect()

    from scalable_data_integration_with_llms_spark.caching import clear_all_memos, release_scoped

    batteries = []
    for _ in range(args.batteries):
        t = {}
        for name in rows:
            runs = []
            for _r in range(2):
                t0 = time.perf_counter()
                QUERIES[name](spark, args.sf_dir).collect()
                runs.append(time.perf_counter() - t0)
            t[name] = round(min(runs), 4)
        release_scoped()
        clear_all_memos()
        batteries.append(t)
    totals = [sum(b.values()) for b in batteries]
    med = batteries[sorted(range(len(totals)), key=lambda i: totals[i])[len(totals) // 2]]

    report = {"rows": {}, "batteries": batteries, "sf_dir": args.sf_dir}
    worst = 0.0
    for name in rows:
        r8v, r9v = r8["queries"].get(name), r9["queries"].get(name)
        r9_runs = r9.get("queries_runs", {}).get(name) or [r9v]
        spread = (max(r9_runs) / max(min(r9_runs), 1e-9)) if r9v else None
        now = med[name]
        vs_r8 = round(now / r8v, 3) if r8v else None
        vs_r9 = round(now / r9v, 3) if r9v else None
        # verdict: drift is "real" only if the quiet median sits beyond the
        # host's own measured battery spread (x1.5 margin) vs BOTH baselines
        gate = max(1.3, (spread or 1.0) * 1.5)
        verdict = (
            "regression"
            if (vs_r8 or 0) > gate and (vs_r9 or 0) > gate
            else "noise/ok"
        )
        report["rows"][name] = {
            "r8": r8v,
            "r9": r9v,
            "quiet_median": now,
            "vs_r8": vs_r8,
            "vs_r9": vs_r9,
            "r9_spread": round(spread, 3) if spread else None,
            "gate": round(gate, 3),
            "verdict": verdict,
        }
        worst = max(worst, vs_r8 or 0)
        print(
            f"{name:28s} r8={r8v} r9={r9v} quiet={now} "
            f"vs_r8={vs_r8} vs_r9={vs_r9} gate={gate:.2f} {verdict}"
        )
    json.dump(report, open(args.out, "w"), indent=1)
    print(f"worst vs_r8: {worst}; report -> {args.out}")
    return 0 if all(v["verdict"] == "noise/ok" for v in report["rows"].values()) else 1


if __name__ == "__main__":
    raise SystemExit(main())
