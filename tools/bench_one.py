#!/usr/bin/env python
"""Fresh-process single-query timer: the JVM-heap-isolation measurement the
shared-JVM battery cannot give (r12/r13 postmortems: spark.stop() does not
reset the heap, so late-battery queries inherit GC pressure from the ~100
queries before them and read 3-4x slower than their true cost).

    python tools/bench_one.py q_image_dhash_dedup [--sf-dir DIR] [--runs 3]

Prints ONE JSON line ``{"query": ..., "runs": [...], "best": ..., "median":
...}`` per query argument.  bench_compare.py uses this (one subprocess per
query) to auto-recheck flagged rows before printing a regression — the
process boundary, not spark.stop(), is the isolation mechanism.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from scalable_data_integration_with_llms_spark.caching import clear_all_memos, release_scoped
    from scalable_data_integration_with_llms_spark.queries import QUERIES
    from scalable_data_integration_with_llms_spark.session import get_spark

    spark = get_spark("sdi-bench-one")
    spark.sparkContext.setLogLevel("ERROR")
    # same warm-up battery as bench.py so a fresh-process number is
    # comparable to a battery number: JIT the scan/agg/join shapes and spin
    # up the Arrow/pandas worker pool before the timed runs
    for warm in ("q1_pricing_summary", "q3_shipping_priority", "q5_region_revenue", "q_dedup_clusters"):
        QUERIES[warm](spark, "/root/testdata/sf0.001").collect()
    spark.createDataFrame([(1,)], "x int").mapInPandas(
        lambda it: (pdf for pdf in it), "x int"
    ).collect()

    for name in args.queries:
        fn = QUERIES[name]
        runs = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).collect()
            runs.append(round(time.perf_counter() - t0, 4))
            release_scoped()
        srt = sorted(runs)
        print(json.dumps({
            "query": name,
            "runs": runs,
            "best": srt[0],
            "median": srt[len(srt) // 2],
            "sf_dir": args.sf_dir,
        }), flush=True)
        spark.catalog.clearCache()
        clear_all_memos()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
