#!/usr/bin/env python
"""Dump .explain("formatted") output for the r15 optimization round.

    python tools/dump_plans_r15.py before q_pmi_collocations q_er_entities ...
    python tools/dump_plans_r15.py after  q_pmi_collocations ...

Writes plans/r15/<query>_<tag>.txt — the before/after evidence files the
optimization deliverable asks for.  Queries that drain a stream through a
memory sink have no single batch plan; for those the BATCH-side plan of the
returned frame is dumped with a header noting the streaming drain.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    assert tag in ("before", "after"), tag
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from scalable_data_integration_with_llms_spark.caching import (
        clear_all_memos,
        release_scoped,
    )
    from scalable_data_integration_with_llms_spark.queries import QUERIES
    from scalable_data_integration_with_llms_spark.session import get_spark

    spark = get_spark("sdi-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15"
    )
    os.makedirs(out_dir, exist_ok=True)

    for name in names:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"== {name} ({tag}, sf_dir={sf_dir}) ==\n")
            fh.write(buf.getvalue())
        release_scoped()
        print(f"wrote {path}")
    clear_all_memos()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
