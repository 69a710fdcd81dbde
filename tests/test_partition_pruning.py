"""Partitioned-sink scan pruning: the layout half of the 100 TB story.

At cluster scale the events/fact tables land hive-partitioned (by day,
type, tenant...); a scan that lists every partition is wrong no matter how
good the per-file pushdown is.  These tests write through
``sources.sinks.write_parquet(partition_by=...)`` and prove both pruning
modes on the read path:

* static pruning — a literal partition predicate reaches ``PartitionFilters``
  and non-matching partition *files* are never touched;
* dynamic partition pruning — a broadcast dim filter prunes fact partitions
  at runtime (``dynamicpruningexpression`` in the scan's PartitionFilters).
"""

import pytest
from pyspark.sql import functions as F

from scalable_data_integration_with_llms_spark.sources.readers import load_table
from scalable_data_integration_with_llms_spark.sources.sinks import write_parquet


@pytest.fixture(scope="module")
def part_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("events_by_type"))
    e = load_table(spark, "/root/testdata/sf0.001", "events")
    write_parquet(e, path, partition_by=["event_type"])
    return path


def test_static_partition_pruning(spark, part_dir):
    df = spark.read.parquet(part_dir).filter(F.col("event_type") == "click")
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m, f"no partition filter in scan: {plan[:500]}"
    # the predicate itself (not just isnotnull) reaches the partition filter,
    # so non-matching directories are never listed for read
    assert "event_type" in m.group(1) and "= click" in m.group(1), m.group(1)
    # and nothing remains as a post-scan data filter on the partition column
    d = re.search(r"DataFilters: \[([^\]]*)\]", plan)
    assert d and "event_type" not in d.group(1)


def test_static_pruning_row_parity(spark, part_dir):
    e = load_table(spark, "/root/testdata/sf0.001", "events")
    expect = e.filter(F.col("event_type") == "click").count()
    got = spark.read.parquet(part_dir).filter(F.col("event_type") == "click").count()
    assert got == expect


def test_dynamic_partition_pruning(spark, part_dir):
    """Join on the partition column with a filtered broadcast dim: Catalyst
    must inject a runtime subquery filter into the fact scan instead of
    reading every partition."""
    dim = spark.createDataFrame(
        [("click", "engagement"), ("view", "engagement"), ("purchase", "revenue")],
        "event_type string, event_class string",
    ).filter(F.col("event_class") == "revenue")
    fact = spark.read.parquet(part_dir)
    joined = fact.join(F.broadcast(dim), "event_type").groupBy("event_class").count()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), f"no DPP in plan: {plan[:800]}"
    rows = joined.collect()
    assert len(rows) == 1 and rows[0]["event_class"] == "revenue"
