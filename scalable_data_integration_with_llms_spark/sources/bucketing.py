"""Bucketed tables for shuffle-free co-located joins (build mandate:
"repartition() / bucketing for co-located joins").

At 100 TB the fact-to-fact join (e.g. orders ⋈ lineitem on orderkey) is the
dominant shuffle; bucketing both tables on the join key at write time makes
every subsequent join/aggregation on that key shuffle-free.  Spark needs a
metastore-backed table for bucket metadata, so these helpers go through
``saveAsTable`` (local Derby metastore in tests; any Hive-compatible catalog
on a cluster).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def cobucket_join(spark: SparkSession, left_table: str, right_table: str, on: list[str]) -> DataFrame:
    """Join two co-bucketed tables; with matching bucket specs Catalyst
    plans this without an Exchange on either side (verified in
    tests/test_scale_ops.py)."""
    return spark.table(left_table).join(spark.table(right_table), on)
