"""Approximate aggregation surface: HyperLogLog++ distinct counts and
Greenwald-Khanna percentiles, each reported NEXT TO its exact twin so the
result row itself carries the error harness.

These are the mergeable-sketch aggregates a 100 TB pipeline leans on: both
are partial-aggregable (one pass, map-side combine, O(sketch) shuffle bytes
per group) where their exact twins need a full shuffle of distinct values
(COUNT DISTINCT) or a sort (percentile).  The estimates are deterministic
for a given input but engine-specific — DuckDB's sketches produce different
estimates — so these two queries are declared rows-only; the value-level
guarantees (relative/rank error bounds vs the exact twin) are asserted in
tests/test_approx.py, the same quality-harness pattern as q_ann_recall.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .registry import query

HLL_RSD = 0.05


@query("q_approx_distinct_users")
def q_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type: exact vs HyperLogLog++ (rsd=5%).
    At scale the exact arm is the one you drop — approx_count_distinct
    shuffles one ~kB sketch per group instead of every distinct key."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", HLL_RSD).alias("approx_users"),
        )
        .select(
            "event_type",
            "exact_users",
            "approx_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                / F.col("exact_users")
            ).alias("rel_err"),
        )
    )


@query("q_approx_percentiles")
def q_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-price p50/p90 per status: exact interpolated percentile vs
    percentile_approx (GK sketch, accuracy 10000 → rank error ≤ n/10000).
    The exact twin (q_price_percentiles) is the oracle-checked query; this
    one pins the mergeable-sketch path used when a sort is off the table."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("exact_p50"),
        F.expr("percentile_approx(o_totalprice, 0.5, 10000)").alias("approx_p50"),
        F.expr("percentile(o_totalprice, 0.9)").alias("exact_p90"),
        F.expr("percentile_approx(o_totalprice, 0.9, 10000)").alias("approx_p90"),
        F.count(F.lit(1)).alias("n"),
    )
