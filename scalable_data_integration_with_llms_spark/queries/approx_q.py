"""Approximate aggregation surface: HyperLogLog++ distinct counts and
Greenwald-Khanna percentiles, each reported NEXT TO its exact twin so the
result row itself carries the error harness.

These are the mergeable-sketch aggregates a 100 TB pipeline leans on: both
are partial-aggregable (one pass, map-side combine, O(sketch) shuffle bytes
per group) where their exact twins need a full shuffle of distinct values
(COUNT DISTINCT) or a sort (percentile).

Value-oracle design (upgraded from rows-only in r3): the sketch estimates
themselves are engine-specific (DuckDB's sketches differ), so the HASHED
columns are the engine-stable parts — the exact twins as integers plus a
boolean guarantee check (estimate within its published error bound) that
the Spark side computes from the real sketch output and the oracle asserts
as TRUE.  A sketch that ever violates its bound flips the boolean and the
driver's value-hash goes red — the guarantee itself is oracle-checked, not
just row counts.  Tighter statistical error-bound assertions live in
tests/test_approx.py (same quality-harness pattern as q_ann_recall).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .registry import query

HLL_RSD = 0.05
# pass criterion: within 3 standard errors of the requested rsd
HLL_BOUND = 3 * HLL_RSD

_DISTINCT_ORACLE = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS within_bound
FROM events GROUP BY event_type
"""


@query("q_approx_distinct_users", _DISTINCT_ORACLE)
def q_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type: exact vs HyperLogLog++ (rsd=5%).
    At scale the exact arm is the one you drop — approx_count_distinct
    shuffles one ~kB sketch per group instead of every distinct key.  The
    oracle-hashed columns are the exact count and the 3σ-bound check on the
    real sketch estimate (the oracle asserts it must hold)."""
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
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= F.lit(HLL_BOUND) * F.col("exact_users")
            ).alias("within_bound"),
        )
    )


# GK sketch accuracy: rank error <= n / _GK_ACCURACY.  The guarantee check
# brackets the approx value between the exact order statistics at ranks
# k ± (n // _GK_ACCURACY + 1) — directly the published contract.
_GK_ACCURACY = 10_000

_PCTL_ORACLE = """
WITH c AS (
  SELECT o_orderstatus, CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders
),
r AS (
  SELECT o_orderstatus, cents,
         ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY cents) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
  FROM c
)
SELECT o_orderstatus, MAX(n) AS n,
       MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN cents END) AS p50_cents,
       MAX(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN cents END) AS p90_cents,
       TRUE AS p50_in_bound, TRUE AS p90_in_bound
FROM r GROUP BY o_orderstatus
"""


@query("q_approx_percentiles", _PCTL_ORACLE)
def q_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-price p50/p90 per status: exact discrete percentile (the k-th
    order statistic in integer cents — engine-stable, no interpolation
    floats) vs percentile_approx (GK sketch).  Oracle-hashed: the exact
    values plus the GK rank-error guarantee check — the approx value must
    lie between the order statistics at ranks k ± (n/accuracy + 1).  The
    exact arm costs a per-group sort (the scale ceiling that motivates the
    sketch); the approx arm is one mergeable pass."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    )
    ranked = o.select(
        "o_orderstatus",
        "cents",
        F.row_number().over(W.partitionBy("o_orderstatus").orderBy("cents")).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("o_orderstatus")).alias("n"),
    )

    def order_stat(rank_col):
        return F.max(F.when(F.col("rn") == rank_col, F.col("cents")))

    slack = (F.col("n") / _GK_ACCURACY).cast("bigint") + 1
    k50 = F.ceil(F.lit(0.5) * F.col("n"))
    k90 = F.ceil(F.lit(0.9) * F.col("n"))
    exact = ranked.groupBy("o_orderstatus").agg(
        F.max("n").alias("n"),
        order_stat(k50).alias("p50_cents"),
        order_stat(k90).alias("p90_cents"),
        order_stat(F.greatest(F.lit(1), k50 - slack)).alias("_lo50"),
        order_stat(F.least(F.col("n"), k50 + slack)).alias("_hi50"),
        order_stat(F.greatest(F.lit(1), k90 - slack)).alias("_lo90"),
        order_stat(F.least(F.col("n"), k90 + slack)).alias("_hi90"),
    )
    approx = o.groupBy("o_orderstatus").agg(
        F.expr(f"percentile_approx(cents, 0.5, {_GK_ACCURACY})").alias("_a50"),
        F.expr(f"percentile_approx(cents, 0.9, {_GK_ACCURACY})").alias("_a90"),
    )
    return exact.join(approx, "o_orderstatus").select(
        "o_orderstatus",
        "n",
        "p50_cents",
        "p90_cents",
        F.col("_a50").between(F.col("_lo50"), F.col("_hi50")).alias("p50_in_bound"),
        F.col("_a90").between(F.col("_lo90"), F.col("_hi90")).alias("p90_in_bound"),
    )
