"""Row-set overlap evaluation (SURVEY §2.3 J5/J6, §2.7 SO5; reference
``Schema Mapping/AnalysisUtils/Evaluator.py:126-238``).

Differential testing of a predicted mapping against the gold mapping:
per target table, over its *meaningful* columns,

    FN rows = gold EXCEPT pred      (distinct semantics — SQLite set ops)
    FP rows = pred EXCEPT gold
    TP rows = pred INTERSECT gold

Spark's ``EXCEPT``/``INTERSECT`` use the same distinct + null-safe-equality
semantics as SQLite/DuckDB, verified against the oracle.  Join overlap (J6)
executes the rule's multi-table join SQL against both namespaces and applies
the same set algebra to the join results.

Timeout sentinel (``Evaluator.py:141-151``): a timed-out predicted query
scores FN = |gold rows|, FP = ∞.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..plans.timeout import OK, ExecResult, run_with_timeout
from ..functions.localframe import local_df

INF_FP = float("inf")


@dataclass
class OverlapCounts:
    table: str
    tp: int
    fp: float  # float: ∞ sentinel on timeout
    fn: int


def table_overlap(gold: DataFrame, pred: DataFrame, meaningful_cols: list[str], table: str) -> OverlapCounts:
    """Identical set semantics to INTERSECT/EXCEPT DISTINCT (nulls equal),
    computed in ONE job: distinct each side, null-safe full-outer join on
    all meaningful columns, count the three presence patterns.  The naive
    three-set-op form ran three jobs, each re-evaluating both namespaces'
    insert lineage — 3× the work per table, at any scale."""
    from functools import reduce

    from pyspark.sql import functions as F

    if not meaningful_cols:
        # no meaningful columns -> nothing to compare (the reference never
        # evaluates such tables, Evaluator.py:199-208); zero counts keep
        # callers without reference_skips well-defined
        return OverlapCounts(table, 0, 0.0, 0)
    g = gold.select(*meaningful_cols).distinct().withColumn("__in_g", F.lit(1)).alias("g")
    p = pred.select(*meaningful_cols).distinct().withColumn("__in_p", F.lit(1)).alias("p")
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"g.{c}").eqNullSafe(F.col(f"p.{c}")) for c in meaningful_cols],
    )
    row = (
        g.join(p, cond, "full_outer")
        .agg(
            F.sum(
                F.when(F.col("__in_g").isNotNull() & F.col("__in_p").isNotNull(), 1).otherwise(0)
            ).alias("tp"),
            F.sum(
                F.when(F.col("__in_p").isNotNull() & F.col("__in_g").isNull(), 1).otherwise(0)
            ).alias("fp"),
            F.sum(
                F.when(F.col("__in_g").isNotNull() & F.col("__in_p").isNull(), 1).otherwise(0)
            ).alias("fn"),
        )
        .collect()[0]
    )
    return OverlapCounts(table, row.tp or 0, float(row.fp or 0), row.fn or 0)


def timed_table_overlap(
    spark: SparkSession,
    gold: DataFrame,
    pred: DataFrame,
    meaningful_cols: list[str],
    table: str,
    timeout_s: float = 30.0,
) -> OverlapCounts:
    """Overlap with the reference's timeout sentinel semantics."""
    res: ExecResult = run_with_timeout(
        spark, lambda: table_overlap(gold, pred, meaningful_cols, table), timeout_s
    )
    if res.status == OK:
        return res.value
    # reference counts the RAW gold select (``Evaluator.py:146-147``:
    # ``len(results.rows)`` of ``SELECT <cols> FROM gold.<table>`` — no
    # DISTINCT), so duplicates in a timed-out table's gold side count
    gold_rows = gold.select(*meaningful_cols).count()
    return OverlapCounts(table, 0, INF_FP, gold_rows)


def overlap_counts_df(spark: SparkSession, counts: list[OverlapCounts]) -> DataFrame:
    """Counts + the Schema-Mapping P/R/F1 (all-zero ⇒ 1.0) as a DataFrame."""
    from .metrics import prf1_columns

    df = local_df(spark, 
        [(c.table, c.tp, c.fp, c.fn) for c in counts],
        "table_name string, tp bigint, fp double, fn bigint",
    )
    return prf1_columns(df, all_zero_is_perfect=True)
