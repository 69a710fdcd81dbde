"""Seed-run ensembles (SURVEY §2.7 SO1–SO4, §2.4 A3/A4;
``Stable Schema Matching/eval/eval_ensemble.py``).

The run matrix (seed × config) is an explicit dimension column (SURVEY §1.4),
so every ensemble mode is one distributed set-op or groupBy over
``(case_id, seed, src, tgt)`` alignment frames — no driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

_PAIR = ["case_id", "src", "tgt"]


def ensemble_union(runs: DataFrame) -> DataFrame:
    """SO1: pairs predicted in any seed run (``eval_ensemble.py:20-28``)."""
    return runs.select(*_PAIR).distinct()


def ensemble_intersection(runs: DataFrame, n_runs: int | None = None) -> DataFrame:
    """SO2: pairs present in every run (``:31-38``).  groupBy-count form —
    one shuffle instead of n-1 chained intersects."""
    if n_runs is None:
        n_runs_df = runs.select("seed").distinct().count()
    else:
        n_runs_df = n_runs
    return (
        runs.select("seed", *_PAIR)
        .distinct()
        .groupBy(*_PAIR)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") == n_runs_df)
        .select(*_PAIR)
    )


def ensemble_disjoint(runs: DataFrame, n_runs: int | None = None) -> DataFrame:
    """SO3: union − intersection (symmetric difference across runs,
    ``:41-51``) = pairs present in SOME run but not ALL runs — one
    distinct + one aggregation, instead of evaluating the runs frame for
    union and intersection separately and EXCEPTing them (three passes
    plus a set-op shuffle; the DuckDB oracle still states the EXCEPT form,
    so the algebraic identity is value-checked).  ``n != n_runs`` (not
    ``<``) keeps the identity even when a caller passes ``n_runs`` smaller
    than the distinct seeds present: such pairs are outside the
    intersection, so union − intersection INCLUDES them."""
    if n_runs is None:
        n_runs = runs.select("seed").distinct().count()
    return (
        runs.select("seed", *_PAIR)
        .distinct()
        .groupBy(*_PAIR)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") != n_runs)
        .select(*_PAIR)
    )


def ensemble_majority(runs: DataFrame) -> DataFrame:
    """A3: per target attribute keep every pair tied at the max vote count
    (``eval_ensemble.py:70-88``)."""
    counts = runs.groupBy(*_PAIR).agg(F.count(F.lit(1)).alias("votes"))
    win = W.partitionBy("case_id", "tgt")
    return (
        counts.withColumn("max_votes", F.max("votes").over(win))
        .filter(F.col("votes") == F.col("max_votes"))
        .select(*_PAIR, "votes")
    )


def gold_filter(runs: DataFrame, gold: DataFrame) -> DataFrame:
    """SO4: union ∩ gold — the oracle upper bound (``:119-126``)."""
    return ensemble_union(runs).join(gold.select(*_PAIR), _PAIR, "left_semi")
