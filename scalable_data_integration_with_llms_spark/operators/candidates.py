"""Candidate generation + preference algebra (SURVEY §2.3 J1/J2/J3,
§2.5 W1/W2).

J1 (``prompt/MatchMaker.py:45-61``, ``PromptReprTemplate.py:329-342``): every
query attribute × every candidate attribute *of the same case* — an equi-join
on case_id that is Cartesian within a case.  Schemas are ≤ ~40 columns, so the
per-case product is tiny; across a corpus of cases the join parallelizes by
case_id.  A synthetic "none of the options" candidate is appended per query
list (the reference's no-match option, ``PromptReprTemplate.py:493-496``).

J3 (``ask_StableMatcher.py:121-199``): bidirectional merge — full outer join
of forward (n→1: target queries, source candidates) and swapped (1→n) scores
on (case_id, src, tgt); a missing side scores 0; aggregate by ``multiply`` or
``avg``; drop zeros.  Exact arithmetic: scores stay integer milli until the
final presentation division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

NO_MATCH = "none of the options"


def guard_dimension(df: DataFrame, max_rows: int, what: str) -> DataFrame:
    """Plan-level cardinality contract for an all-pairs (quadratic) stage:
    fail the JOB, loudly, if ``df`` exceeds ``max_rows`` at runtime.

    Implemented as ``assert_true`` over an unpartitioned window count,
    materialized as a column and then consumed by a filter — the filter
    reference keeps the assertion from being pruned (windows are not
    allowed directly in WHERE), and the single-partition window is fine
    because the guarded frames are dimension-sized by contract.  Use on
    the build side of a crossJoin whose square would be unpayable at
    corpus scale."""
    count_all = F.count(F.lit(1)).over(W.partitionBy())
    ok = F.assert_true(
        count_all <= F.lit(max_rows),
        f"{what}: all-pairs stage exceeds its {max_rows}-row contract",
    )
    return df.withColumn("_dim_guard", ok).filter(
        F.col("_dim_guard").isNull()
    ).drop("_dim_guard")


def generate_candidates(catalog: DataFrame) -> DataFrame:
    """J1: per-case query×candidate cross product, both directions.

    ``catalog``: ``(case_id, side, col_name, col_type)`` with side ∈
    {source, target}.  Output: ``(case_id, side, query_attr, query_type,
    candidate_attr, candidate_type)`` where side ``n_to_one`` queries target
    attrs against source candidates and ``one_to_n`` the reverse, plus one
    no-match candidate per query list.
    """
    src = catalog.filter(F.col("side") == "source").select(
        "case_id", F.col("col_name").alias("s_attr"), F.col("col_type").alias("s_type")
    )
    tgt = catalog.filter(F.col("side") == "target").select(
        "case_id", F.col("col_name").alias("t_attr"), F.col("col_type").alias("t_type")
    )
    pairs = src.join(tgt, "case_id")  # equi on case, Cartesian within
    fwd = pairs.select(
        "case_id",
        F.lit("n_to_one").alias("side"),
        F.col("t_attr").alias("query_attr"),
        F.col("t_type").alias("query_type"),
        F.col("s_attr").alias("candidate_attr"),
        F.col("s_type").alias("candidate_type"),
    )
    bwd = pairs.select(
        "case_id",
        F.lit("one_to_n").alias("side"),
        F.col("s_attr").alias("query_attr"),
        F.col("s_type").alias("query_type"),
        F.col("t_attr").alias("candidate_attr"),
        F.col("t_type").alias("candidate_type"),
    )
    both = fwd.unionByName(bwd)
    no_match = (
        both.select("case_id", "side", "query_attr", "query_type")
        .distinct()
        .withColumn("candidate_attr", F.lit(NO_MATCH))
        .withColumn("candidate_type", F.lit(""))
    )
    return both.unionByName(no_match)


def rank_preferences(scored: DataFrame) -> DataFrame:
    """W1: rank candidates per (case_id, side, query_attr) by score desc;
    deterministic tiebreak by candidate name.  Adds exact sum-normalized
    ``score`` (milli/total, both engines divide the same bigints)."""
    win = W.partitionBy("case_id", "side", "query_attr")
    order = win.orderBy(F.desc("score_milli"), F.asc("candidate_attr"))
    return (
        scored.withColumn("rank", F.row_number().over(order))
        .withColumn("score", F.col("score_milli") / F.sum("score_milli").over(win))
    )


def bidirectional_merge(preferences: DataFrame, agg: str = "multiply") -> DataFrame:
    """J3: full-outer merge of forward and swapped normalized scores per
    (case_id, src, tgt); missing side = 0; ``multiply`` or ``avg``; zeros
    dropped (``ask_StableMatcher.py:158-186``).

    Merged score stays on integer milli inputs: multiply -> (f·b)/1e12,
    avg -> (f+b)/2e6 — single-expression double math, oracle-exact.
    """
    fwd = preferences.filter((F.col("side") == "n_to_one") & (F.col("candidate_attr") != NO_MATCH)).select(
        "case_id",
        F.col("candidate_attr").alias("src"),
        F.col("query_attr").alias("tgt"),
        F.col("score_milli").alias("fwd_milli"),
    )
    bwd = preferences.filter((F.col("side") == "one_to_n") & (F.col("candidate_attr") != NO_MATCH)).select(
        "case_id",
        F.col("query_attr").alias("src"),
        F.col("candidate_attr").alias("tgt"),
        F.col("score_milli").alias("bwd_milli"),
    )
    merged = fwd.join(bwd, ["case_id", "src", "tgt"], "full_outer").select(
        "case_id",
        "src",
        "tgt",
        F.coalesce("fwd_milli", F.lit(0)).alias("fwd_milli"),
        F.coalesce("bwd_milli", F.lit(0)).alias("bwd_milli"),
    )
    if agg == "multiply":
        score = (F.col("fwd_milli") * F.col("bwd_milli")) / F.lit(1.0e12)
    else:  # avg
        score = (F.col("fwd_milli") + F.col("bwd_milli")) / F.lit(2.0e6)
    return merged.withColumn("score", score).filter(F.col("score") != 0)


def top_k_per_query(merged: DataFrame, k: int, query_col: str = "tgt") -> DataFrame:
    """W2: keep the k best alignments per query attribute (k sweep 1..5,
    ``eval/eval_MatchMaker.py:227-244``)."""
    win = W.partitionBy("case_id", query_col).orderBy(
        F.desc("score"), F.asc("src"), F.asc("tgt")
    )
    return merged.withColumn("rank", F.row_number().over(win)).filter(F.col("rank") <= k)
