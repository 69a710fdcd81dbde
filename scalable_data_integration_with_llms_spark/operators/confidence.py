"""Confidence-score evaluation regimes — the reference's three TP/FP/TN/FN
classification schemes over 0/100-scored MCQ answers.

Reference semantics pinned here (``Stable Schema Matching/eval/
eval_confidence_score.py``):

* ``evaluate_none_of_options`` (:12-46) — only "None of the options" answers
  count.  A none-answer scored 100 is TP when the attribute has no gold
  match, OR has one that was never offered among the options; it is FP only
  when the gold match WAS in the options (the model confidently said "none"
  with the right answer on the table).  A none-answer scored 0 mirrors:
  TN when the gold match was in the options, FN otherwise (:28-37 — note
  the attribute-not-in-gold branch is FN, not TN: rejecting "none" for an
  unmatched attribute is a miss under this regime).
* ``evaluate_attr_options`` (:140-169) — none-answers are skipped; a
  concrete (prediction, attribute) pair scored 100 is TP iff the pair is in
  gold else FP; scored 0 is FN iff in gold else TN.
* ``evaluate_confidence_score`` (:95-138) — the union: none-answers follow
  the first regime's branching, concrete pairs the second's.

Per case: recall/precision/accuracy/F1 with 0.0 on empty denominators
(:133-136).  ``is_in_the_options`` (:7-9) is the existing
``q_gold_in_options`` predicate: some gold pair (src, tgt=attribute) with
src among the attribute's offered options.

Scale shape: every predicate is a broadcast semi/left join against the
gold dimension (tiny by construction — gold mappings are human-curated),
then ONE hash aggregation by case.  No windows, no self-joins; at 100 TB
of scored answers this is a map-side-joined single-shuffle plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .candidates import NO_MATCH

METRIC_GROUPS = ["None of the options", "(attr, query)", "All"]


def confidence_counts(
    scored: DataFrame,
    gold: DataFrame,
    *,
    no_match: str = NO_MATCH,
) -> DataFrame:
    """Per-case TP/FP/FN/TN under all three regimes.

    ``scored``: one row per scored MCQ answer — columns ``case_id``,
    ``attribute`` (the query attribute), ``prediction`` (the chosen option,
    possibly ``no_match``), ``bucket`` (100 = confident yes, 0 = confident
    no).  The attribute's option list is taken to be the set of predictions
    scored for it (the reference's ``preferences[attribute]``).

    ``gold``: columns ``case_id``, ``src``, ``tgt``.

    Returns (case_id, metric_group, tp, fp, fn, tn) — exactly 3 rows per
    case, groups ordered as ``METRIC_GROUPS``.
    """
    rows = scored.select("case_id", "attribute", "prediction", "bucket")

    g_attr = (
        gold.select("case_id", F.col("tgt").alias("attribute"))
        .distinct()
        .withColumn("attr_in_gold", F.lit(1))
    )
    g_pair = (
        gold.select(
            "case_id",
            F.col("src").alias("prediction"),
            F.col("tgt").alias("attribute"),
        )
        .distinct()
        .withColumn("pair_in_gold", F.lit(1))
    )
    # gold-match-was-offered: some gold (src, tgt=attribute) has src among
    # the options scored for that attribute (eval_confidence_score.py:7-9)
    g_opts = (
        rows.select("case_id", "attribute", "prediction")
        .join(
            gold,
            (rows.case_id == gold.case_id)
            & (rows.attribute == gold.tgt)
            & (rows.prediction == gold.src),
            "left_semi",
        )
        .select("case_id", "attribute")
        .distinct()
        .withColumn("gold_in_options", F.lit(1))
    )

    flagged = (
        rows.join(F.broadcast(g_attr), ["case_id", "attribute"], "left")
        .join(F.broadcast(g_pair), ["case_id", "attribute", "prediction"], "left")
        .join(F.broadcast(g_opts), ["case_id", "attribute"], "left")
        .fillna(0, ["attr_in_gold", "pair_in_gold", "gold_in_options"])
        .withColumn("is_none", (F.col("prediction") == no_match).cast("int"))
    )

    is_none = F.col("is_none") == 1
    yes = F.col("bucket") == 100
    no = F.col("bucket") == 0
    in_gold = F.col("attr_in_gold") == 1
    offered = F.col("gold_in_options") == 1
    pair_hit = F.col("pair_in_gold") == 1

    # none-of-options regime contributions (eval_confidence_score.py:18-37)
    none_tp = yes & is_none & (~in_gold | (in_gold & ~offered))
    none_fp = yes & is_none & in_gold & offered
    none_tn = no & is_none & in_gold & offered
    none_fn = no & is_none & (~in_gold | (in_gold & ~offered))
    # (attr, query) regime contributions (:145-160)
    attr_tp = yes & ~is_none & pair_hit
    attr_fp = yes & ~is_none & ~pair_hit
    attr_fn = no & ~is_none & pair_hit
    attr_tn = no & ~is_none & ~pair_hit

    def n(cond) -> F.Column:
        return F.sum(F.when(cond, 1).otherwise(0))

    counts = flagged.groupBy("case_id").agg(
        n(none_tp).alias("tp_none"),
        n(none_fp).alias("fp_none"),
        n(none_fn).alias("fn_none"),
        n(none_tn).alias("tn_none"),
        n(attr_tp).alias("tp_attr"),
        n(attr_fp).alias("fp_attr"),
        n(attr_fn).alias("fn_attr"),
        n(attr_tn).alias("tn_attr"),
    )
    stacked = counts.select(
        "case_id",
        F.inline(
            F.array(
                F.struct(
                    F.lit(METRIC_GROUPS[0]).alias("metric_group"),
                    F.col("tp_none").alias("tp"),
                    F.col("fp_none").alias("fp"),
                    F.col("fn_none").alias("fn"),
                    F.col("tn_none").alias("tn"),
                ),
                F.struct(
                    F.lit(METRIC_GROUPS[1]).alias("metric_group"),
                    F.col("tp_attr").alias("tp"),
                    F.col("fp_attr").alias("fp"),
                    F.col("fn_attr").alias("fn"),
                    F.col("tn_attr").alias("tn"),
                ),
                # the union regime: none-answers follow the none branching,
                # concrete pairs the attr branching (:95-138) — so its
                # counts are exactly the sums of the two regimes' counts
                F.struct(
                    F.lit(METRIC_GROUPS[2]).alias("metric_group"),
                    (F.col("tp_none") + F.col("tp_attr")).alias("tp"),
                    (F.col("fp_none") + F.col("fp_attr")).alias("fp"),
                    (F.col("fn_none") + F.col("fn_attr")).alias("fn"),
                    (F.col("tn_none") + F.col("tn_attr")).alias("tn"),
                ),
            )
        ),
    )
    return stacked


def confidence_metrics(counts: DataFrame) -> DataFrame:
    """R/P/accuracy/F1 from (tp, fp, fn, tn) with the reference's
    0.0-on-empty-denominator convention (eval_confidence_score.py:133-136)."""
    tp, fp, fn, tn = (F.col(c).cast("double") for c in ("tp", "fp", "fn", "tn"))
    recall = F.when(tp + fn > 0, tp / (tp + fn)).otherwise(F.lit(0.0))
    precision = F.when(tp + fp > 0, tp / (tp + fp)).otherwise(F.lit(0.0))
    accuracy = F.when(
        tp + fp + fn + tn > 0, (tp + tn) / (tp + fp + fn + tn)
    ).otherwise(F.lit(0.0))
    p, r = precision, recall
    f1 = F.when(p + r > 0, (2 * p * r) / (p + r)).otherwise(F.lit(0.0))
    return counts.select(
        "*",
        precision.alias("precision"),
        recall.alias("recall"),
        accuracy.alias("accuracy"),
        f1.alias("f1"),
    )
