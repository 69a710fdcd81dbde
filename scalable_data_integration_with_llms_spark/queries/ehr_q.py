"""Real-dataset end-to-end golden: the reference's own EHR benchmark
(``Stable Schema Matching/data/ehr/ehr_dataset.json`` — 52 MIMIC-III → OMOP
cases, committed as ``fixtures/ehr_dataset.json``) through the full mock
matching pipeline in ONE plan:

    S1 JSON scan → S2 catalog flatten → J1 candidates → U2 mock scoring →
    W1 ranking → U6 stable matching → J4 confusion → A9 per-case PRF1

This converts "every stage is ported" into "the reference experiment
reproduces": the same loader that parity-tests against the reference's
dataset layout feeds the same operators the synthetic queries exercise,
and the result is pinned against a pure-Python pipeline twin
(``tools/golden_ehr.py`` → ``fixtures/ehr_golden.py``) that parses the
JSON independently with stdlib json and its own DP levenshtein.

Scale shape: one case = one independent unit of work (the applyInPandas
stable-matching task); a 100 TB matching corpus is millions of cases, so
every stage here scales out across the case dimension.  The 52-case
fixture is deliberately small — it is a CORRECTNESS anchor on real data,
not a throughput query.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..caching import SessionMemo
from ..llm.boundary import mock_score_candidates
from ..operators.candidates import generate_candidates, rank_preferences
from ..operators.metrics import confusion_counts, prf1_columns
from ..operators.stable_matching import round_r, stable_match
from ..sources.dataset_json import catalog_from_cases, load_dataset_json
from .registry import query

_FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "ehr_dataset.json",
)


def _sq(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _values(rows: list[tuple[str, str, str]], alias: str) -> str:
    body = ", ".join(f"({_sq(a)}, {_sq(b)}, {_sq(c)})" for a, b, c in rows)
    return f"(VALUES {body}) AS {alias}(case_id, src, tgt)"


def _round1_sql() -> str:
    from ..fixtures.ehr_golden import ROUND1

    return _values(ROUND1, "r1")


def _gold_sql() -> str:
    from ..fixtures.ehr_golden import GOLD

    return _values(GOLD, "g")


def ehr_cases_df(spark: SparkSession) -> DataFrame:
    """The committed EHR benchmark through the S1 dataset-JSON scan (the
    loader whose layout parity with the reference is pinned by
    tests/test_dataset_loaders.py)."""
    return load_dataset_json(spark, _FIXTURE)


def ehr_gold_df(spark: SparkSession) -> DataFrame:
    """Gold pairs, case-folded (the dataset writes source names in table
    case, e.g. SUBJECT_ID, while schema columns are lower case) and
    deduped — the set the reference's eval compares against."""
    return (
        ehr_cases_df(spark)
        .select(F.col("id").alias("case_id"), F.explode("gold_mapping").alias("p"))
        .select(
            "case_id",
            F.lower(F.col("p")[0]).alias("src"),
            F.lower(F.col("p")[1]).alias("tgt"),
        )
        .distinct()
    )


_EHR_PREFS_MEMO = SessionMemo()


def _ehr_preferences(spark: SparkSession) -> DataFrame:
    """Scored + ranked preference frame for the EHR cases, memoized per
    session: all three q_ehr_* queries read it, and the mapInPandas scorer
    must not re-run per consumer (SURVEY §4 recompute trap)."""

    def build() -> DataFrame:
        catalog = catalog_from_cases(ehr_cases_df(spark)).select(
            "case_id", "side", "col_name", "col_type"
        )
        # 52 cases / ~29k candidate rows: one Arrow batch through one
        # Python worker, then a handful of post-shuffle partitions
        cands = generate_candidates(catalog).coalesce(1)
        return rank_preferences(mock_score_candidates(cands)).coalesce(4)

    return _EHR_PREFS_MEMO.get_or_build(spark, build)


def _ehr_round1(spark: SparkSession) -> DataFrame:
    return round_r(stable_match(_ehr_preferences(spark), top_k=5), 1).select(
        "case_id", "src", "tgt"
    )


# -- loader check on real data: gold pairs vs the independent parse -----------


def _gold_parity_oracle() -> str:
    return f"SELECT case_id, src, tgt FROM {_gold_sql()}"


@query("q_ehr_gold_parity", _gold_parity_oracle())
def q_ehr_gold_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 on the real dataset: the Spark JSON scan's exploded gold pairs
    must equal the stdlib-json parse committed by the golden tool — a
    loader-level parity check on reference data, not synthetic."""
    return ehr_gold_df(spark)


# -- full pipeline to round-1 matches -----------------------------------------


def _round1_oracle() -> str:
    return f"SELECT case_id, src, tgt FROM {_round1_sql()}"


@query("q_ehr_round1_matches", _round1_oracle())
def q_ehr_round1_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidates → mock scores → ranking → Gale–Shapley round 1 over the
    real 52-case benchmark, pinned row-for-row (542 matches) against the
    pure-Python twin."""
    return _ehr_round1(spark)


# -- per-case PRF1 (the reproduced experiment) --------------------------------


def _f1_oracle() -> str:
    return f"""
WITH r1 AS (SELECT DISTINCT case_id, src, tgt FROM {_round1_sql()}),
gold AS (SELECT DISTINCT case_id, src, tgt FROM {_gold_sql()}),
cases AS (SELECT case_id FROM gold UNION SELECT case_id FROM r1),
counts AS (
  SELECT cases.case_id,
         COALESCE(tp, 0) AS tp, COALESCE(fp, 0) AS fp, COALESCE(fn, 0) AS fn
  FROM cases
  LEFT JOIN (SELECT case_id, COUNT(*) AS tp FROM (SELECT * FROM r1 INTERSECT SELECT * FROM gold) GROUP BY case_id) t USING (case_id)
  LEFT JOIN (SELECT case_id, COUNT(*) AS fp FROM (SELECT * FROM r1 EXCEPT SELECT * FROM gold) GROUP BY case_id) f USING (case_id)
  LEFT JOIN (SELECT case_id, COUNT(*) AS fn FROM (SELECT * FROM gold EXCEPT SELECT * FROM r1) GROUP BY case_id) n USING (case_id)
)
SELECT case_id, tp, fp, fn,
       CASE WHEN tp + fp = 0 THEN 0.0 ELSE tp / (tp + fp) END AS precision,
       CASE WHEN tp + fn = 0 THEN 0.0 ELSE tp / (tp + fn) END AS recall,
       CASE WHEN (CASE WHEN tp + fp = 0 THEN 0.0 ELSE tp / (tp + fp) END)
               + (CASE WHEN tp + fn = 0 THEN 0.0 ELSE tp / (tp + fn) END) = 0 THEN 0.0
            ELSE (2.0 * (CASE WHEN tp + fn = 0 THEN 0.0 ELSE tp / (tp + fn) END)
                      * (CASE WHEN tp + fp = 0 THEN 0.0 ELSE tp / (tp + fp) END))
               / ((CASE WHEN tp + fn = 0 THEN 0.0 ELSE tp / (tp + fn) END)
                + (CASE WHEN tp + fp = 0 THEN 0.0 ELSE tp / (tp + fp) END)) END AS f1
FROM counts
"""


@query("q_ehr_matching_f1", _f1_oracle())
def q_ehr_matching_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reproduced reference experiment: per-case precision/recall/F1 of
    the round-1 stable matching against the dataset's gold mapping, for all
    52 real cases.  The oracle derives the same metric stack in SQL from
    the pinned round-1 VALUES and the independently parsed gold pairs."""
    counts = confusion_counts(_ehr_round1(spark), ehr_gold_df(spark))
    return prf1_columns(counts).select(
        "case_id", "tp", "fp", "fn", "precision", "recall", "f1"
    )
