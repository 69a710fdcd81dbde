"""Real-dataset end-to-end goldens: the reference's own matching benchmarks
(``Stable Schema Matching/data/{ehr,synthea}/*_dataset.json`` — the 52-case
MIMIC-III → OMOP set and the 12-case Synthea → OMOP set, committed under
``fixtures/``) through the full mock matching pipeline in ONE plan:

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
every stage here scales out across the case dimension.  The 52+12-case
fixtures are deliberately small — they are CORRECTNESS anchors on real
data, not throughput queries.
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

_FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
)


def _sq(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _values(rows: list[tuple[str, str, str]], alias: str) -> str:
    body = ", ".join(f"({_sq(a)}, {_sq(b)}, {_sq(c)})" for a, b, c in rows)
    return f"(VALUES {body}) AS {alias}(case_id, src, tgt)"


def _golden(dataset: str) -> tuple[list, list]:
    from ..fixtures import ehr_golden as g

    if dataset == "ehr":
        return g.ROUND1, g.GOLD
    return g.SYNTHEA_ROUND1, g.SYNTHEA_GOLD


def dataset_cases_df(spark: SparkSession, dataset: str) -> DataFrame:
    """A committed benchmark through the S1 dataset-JSON scan (the loader
    whose layout parity with the reference is pinned by
    tests/test_dataset_loaders.py)."""
    return load_dataset_json(
        spark, os.path.join(_FIXTURE_DIR, f"{dataset}_dataset.json")
    )


def dataset_gold_df(spark: SparkSession, dataset: str) -> DataFrame:
    """Gold pairs, case-folded (the datasets write source names in table
    case, e.g. SUBJECT_ID, while schema columns are lower case) and
    deduped — the set the reference's eval compares against."""
    return (
        dataset_cases_df(spark, dataset)
        .select(F.col("id").alias("case_id"), F.explode("gold_mapping").alias("p"))
        .select(
            "case_id",
            F.lower(F.col("p")[0]).alias("src"),
            F.lower(F.col("p")[1]).alias("tgt"),
        )
        .distinct()
    )


_PREFS_MEMOS = {"ehr": SessionMemo(), "synthea": SessionMemo()}


def _preferences(spark: SparkSession, dataset: str) -> DataFrame:
    """Scored + ranked preference frame for a benchmark's cases, memoized
    per session: the q_{ehr,synthea}_* queries share it, and the
    mapInPandas scorer must not re-run per consumer (SURVEY §4 recompute
    trap)."""

    def build() -> DataFrame:
        catalog = catalog_from_cases(dataset_cases_df(spark, dataset)).select(
            "case_id", "side", "col_name", "col_type"
        )
        # ≤52 cases / ≤~29k candidate rows: one Arrow batch through one
        # Python worker, then a handful of post-shuffle partitions
        cands = generate_candidates(catalog).coalesce(1)
        return rank_preferences(mock_score_candidates(cands)).coalesce(4)

    return _PREFS_MEMOS[dataset].get_or_build(spark, build)


def _round1(spark: SparkSession, dataset: str) -> DataFrame:
    return round_r(stable_match(_preferences(spark, dataset), top_k=5), 1).select(
        "case_id", "src", "tgt"
    )


def _gold_parity_oracle(dataset: str) -> str:
    _, gold = _golden(dataset)
    return f"SELECT case_id, src, tgt FROM {_values(gold, 'g')}"


def _round1_oracle(dataset: str) -> str:
    round1, _ = _golden(dataset)
    return f"SELECT case_id, src, tgt FROM {_values(round1, 'r1')}"


def _f1_oracle(dataset: str) -> str:
    round1, gold = _golden(dataset)
    return f"""
WITH r1 AS (SELECT DISTINCT case_id, src, tgt FROM {_values(round1, "rv")}),
gold AS (SELECT DISTINCT case_id, src, tgt FROM {_values(gold, "gv")}),
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


def _f1_df(spark: SparkSession, dataset: str) -> DataFrame:
    counts = confusion_counts(_round1(spark, dataset), dataset_gold_df(spark, dataset))
    return prf1_columns(counts).select(
        "case_id", "tp", "fp", "fn", "precision", "recall", "f1"
    )


# -- EHR (52 MIMIC-III → OMOP cases) ------------------------------------------


@query("q_ehr_gold_parity", _gold_parity_oracle("ehr"))
def q_ehr_gold_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 on the real dataset: the Spark JSON scan's exploded gold pairs
    must equal the stdlib-json parse committed by the golden tool — a
    loader-level parity check on reference data, not synthetic."""
    return dataset_gold_df(spark, "ehr")


@query("q_ehr_round1_matches", _round1_oracle("ehr"))
def q_ehr_round1_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidates → mock scores → ranking → Gale–Shapley round 1 over the
    real 52-case benchmark, pinned row-for-row (542 matches) against the
    pure-Python twin."""
    return _round1(spark, "ehr")


@query("q_ehr_matching_f1", _f1_oracle("ehr"))
def q_ehr_matching_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reproduced reference experiment: per-case precision/recall/F1 of
    the round-1 stable matching against the dataset's gold mapping, for all
    52 real cases.  The oracle derives the same metric stack in SQL from
    the pinned round-1 VALUES and the independently parsed gold pairs."""
    return _f1_df(spark, "ehr")


# -- Synthea (12 Synthea → OMOP cases) ----------------------------------------


@query("q_synthea_round1_matches", _round1_oracle("synthea"))
def q_synthea_round1_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's second benchmark (12 Synthea → OMOP cases) through
    the same pipeline, pinned row-for-row (118 matches) against the twin.
    Synthea cases omit the instance-row counts — the nullable-schema branch
    of the S1 loader, which the EHR set cannot exercise."""
    return _round1(spark, "synthea")


@query("q_synthea_matching_f1", _f1_oracle("synthea"))
def q_synthea_matching_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-case PRF1 for the Synthea benchmark (see q_ehr_matching_f1)."""
    return _f1_df(spark, "synthea")
