"""Confidence-score evaluation regimes: hand-computed fixture pinning every
branch of the reference's three classification schemes
(``Stable Schema Matching/eval/eval_confidence_score.py:12-169``), with the
none-of-options TN/FN branching (:28-37, :101-115) exercised explicitly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scalable_data_integration_with_llms_spark.operators.confidence import (
    METRIC_GROUPS,
    confidence_counts,
    confidence_metrics,
)

NONE = "none of the options"

# One synthetic case covering every branch:
#   t1  in gold (s1), gold offered   — top (s1,100)=TP_attr, (s3,0)=TN_attr,
#                                      (NONE,100)=FP_none (right answer on
#                                      the table, model said none)
#   t2  in gold (s2), gold offered   — (s2,0)=FN_attr, (NONE,0)=TN_none
#   t9  in gold (s9), gold NOT offered — (s4,100)=FP_attr, (NONE,100)=TP_none
#   t5  not in gold                  — (NONE,100)=TP_none, (s5,0)=TN_attr
#   t6  not in gold                  — (NONE,0)=FN_none, (s6,100)=FP_attr
#   t7  in gold (s7), gold NOT offered — (NONE,0)=FN_none, (s8,0)=TN_attr
GOLD = [("c1", "s1", "t1"), ("c1", "s2", "t2"), ("c1", "s9", "t9"), ("c1", "s7", "t7")]
SCORED = [
    ("c1", "t1", "s1", 100),
    ("c1", "t1", "s3", 0),
    ("c1", "t1", NONE, 100),
    ("c1", "t2", "s2", 0),
    ("c1", "t2", NONE, 0),
    ("c1", "t9", "s4", 100),
    ("c1", "t9", NONE, 100),
    ("c1", "t5", NONE, 100),
    ("c1", "t5", "s5", 0),
    ("c1", "t6", NONE, 0),
    ("c1", "t6", "s6", 100),
    ("c1", "t7", NONE, 0),
    ("c1", "t7", "s8", 0),
]

# Hand-computed per-regime (tp, fp, fn, tn):
EXPECTED_COUNTS = {
    "None of the options": (2, 1, 2, 1),
    "(attr, query)": (1, 2, 1, 3),
    "All": (3, 3, 3, 4),
}
# Hand-computed metrics (precision, recall, accuracy, f1):
EXPECTED_METRICS = {
    "None of the options": (2 / 3, 2 / 4, 3 / 6, 4 / 7),
    "(attr, query)": (1 / 3, 1 / 2, 4 / 7, 2 / 5),
    "All": (3 / 6, 3 / 6, 7 / 13, 1 / 2),
}


def _reference_eval(scored, gold):
    """Independent re-statement of the reference semantics (documented in
    operators/confidence.py) used as a second oracle: iterate answers,
    classify per regime, return {group: (tp, fp, fn, tn)}."""
    gold_pairs = {(s, t) for _, s, t in gold}
    gold_attrs = {t for _, _, t in gold}
    options = {}
    for _, attr, pred, _b in scored:
        options.setdefault(attr, set()).add(pred)
    offered = {
        attr for attr in options
        if any((s, attr) in gold_pairs for s in options[attr])
    }
    none_c = [0, 0, 0, 0]  # tp fp fn tn
    attr_c = [0, 0, 0, 0]
    for _, attr, pred, bucket in scored:
        if pred == NONE:
            if bucket == 100:
                if attr in gold_attrs and attr in offered:
                    none_c[1] += 1
                else:
                    none_c[0] += 1
            else:
                if attr in gold_attrs and attr in offered:
                    none_c[3] += 1
                else:
                    none_c[2] += 1
        else:
            hit = (pred, attr) in gold_pairs
            if bucket == 100:
                none_idx = 0 if hit else 1
                attr_c[none_idx] += 1
            else:
                attr_c[2 if hit else 3] += 1
    all_c = [a + b for a, b in zip(none_c, attr_c)]
    return {
        "None of the options": tuple(none_c),
        "(attr, query)": tuple(attr_c),
        "All": tuple(all_c),
    }


@pytest.fixture(scope="module")
def frames(spark):
    scored = spark.createDataFrame(
        SCORED, "case_id string, attribute string, prediction string, bucket int"
    )
    gold = spark.createDataFrame(GOLD, "case_id string, src string, tgt string")
    return scored, gold


def test_counts_match_hand_computed(frames):
    scored, gold = frames
    rows = confidence_counts(scored, gold).collect()
    assert len(rows) == 3
    got = {r["metric_group"]: (r["tp"], r["fp"], r["fn"], r["tn"]) for r in rows}
    assert got == EXPECTED_COUNTS


def test_counts_match_reference_recomputation(frames):
    scored, gold = frames
    rows = confidence_counts(scored, gold).collect()
    got = {r["metric_group"]: (r["tp"], r["fp"], r["fn"], r["tn"]) for r in rows}
    assert got == _reference_eval(SCORED, GOLD)
    assert got == EXPECTED_COUNTS  # and the independent oracle agrees


def test_metrics_zero_denominator_convention(spark):
    # one concrete non-gold answer scored 0: only TN_attr=1; every
    # denominator with tp is empty -> all four metrics 0.0 except accuracy
    scored = spark.createDataFrame(
        [("c2", "t1", "s1", 0)],
        "case_id string, attribute string, prediction string, bucket int",
    )
    gold = spark.createDataFrame(
        [("cX", "sX", "tX")], "case_id string, src string, tgt string"
    )
    out = confidence_metrics(confidence_counts(scored, gold)).collect()
    by_group = {r["metric_group"]: r for r in out}
    none_row = by_group["None of the options"]
    assert (none_row["tp"], none_row["fp"], none_row["fn"], none_row["tn"]) == (0, 0, 0, 0)
    assert none_row["precision"] == 0.0 and none_row["recall"] == 0.0
    assert none_row["accuracy"] == 0.0 and none_row["f1"] == 0.0  # 0-total case
    attr_row = by_group["(attr, query)"]
    assert attr_row["tn"] == 1 and attr_row["accuracy"] == 1.0
    assert attr_row["precision"] == 0.0 and attr_row["f1"] == 0.0


def test_metrics_match_hand_computed(frames):
    scored, gold = frames
    out = confidence_metrics(confidence_counts(scored, gold)).collect()
    got = {
        r["metric_group"]: (r["precision"], r["recall"], r["accuracy"], r["f1"])
        for r in out
    }
    for group in METRIC_GROUPS:
        assert got[group] == pytest.approx(EXPECTED_METRICS[group], abs=1e-12), group


def test_every_branch_contributes(frames):
    # sanity: the fixture really exercises all 8 branch outcomes
    scored, gold = frames
    rows = confidence_counts(scored, gold).collect()
    for r in rows:
        assert min(r["tp"], r["fp"], r["fn"], r["tn"]) >= 1 or r["metric_group"] == "All"
