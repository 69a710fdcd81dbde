"""Oracle parity for the matching pipeline + LLM-boundary determinism."""

import pytest

from conftest import assert_oracle_match

NAMES = [
    "q_match_candidates",
    "q_mock_match_scores",
    "q_bidirectional_scores",
    "q_topk_alignments",
    "q_ensemble_union",
    "q_ensemble_intersection",
    "q_ensemble_majority",
]


@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity(spark, duck, name):
    assert_oracle_match(spark, duck, name)


def test_levenshtein_matches_engines(spark, duck):
    """The mock scorer's pure-Python levenshtein must equal both engines'."""
    from scalable_data_integration_with_llms_spark.llm.boundary import levenshtein

    pairs = [
        ("custkey", "suppkey"), ("name", "name"), ("nationkey", "cust_id"),
        ("acctbal", "acct_balance"), ("", "abc"), ("abc", ""), ("kitten", "sitting"),
    ]
    duck_d = [duck.execute("SELECT levenshtein(?, ?)", p).fetchone()[0] for p in pairs]
    py_d = [levenshtein(a, b) for a, b in pairs]
    assert py_d == duck_d


def test_stable_matching_rows(spark):
    from scalable_data_integration_with_llms_spark.queries import QUERIES

    df = QUERIES["q_stable_matching"](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert len(rows) > 0
    # rounds are cumulative: round r+1 ⊇ round r pairs per case
    by_round = {}
    for r in rows:
        by_round.setdefault((r.case_id, r.round), set()).add((r.src, r.tgt))
    for (cid, rnd), pairs in by_round.items():
        if (cid, rnd + 1) in by_round:
            assert pairs <= by_round[(cid, rnd + 1)]
    # the NEW matches of each round form a matching: src/tgt used at most once
    from collections import Counter

    for (cid, rnd), pairs in by_round.items():
        delta = pairs - by_round.get((cid, rnd - 1), set())
        src_uses = Counter(s for s, _ in delta)
        tgt_uses = Counter(t for _, t in delta)
        assert not src_uses or max(src_uses.values()) == 1
        assert not tgt_uses or max(tgt_uses.values()) == 1


def test_stable_matching_golden_parity(spark, duck):
    assert_oracle_match(spark, duck, "q_stable_matching")


def test_filtered_preferences_parity(spark, duck):
    assert_oracle_match(spark, duck, "q_filtered_preferences")


def test_filtered_preferences_terminator_semantics(spark):
    """Everything at or below the no-match option is dropped."""
    from pyspark.sql import functions as F

    from scalable_data_integration_with_llms_spark.queries import QUERIES

    out = QUERIES["q_filtered_preferences"](spark, "x")
    assert out.filter(F.col("candidate_attr") == "none of the options").count() == 0
