"""Oracle parity for the second-round reference-operator surface."""

import pytest

from conftest import assert_oracle_match

NAMES = [
    "q_parse_matches_json",
    "q_mcq_scores",
    "q_mcq_validation",
    "q_yes_no_majority",
    "q_icl_packing",
    "q_example_selection",
    "q_gold_in_options",
    "q_case_swap",
    "q_softmax_scores",
    "q_prompt_assembly",
]


@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity(spark, duck, name):
    assert_oracle_match(spark, duck, name)


ROUND3 = [
    "q_parse_create_view",
    "q_parse_tada_yes",
    "q_ensemble_disjoint",
    "q_prompt_with_samples",
    "q_topk_sweep",
]


@pytest.mark.parametrize("name", ROUND3)
def test_oracle_parity_round3(spark, duck, name):
    assert_oracle_match(spark, duck, name)


def test_view_parser_unit():
    from scalable_data_integration_with_llms_spark.operators.view_parse import parse_view_alignments

    errs, pairs = parse_view_alignments(
        "CREATE VIEW v (a, b) AS SELECT x, y FROM t;"
    )
    assert not errs and pairs == [("x", "a"), ("y", "b")]
    errs, pairs = parse_view_alignments("CREATE VIEW v AS SELECT x AS a, y FROM t;")
    assert pairs == [("x", "a"), ("y", "y")]
    errs, pairs = parse_view_alignments("nothing")
    assert pairs is None and errs == ["No CREATE VIEWs found"]
