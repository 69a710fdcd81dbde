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
