"""Unit fixtures pinning the reference stable-matching semantics
(stable_match.py quirks listed in SURVEY §7 'hard parts')."""

from scalable_data_integration_with_llms_spark.operators.stable_matching import stable_match_case


def test_simple_mutual_best():
    rounds = stable_match_case(
        ["a1", "a2"],
        ["b1", "b2"],
        {"a1": [("b1", 0.9), ("b2", 0.1)], "a2": [("b2", 0.8), ("b1", 0.2)]},
        {"b1": [("a1", 0.9), ("a2", 0.2)], "b2": [("a2", 0.8), ("a1", 0.1)]},
        top_k=1,
    )
    assert rounds[0] == [("a1", "b1"), ("a2", "b2")]


def test_displacement_on_strictly_better():
    # a2 proposes later but b1 strictly prefers it -> displaces a1
    rounds = stable_match_case(
        ["a1", "a2"],
        ["b1"],
        {"a1": [("b1", 0.5)], "a2": [("b1", 0.6)]},
        {"b1": [("a2", 0.9), ("a1", 0.4)]},
        top_k=1,
    )
    assert rounds[0] == [("a2", "b1")]


def test_tie_never_displaces():
    # is_better_match returns False on equal scores (stable_match.py:4-7)
    rounds = stable_match_case(
        ["a1", "a2"],
        ["b1"],
        {"a1": [("b1", 0.5)], "a2": [("b1", 0.6)]},
        {"b1": [("a1", 0.7), ("a2", 0.7)]},
        top_k=1,
    )
    assert rounds[0] == [("a1", "b1")]


def test_missing_score_never_displaces():
    # a2 absent from b1's list -> mutual-acceptability gate rejects proposal
    rounds = stable_match_case(
        ["a1", "a2"],
        ["b1"],
        {"a1": [("b1", 0.5)], "a2": [("b1", 0.9)]},
        {"b1": [("a1", 0.7)]},
        top_k=1,
    )
    assert rounds[0] == [("a1", "b1")]


def test_no_match_terminator_filtered():
    rounds = stable_match_case(
        ["a1"],
        ["b1"],
        {"a1": [("none of the options", 1.0), ("b1", 0.5)]},
        {"b1": [("a1", 0.5)]},
        top_k=1,
    )
    assert rounds[0] == [("a1", "b1")]


def test_rounds_accumulate_second_choice():
    # round 2 re-runs on pruned preferences: a1 already has b1, can add b2
    rounds = stable_match_case(
        ["a1"],
        ["b1", "b2"],
        {"a1": [("b1", 0.9), ("b2", 0.4)]},
        {"b1": [("a1", 0.9)], "b2": [("a1", 0.4)]},
        top_k=3,
    )
    assert rounds[0] == [("a1", "b1")]
    assert rounds[1] == [("a1", "b1"), ("a1", "b2")]
    assert len(rounds) == 2  # third round makes no match -> stops


def test_weaker_rival_matches_next_round():
    # round 1: b1 takes a1 and rejects a2 (strictly worse); round 2 frees
    # everyone, (a1,b1) is pruned from preferences, so b1 accepts a2 — the
    # reference's many-to-many round semantics (stable_match.py:93-198)
    rounds = stable_match_case(
        ["a1", "a2"],
        ["b1"],
        {"a1": [("b1", 0.9)], "a2": [("b1", 0.2)]},
        {"b1": [("a1", 0.9), ("a2", 0.1)]},
        top_k=2,
    )
    assert rounds[0] == [("a1", "b1")]
    assert rounds[1] == [("a1", "b1"), ("a2", "b1")]
