"""Property tests for stable matching (SURVEY §5(d)): random preference
instances; invariants of the reference algorithm's round semantics."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from scalable_data_integration_with_llms_spark.operators.stable_matching import stable_match_case


@st.composite
def instances(draw):
    n_a = draw(st.integers(1, 5))
    n_b = draw(st.integers(1, 5))
    schema_a = [f"a{i}" for i in range(n_a)]
    schema_b = [f"b{i}" for i in range(n_b)]
    scores = st.integers(0, 100).map(lambda x: x / 100.0)

    def prefs(own: list[str], others: list[str]):
        out = {}
        for attr in own:
            cands = draw(st.lists(st.sampled_from(others), unique=True, max_size=len(others)))
            pairs = [(c, draw(scores)) for c in cands]
            pairs.sort(key=lambda p: -p[1])
            out[attr] = pairs
        return out

    return schema_a, schema_b, prefs(schema_a, schema_b), prefs(schema_b, schema_a)


@settings(max_examples=60, deadline=None)
@given(instances())
def test_round1_is_a_matching_and_has_no_mutually_free_pair(inst):
    schema_a, schema_b, conf_a, conf_b = inst
    rounds = stable_match_case(schema_a, schema_b, conf_a, conf_b, top_k=1)
    matches = rounds[0] if rounds else []
    # a matching: each side used at most once in round 1
    assert len({a for a, _ in matches}) == len(matches)
    assert len({b for _, b in matches}) == len(matches)
    # every match is mutually acceptable
    for a, b in matches:
        assert b in {c for c, _ in conf_a.get(a, [])}
        assert a in {c for c, _ in conf_b.get(b, [])}
    # no mutually-acceptable pair with both sides unmatched (a would have
    # proposed to b, and a free b never rejects an acceptable proposal)
    matched_a = {a for a, _ in matches}
    matched_b = {b for _, b in matches}
    for a in schema_a:
        for b, _ in conf_a.get(a, []):
            if a not in matched_a and b not in matched_b and b != "none of the options":
                if a in {c for c, _ in conf_b.get(b, [])}:
                    raise AssertionError(f"free mutually-acceptable pair {(a, b)}")


@settings(max_examples=40, deadline=None)
@given(instances())
def test_rounds_are_cumulative_and_bounded(inst):
    schema_a, schema_b, conf_a, conf_b = inst
    rounds = stable_match_case(schema_a, schema_b, conf_a, conf_b, top_k=4)
    assert len(rounds) <= 4
    for earlier, later in zip(rounds, rounds[1:]):
        assert set(earlier) <= set(later)
        assert len(later) > len(earlier)  # a round with no new match stops


# -- connected components vs a reference union-find ---------------------------


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    return {n: find(n) for n in parent}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_connected_components_matches_union_find(spark, seed):
    """Randomized (seeded) graphs vs a reference union-find: one Spark CC
    run per graph keeps the check cheap while covering chains, cycles, and
    forests."""
    import random

    from scalable_data_integration_with_llms_spark.operators.dedup import connected_components

    rng = random.Random(seed)
    edges = []
    while len(edges) < 40:
        a, b = rng.randrange(40), rng.randrange(40)
        if a != b:
            edges.append((a, b))
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r.doc: r.cluster_id for r in connected_components(pairs).collect()}
    assert got == _uf_components(edges)
