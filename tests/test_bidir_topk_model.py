"""Differential tests for J3 (bidirectional merge) and W2 (top-k per query
attribute): many random preference instances in ONE DataFrame, compared
against a pure-Python model that mirrors the reference's semantics
(ask_StableMatcher.py:131-226 save_avg_logits: missing side -> 0, zero
products dropped; eval_MatchMaker.py:227-244 get_top_k: first k per
attribute, all when shorter)."""

import random

import pytest

from scalable_data_integration_with_llms_spark.operators.candidates import (
    NO_MATCH,
    bidirectional_merge,
    top_k_per_query,
)

SEED = 74007
N_CASES = 30


def _random_instances(seed: int):
    """Rows (case_id, side, query_attr, candidate_attr, score_milli) for
    N_CASES random cases: attr universes of 1-5 per side, each direction's
    candidate list an arbitrary SUBSET (so one-sided pairs exist), plus
    no-match rows the merge must drop."""
    rng = random.Random(seed)
    rows = []
    for ci in range(N_CASES):
        cid = f"case{ci}"
        srcs = [f"s{i}" for i in range(rng.randint(1, 5))]
        tgts = [f"t{i}" for i in range(rng.randint(1, 5))]
        for t in tgts:  # n_to_one: target attrs query source candidates
            for s in srcs:
                if rng.random() < 0.7:
                    rows.append((cid, "n_to_one", t, s, rng.randint(0, 1_250_000)))
            rows.append((cid, "n_to_one", t, NO_MATCH, 100_000))
        for s in srcs:  # one_to_n: source attrs query target candidates
            for t in tgts:
                if rng.random() < 0.7:
                    rows.append((cid, "one_to_n", s, t, rng.randint(0, 1_250_000)))
            rows.append((cid, "one_to_n", s, NO_MATCH, 100_000))
    return rows


def _model_merge(rows, agg):
    fwd, bwd = {}, {}
    for cid, side, q, c, m in rows:
        if c == NO_MATCH:
            continue
        if side == "n_to_one":
            fwd[(cid, c, q)] = m  # src=candidate, tgt=query
        else:
            bwd[(cid, q, c)] = m  # src=query, tgt=candidate
    out = {}
    for key in set(fwd) | set(bwd):
        f, b = fwd.get(key, 0), bwd.get(key, 0)
        score = (f * b) / 1.0e12 if agg == "multiply" else (f + b) / 2.0e6
        if score != 0:
            out[key] = (f, b, score)
    return out


def _model_top_k(merged, k):
    by_tgt = {}
    for (cid, s, t), (_, _, score) in merged.items():
        by_tgt.setdefault((cid, t), []).append((s, score))
    kept = set()
    for (cid, t), lst in by_tgt.items():
        lst.sort(key=lambda p: (-p[1], p[0]))
        for s, _ in lst[:k]:  # shorter lists keep everything
            kept.add((cid, s, t))
    return kept


@pytest.mark.parametrize("agg", ["multiply", "avg"])
def test_bidirectional_merge_matches_model(spark, agg):
    rows = _random_instances(SEED)
    prefs = spark.createDataFrame(
        rows,
        "case_id string, side string, query_attr string, "
        "candidate_attr string, score_milli bigint",
    )
    got = {
        (r.case_id, r.src, r.tgt): (r.fwd_milli, r.bwd_milli, r.score)
        for r in bidirectional_merge(prefs, agg=agg).collect()
    }
    assert got == _model_merge(rows, agg)


def test_top_k_matches_model_for_all_k(spark):
    rows = _random_instances(SEED + 1)
    prefs = spark.createDataFrame(
        rows,
        "case_id string, side string, query_attr string, "
        "candidate_attr string, score_milli bigint",
    )
    merged_df = bidirectional_merge(prefs, agg="avg")
    merged = _model_merge(rows, "avg")
    for k in (1, 2, 3, 5):
        got = {
            (r.case_id, r.src, r.tgt)
            for r in top_k_per_query(merged_df, k).collect()
        }
        assert got == _model_top_k(merged, k), f"k={k}"
