"""Many-to-many stable matching (SURVEY §2.9 U6; reference
``Stable Schema Matching/stable_match.py:27-222``).

Semantics preserved exactly (SURVEY §7 "hard parts"):

* proposal order is schema-A order; each free A pops its best remaining
  candidate (``stable_match.py:104-161``);
* acceptance requires mutual acceptability (A must appear in B's preference
  list) — ``:128``;
* displacement only on strictly better score; ``is_better_match`` returns
  False on ties or missing scores (``:4-7``);
* after each round, every *cumulative* match is pruned from the acceptable
  lists and from pristine temp copies of both preference sides, which then
  become the next round's working lists (``:173-198``);
* ``rounds[r-1]`` records a deep copy of cumulative M (``:219``); loop ends
  at top_k rounds or the first round with no new match.

Spark shape: per-case preference lists are tiny (≤ ~40 attrs), so the
algorithm runs as ``groupBy(case_id).applyInPandas`` — scale-out is across
cases (a 100 TB matching corpus is millions of cases, each independent).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .candidates import NO_MATCH

_OUT_SCHEMA = "case_id string, round int, src string, tgt string"


def _is_better(s1: float | None, s2: float | None) -> bool:
    # ties and missing scores never displace (stable_match.py:4-7)
    if s1 is None or s2 is None:
        return False
    return s1 > s2


def stable_match_case(
    schema_a: list[str],
    schema_b: list[str],
    conf_a: dict[str, list[tuple[str, float]]],
    conf_b: dict[str, list[tuple[str, float]]],
    top_k: int = 10,
    no_match: str = NO_MATCH,
) -> list[list[tuple[str, str]]]:
    """One case's rounds: element r-1 is the cumulative match set after
    round r.  ``conf_*`` lists must be sorted best-first."""
    pref_a = {a: [(b, s) for b, s in conf_a.get(a, []) if b != no_match] for a in schema_a}
    pref_b = {b: [(a, s) for a, s in conf_b.get(b, []) if a != no_match] for b in schema_b}
    acceptable_a = {a: [b for b, _ in pref_a[a]] for a in schema_a}
    acceptable_b = {b: [a for a, _ in pref_b[b]] for b in schema_b}
    temp_a = {a: list(v) for a, v in pref_a.items()}
    temp_b = {b: list(v) for b, v in pref_b.items()}
    work_a = {a: list(v) for a, v in pref_a.items()}
    work_b = {b: list(v) for b, v in pref_b.items()}

    def score_of(prefs: list[tuple[str, float]], attr: str) -> float | None:
        for cand, s in prefs:
            if cand == attr:
                return s
        return None

    M: list[tuple[str, str]] = []
    rounds: list[list[tuple[str, str]]] = []
    r = 1
    while r <= top_k:
        match_made = False
        free_a = {a: True for a in schema_a}
        free_b = {b: True for b in schema_b}
        while any(free_a[a] and work_a[a] for a in schema_a):
            for a in schema_a:
                if not free_a[a] or not work_a[a]:
                    continue
                b = work_a[a].pop(0)[0]
                if b not in acceptable_b or a not in acceptable_b[b]:
                    continue
                if b in free_b and free_b[b]:
                    M.append((a, b))
                    match_made = True
                    free_b[b] = False
                    free_a[a] = False
                else:
                    current = next(((a1, b1) for a1, b1 in M if b1 == b), None)
                    if current and _is_better(
                        score_of(work_b[b], a), score_of(work_b[b], current[0])
                    ):
                        M.remove((current[0], b))
                        M.append((a, b))
                        match_made = True
                        free_b[b] = False
                        free_a[a] = False
                        free_a[current[0]] = True
        for a_, b_ in M:
            if b_ in acceptable_a.get(a_, []):
                acceptable_a[a_].remove(b_)
            if a_ in acceptable_b.get(b_, []):
                acceptable_b[b_].remove(a_)
            temp_b[b_] = [p for p in temp_b[b_] if p[0] != a_]
            temp_a[a_] = [p for p in temp_a[a_] if p[0] != b_]
        work_a = {a: list(v) for a, v in temp_a.items()}
        work_b = {b: list(v) for b, v in temp_b.items()}
        if not match_made:
            break
        rounds.append(list(M))
        r += 1
    return rounds


def stable_match(preferences: DataFrame, top_k: int = 10) -> DataFrame:
    """Distributed stable matching over a long-form preference frame
    ``(case_id, side, query_attr, candidate_attr, score, rank)`` with side
    ``one_to_n`` = schema-A (source) queries and ``n_to_one`` = schema-B
    (target) queries.  Emits ``(case_id, round, src, tgt)`` — round r rows
    are the *cumulative* match set after round r (W3 round expansion reads
    ``round = least(r, max_round)``)."""

    def run(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        case_id = key[0]
        a_rows = pdf[pdf.side == "one_to_n"].sort_values(["query_attr", "rank"])
        b_rows = pdf[pdf.side == "n_to_one"].sort_values(["query_attr", "rank"])
        schema_a = sorted(a_rows.query_attr.unique())
        schema_b = sorted(b_rows.query_attr.unique())
        conf_a = {
            q: list(zip(g.candidate_attr, g.score))
            for q, g in a_rows.groupby("query_attr", sort=True)
        }
        conf_b = {
            q: list(zip(g.candidate_attr, g.score))
            for q, g in b_rows.groupby("query_attr", sort=True)
        }
        rounds = stable_match_case(schema_a, schema_b, conf_a, conf_b, top_k=top_k)
        out = [
            (case_id, r + 1, a, b)
            for r, matches in enumerate(rounds)
            for a, b in matches
        ]
        return pd.DataFrame(out, columns=["case_id", "round", "src", "tgt"])

    return (
        preferences.select("case_id", "side", "query_attr", "candidate_attr", "score", "rank")
        .groupBy("case_id")
        .applyInPandas(run, _OUT_SCHEMA)
    )


def round_r(matches: DataFrame, r: int) -> DataFrame:
    """W3: the round-r match set; cases with fewer rounds fall back to their
    last round (``ask_StableMatcher.py:374-447``).

    max_round comes from a window over the case key, NOT an aggregate
    self-join: the join form executes the upstream plan twice — and when
    ``matches`` is the applyInPandas stable matcher, that doubles the most
    expensive Python stage of the pipeline (caught by the round-6 plan
    audit of q_ehr_matching_f1).  The window adds no exchange either,
    because the matcher's groupBy already partitioned by case_id."""
    from pyspark.sql import Window as W

    last = F.max("round").over(W.partitionBy("case_id"))
    return (
        matches.withColumn("max_round", last)
        .filter(F.col("round") == F.least(F.lit(r), F.col("max_round")))
        .select("case_id", "src", "tgt")
    )
