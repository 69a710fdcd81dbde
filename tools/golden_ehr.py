#!/usr/bin/env python
"""Generate the EHR end-to-end golden fixture (``sdi/fixtures/ehr_golden.py``).

Pure-Python twin of the mock matching pipeline, run over the committed
``fixtures/ehr_dataset.json`` (the reference's own 52-case MIMIC-III → OMOP
benchmark, ``Stable Schema Matching/data/ehr/ehr_dataset.json``):

    candidates (both directions + no-match) → levenshtein milli-scores →
    rank + list-normalize → Gale–Shapley rounds → round-1 match set

Everything up to stable matching is implemented HERE from the documented
formulas (stdlib json + its own DP levenshtein), independent of the Spark
operators; the Gale–Shapley step reuses ``stable_match_case`` — the pure-
Python round engine whose semantics are pinned by unit fixtures and
hypothesis property tests (the same precedent as the q_stable_matching
golden).  The emitted fixture is what the q_ehr_* oracles embed as VALUES.

    python tools/golden_ehr.py        # rewrites fixtures/ehr_golden.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scalable_data_integration_with_llms_spark.operators.stable_matching import (  # noqa: E402
    stable_match_case,
)

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scalable_data_integration_with_llms_spark",
)
DATASETS = {
    "ehr": os.path.join(PKG, "fixtures", "ehr_dataset.json"),
    "synthea": os.path.join(PKG, "fixtures", "synthea_dataset.json"),
}
OUT = os.path.join(PKG, "fixtures", "ehr_golden.py")

NO_MATCH = "none of the options"
NO_MATCH_MILLI = 100_000
TOP_K = 5


def levenshtein(a: str, b: str) -> int:
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def strip_prefix(name: str) -> str:
    if len(name) > 2 and name[1] == "_" and name[0].isalpha():
        return name[2:]
    return name


def supertype(t: str) -> str:
    s = (t or "").strip().lower()
    if s.startswith(("int", "bigint", "smallint", "tinyint", "serial")):
        return "INTEGER"
    if s.startswith(("float", "real", "double", "numeric", "decimal")):
        return "DOUBLE"
    return "TEXT"


def score_milli(q: str, qt: str, c: str, ct: str) -> int:
    if c == NO_MATCH:
        return NO_MATCH_MILLI
    raw = 1.0 / (1.0 + levenshtein(strip_prefix(q.lower()), strip_prefix(c.lower())))
    if supertype(qt) == supertype(ct):
        raw += 0.25
    return int(round(raw * 1_000_000))


def ranked_lists(queries, candidates):
    """Per query attr: best-first (milli desc, name asc) candidate list with
    list-normalized scores (the no-match row participates in the sum)."""
    out = {}
    for q, qt in queries:
        cands = [(c, score_milli(q, qt, c, ct)) for c, ct in candidates] + [
            (NO_MATCH, NO_MATCH_MILLI)
        ]
        cands.sort(key=lambda x: (-x[1], x[0]))
        total = sum(m for _, m in cands)
        out[q] = [(c, m / total) for c, m in cands]
    return out


def catalog_rows(dataset_path: str):
    """(case_id, side, col_name_lower, col_type) — the independently parsed
    catalog the fully-derived ensemble oracle embeds as VALUES."""
    with open(dataset_path) as f:
        cases = json.load(f)
    rows = []
    for case in cases:
        for side in ("source", "target"):
            for c in case[f"{side}_schema"]["columns"]:
                rows.append((case["id"], side, c["name"].lower(), c["type"]))
    return rows


def pipeline(dataset_path: str):
    with open(dataset_path) as f:
        cases = json.load(f)

    round1: list[tuple[str, str, str]] = []
    gold: list[tuple[str, str, str]] = []
    all_rounds: list[tuple[str, int, str, str]] = []
    for case in cases:
        cid = case["id"]
        src = [(c["name"].lower(), c["type"]) for c in case["source_schema"]["columns"]]
        tgt = [(c["name"].lower(), c["type"]) for c in case["target_schema"]["columns"]]
        seen = set()
        for s, t in case["gold_mapping"]:
            pair = (cid, s.lower(), t.lower())
            if pair not in seen:
                seen.add(pair)
                gold.append(pair)
        # one_to_n: source attrs query target candidates (schema A);
        # n_to_one: target attrs query source candidates (schema B)
        conf_a = ranked_lists(src, tgt)
        conf_b = ranked_lists(tgt, src)
        schema_a = sorted(a for a, _ in src)
        schema_b = sorted(b for b, _ in tgt)
        rounds = stable_match_case(
            schema_a, schema_b, conf_a, conf_b, top_k=TOP_K, no_match=NO_MATCH
        )
        for a, b in (rounds[0] if rounds else []):
            round1.append((cid, a, b))
        for r, matches in enumerate(rounds):
            for a, b in matches:
                all_rounds.append((cid, r + 1, a, b))

    round1.sort()
    gold.sort()
    all_rounds.sort()
    return round1, gold, all_rounds


def main() -> None:
    with open(OUT, "w") as f:
        f.write(
            '"""GENERATED by tools/golden_ehr.py — do not edit by hand.\n\n'
            "Round-1 stable-match sets and gold pairs for the committed real\n"
            "matching benchmarks (fixtures/{ehr,synthea}_dataset.json),\n"
            "computed by the pure-Python pipeline twin.  Embedded as VALUES\n"
            "by the q_ehr_* / q_synthea_* oracles.\n"
            '"""\n\n'
        )
        for name, path in DATASETS.items():
            round1, gold, all_rounds = pipeline(path)
            up = name.upper()
            if name == "ehr":
                f.write(f"ROUND1: list[tuple[str, str, str]] = {round1!r}\n\n")
                f.write(f"GOLD: list[tuple[str, str, str]] = {gold!r}\n\n")
                # full per-round match sets (case_id, round, src, tgt) — the
                # oracle base for the W3 round-r extraction on real data
                f.write(f"ROUNDS: list[tuple[str, int, str, str]] = {all_rounds!r}\n\n")
            else:
                f.write(f"{up}_ROUND1: list[tuple[str, str, str]] = {round1!r}\n\n")
                f.write(f"{up}_GOLD: list[tuple[str, str, str]] = {gold!r}\n\n")
            print(
                f"{name}: {len(round1)} round-1 matches, {len(gold)} gold pairs, "
                f"{len(all_rounds)} round rows"
            )
        cat = catalog_rows(DATASETS["ehr"])
        f.write(
            "# (case_id, side, col_name_lower, col_type) — independent parse\n"
            f"EHR_CATALOG: list[tuple[str, str, str, str]] = {cat!r}\n"
        )
        print(f"ehr catalog rows: {len(cat)}")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
