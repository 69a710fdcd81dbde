"""Distributed stable matching: the reference's round engine
(``stable_match.py:27-222``) as iterative DataFrame joins — for the case
too large for one task.

``operators/stable_matching.py`` scales ACROSS cases (grouped-map pandas,
one case per group).  This module answers the other axis: ONE case whose
preference lists dwarf a task — schema-A state is a (case, attr) row with
an array candidate list and an integer pointer, proposals/acceptances are
joins keyed by (case, b), and every inner iteration is a parallel
deferred-acceptance step.  All cases still process simultaneously in the
same frames, so the operator subsumes the per-case path's parallelism too.

Scheduling emulation (how parallel steps reproduce the reference's
sequential pass semantics):

* Each iteration, every free A with candidates left proposes to its next
  candidate and its pointer advances (valid or not) — the reference pops
  unconditionally (``:117-121``).
* Acceptance per B ranks the incumbent and the new valid proposers:
  - B already matched in a PREVIOUS round: the reference's displacement
    lookup resolves to the oldest cumulative match, whose score was pruned
    from ``work_b`` — ``score_of`` returns None and ``is_better`` is False
    (``:4-7,128-141``) — so the FIRST arrival this round wins and is never
    displaced.  Ordering (arrival ASC, a_pos ASC) reproduces that: the
    incumbent's earlier arrival makes it sticky.
  - Fresh B: strictly-better score displaces; ties keep the incumbent;
    simultaneous proposers tie-break by schema-A position (the reference's
    ``for a in schema_a`` pass order).  Ordering (score DESC, arrival ASC,
    a_pos ASC).
* A round ends at the proposal fixpoint; cases making no new match stop
  recording rounds (``match_made`` ``:210-218``).

Parity with the per-case implementation over the full static case set is
asserted in tests (same 302 golden rows), and a hypothesis property test
checks random instances; the one scheduling regime the emulation cannot
reproduce in general is a mid-pass displacement cascade racing a same-pass
lower-priority proposal to a seasoned B — not observed on the test
surface, and documented here rather than hidden.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .candidates import NO_MATCH
from ..functions.localframe import local_df

_M_SCHEMA = "case_id string, a string, b string"


def stable_match_distributed(preferences: DataFrame, top_k: int = 10) -> DataFrame:
    """Same contract as ``stable_matching.stable_match``: long-form
    ``(case_id, side, query_attr, candidate_attr, score, rank)`` in,
    cumulative ``(case_id, round, src, tgt)`` out."""
    spark = preferences.sparkSession

    a_rows = preferences.filter(
        (F.col("side") == "one_to_n") & (F.col("candidate_attr") != NO_MATCH)
    )
    a_lists = (
        a_rows.groupBy("case_id", F.col("query_attr").alias("a"))
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("rank", F.col("candidate_attr").alias("b")))
                ),
                lambda s: s["b"],
            ).alias("cands")
        )
        .withColumn(
            "a_pos",
            F.row_number().over(W.partitionBy("case_id").orderBy("a")),
        )
    )
    # every A appears even with an empty list (schema_a is the full attr set)
    acc_b = (
        preferences.filter(
            (F.col("side") == "n_to_one") & (F.col("candidate_attr") != NO_MATCH)
        )
        .select(
            "case_id",
            F.col("query_attr").alias("b"),
            F.col("candidate_attr").alias("a"),
            F.col("score").alias("score_b"),
        )
        .localCheckpoint()
    )
    a_lists = a_lists.localCheckpoint()

    M = local_df(spark, [], _M_SCHEMA)
    out_frames: list[DataFrame] = []
    active = None  # None = all cases active

    for r in range(1, top_k + 1):
        # round-start pruning: cumulative matches leave both sides' lists
        partners = M.groupBy("case_id", "a").agg(F.collect_set("b").alias("done"))
        work = (
            a_lists.join(partners, ["case_id", "a"], "left")
            .withColumn(
                "cands_r",
                F.when(
                    F.col("done").isNotNull(),
                    F.filter(
                        F.col("cands"),
                        lambda b: ~F.array_contains(F.col("done"), b),
                    ),
                ).otherwise(F.col("cands")),
            )
            .select("case_id", "a", "a_pos", "cands_r")
        )
        if active is not None:
            work = work.join(active, "case_id", "left_semi")
        acc_r = acc_b.join(M, ["case_id", "b", "a"], "left_anti").localCheckpoint()
        seasoned = M.select("case_id", "b").distinct().withColumn("szn", F.lit(1))

        state = work.withColumn("ptr", F.lit(0)).localCheckpoint()
        holders = local_df(spark, 
            [], "case_id string, b string, a string, a_pos int, score_b double, arrival int"
        )
        it = 0
        while True:
            it += 1
            held = holders.select("case_id", "a").withColumn("h", F.lit(1))
            props = (
                state.join(held, ["case_id", "a"], "left_anti")
                .filter(F.col("ptr") < F.size("cands_r"))
                .select(
                    "case_id",
                    "a",
                    "a_pos",
                    F.element_at(F.col("cands_r"), F.col("ptr") + 1).alias("b"),
                )
                .localCheckpoint()
            )
            if props.count() == 0:
                break
            # pointer advances for every proposal, valid or not
            state = (
                state.join(
                    props.select("case_id", "a").withColumn("p", F.lit(1)),
                    ["case_id", "a"],
                    "left",
                )
                .withColumn(
                    "ptr", F.col("ptr") + F.when(F.col("p").isNotNull(), 1).otherwise(0)
                )
                .drop("p")
                .localCheckpoint()
            )
            valid = props.join(acc_r, ["case_id", "b", "a"]).withColumn(
                "arrival", F.lit(it)
            )
            contenders = holders.unionByName(
                valid.select("case_id", "b", "a", "a_pos", "score_b", "arrival")
            ).join(seasoned, ["case_id", "b"], "left")
            order_key = F.when(F.col("szn").isNotNull(), F.lit(0.0)).otherwise(
                -F.col("score_b")
            )
            win = W.partitionBy("case_id", "b").orderBy(
                order_key.asc(), F.col("arrival").asc(), F.col("a_pos").asc()
            )
            holders = (
                contenders.withColumn("rk", F.row_number().over(win))
                .filter(F.col("rk") == 1)
                .select("case_id", "b", "a", "a_pos", "score_b", "arrival")
                .localCheckpoint()
            )

        new_matches = holders.select("case_id", "a", "b")
        active = new_matches.select("case_id").distinct().localCheckpoint()
        if active.limit(1).count() == 0:
            break
        M = M.unionByName(new_matches).localCheckpoint()
        out_frames.append(
            M.join(active, "case_id", "left_semi").select(
                "case_id",
                F.lit(r).alias("round"),
                F.col("a").alias("src"),
                F.col("b").alias("tgt"),
            )
        )

    if not out_frames:
        return local_df(spark, [], "case_id string, round int, src string, tgt string")
    out = out_frames[0]
    for f in out_frames[1:]:
        out = out.unionByName(f)
    return out
