"""Ordered-funnel operator: which users completed stage k strictly after
stage k-1, for an arbitrary stage chain.

Semantics (pinned by the property test in tests/test_funnel_properties.py):
an event qualifies for stage i > 0 iff its type matches AND the earliest
*qualifying* stage-(i-1) timestamp is strictly earlier.  Equal timestamps
never chain (strict ``<``), which also makes the window formulation
deterministic under timestamp ties regardless of within-ts row order.

Plan shape: ONE shuffle+sort per user feeds every stage's running-minimum
window and the final per-user aggregate — vs one events-table shuffle per
stage for the join formulation (at k stages: k-1 full shuffles saved).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def funnel_user_flags(
    df: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user 0/1 completion flags ``did_0 .. did_{k-1}`` for the stage
    chain."""
    # first window breaks ts ties by event id for a deterministic frame;
    # later stages order by ts alone — the strict `<` predicate makes
    # same-ts rows irrelevant, so tie order cannot change the result
    w_first = (
        W.partitionBy(user_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    w_rest = (
        W.partitionBy(user_col).orderBy(ts_col).rowsBetween(W.unboundedPreceding, -1)
    )
    qualify = F.col(type_col) == stages[0]
    qualifies = [qualify]
    cur = df
    for i, stage in enumerate(stages[1:], start=1):
        prior_col = f"_prior_{i - 1}"
        cur = cur.withColumn(
            prior_col,
            F.min(F.when(qualifies[-1], F.col(ts_col))).over(
                w_first if i == 1 else w_rest
            ),
        )
        qualify = (F.col(type_col) == stage) & (F.col(prior_col) < F.col(ts_col))
        qualifies.append(qualify)
    return cur.groupBy(user_col).agg(
        *[
            F.max(F.when(q, 1).otherwise(0)).alias(f"did_{i}")
            for i, q in enumerate(qualifies)
        ]
    )
