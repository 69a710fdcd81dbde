"""As-of (point-in-time) join — a custom operator Spark's DataFrame API
lacks (pandas has merge_asof; the reference is batch pandas/SQLite and has no
as-of either, so this is additive scale surface per SURVEY §2.10/§7 step 11).

Semantics: for each left row, attach the payload of the right row with the
greatest ``t_right <= t_left`` for the same key; ties on ``t_right`` broken
by the greatest ``tiebreak`` value (deterministic).  Left rows with no prior
right row keep NULL payload (left-join semantics).

Implementation is the scalable union-window formulation, NOT the naive
candidate join: tag both inputs, union them, and carry the last-seen right
payload forward with ``last(col, ignoreNulls)`` over a
(key)-partitioned, (t, side, tiebreak)-ordered running frame.  Cost is ONE
shuffle of |left| + |right| rows on the key — no per-left-row candidate
explosion (the naive join is |left| × avg-matches-per-key and skew-fragile).
Right rows sort before left rows at equal t (side 0 < 1), giving inclusive
``<=`` semantics; ascending tiebreak makes the *last* same-t right row the
max-tiebreak row.  All payload columns are non-null on right rows together,
so ``last(..., ignoreNulls)`` reads every payload column from the same row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_T = "__asof_t"
_KEY = "__asof_key"
_TIE = "__asof_tie"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on_left: str,
    on_right: str,
    t_left: str,
    t_right: str,
    payload: list[str],
    tiebreak: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Point-in-time join; returns all ``left`` columns plus ``payload``
    columns from the matched right row (NULL when no right row matches).

    ``direction="backward"`` (default) matches the greatest ``t_right <=
    t_left``; ``"forward"`` matches the smallest ``t_right >= t_left`` (the
    "next event" variant) — same single-shuffle union-window plan, with the
    time traversal reversed."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    tie_col = F.col(tiebreak) if tiebreak else F.lit(0)
    r = right.select(
        F.col(on_right).alias(_KEY),
        F.col(t_right).alias(_T),
        F.lit(0).alias(_SIDE),
        tie_col.alias(_TIE),
        *[F.col(c) for c in payload],
    )
    l = left.select(
        F.col(on_left).alias(_KEY),
        F.col(t_left).alias(_T),
        F.lit(1).alias(_SIDE),
        F.lit(None).alias(_TIE),
        *left.columns,
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    # backward: scan time ascending, right-before-left at equal t gives the
    # inclusive <=; the last-seen right row is the max (t, tiebreak) match.
    # forward: scan time DEscending — the last-seen right row is then the
    # MINIMUM t_right >= t_left; right rows still sort before left at equal
    # t (inclusive >=), and ascending tiebreak keeps max-tiebreak last
    # within a same-t run.
    t_order = F.asc(_T) if direction == "backward" else F.desc(_T)
    win = (
        W.partitionBy(_KEY)
        .orderBy(t_order, F.asc(_SIDE), F.asc_nulls_first(_TIE))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    filled = unioned.select(
        "*", *[F.last(c, ignorenulls=True).over(win).alias(f"__asof_{c}") for c in payload]
    )
    return filled.filter(F.col(_SIDE) == 1).select(
        *left.columns, *[F.col(f"__asof_{c}").alias(c) for c in payload]
    )
