"""Surrogate-key assignment (SURVEY §2.9 U3 ``map_pk``; S6 surrogate IDs).

The reference's ``map_pk`` is a *stateful* SQLite scalar UDF mapping each
distinct value to a dense first-seen index (``DatabaseManager.py:84-95``) —
first-seen order is insertion order, which has no distributed analogue.  The
engine's declared contract (SURVEY §7 hard part 3): **rank by value**, which
is deterministic on any cluster.  ``dense_rank() - 1`` over the value order
reproduces the dense-index property exactly.

At 100 TB this is one shuffle on the value column; for skewed key spaces use
the two-phase variant (distinct → rank → broadcast/shuffle join back), which
ranks only distinct values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def map_pk(df: DataFrame, value_col: str, out_col: str = "pk_id") -> DataFrame:
    """Dense 0-based surrogate id per distinct value, rank-by-value order.

    The unpartitioned rank window implements the declared map_pk contract on
    DIMENSION-sized inputs (the reference re-keys lookup tables, not facts —
    ``DatabaseManager.py:84-95``); it moves the frame to one task, so the
    input must stay modest.  For anything fact-sized use :func:`map_pk_dim`,
    which ranks only the distinct-value dimension and joins back."""
    win = W.orderBy(F.col(value_col))
    return df.withColumn(out_col, (F.dense_rank().over(win) - 1).cast("bigint"))


def map_pk_dim(df: DataFrame, value_col: str, out_col: str = "pk_id") -> DataFrame:
    """Scale path: the distinct ``(value, id)`` dimension, computed on the
    distinct set only; join it back (broadcast when small) instead of running
    a global window over every row."""
    distinct = df.select(value_col).distinct()
    win = W.orderBy(F.col(value_col))
    return distinct.withColumn(out_col, (F.dense_rank().over(win) - 1).cast("bigint"))
