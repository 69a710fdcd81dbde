"""Bucketized range (interval) join — the scale-safe form of the theta join
``l.key = r.key AND r.t ∈ [l.t + lo, l.t + hi)``.

A naive theta join degenerates to a per-key Cartesian product (Spark plans it
as BroadcastNestedLoop or a key-equi join with a residual filter whose
fan-out is |matches-per-key|²).  Bucketizing quantizes time into fixed
buckets: the left side explodes to the few candidate buckets its window
spans, both sides equi-join on (key, bucket) — a plain shuffled hash join
with bounded fan-out ⌈(hi−lo)/bucket⌉+1 — and the exact interval predicate
filters the survivors.  This is the standard range-join optimization
(Databricks' range-join hints, Flink interval joins) expressed with stock
DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "__rj_bucket"


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    on_left: str,
    on_right: str,
    t_left: str,
    t_right: str,
    lo_s: float,
    hi_s: float,
    bucket_s: int = 3600,
) -> DataFrame:
    """Inner-join rows where keys match and ``t_right`` falls in
    ``[t_left + lo_s, t_left + hi_s)`` (seconds).  Returns all columns of
    both inputs.  Timestamps compare at microsecond precision."""
    lo_us, hi_us = int(lo_s * 1_000_000), int(hi_s * 1_000_000)
    bucket_us = bucket_s * 1_000_000

    lt = F.unix_micros(F.col(t_left))
    rt = F.unix_micros(F.col(t_right))
    l = left.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.floor((lt + lo_us) / bucket_us),
                F.floor((lt + hi_us) / bucket_us),
            )
        ),
    )
    r = right.withColumn(_BUCKET, F.floor(rt / bucket_us))
    joined = l.join(
        r, (F.col(on_left) == F.col(on_right)) & (l[_BUCKET] == r[_BUCKET])
    )
    lt_j = F.unix_micros(F.col(t_left))
    rt_j = F.unix_micros(F.col(t_right))
    return joined.filter((rt_j >= lt_j + lo_us) & (rt_j < lt_j + hi_us)).drop(_BUCKET)
