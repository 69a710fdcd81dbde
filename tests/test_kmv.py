"""KMV (k-minimum-values) sketch properties beyond the oracle rows:
the n<k exact fallback, tie-break determinism, tau-prune losslessness
(the pruned k-mins equal the unpruned k-mins), and the estimator's
relative-error envelope on real data."""

from __future__ import annotations

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from scalable_data_integration_with_llms_spark.operators.sketch import (
    KMV_K,
    kmv_estimate_col,
    kmv_k_mins,
)
from scalable_data_integration_with_llms_spark.queries import QUERIES

SF = "/root/testdata/sf0.01"


def _estimates(df, k=KMV_K):
    mins = kmv_k_mins(df, "key", ["g"], k=k)
    return {
        r.g: (r.exact, r.est)
        for r in mins.groupBy("g", "exact_distinct")
        .agg(F.max(F.when(F.col("rn") == k, F.col("h"))).alias("h_k"))
        .select(
            "g",
            F.col("exact_distinct").alias("exact"),
            kmv_estimate_col(k).alias("est"),
        )
        .collect()
    }


def test_kmv_small_group_exact_fallback(spark):
    """Groups with fewer than k distinct keys report the exact count (the
    sketch holds every hash)."""
    rows = [("tiny", f"k{i}") for i in range(3)] + [
        ("big", f"k{i}") for i in range(40)
    ]
    df = spark.createDataFrame(rows, "g string, key string")
    est = _estimates(df)
    assert est["tiny"] == (3, 3)
    exact, e = est["big"]
    assert exact == 40 and e > 0


def test_kmv_duplicates_do_not_inflate(spark):
    """The sketch sees DISTINCT keys: replicating every row 5x leaves both
    arms unchanged."""
    base = [("g", f"k{i}") for i in range(60)]
    df1 = spark.createDataFrame(base, "g string, key string")
    df5 = spark.createDataFrame(base * 5, "g string, key string")
    assert _estimates(df1) == _estimates(df5)


def test_kmv_prune_is_lossless(spark):
    """The tau-pruned k smallest hashes equal the k smallest of the FULL
    hash set (the prune can only drop hashes above the k-th min)."""
    df = spark.createDataFrame(
        [("g", f"key{i}") for i in range(500)], "g string, key string"
    )
    mins = kmv_k_mins(df, "key", ["g"]).orderBy("rn").collect()
    full = (
        df.select(
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.lit("kmv"), F.col("key"))), 1, 15
                ),
                16,
                10,
            )
            .cast("bigint")
            .alias("h")
        )
        .distinct()
        .orderBy("h")
        .limit(KMV_K)
        .collect()
    )
    assert [r.h for r in mins] == [r.h for r in full]
    assert [r.rn for r in mins] == list(range(1, KMV_K + 1))


def test_kmv_estimate_error_envelope(spark):
    """On the events table the estimate lands within the standard KMV
    envelope (~1/sqrt(k-1) relative error, 3x slack) of exact."""
    rows = QUERIES["q_kmv_distinct"](spark, SF).collect()
    assert rows
    for r in rows:
        if r.exact_users >= KMV_K:
            rel = abs(r.kmv_users - r.exact_users) / r.exact_users
            assert rel <= 3.0 / (KMV_K - 1) ** 0.5, (r.event_type, rel)


def test_kmv_set_ops_consistency(spark):
    """Set-ops row: estimates positive, intersection <= union on both arms,
    and the sketch intersection within the union envelope."""
    r = QUERIES["q_kmv_set_ops"](spark, SF).collect()[0]
    assert r.exact_intersection <= r.exact_union
    assert r.kmv_intersection <= r.kmv_union
    assert r.kmv_union > 0
    rel = abs(r.kmv_union - r.exact_union) / r.exact_union
    assert rel <= 3.0 / (KMV_K - 1) ** 0.5


def test_kmv_partitioning_invariance(spark):
    """Estimates are pure functions of the key set: repartitioning the
    input never changes the sketch (the determinism discipline F.rand
    would break)."""
    df = spark.createDataFrame(
        [("g", f"key{i}") for i in range(300)], "g string, key string"
    )
    assert _estimates(df.repartition(1)) == _estimates(df.repartition(13))


# -- streaming KMV gate (streaming/kmv_gate.py) -------------------------------


class _FakeState:
    def __init__(self):
        self.exists = False
        self.hasTimedOut = False
        self.get = None

    def update(self, t):
        self.exists = True
        self.get = t


def _fold_all(chunks_per_batch):
    """Run _kmv_fold over successive micro-batches (each an iterator of
    pandas chunks) against one fake state; return the final state mins."""
    import pandas as pd

    from scalable_data_integration_with_llms_spark.streaming.kmv_gate import _kmv_fold

    st = _FakeState()
    for chunks in chunks_per_batch:
        list(_kmv_fold(("click", 3), (pd.DataFrame({"h": c}) for c in chunks), st))
    return list(st.get[0])


def test_kmv_gate_chunk_incremental_equals_concat():
    """Feeding the fold 3 Arrow chunks equals feeding one concatenated
    chunk (the O(chunk + k) incremental path loses nothing)."""
    data = [982, 14, 7, 500, 14, 3, 999, 42, 8, 77, 123, 6, 2, 55]
    one = _fold_all([[data]])
    three = _fold_all([[data[:5], data[5:9], data[9:]]])
    assert one == three == sorted(set(data))[:8]


def test_kmv_gate_merge_is_arrival_order_independent():
    """k-mins merge associativity: any micro-batch split and order yields
    the same final state — the determinism a task retry or a re-batched
    feed must not break."""
    data = list(range(100, 0, -7)) + [3, 9, 1, 88]
    splits = [
        [[data]],
        [[data[:4]], [data[4:]]],
        [[data[10:]], [data[:10]]],
        [[data[i::3]] for i in range(3)],
    ]
    results = {tuple(_fold_all(s)) for s in splits}
    assert len(results) == 1
    assert list(results.pop()) == sorted(set(data))[:8]


def test_kmv_stream_matches_batch_sketch(spark):
    """Stream-vs-batch parity: the drained streaming sketch equals the
    batch KMV estimate on the same events (hash-dedup vs key-dedup
    conventions coincide absent 60-bit collisions)."""
    stream_rows = {
        (r.event_type, r.kmv_users)
        for r in QUERIES["q_stream_kmv_distinct"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    batch_rows = {
        (r.event_type, r.kmv_users)
        for r in QUERIES["q_kmv_distinct"](spark, "/root/testdata/sf0.001")
        .select("event_type", "kmv_users")
        .collect()
    }
    assert stream_rows == batch_rows
