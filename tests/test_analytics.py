"""Oracle parity for the analytics surface."""

import pytest
from pyspark.sql import functions as F

from conftest import assert_oracle_match

NAMES = [
    "q_asof_latest_order",
    "q_asof_next_order",
    "q_range_join_purchase_context",
    "q_cms_supplier_counts",
    "q_events_rollup_multires",
    "q_stratified_sample",
    "q_value_counts",
    "q_top_frequent",
    "q_majority_vote",
    "q_seeded_sample",
    "q_weighted_sample",
    "q_surrogate_keys",
    "q_json_props",
    "q_events_hourly",
    "q_normalize_chain",
]


@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity(spark, duck, name):
    assert_oracle_match(spark, duck, name)


def test_sampling_stable_across_partitions(spark):
    """Sample-stability discipline: same rows at any partitioning (SURVEY §4)."""
    from scalable_data_integration_with_llms_spark.operators.sampling import random_sample
    from scalable_data_integration_with_llms_spark.sources.readers import load_table

    o = load_table(spark, "/root/testdata/sf0.001", "orders")
    a = {r.o_orderkey for r in random_sample(o, 20, 42, ["o_orderkey"]).collect()}
    b = {r.o_orderkey for r in random_sample(o.repartition(13), 20, 42, ["o_orderkey"]).collect()}
    assert a == b


def test_orders_cube_parity(spark, duck):
    assert_oracle_match(spark, duck, "q_orders_cube")


def test_unique_value_sample_parity(spark, duck):
    assert_oracle_match(spark, duck, "q_unique_value_sample")


MORE_ANALYTICS = ["q_price_percentiles", "q_user_activity_windows", "q_profile_orders"]


@pytest.mark.parametrize("name", MORE_ANALYTICS)
def test_more_analytics_parity(spark, duck, name):
    assert_oracle_match(spark, duck, name)


def test_top_bigrams_parity(spark, duck):
    assert_oracle_match(spark, duck, "q_top_bigrams")


def test_asof_join_semantics(spark):
    from scalable_data_integration_with_llms_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, 5), (2, 10, 50), (3, 20, 5)], "lid long, k long, t long"
    )
    right = spark.createDataFrame(
        [(10, 7, 100), (10, 7, 101), (10, 40, 102), (20, 9, 103)],
        "k long, t long, rid long",
    )
    out = {
        r.lid: r.rid
        for r in asof_join(
            left.withColumnRenamed("k", "lk"),
            right,
            on_left="lk",
            on_right="k",
            t_left="t",
            t_right="t",
            payload=["rid"],
            tiebreak="rid",
        ).collect()
    }
    # lid=1: t=5 precedes every right row for k=10 -> NULL
    # lid=2: t=50 sees t=7 (tie -> max rid 101) and t=40 -> rid 102 wins
    # lid=3: k=20 t=5 precedes t=9 -> NULL
    assert out == {1: None, 2: 102, 3: None}


def test_asof_join_inclusive_and_ties(spark):
    from scalable_data_integration_with_llms_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10, 7)], "lid long, lk long, t long")
    right = spark.createDataFrame(
        [(10, 7, 100), (10, 7, 105), (10, 8, 110)], "k long, t long, rid long"
    )
    row = asof_join(
        left, right, "lk", "k", "t", "t", payload=["rid"], tiebreak="rid"
    ).first()
    # inclusive <= at equal t; tie at t=7 resolved to max rid
    assert row.rid == 105


def test_asof_join_forward(spark):
    from scalable_data_integration_with_llms_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, 5), (2, 10, 50), (3, 10, 7)], "lid long, lk long, t long"
    )
    right = spark.createDataFrame(
        [(10, 7, 100), (10, 7, 105), (10, 40, 102)], "k long, t long, rid long"
    )
    out = {
        r.lid: r.rid
        for r in asof_join(
            left, right, "lk", "k", "t", "t",
            payload=["rid"], tiebreak="rid", direction="forward",
        ).collect()
    }
    # lid=1: t=5 -> next right t=7, tie -> max rid 105
    # lid=2: t=50 -> nothing after -> NULL
    # lid=3: t=7 -> inclusive >= matches t=7 tie -> 105
    assert out == {1: 105, 2: None, 3: 105}


def test_range_join_bounds(spark):
    from scalable_data_integration_with_llms_spark.operators.rangejoin import bucketed_range_join

    left = spark.createDataFrame(
        [(1, 10, "2024-01-01 10:00:00")], "lid long, k long, t string"
    ).withColumn("t", F.col("t").cast("timestamp"))
    right = spark.createDataFrame(
        [
            (10, "2024-01-01 08:59:59", 1),   # before window
            (10, "2024-01-01 09:00:00", 2),   # window start (inclusive)
            (10, "2024-01-01 09:59:59", 3),   # inside
            (10, "2024-01-01 10:00:00", 4),   # window end (exclusive)
            (11, "2024-01-01 09:30:00", 5),   # wrong key
        ],
        "rk long, rt string, rid long",
    ).withColumn("rt", F.col("rt").cast("timestamp"))
    out = bucketed_range_join(
        left, right, "k", "rk", "t", "rt", lo_s=-3600, hi_s=0, bucket_s=600
    )
    assert sorted(r.rid for r in out.collect()) == [2, 3]


def test_cms_never_underestimates(spark):
    from scalable_data_integration_with_llms_spark.operators.sketch import cms_estimates
    from scalable_data_integration_with_llms_spark.sources.readers import load_table

    l = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    rows = cms_estimates(l, "l_suppkey", depth=4, width=64).collect()
    assert rows and all(r.est_cnt >= r.exact_cnt for r in rows)
