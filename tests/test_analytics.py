"""Oracle parity for the analytics surface."""

import pytest

from conftest import assert_oracle_match

NAMES = [
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
