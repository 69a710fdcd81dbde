"""Oracle parity + semantics for the entity-resolution / temporal surface."""

import pytest
from pyspark.sql import functions as F

from conftest import assert_oracle_match

NAMES = ["q_fuzzy_er_names", "q_scd2_intervals", "q_ntile_deciles"]


@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity(spark, duck, name):
    assert_oracle_match(spark, duck, name)


def test_fuzzy_er_blocking_is_sound(spark):
    """Every emitted pair respects the block (shared head noun) and the
    distance threshold; no self-pairs or reversed duplicates."""
    from scalable_data_integration_with_llms_spark.queries import QUERIES

    rows = QUERIES["q_fuzzy_er_names"](spark, "/root/testdata/sf0.001").collect()
    assert rows, "expected at least one fuzzy pair in synthetic part names"
    for r in rows:
        assert r.name_a < r.name_b
        assert r.edit_dist <= 4
        assert r.name_a.split(" ")[1] == r.name_b.split(" ")[1]
        assert r.candidate_pairs == r.n_a * r.n_b


def test_scd2_intervals_partition_users(spark):
    """Intervals per user tile the timeline: exactly one open (current)
    version per user and valid_from < valid_to for all closed ones."""
    from scalable_data_integration_with_llms_spark.queries import QUERIES

    df = QUERIES["q_scd2_intervals"](spark, "/root/testdata/sf0.001")
    per_user = df.groupBy("user_id").agg(
        F.sum(F.when(F.col("is_current"), 1).otherwise(0)).alias("n_open"),
        F.sum(F.when(F.col("valid_to") <= F.col("valid_from"), 1).otherwise(0)).alias(
            "n_bad"
        ),
        F.count(F.lit(1)).alias("n"),
        F.max("version").alias("max_v"),
    )
    bad = per_user.filter(
        (F.col("n_open") != 1) | (F.col("n_bad") > 0) | (F.col("max_v") != F.col("n"))
    )
    assert bad.count() == 0
