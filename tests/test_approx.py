"""Error-bound harnesses for the approximate aggregates.  Since r3 the
queries themselves hash the guarantee check into the value oracle (the
boolean bound columns must be TRUE); these tests keep the finer-grained
statistical assertions against the raw sketch outputs."""

from pyspark.sql import functions as F

from scalable_data_integration_with_llms_spark.queries import QUERIES
from scalable_data_integration_with_llms_spark.queries.approx_q import HLL_RSD
from scalable_data_integration_with_llms_spark.sources.readers import load_table

SF = "/root/testdata/sf0.01"


def test_hll_distinct_within_bound(spark):
    rows = QUERIES["q_approx_distinct_users"](spark, SF).collect()
    assert rows
    for r in rows:
        # the oracle-hashed 3σ bound — recomputed here from the raw arms
        assert r.within_bound, (r.event_type, r.exact_users)


def test_hll_raw_estimate_close(spark):
    """Beyond the boolean gate: the raw HLL++ estimate stays within 3·rsd
    of exact on this data."""
    e = load_table(spark, SF, "events")
    rows = (
        e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id", HLL_RSD).alias("approx"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r.approx - r.exact) <= 3 * HLL_RSD * r.exact, r


def test_hll_deterministic(spark):
    a = {tuple(r) for r in QUERIES["q_approx_distinct_users"](spark, SF).collect()}
    b = {tuple(r) for r in QUERIES["q_approx_distinct_users"](spark, SF).collect()}
    assert a == b


def test_percentile_approx_rank_error(spark):
    """GK guarantee against the raw sorted data: the approx percentile's
    rank is within n/accuracy of the target rank."""
    import bisect

    rows = QUERIES["q_approx_percentiles"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.p50_in_bound and r.p90_in_bound, r

    o = load_table(spark, SF, "orders").select(
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    )
    approx = {
        r.o_orderstatus: (r.a50, r.a90)
        for r in o.groupBy("o_orderstatus")
        .agg(
            F.expr("percentile_approx(cents, 0.5, 10000)").alias("a50"),
            F.expr("percentile_approx(cents, 0.9, 10000)").alias("a90"),
        )
        .collect()
    }
    for status, (a50, a90) in approx.items():
        xs = sorted(
            x.cents for x in o.filter(F.col("o_orderstatus") == status).collect()
        )
        n = len(xs)
        for q, val in ((0.5, a50), (0.9, a90)):
            lo = bisect.bisect_left(xs, val)
            hi = bisect.bisect_right(xs, val)
            target = q * n
            slack = n / 10000 + 1
            assert lo - slack <= target <= hi + slack, (status, q, val, lo, hi, target)


def test_exact_percentiles_match_order_statistics(spark):
    """The exact arm is the k-th order statistic with k = ceil(q*n)."""
    import math

    rows = {r.o_orderstatus: r for r in QUERIES["q_approx_percentiles"](spark, SF).collect()}
    o = load_table(spark, SF, "orders").select(
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    )
    for status, r in rows.items():
        xs = sorted(x.cents for x in o.filter(F.col("o_orderstatus") == status).collect())
        assert r.n == len(xs)
        assert r.p50_cents == xs[math.ceil(0.5 * len(xs)) - 1]
        assert r.p90_cents == xs[math.ceil(0.9 * len(xs)) - 1]
