"""Error-bound harnesses for the approximate aggregates (rows-only queries
whose value guarantees live here, mirroring the ANN/MinHash recall
harnesses)."""

from pyspark.sql import functions as F

from scalable_data_integration_with_llms_spark.queries import QUERIES
from scalable_data_integration_with_llms_spark.queries.approx_q import HLL_RSD

SF = "/root/testdata/sf0.01"


def test_hll_distinct_within_bound(spark):
    rows = QUERIES["q_approx_distinct_users"](spark, SF).collect()
    assert rows
    for r in rows:
        # 3·rsd ≈ a 3-sigma bound for HLL++'s relative standard deviation
        assert r.rel_err <= 3 * HLL_RSD, (r.event_type, r.exact_users, r.approx_users)


def test_hll_deterministic(spark):
    a = {(r.event_type, r.approx_users) for r in QUERIES["q_approx_distinct_users"](spark, SF).collect()}
    b = {(r.event_type, r.approx_users) for r in QUERIES["q_approx_distinct_users"](spark, SF).collect()}
    assert a == b


def test_percentile_approx_rank_error(spark):
    """GK guarantee: the approx percentile's rank is within n/accuracy of
    the target rank.  Verify against the sorted group values."""
    from scalable_data_integration_with_llms_spark.sources.readers import load_table

    rows = QUERIES["q_approx_percentiles"](spark, SF).collect()
    assert rows
    o = load_table(spark, SF, "orders")
    vals = {
        r.o_orderstatus: [x.o_totalprice for x in r2]
        for r in rows
        for r2 in [
            o.filter(F.col("o_orderstatus") == r.o_orderstatus)
            .select("o_totalprice")
            .orderBy("o_totalprice")
            .collect()
        ]
    }
    for r in rows:
        xs = vals[r.o_orderstatus]
        n = len(xs)
        for q, approx in ((0.5, r.approx_p50), (0.9, r.approx_p90)):
            # rank of the returned value within the sorted data
            import bisect

            lo = bisect.bisect_left(xs, approx)
            hi = bisect.bisect_right(xs, approx)
            target = q * n
            slack = n / 10000 + 1
            assert lo - slack <= target <= hi + slack, (
                r.o_orderstatus,
                q,
                approx,
                lo,
                hi,
                target,
            )
