"""Property tests for the as-of join (SURVEY §5(d) style): random
key/time/tie instances vs a brute-force Python reference, both directions.
The union-window formulation must agree with the naive candidate scan on
every input, including duplicate timestamps and tie values."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from scalable_data_integration_with_llms_spark.operators.asof import asof_join


@st.composite
def instances(draw):
    n_l = draw(st.integers(1, 10))
    n_r = draw(st.integers(0, 10))
    key = st.integers(0, 2)
    t = st.integers(0, 20)  # small domain to force duplicate timestamps
    left = [(i, draw(key), draw(t)) for i in range(n_l)]
    right = [(100 + j, draw(key), draw(t), float(j)) for j in range(n_r)]
    return left, right


def brute_force(left, right, direction):
    out = {}
    for lid, lk, lt in left:
        if direction == "backward":
            cands = [r for r in right if r[1] == lk and r[2] <= lt]
            # greatest t, then greatest tiebreak id
            best = max(cands, key=lambda r: (r[2], r[0]), default=None)
        else:
            cands = [r for r in right if r[1] == lk and r[2] >= lt]
            # smallest t, then greatest tiebreak id
            best = min(cands, key=lambda r: (r[2], -r[0]), default=None)
        out[lid] = None if best is None else (best[0], best[3])
    return out


@pytest.mark.parametrize("direction", ["backward", "forward"])
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(inst=instances())
def test_asof_matches_brute_force(spark, direction, inst):
    left, right = inst
    ldf = spark.createDataFrame(left, "l_id int, k int, t int")
    rdf = spark.createDataFrame(
        right, "r_id int, rk int, rt int, val double"
    ) if right else spark.createDataFrame([], "r_id int, rk int, rt int, val double")
    got = {
        r.l_id: (None if r.r_id is None else (r.r_id, r.val))
        for r in asof_join(
            ldf,
            rdf,
            on_left="k",
            on_right="rk",
            t_left="t",
            t_right="rt",
            payload=["r_id", "val"],
            tiebreak="r_id",
            direction=direction,
        ).collect()
    }
    assert got == brute_force(left, right, direction)


# -- bucketized range join vs brute force -------------------------------------

@st.composite
def range_instances(draw):
    n_l = draw(st.integers(1, 8))
    n_r = draw(st.integers(0, 8))
    key = st.integers(0, 2)
    # seconds within a few hours; bucket boundary cases matter
    t = st.integers(0, 4 * 3600)
    left = [(i, draw(key), draw(t)) for i in range(n_l)]
    right = [(100 + j, draw(key), draw(t)) for j in range(n_r)]
    lo = draw(st.sampled_from([-3600, -1800, 0]))
    width = draw(st.sampled_from([1, 1800, 3600, 7200]))
    return left, right, lo, lo + width


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(inst=range_instances())
def test_range_join_matches_brute_force(spark, inst):
    import datetime as dt

    from scalable_data_integration_with_llms_spark.operators.rangejoin import (
        bucketed_range_join,
    )

    left, right, lo, hi = inst
    epoch = dt.datetime(2024, 1, 1)
    ts = lambda s: epoch + dt.timedelta(seconds=s)  # noqa: E731
    ldf = spark.createDataFrame(
        [(i, k, ts(t)) for i, k, t in left], "l_id int, k int, t timestamp"
    )
    rdf = spark.createDataFrame(
        [(j, k, ts(t)) for j, k, t in right], "r_id int, rk int, rt timestamp"
    )
    got = {
        (r.l_id, r.r_id)
        for r in bucketed_range_join(
            ldf, rdf, on_left="k", on_right="rk", t_left="t", t_right="rt",
            lo_s=lo, hi_s=hi, bucket_s=3600,
        ).collect()
    }
    want = {
        (lid, rid)
        for lid, lk, lt in left
        for rid, rk, rt in right
        if lk == rk and (lt + lo) <= rt < (lt + hi)
    }
    assert got == want
