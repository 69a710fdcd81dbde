"""Property test for sorted-neighborhood blocking (SURVEY §5(d) style):
random key/id instances vs a brute-force Python reference.  The two-level
prefix-sum rank + rank-cell equi-join must emit EXACTLY the 0 < gap < w
pairs of the (key, id) total order on every input — duplicate keys, empty
and singleton buckets, ids out of insertion order, and w larger than the
frame are all reachable from the strategy."""

from itertools import combinations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from scalable_data_integration_with_llms_spark.queries.er_q import (
    sorted_neighborhood_pairs,
)


@st.composite
def instances(draw):
    n = draw(st.integers(1, 12))
    # 2-char alphabet over 2 letters → heavy key duplication AND multiple
    # 1-char prefix buckets, so ties and bucket seams both occur
    keys = st.text(alphabet="ab", min_size=1, max_size=2)
    rows = [(i, draw(keys)) for i in draw(st.permutations(list(range(n))))]
    w = draw(st.integers(2, 5))
    return rows, w


def brute_force(rows, w):
    order = sorted(rows, key=lambda r: (r[1], r[0]))
    return {
        (order[i][0], order[j][0], j - i)
        for i, j in combinations(range(len(order)), 2)
        if j - i < w
    }


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(inst=instances())
def test_sorted_neighborhood_matches_brute_force(spark, inst):
    rows, w = inst
    df = spark.createDataFrame(rows, "doc_id bigint, sk string")
    got = {
        (r.id_a, r.id_b, r.rank_gap)
        for r in sorted_neighborhood_pairs(
            df, "doc_id", F.col("sk"), w=w, bucket_chars=1
        ).collect()
    }
    assert got == brute_force(rows, w)
