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


def test_zorder_oracle(spark, duck):
    assert_oracle_match(spark, duck, "q_zorder_locality")


def test_zorder_write_tightens_file_ranges(spark, tmp_path):
    """Files written Z-ordered must cover far smaller (px, sx) rectangles
    than the incoming layout: read back per-file min/max and require the
    mean rectangle area to shrink."""
    from scalable_data_integration_with_llms_spark.operators.layout import write_zordered
    from scalable_data_integration_with_llms_spark.sources.readers import load_table

    l = load_table(spark, "/root/testdata/sf0.01", "lineitem").select(
        (F.col("l_partkey").bitwiseAND(F.lit(1023))).alias("px"),
        (F.col("l_suppkey").bitwiseAND(F.lit(1023))).alias("sx"),
    )
    path = str(tmp_path / "zordered")
    write_zordered(l, path, "px", "sx", bits=10, files=16)

    import glob

    import pyarrow.parquet as pq

    areas = []
    for f in glob.glob(path + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        pxs, sxs = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.row_group(rg).num_columns):
                col = md.row_group(rg).column(ci)
                tgt = pxs if col.path_in_schema == "px" else sxs
                tgt.append((col.statistics.min, col.statistics.max))
        lo_p, hi_p = min(a for a, _ in pxs), max(b for _, b in pxs)
        lo_s, hi_s = min(a for a, _ in sxs), max(b for _, b in sxs)
        areas.append((hi_p - lo_p + 1) * (hi_s - lo_s + 1))
    full_area = 1024 * 1024
    mean_area = sum(areas) / len(areas)
    # 16 curve segments ≈ 1/16 of the plane each; allow 2x slop
    assert mean_area < full_area / 8, (mean_area, full_area, len(areas))


def test_sorted_neighborhood_exact_pairs(spark):
    """SNM candidate pairs must be EXACTLY the 0 < gap < w pairs of the
    (key, id) total order — including pairs that straddle a prefix-bucket
    boundary and pairs that straddle a rank-cell boundary (the two seams
    of the two-level construction)."""
    from itertools import combinations

    from scalable_data_integration_with_llms_spark.queries.er_q import (
        sorted_neighborhood_pairs,
    )

    # keys chosen so buckets (first 3 chars) split mid-order: aaX < abX,
    # ids break the tie inside "aaq"
    rows = [
        (1, "aaq one"), (2, "aaq two"), (3, "aar"), (4, "abb"),
        (5, "abc"), (6, "abd"), (7, "zzz"), (8, "aaa"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    w = 3
    got = {
        (r.id_a, r.id_b, r.rank_gap)
        for r in sorted_neighborhood_pairs(
            df, "doc_id", F.substring("text", 1, 7), w=w
        ).collect()
    }
    order = sorted(rows, key=lambda r: (r[1][:7], r[0]))
    expect = {
        (order[i][0], order[j][0], j - i)
        for i, j in combinations(range(len(order)), 2)
        if j - i < w
    }
    assert got == expect, got ^ expect
