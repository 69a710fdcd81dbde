"""Oracle parity for the metrics surface + formula edge cases."""

import pytest

from conftest import assert_oracle_match

NAMES = [
    "q_alignment_prf1",
    "q_mrr",
    "q_metric_ci",
    "q_pass_rate",
    "q_coverage",
    "q_constraint_audit",
    "q_pipeline_e2e",
    "q_fk_audit",
]


@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity(spark, duck, name):
    assert_oracle_match(spark, duck, name)


def test_prf1_all_zero_is_perfect(spark):
    """Schema-Mapping variant: tp+fp+fn == 0 -> 1.0 (AnaylsisUtils.py:9-13)."""
    from scalable_data_integration_with_llms_spark.operators.metrics import prf1_columns

    df = spark.createDataFrame([("c1", 0, 0, 0), ("c2", 1, 1, 0)], "case_id string, tp int, fp int, fn int")
    rows = {r.case_id: r for r in prf1_columns(df, all_zero_is_perfect=True).collect()}
    assert rows["c1"].precision == 1.0 and rows["c1"].recall == 1.0 and rows["c1"].f1 == 1.0
    assert rows["c2"].precision == 0.5 and rows["c2"].recall == 1.0


def test_prf1_guards(spark):
    from scalable_data_integration_with_llms_spark.operators.metrics import prf1_columns

    df = spark.createDataFrame([("c1", 0, 0, 3), ("c2", 0, 2, 0)], "case_id string, tp int, fp int, fn int")
    rows = {r.case_id: r for r in prf1_columns(df).collect()}
    assert rows["c1"].precision == 0.0 and rows["c1"].recall == 0.0 and rows["c1"].f1 == 0.0
    assert rows["c2"].precision == 0.0 and rows["c2"].f1 == 0.0


def test_token_stats_t_parity(spark, duck):
    assert_oracle_match(spark, duck, "q_token_stats_t")


def test_gold_filter_parity(spark, duck):
    assert_oracle_match(spark, duck, "q_ensemble_gold_filter")


def test_metrics_by_category_parity(spark, duck):
    assert_oracle_match(spark, duck, "q_metrics_by_category")


def test_fk_audit_counts_orphans(spark):
    from scalable_data_integration_with_llms_spark.operators.audit import audit_foreign_keys

    child = spark.createDataFrame(
        [(1,), (2,), (9,), (9,), (None,)], "fk long"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    row = audit_foreign_keys(child, parent, "fk", "pk", "t.fk->p").first()
    # two rows with fk=9 are orphans (one distinct key); NULL FK is not an orphan
    assert (row.fk_name, row.orphan_rows, row.orphan_keys) == ("t.fk->p", 2, 1)


def test_pass_rate_matches_pandas_reference():
    """A12 differential: operators/metrics.pass_rate equals a literal
    pandas transcription of the reference's two-level aggregation
    (AnaylsisUtils.py:121-146 — per-(args, seed) tests_passed, then
    mean/max over seeds) on a crafted matrix with unequal test counts per
    seed, where mean-of-means and pooled-mean DIFFER (pass_rate's contract
    is the pooled sum(n_passed)/sum(n_tests))."""
    import pandas as pd
    from pyspark.sql import functions as F

    from scalable_data_integration_with_llms_spark.operators.metrics import pass_rate
    from scalable_data_integration_with_llms_spark.session import get_spark

    spark = get_spark("pass-rate-diff")
    rows = [
        # config A, seed 1: 2 tests, both perfect
        ("A", 1, 1.0), ("A", 1, 1.0),
        # config A, seed 2: 4 tests, one perfect
        ("A", 2, 1.0), ("A", 2, 0.5), ("A", 2, 0.0), ("A", 2, 0.25),
        # config B, seed 1: 3 tests, none perfect
        ("B", 1, 0.9), ("B", 1, 0.0), ("B", 1, 0.99),
    ]
    df = spark.createDataFrame(rows, "config string, seed int, metric double")
    got = {
        r["config"]: (r["mean_pass_rate"], r["max_pass_rate"])
        for r in pass_rate(df, F.col("metric"), ["config"], "seed").collect()
    }

    pdf = pd.DataFrame(rows, columns=["config", "seed", "metric"])
    per_seed = pdf.groupby(["config", "seed"])["metric"].agg(
        n_passed=lambda c: (c >= 1).sum(), n_tests="count"
    ).reset_index()
    per_seed["rate"] = per_seed.n_passed / per_seed.n_tests
    want = {
        cfg: (g.n_passed.sum() / g.n_tests.sum(), g.rate.max())
        for cfg, g in per_seed.groupby("config")
    }
    assert got == want
    # the crafted matrix makes pooled != mean-of-means, so the test would
    # catch an implementation switching to the wrong aggregation
    a = per_seed[per_seed.config == "A"]
    assert a.n_passed.sum() / a.n_tests.sum() != a.rate.mean()
