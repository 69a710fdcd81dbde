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
