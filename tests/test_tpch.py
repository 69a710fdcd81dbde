"""Oracle-parity tests for the core relational queries (driver t2, locally)."""

import pytest

from conftest import assert_oracle_match

CORE = ["q1_pricing_summary", "q3_shipping_priority", "q5_region_revenue", "q_orders_per_status"]


@pytest.mark.parametrize("name", CORE)
def test_oracle_parity(spark, duck, name):
    assert_oracle_match(spark, duck, name)


def test_q1_rows(spark):
    from scalable_data_integration_with_llms_spark.queries import QUERIES

    df = QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert len(rows) > 0
    assert {r.l_returnflag for r in rows} <= {"A", "N", "R"}


SUBQ = ["q_customers_without_orders", "q_big_spenders", "q_above_avg_orders"]


@pytest.mark.parametrize("name", SUBQ)
def test_subquery_parity(spark, duck, name):
    assert_oracle_match(spark, duck, name)


MORE = [
    "q7_volume_shipping",
    "q9_profit",
    "q10_returned_revenue",
    "q14_promo_share",
    "q4_priority_exists",
    "q6_forecast_revenue",
    "q12_priority_by_status",
    "q13_order_distribution",
    "q18_large_orders",
    "q19_disjunctive_filter",
    "q2_min_cost_part",
    "q11_important_types",
    "q15_top_supplier",
    "q21_sole_failing_supplier",
    "q22_idle_rich_customers",
    "q8_market_share",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q20_heavy_shippers",
]


@pytest.mark.parametrize("name", MORE)
def test_more_tpch_parity(spark, duck, name):
    assert_oracle_match(spark, duck, name)
