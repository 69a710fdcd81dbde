"""The engine's declared query surface (driver contract in __spark_entry__.py).

Each module registers queries with the shared registry; a query is a callable
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) a DuckDB oracle
SQL string producing the identical result — same column names, same values.

Registration ORDER matters downstream: the correctness driver hard-verifies a
window of the registry front.  ``_VERIFY_FIRST`` below pins the queries that
most need the hard oracle signal this round to the front of the dict; round 1
verified the TPC-H/analytics block (registry 0-49, all green), so those rotate
to the back and the reference-port core + LLM-pipeline operators come first.
"""

from .registry import QUERIES, ORACLES, query  # noqa: F401

# Register all query modules.
from . import tpch  # noqa: F401, E402
from . import analytics  # noqa: F401, E402
from . import matching  # noqa: F401, E402
from . import metrics_q  # noqa: F401, E402
from . import dedup_q  # noqa: F401, E402
from . import text_q  # noqa: F401, E402
from . import similarity_q  # noqa: F401, E402
from . import streaming_q  # noqa: F401, E402
from . import mapping_q  # noqa: F401, E402
from . import reference_ops  # noqa: F401, E402
from . import er_q  # noqa: F401, E402
from . import approx_q  # noqa: F401, E402
from . import pipeline_q  # noqa: F401, E402
from . import retrieval_q  # noqa: F401, E402
from . import prompt_q  # noqa: F401, E402

# Verification-window priority (round 5): rounds 1-4 hard-verified 194 of
# the (pre-round-5) 197 registered queries.  This round's window is
# (a) the 3 registry entries with no driver-green row in any round
# (q_confidence_eval / q_confidence_summary were added after the r4 window
# was fixed; q_ntile_deciles was held back in r4 with a documented scale
# note) and the 21 new round-5 queries (prompt catalog, selectors, records, mixture scheduling), then
# (b) a drift re-check of the 45 queries whose only driver-green row is
# round 1 — the oldest verification, three code states ago.  After this
# window every registered query has a driver-green row, and the oldest
# standing verification is round 4.
_VERIFY_FIRST = [
    # never driver-verified (r4 additions + the held-back ntile)
    "q_confidence_eval",
    "q_confidence_summary",
    "q_ntile_deciles",
    # round-5 additions: prompt repr-template catalog
    "q_repr_scoring_prompts",
    "q_repr_n2one_prompts",
    "q_repr_tada_prompts",
    "q_mm_prompts",
    "q_repr_prompt_tokens",
    "q_icl_prompt_render",
    "q_example_selector_random",
    "q_example_selector_coverage",
    "q_generate_questions_record",
    "q_mapping_prompt_render",
    "q_mapping_sample_data_hint",
    "q_mixture_schedule",
    "q_quality_threshold_sweep",
    "q_packing_efficiency",
    "q_cross_source_dup_matrix",
    "q_image_dhash_dedup",
    "q_question_cost_report",
    "q_stream_near_dup_gate",
    "q_concat_chunk_bins",
    "q_ann_plane_sweep",
    "q_ivf_nprobe_sweep",
    # r1-only rows (oldest verification -> drift re-check)
    "q1_pricing_summary",
    "q2_min_cost_part",
    "q3_shipping_priority",
    "q4_priority_exists",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_profit",
    "q10_returned_revenue",
    "q11_important_types",
    "q13_order_distribution",
    "q14_promo_share",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_disjunctive_filter",
    "q20_heavy_shippers",
    "q21_sole_failing_supplier",
    "q22_idle_rich_customers",
    "q_above_avg_orders",
    "q_asof_latest_order",
    "q_asof_next_order",
    "q_big_spenders",
    "q_customers_without_orders",
    "q_events_hourly",
    "q_events_rollup_multires",
    "q_majority_vote",
    "q_match_candidates",
    "q_normalize_chain",
    "q_orders_cube",
    "q_orders_per_status",
    "q_price_histogram",
    "q_price_percentiles",
    "q_range_join_purchase_context",
    "q_salted_join_revenue",
    "q_seeded_sample",
    "q_stratified_sample",
    "q_surrogate_keys",
    "q_top_frequent",
    "q_unique_value_sample",
    "q_user_activity_windows",
    "q_value_counts",
    "q_weighted_sample",
]


def _reorder() -> None:
    missing = [n for n in _VERIFY_FIRST if n not in QUERIES]
    assert not missing, f"_VERIFY_FIRST names unknown queries: {missing}"
    rest = [n for n in QUERIES if n not in set(_VERIFY_FIRST)]
    ordered = _VERIFY_FIRST + rest
    for reg in (QUERIES, ORACLES):
        snapshot = dict(reg)
        reg.clear()
        reg.update({n: snapshot[n] for n in ordered if n in snapshot})


_reorder()
