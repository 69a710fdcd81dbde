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
from . import ehr_q  # noqa: F401, E402

# Verification-window priority (round 6): every registered query has a
# driver-green row (union r1–r5 = 218/218), so the window is pure drift
# rotation plus this round's code changes:
# (a) the 4 queries whose code or oracle changed in round 6 (the bpe
#     oracle un-pin, the gate repartition, the two advisor-item fixes);
# (b) the 19 queries whose NEWEST driver-green row is still round 1 (the
#     r5 window fit only 26 of the 45 r1-era drift re-checks);
# (c) the round-2-latest block, oldest first — 50-window overflow rotates
#     to the front of round 7.
_VERIFY_FIRST = [
    # (a) new round-6 queries (EHR real-dataset e2e golden) + code/oracle changes
    "q_ehr_gold_parity",
    "q_ehr_round1_matches",
    "q_ehr_matching_f1",
    "q_synthea_round1_matches",
    "q_synthea_matching_f1",
    "q_example_selection_scalable",
    "q_ehr_ensemble_f1",
    "q_real_benchmarks_summary",
    "q_bpe_train",
    "q_stream_near_dup_gate",
    "q_mixture_schedule",
    "q_question_cost_report",
    # (b) newest green row is r1
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
    # (c) newest green row is r2 (reference-ops block, three code states old)
    "q12_priority_by_status",
    "q_alignment_prf1",
    "q_ann_ivf",
    "q_ann_lsh",
    "q_bidirectional_scores",
    "q_chat_prompt",
    "q_cms_supplier_counts",
    "q_constraint_audit",
    "q_coverage",
    "q_dedup_clusters",
    "q_dedup_exact",
    "q_dedup_ngram_jaccard",
    "q_ensemble_disjoint",
    "q_ensemble_gold_filter",
    "q_ensemble_intersection",
    "q_ensemble_majority",
    "q_ensemble_union",
    "q_example_selection",
    "q_filtered_preferences",
    "q_fk_audit",
    "q_icl_packing",
    "q_json_props",
    "q_lsh_verified_pairs",
    "q_mapping_map_pk",
    "q_mapping_overlap",
    "q_match_round2",
    "q_mcq_scores",
    "q_mcq_validation",
    "q_metric_ci",
    "q_metrics_by_category",
    "q_minhash_signatures",
    "q_mock_match_scores",
    "q_mrr",
    "q_multimodal_features",
    "q_parse_create_view",
    "q_parse_matches_json",
    "q_pass_rate",
    "q_pipeline_e2e",
    "q_pivot_status_priority",
    "q_profile_orders",
    "q_prompt_assembly",
    "q_sessionization",
    "q_softmax_scores",
    "q_stable_matching",
    "q_stream_hourly",
    "q_subsumed_rules",
    "q_token_stats",
    "q_topk_alignments",
    "q_yes_no_majority",
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
