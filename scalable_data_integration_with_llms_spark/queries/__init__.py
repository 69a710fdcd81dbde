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

# Verification-window priority (round 7): drift rotation + this round's
# code changes.  After the r6 driver run every query's newest green row is
# r2+ and exactly 30 queries are still r2-latest, so the 50-window is:
# (a) the 15 queries round 7 ADDED or whose code changed — the seven new
#     real-data/mapping queries (q_mapping_e2e, q_ehr_effort_report,
#     q_ehr_rounds, q_ehr_round2_matches, q_ehr_bidirectional_*,
#     q_ehr_topk_sweep), the six seed-list-affected ensembles
#     (ENSEMBLE_SEEDS grew to the reference's full four seeds), and the
#     two mapping queries riding the single-pass table_overlap rewrite;
# (b) the 28 remaining r2-latest queries (30 minus the two already in (a));
# (c) 7 oldest r3-latest queries — after this round the oldest standing
#     driver verification becomes r3 with 42 rows left there.
_VERIFY_FIRST = [
    # (a) new round-7 queries + code-changed queries
    "q_mapping_e2e",
    "q_ehr_effort_report",
    "q_ehr_rounds",
    "q_ehr_round2_matches",
    "q_ehr_bidirectional_scores",
    "q_ehr_bidirectional_f1",
    "q_ehr_topk_sweep",
    "q_ensemble_union",
    "q_ensemble_intersection",
    "q_ensemble_majority",
    "q_ensemble_disjoint",
    "q_ensemble_gold_filter",
    "q_ehr_ensemble_f1",
    "q_mapping_overlap",
    "q_mapping_map_pk",
    # (b) newest green row is r2 (the drift-rotation block VERDICT r6 named)
    "q_fk_audit",
    "q_icl_packing",
    "q_json_props",
    "q_lsh_verified_pairs",
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
    # (c) oldest r3-latest
    "q_ann_recall",
    "q_approx_distinct_users",
    "q_approx_percentiles",
    "q_bloom_contamination",
    "q_bpe_token_stats",
    "q_case_swap",
    "q_contamination",
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
