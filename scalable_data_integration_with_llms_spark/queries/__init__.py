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

# Verification-window priority (round 3): rounds 1+2 hard-verified 95
# distinct queries; this round rotates the never-driver-checked remainder
# into the 50-entry window — the full dedup/similarity/text/streaming tail,
# the three oracles upgraded from rows-only this round (q_media_frames,
# q_approx_distinct_users, q_approx_percentiles), the re-scored
# q_source_drift (χ², engine-exact), and the new W5 q_demo_rating.  Seven
# never-checked queries don't fit (q_udtf_tokens, q_prompt_with_samples,
# q_zorder_locality, q_ntile_deciles, q_scd2_intervals, q_fuzzy_er_names,
# q_knn_classify) — all pytest-covered and local-green in the committed
# full-surface report (CORRECTNESS_FULL_r03.json); they rotate in next
# round.  Previously-verified queries keep full-surface evidence there too.
#
# ROUND-4 TODO (window rotation): after the r3 driver check, exactly 50
# queries have never been driver-verified (computed: registry minus
# CORRECTNESS_r01/r02 minus this round's window) — they fit one 50-entry
# window.  Rebuild _VERIFY_FIRST from this list next round:
#   q_ann_filtered q_bibtex_import q_bloom_join_pushdown q_bm25_topk
#   q_cdc_apply q_cohort_retention q_corr_qty_price q_domain_affinity
#   q_duplicate_spans q_embedding_drift q_embedding_dup_clusters
#   q_er_entities q_event_funnel q_event_transitions q_filter_funnel
#   q_funnel_by_cohort q_fuzzy_er_names q_hard_negatives
#   q_hot_cold_join_revenue q_ivfpq_adc q_kcenter_coreset q_kn_bigram_lm
#   q_knn_classify q_ngram_novelty q_notin_null_semantics q_ntile_deciles
#   q_paragraph_dedup q_perplexity_buckets q_pq_codes
#   q_prompt_with_samples q_rfm_segments q_scd2_intervals
#   q_seasonality_profile q_semdedup q_session_overlap_join
#   q_session_paths q_source_caps q_stable_matching_dist
#   q_stream_cdc_apply q_stream_corpus_ingest q_stream_topk_types
#   q_strip_duplicate_spans q_token_chunks q_train_val_split
#   q_udtf_tokens q_user_value_trend q_value_outliers q_zorder_locality
#   q_pmi_collocations q_brand_hhi
# All are green in CORRECTNESS_FULL_r03.json; keep full-surface evidence
# for the rest.
_VERIFY_FIRST = [
    # oracles upgraded from rows-only this round
    "q_media_frames",
    "q_approx_distinct_users",
    "q_approx_percentiles",
    # new + re-scored this round
    "q_demo_rating",
    "q_source_drift",
    # dedup/similarity tail
    "q_simhash",
    "q_simhash_near_dup",
    "q_dedup_containment",
    "q_dedup_keepers",
    "q_minhash_est_jaccard",
    "q_media_metadata",
    "q_incremental_dedup",
    "q_cosine_topk",
    "q_embedding_near_dup",
    "q_lsh_hyperplane_buckets",
    "q_label_centroids",
    "q_ann_recall",
    "q_ivf_recall",
    "q_kmeans_iteration",
    "q_embedding_quantize",
    # text analysis tail
    "q_text_quality",
    "q_langid",
    "q_doc_fingerprint",
    "q_token_stats_t",
    "q_top_bigrams",
    "q_bpe_token_stats",
    "q_repetition_ratio",
    "q_pii_scrub",
    "q_contamination",
    "q_bloom_contamination",
    "q_pack_sequences",
    "q_vocab",
    "q_tfidf_top_terms",
    "q_inverted_index",
    # corpus pipeline
    "q_source_mixture",
    "q_doc_commonness",
    "q_shard_assignment",
    "q_corpus_pipeline_e2e",
    # streaming tail
    "q_sessionization_stream",
    "q_stream_enriched",
    "q_stream_dedup",
    "q_stream_stream_join",
    "q_sliding_windows",
    "q_session_window_native",
    # reference-op tail
    "q_gold_in_options",
    "q_case_swap",
    "q_parse_tada_yes",
    "q_topk_sweep",
    # analytics tail
    "q_unpivot_status_metrics",
    "q_events_gapfill",
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
