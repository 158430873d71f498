"""The engine's query registry: every declared operator (SURVEY.md §2.B)
as a QuerySpec — Spark callable + DuckDB oracle SQL (None => rows-only).
"""

from __future__ import annotations

from .core import QuerySpec
from . import (
    extras,
    extras2,
    extras3,
    extras4,
    extras5,
    extras6,
    extras7,
    extras8,
    extras9,
    extras10,
    extras11,
    extras12,
    extras13,
    extras14,
    extras15,
    extras16,
    extras17,
    extras18,
    extras19,
    extras20,
    extras21,
    extras22,
    extras23,
    extras24,
    extras25,
    extras26,
    extras27,
    extras28,
    extras29,
    extras30,
    extras31,
    extras32,
    extras33,
    extras34,
    extras35,
    extras36,
    extras37,
    extras38,
    extras39,
    extras40,
    extras41,
    extras42,
    extras43,
    extras44,
    extras45,
    extras46,
    extras47,
    extras48,
    extras49,
    extras50,
    extras51,
    extras52,
    extras53,
    extras54,
    extras55,
    extras56,
    extras57,
    extras58,
    extras59,
    extras60,
    extras61,
    extras62,
    extras63,
    extras64,
    extras65,
    extras66,
    llmdata_q,
    relational,
    scalars,
    temporal,
)

REGISTRY: dict[str, QuerySpec] = {}
# Registry order policy (deterministic, documented — not ad-hoc): an
# external correctness harness samples the first N entries, so entries
# that have never had a hard driver check lead; once verified, modules
# keep a stable relative order. History: round 1 verified all 50 of
# `relational`; round 2 verified temporal+llmdata_q+extras2 (50/50);
# round 3 verified scalars/extras/extras3-5 + temporal head; round 4
# verified the round-3 additions plus the first 33 round-4 additions
# (through `concurrency_peaks`, 50 rows). Round 5 hard-checked the next
# 50 round-4 additions (`union_by_name_kit` → `iqr_fences`, all green).
# Round 6 front: the 6 never-driver-checked leftovers (4 round-4 tail
# queries + the 2 round-5 approx siblings) first, then the round-6
# additions (bloom-prune kit, stratified split with floors, BM25,
# hard-negative mining, BPE, …; document chunking itself shipped in
# round 2 — CORRECTNESS_r02.json). CORRECTNESS_r06.json verified ALL
# 24 front entries green, so as of round 7 every registry query has a
# driver row; the round-7 front below leads with the new additions.
_NEVER_VERIFIED_FRONT = [
    # Round-13 wave: brand-new queries lead (never driver-checked) —
    # the incremental-dedup store + streaming near-dup gate (round-12
    # verdict items #2/#3), then the two reworked graph ops so the
    # driver hard-checks the delta-degree peel / broadcast-gated
    # pagerank the same round they changed.
    "incremental_dedup_census",
    "stream_neardup_gate",
    # Round-12 late wave (r12-verified; continue rotation below).
    "winnowing_fingerprints",
    "unicode_nfc_audit",
    # Round-12 rotation. Standing rule (round-8 verdict item 1): any
    # query whose IMPLEMENTATION or ORACLE changed this round jumps
    # the queue so the driver hard-checks the new code path the same
    # round. Head: the three round-12 oracle conversions, the ADVICE
    # r11 hardening wave, and the sixteen window-free allowlist
    # burn-downs. Backfill (round-10 verdict item 2, stalest-first):
    # the continuation of the round-11 backfill order — entries whose
    # most recent driver row is oldest, in the same relative order,
    # minus everything CORRECTNESS_r11 re-greened.
    "isotonic_calibration",
    "pagerank_entities",
    "k_core_decomposition",
    "markov_attribution",
    "binseg_changepoints",
    "hill_tail_index",
    "poisson_bootstrap_ci",
    "platt_scaling_irls",
    "gmm2_em_fit",
    "raking_ipf",
    "share_of_parent",
    "orphan_audit",
    "mann_whitney_u",
    "kruskal_wallis_h",
    "fdr_bh_tests",
    "kmeans_clusters",
    "randomized_response_freq",
    "wasserstein_sources",
    "best_split_stump",
    "ks_drift_test",
    "quantile_normalize_scores",
    "gini_lorenz_approx",
    "pareto_revenue",
    "concurrency_peaks",
    "forecast_skill_mase",
    "granger_daily",
    "ntile_quartiles",
    "percentile_by_group",
    "pivot_status",
    "price_histogram",
    "pricing_summary",
    "range_frame_cumulative",
    "range_join_60d",
    "rank_percentiles",
    "revenue_by_nation",
    "right_join_suppliers",
    "rollup_qty",
    "running_total",
    "salted_agg_by_flag",
    "semi_join_urgent",
    "sort_nulls_limit",
    "sql_shipping_priority",
    "stats_by_flag",
    "theta_join_pairs",
    "top10_orders",
    "top3_orders_per_customer",
    "union_all_sources",
    "unpivot_metrics",
    "window_value_fns",
    "ann_ivf_topk",
    "ann_lsh_topk",
    "asof_purchases",
    "binary_media_meta",
    "bow_fingerprint",
    "chunk_documents",
    "cosine_neardup_pairs",
    "decontaminate_ngrams",
    "dup_components",
    "embedding_quantize",
    "embedding_topk",
    "exact_dedup",
    "first_event_dedup",
    "frame_sample_manifest",
    "global_shuffle_shards",
    "gopher_filters",
    "hash_split_summary",
    "jaccard_pairs",
    "jsonl_roundtrip",
    "lang_quality_summary",
    "media_features",
    "minhash_lsh_pairs",
    "nation_trade_flows",
    "neardup_dedup_summary",
    "orc_roundtrip",
    "pii_scrub",
    "repetition_stats",
    "sequence_packing",
    "session_windows",
    "simhash_fingerprints",
    "stratified_sample_counts",
    "stream_dedup_watermark",
    "stream_foreachbatch_totals",
    "stream_session_windows",
    "stream_sliding_windows",
    "stream_stream_join",
    "text_stats",
    "tfidf_top_terms",
    "token_count_kit",
    "training_data_prep",
    "vector_centroids",
    "vocab_top20",
    "weighted_mix_summary",
    "arrow_udf_kit",
    "bucketed_join_agg",
    "csv_roundtrip",
    "dynamic_gap_sessions",
    "explode_outer_kit",
    "filtered_aggs",
    "group_by_all",
    "map_kit2",
    "mode_median_kit",
    "natural_using_join",
    "partition_prune_agg",
    "python_datasource_agg",
    "regex_kit",
    "salted_join_counts",
    "sliding_windows",
    "stream_stateful_totals",
    "stream_tumbling_hourly",
    "string_kit3",
    "struct_kit",
    "text_roundtrip",
    "try_agg_kit",
    "tumbling_hourly",
    "variant_kit",
    "zorder_interleave",
    "approx_quantile_kit",
    "asof_nearest_clicks",
    "bigram_top_terms",
    "bmp_decode_roundtrip",
    "bmp_resize_roundtrip",
    "ccnet_quality_buckets",
    "chisq_lang_source",
    "compression_ratio_stats",
    "copurchase_pairs",
    "counter_deltas",
    "dup_span_stats",
    "encoding_quality_kit",
    "event_transitions",
    "ewma_daily_value",
    "expectations_audit",
    "funnel_conversion",
    "html_strip_kit",
    "incremental_rollup",
    "interval_overlap_join",
    "join_hints_kit",
    "mad_outliers",
]
_merged: dict[str, QuerySpec] = {}
for mod in (scalars, extras, extras3, extras4, extras5, extras6, extras7, extras8, extras9, extras10, extras11, extras12, extras13, extras14, extras15, extras16, extras17, extras18, extras19, extras20, extras21, extras22, extras23, extras24, extras25, extras26, extras27, extras28, extras29, extras30, extras31, extras32, extras33, extras34, extras35, extras36, extras37, extras38, extras39, extras40, extras41, extras42, extras43, extras44, extras45, extras46, extras47, extras48, extras49, extras50, extras51, extras52, extras53, extras54, extras55, extras56, extras57, extras58, extras59, extras60, extras61, extras62, extras63, extras64, extras65, extras66, temporal, llmdata_q, extras2, relational):
    overlap = _merged.keys() & mod.QUERIES.keys()
    if overlap:
        raise ValueError(f"duplicate query names: {overlap}")
    _merged.update(mod.QUERIES)
missing = [name for name in _NEVER_VERIFIED_FRONT if name not in _merged]
if missing:
    raise ValueError(f"front-rotation names absent from registry: {missing}")
for name in _NEVER_VERIFIED_FRONT:
    REGISTRY[name] = _merged[name]
for name, spec in _merged.items():
    if name not in REGISTRY:
        REGISTRY[name] = spec

__all__ = ["REGISTRY", "QuerySpec"]
