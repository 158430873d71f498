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
    # Round-10 rotation. Standing rule (round-8 verdict item 1, encoded
    # here since round 9): any query whose IMPLEMENTATION changed this
    # round jumps the queue so the driver hard-checks the new code path
    # the same round.
    # -- round-10 additions (extras64) — never driver-checked
    "dsir_importance_weights",
    "dsir_resample_census",
    "multimodal_data_prep",
    "stream_dsir_gate",
    "bm25_prf_topk",
    "dp_mean_release",
    # -- round-10 additions (extras63) — never driver-checked
    "hybrid_bm25_ann_rerank",
    "audio_source_curation_join",
    "mixed_media_manifest",
    "bm25_multiquery_topk",
    # -- implementation touched in round 10: crossenc tokenization now
    #    trims + drops empty tokens (ADVICE r9); pca_variance probe is
    #    NULL-guarded; rfm/rrf/gapfill/rollup persists are now tracked
    #    via fns.persist_dim (plan-identical, but the rule is the rule)
    "crossenc_rerank_topk",
    "pca_variance",
    "rfm_segments",
    "rrf_rank_fusion",
    "gapfill_interpolate",
    "hypertable_rollup",
    #    wav_block_loudness shares synthesize_block_wavs, which gained
    #    the (nb_mod, amp_mod) parameters (defaults preserve its recipe)
    "wav_block_loudness",
    #    round-10 allowlist burn-down reworks (window-free plans)
    "skyline_parts",
    "sequence_gaps",
    "survival_curve",
    # Everything below was driver-verified in CORRECTNESS_r09.json
    # (all 50 rows green — the round-9 front came back clean) or
    # earlier; kept as sample backfill in the r09 order.
    "quantile_bins",
    "pareto_revenue",
    "semantic_dedup_summary",
    "gini_lorenz",
    "trimmed_mean_by_segment",
    "event_trigram_mining",
    "dau_wau_stickiness",
    "media_source_curation_join",
    # Everything below was driver-verified in CORRECTNESS_r08.json
    # (the 33-query round-7 backlog + round-8 additions, all green) or
    # earlier; kept in the r08 order as sample backfill.
    # round-7 thirteenth wave tail (extras47)
    "huber_mean_irls",
    # round-7 fourteenth wave (extras48) — never driver-checked
    "holt_winters_daily",
    "median_ci_order_stats",
    "granger_daily",
    # round-7 fifteenth wave (extras49) — never driver-checked
    "embedding_procrustes_align",
    "fd_discovery_audit",
    "pairwise_mean_contrasts",
    # round-7 sixteenth wave (extras50) — never driver-checked
    "loso_source_influence",
    "platt_scaling_irls",
    "randomized_response_freq",
    # round-7 seventeenth wave (extras51) — never driver-checked
    "binseg_changepoints",
    "corpus_datasheet",
    "selfjoin_size_cms_estimate",
    # round-7 eighteenth wave (extras52) — never driver-checked
    "wasserstein_sources",
    "dtw_priority_series",
    "gmm2_em_fit",
    # round-7 nineteenth wave (extras53) — never driver-checked
    "brand_share_trend",
    "simpsons_paradox_scan",
    "overdispersion_check",
    # round-7 twentieth wave (extras54) — never driver-checked
    "degree_assortativity",
    "bfs_hops_from_hub",
    # round-7 twenty-first wave (extras55) — never driver-checked
    "hill_tail_index",
    "best_split_stump",
    "unigram_scaling_law",
    # round-7 twenty-second wave (extras56) — never driver-checked
    "forecast_skill_mase",
    "minhash_jaccard_calibration",
    # round-7 twenty-third wave (extras57) — never driver-checked
    "bitwise_kit",
    "business_days_kit",
    # round-7 twenty-fourth wave (extras58) — never driver-checked
    "bmp_channel_stats",
    "ip_subnet_rollup",
    # round-7 twenty-fifth wave (extras59) — never driver-checked
    "haar_energy_decomposition",
    "ljung_box_hw_residuals",
    "arch_effect_acf",
    # --- round-8 additions (extras60) — never driver-checked ---
    "kmv_source_jaccard",
    "wav_block_loudness",
    "prefix_dup_census",
    "dau_wau_stickiness",
    # round-8 second wave (extras61) — never driver-checked
    "embedding_mahalanobis_outliers",
    "event_trigram_mining",
    "trimmed_mean_by_segment",
    # everything below was driver-verified in CORRECTNESS_r07.json
    "cms_heavy_hitters",
    "ks_drift_test",
    "ndcg_eval",
    "adamic_adar_links",
    "acf_lags",
    "cohens_kappa",
    "theil_sen_trend",
    "pq_ann_topk",
    "mmr_diverse_topk",
    "image_dhash_neardup",
    "cuped_adjusted_ab",
    "k_anonymity_audit",
    "weighted_log_odds_terms",
    "fdr_bh_tests",
    "poisson_bootstrap_ci",
    "neyman_allocation",
    "isotonic_calibration",
    "embedding_diversity_by_label",
    "embedding_centroid_shift",
    "mann_whitney_u",
    "assoc_rules_lift",
    "threshold_sweep_pr",
    "conformal_intervals",
    "cem_att",
    "rolling_ols_slope",
    "mutual_information_lang_source",
    "quantile_normalize_scores",
    "bigram_backoff_scores",
    "hhi_concentration",
    "raking_ipf",
    "spearman_daily_corr",
    "welch_ttest",
    "kruskal_wallis_h",
    "cramers_v_assoc",
    "js_divergence_sources",
    "jaro_winkler_linkage",
    "rake_keyphrases",
    "ab_power_mde",
    "l_diversity_audit",
    "wav_spectral_peak",
    "k_core_decomposition",
    "pacf_lags",
    "grid_proximity_join",
    "markov_attribution",
    "kmv_distinct_shingles",
    "g2_collocations",
    "funnel_within_window",
    "ess_weighted_estimate",
    "its_segmented_regression",
    "spatial_knn_grid",
    # everything below was driver-verified in CORRECTNESS_r06.json
    "mean_confidence_intervals",
    "cohort_ltv_curve",
    "dup_cluster_histogram",
    "anova_oneway",
    "rfm_segments_approx",
    "gini_lorenz_approx",
    # round-6 additions (extras29 + the IVF high-recall sibling)
    "stratified_split_floors",
    "bloom_prune_kit",
    "bm25_topk",
    "hard_negative_mining",
    "psi_quality_drift",
    "bpe_merges",
    "ann_ivf_topk_hi",
    # round-6 third wave (extras30)
    "nb_source_classifier",
    "mixture_budget_plan",
    "ngram_novelty_scores",
    # round-6 fourth wave (extras31)
    "bpe_encode_stats",
    "quality_filter_funnel",
    # round-6 fifth wave (extras32)
    "source_overlap_matrix",
    "dp_lang_counts",
    # round-6 sixth wave (extras33)
    "component_label_propagation",
    "weighted_reservoir_sample",
    "group_kfold_assign",
    # round-6 seventh wave (extras34)
    "entity_resolution_pipeline",
]
_merged: dict[str, QuerySpec] = {}
for mod in (scalars, extras, extras3, extras4, extras5, extras6, extras7, extras8, extras9, extras10, extras11, extras12, extras13, extras14, extras15, extras16, extras17, extras18, extras19, extras20, extras21, extras22, extras23, extras24, extras25, extras26, extras27, extras28, extras29, extras30, extras31, extras32, extras33, extras34, extras35, extras36, extras37, extras38, extras39, extras40, extras41, extras42, extras43, extras44, extras45, extras46, extras47, extras48, extras49, extras50, extras51, extras52, extras53, extras54, extras55, extras56, extras57, extras58, extras59, extras60, extras61, extras62, extras63, extras64, temporal, llmdata_q, extras2, relational):
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
