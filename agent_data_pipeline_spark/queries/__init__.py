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
    # Round-13 rotation (standing rules: round-8 item 1 — changed
    # implementations jump the queue; round-10 item 2 — backfill
    # stalest-first). Head: the two NEW queries (never
    # driver-checked), then the two graph ops whose implementations
    # were reworked this round (delta-degree k-core peel,
    # broadcast-gated pagerank). Backfill: the 46 stalest entries —
    # last driver-checked r1 (window_value_fns), r2 (the llmdata/
    # streaming wave), r3 (arrow_udf_kit, bucketed_join_agg) —
    # recomputed from CORRECTNESS_r01-r12 this round, so after r13
    # every entry's driver-check age is r4 or newer.
    "incremental_dedup_census",
    "stream_neardup_gate",
    "incremental_neardup_census",
    "pagerank_entities",
    "k_core_decomposition",
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
