"""Round-10 wave: the hybrid BM25 ∪ ANN retrieval arm (VERDICT r9
item 1) and the audio sibling of the round-9 media-curation fact join
(item 5).

* ``hybrid_bm25_ann_rerank`` — two-stage retrieval whose first stage
  unions the IVF ANN shortlist with a multi-query BM25 shortlist
  (``llmdata/retrieval.py``), then re-ranks the union with the SAME
  late-interaction blend as round 9's ``crossenc_rerank_topk``
  (0.5·cosine + 0.5·token-Jaccard, 6dp floor) — so the two queries'
  recall@5 numbers compare directly. The crossenc docstring diagnosed
  the vector-only ceiling (recall@5 0.86, saturated in shortlist
  depth: the misses are high-Jaccard/low-cosine docs no vector
  shortlist can surface); the lexical arm exists precisely to surface
  those. The sf fixtures cannot measure the lift (31-word global
  vocabulary — every posting list covers ~80% of the corpus, so a
  fixture test would pass by accidental brute force; see
  degenerate-fixture-labels), so the recall lift is measured on a
  locally PLANTED richer-vocab corpus in
  tests/test_retrieval_planted.py: planted lexical twins are
  constructed orthogonal to every query embedding (cosine exactly 0 —
  invisible to ANY vector arm at ANY depth) yet share ~10/12 query
  tokens; the hybrid recovers them, the vector-only path provably
  cannot. Hash-seeded IVF ⇒ rows-only driver check.
* ``audio_source_curation_join`` — the WAV analog of round 9's
  ``media_source_curation_join``: per-doc blocked-square-wave WAVs
  (the exact-closed-form recipe of ``wav_block_loudness``) are
  REAL-decoded payload-local (stdlib RIFF codec, mapInPandas, zero
  payload shuffle) into typed scalar features — mean block RMS,
  dynamic range (dB) — and only those scalars cross the join back to
  the documents dim for the per-source census (count, loud share at
  the probed 57%-prevalence cut, mean loudness, mean dynamic range,
  total stored bytes). Stored bytes are reconstructed arithmetically
  from the decoded block count (44-byte RIFF header + 512 bytes per
  256-sample mono PCM16 block), so the stats frame never rejoins the
  payload frame. The synthesis recipe gives every feature in closed
  form ⇒ fully oracled (DuckDB lateral generate_series).

Reference parity: no retrieval/audio surface in the reference
(SURVEY.md §2.A); declared north-star §2.B additions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .core import QuerySpec, rnd, t

_SHORTLIST_K = 50
_FINAL_K = 5
_N_QUERIES = 10


def _hybrid_bm25_ann_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmdata import retrieval

    emb = t(spark, sf_dir, "embeddings")
    docs = t(spark, sf_dir, "documents")
    return retrieval.hybrid_bm25_ann_rerank(
        emb,
        docs,
        list(range(_N_QUERIES)),
        shortlist_k=_SHORTLIST_K,
        final_k=_FINAL_K,
        n_cells=32,
        n_probe=16,
    )


# loudness cut on per-clip mean block RMS. Recipe moduli (3, 7) give
# period lcm(3,7)=21, COPRIME with the fixture's source = doc_id % 20
# assignment -- the default (4, 5) recipe's period 20 aliases with it
# and makes every source one constant loudness (probed: n_loud would
# be 0 or 25 per source). With (3, 7): 17 distinct rms_mean values per
# source, span [1750, 3250]; 2500 probed at 57% overall prevalence,
# per-source loud share spanning (not constant) -- the
# degenerate-fixture-labels 20-80% rule on BOTH grains.
_LOUD_CUT = 2500.0
_NB_MOD, _AMP_MOD = 3, 7


def _audio_source_curation_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmdata import multimodal

    d = t(spark, sf_dir, "documents")
    media = multimodal.synthesize_block_wavs(
        d, "doc_id", nb_mod=_NB_MOD, amp_mod=_AMP_MOD
    )
    feats = multimodal.audio_block_loudness(media)
    # stored size from the DECODED block count (RIFF/WAVE: 44-byte
    # canonical header + 2 bytes x 256 samples per mono PCM16 block)
    # -- the scalar stats frame never rejoins the binary payload frame
    feats = feats.select(
        F.col("media_id").alias("doc_id"),
        "rms_mean",
        "dyn_range_db",
        (F.lit(44) + 512 * F.col("n_blocks")).cast("long").alias("stored_bytes"),
    )
    joined = d.select("doc_id", "source").join(feats, "doc_id")
    return (
        joined.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clips"),
            F.sum(F.when(F.col("rms_mean") >= _LOUD_CUT, 1).otherwise(0))
            .cast("long")
            .alias("n_loud"),
            rnd(F.avg("rms_mean"), 6).alias("avg_rms"),
            rnd(F.avg("dyn_range_db"), 6).alias("avg_dyn_db"),
            F.sum("stored_bytes").cast("long").alias("total_bytes"),
        )
        .orderBy("source")
    )


_AUDIO_JOIN_SQL = """
WITH blocks AS (
  SELECT doc_id, 4 + doc_id % 3 AS nb,
         1000 + 500 * ((doc_id + b) % 7) AS amp
  FROM (
    SELECT doc_id,
           unnest(generate_series(0, CAST(3 + doc_id % 3 AS BIGINT))) AS b
    FROM documents
  )
), agg AS (
  SELECT doc_id, nb,
         sum(CAST(amp AS DOUBLE)) / nb AS rmean,
         20.0 * log10(CAST(max(amp) AS DOUBLE) / min(amp)) AS dyn_db,
         44 + 512 * nb AS stored_bytes
  FROM blocks GROUP BY doc_id, nb
)
SELECT d.source AS source,
       count(*) AS n_clips,
       CAST(sum(CASE WHEN a.rmean >= 2500.0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_loud,
       floor(avg(a.rmean) * 1000000 + 0.5) / 1000000 AS avg_rms,
       floor(avg(a.dyn_db) * 1000000 + 0.5) / 1000000 AS avg_dyn_db,
       CAST(sum(a.stored_bytes) AS BIGINT) AS total_bytes
FROM documents d JOIN agg a USING (doc_id)
GROUP BY d.source
ORDER BY d.source
"""


_BRIGHT_CUT = 96  # same probed ~54% cut as media_source_curation_join


def _mixed_media_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-modality curation manifest: every document carries an
    image AND an audio clip; each payload is REAL-decoded payload-local
    into scalars (BMP channel stats, WAV block loudness), the two
    modality feature frames meet in a doc-grain equi-join, and the
    per-source rollup reports the joint keep decision
    (bright image AND loud audio — probed ~31% joint prevalence) plus
    the per-modality byte budgets. The 100 TB shape: two independent
    payload-local extractions (zero payload shuffle each), then joins
    that move only typed scalars — the manifest never carries a byte of
    media. Fully closed-form ⇒ oracled."""
    from ..llmdata import multimodal

    d = t(spark, sf_dir, "documents")
    img = multimodal.image_channel_stats(
        multimodal.synthesize_gradient_images(d, "doc_id")
    ).select(
        F.col("media_id").alias("doc_id"),
        (F.col("r_mean") >= _BRIGHT_CUT).alias("is_bright"),
        (
            F.lit(54)
            + F.floor((3 * F.col("width") + 3) / 4) * 4 * F.col("height")
        )
        .cast("long")
        .alias("img_bytes"),
    )
    wav = multimodal.audio_block_loudness(
        multimodal.synthesize_block_wavs(
            d, "doc_id", nb_mod=_NB_MOD, amp_mod=_AMP_MOD
        )
    ).select(
        F.col("media_id").alias("doc_id"),
        (F.col("rms_mean") >= _LOUD_CUT).alias("is_loud"),
        (F.lit(44) + 512 * F.col("n_blocks")).cast("long").alias("wav_bytes"),
    )
    manifest = (
        d.select("doc_id", "source").join(img, "doc_id").join(wav, "doc_id")
    )
    return (
        manifest.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum((F.col("is_bright") & F.col("is_loud")).cast("long"))
            .cast("long")
            .alias("n_keep"),
            F.sum("img_bytes").cast("long").alias("total_img_bytes"),
            F.sum("wav_bytes").cast("long").alias("total_wav_bytes"),
        )
        .withColumn("keep_share", rnd(F.col("n_keep") / F.col("n_docs"), 6))
        .orderBy("source")
    )


_MIXED_MANIFEST_SQL = """
WITH img AS (
  SELECT doc_id,
         (doc_id % 192 + (4 + doc_id % 4 - 1) / 2.0
          + 7 * (4 + doc_id % 5 - 1) / 2.0) >= 96 AS is_bright,
         54 + ((3 * (4 + doc_id % 4) + 3) // 4) * 4 * (4 + doc_id % 5)
           AS img_bytes
  FROM documents
), blocks AS (
  SELECT doc_id, 4 + doc_id % 3 AS nb,
         1000 + 500 * ((doc_id + b) % 7) AS amp
  FROM (
    SELECT doc_id,
           unnest(generate_series(0, CAST(3 + doc_id % 3 AS BIGINT))) AS b
    FROM documents
  )
), wav AS (
  SELECT doc_id,
         sum(CAST(amp AS DOUBLE)) / nb >= 2500.0 AS is_loud,
         44 + 512 * nb AS wav_bytes
  FROM blocks GROUP BY doc_id, nb
)
SELECT d.source AS source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN i.is_bright AND w.is_loud THEN 1 ELSE 0 END)
            AS BIGINT) AS n_keep,
       CAST(sum(i.img_bytes) AS BIGINT) AS total_img_bytes,
       CAST(sum(w.wav_bytes) AS BIGINT) AS total_wav_bytes,
       floor(sum(CASE WHEN i.is_bright AND w.is_loud THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE) * 1000000 + 0.5) / 1000000
         AS keep_share
FROM documents d
JOIN img i USING (doc_id)
JOIN wav w USING (doc_id)
GROUP BY d.source
ORDER BY d.source
"""


_BM25_K = 10


def _bm25_multiquery_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-query BM25 top-10 (doc-as-query, self excluded) — the
    hybrid's lexical arm run standalone so the driver HASH-checks it
    against a SQL oracle (the arm is fully deterministic; only the
    hybrid's IVF side is hash-seeded). Ranks order by the 6dp-rounded
    score then doc_id on BOTH engines, so the cut is deterministic
    even where scores collide after rounding."""
    from ..llmdata import retrieval

    docs = t(spark, sf_dir, "documents")
    qt = retrieval.query_terms_from_docs(docs, list(range(_N_QUERIES)))
    return (
        retrieval.bm25_topk(docs, qt, k=_BM25_K + 1)
        .filter(F.col("doc_id") != F.col("query_id"))
        .select("query_id", "doc_id", "bm25")
        .withColumn(
            "lex_rank",
            F.row_number()
            .over(
                W.partitionBy("query_id").orderBy(
                    F.col("bm25").desc(), F.col("doc_id")
                )
            )
            .cast("long"),
        )
        .filter(F.col("lex_rank") <= _BM25_K)
        .orderBy("query_id", "lex_rank")
    )


_BM25_MULTI_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(lower(trim(text)), ' '), x -> x <> '')
           AS tk
  FROM documents
), dl AS (
  SELECT doc_id, len(tk) AS dl FROM toks
), g AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl FROM dl
), tf AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(tk) AS tok FROM toks)
  GROUP BY doc_id, tok
), qt AS (
  SELECT doc_id AS query_id, unnest(list_distinct(tk)) AS tok
  FROM toks WHERE doc_id < {_N_QUERIES}
), dft AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS dft FROM tf
  WHERE tok IN (SELECT DISTINCT tok FROM qt)
  GROUP BY tok
), sc AS (
  SELECT q.query_id, f.doc_id,
         floor(sum(
           ln(1 + (g.n_docs - d.dft + 0.5) / (d.dft + 0.5))
           * f.tf * 2.2
           / (f.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl / g.avgdl))
         ) * 1000000 + 0.5) / 1000000 AS bm25
  FROM tf f
  JOIN qt q USING (tok)
  JOIN dft d USING (tok)
  JOIN dl l ON l.doc_id = f.doc_id
  CROSS JOIN g
  WHERE f.doc_id <> q.query_id
  GROUP BY q.query_id, f.doc_id
), rk AS (
  SELECT query_id, doc_id, bm25,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY bm25 DESC, doc_id) AS BIGINT) AS lex_rank
  FROM sc
)
SELECT query_id, doc_id, bm25, lex_rank
FROM rk WHERE lex_rank <= {_BM25_K}
ORDER BY query_id, lex_rank
"""


QUERIES: dict[str, QuerySpec] = {
    "hybrid_bm25_ann_rerank": QuerySpec(
        _hybrid_bm25_ann_rerank,
        None,
        "two-stage retrieval with a hybrid first stage: IVF ANN shortlist "
        "∪ multi-query BM25 shortlist, re-ranked by the late-interaction "
        "cosine+Jaccard blend, top-5 per query",
    ),
    "audio_source_curation_join": QuerySpec(
        _audio_source_curation_join,
        _AUDIO_JOIN_SQL,
        "per-source audio curation rollup: real WAV decode payload-local, "
        "scalar features (mean block RMS, dynamic range, stored bytes) "
        "joined to the documents dim",
    ),
    "bm25_multiquery_topk": QuerySpec(
        _bm25_multiquery_topk,
        _BM25_MULTI_SQL,
        "multi-query BM25 top-10 per query doc (posting-list equi-join, "
        "the hybrid's lexical arm standalone and fully oracled)",
    ),
    "mixed_media_manifest": QuerySpec(
        _mixed_media_manifest,
        _MIXED_MANIFEST_SQL,
        "mixed-modality curation manifest: image + audio payloads decoded "
        "payload-local to scalars, doc-grain joined, per-source joint "
        "keep decision and per-modality byte budgets",
    ),
}
