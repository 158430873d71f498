"""Round-9 wave: multimodal columns through a fact join, and a
cross-encoder-style second-stage re-ranker over an ANN shortlist — the
two north-star gaps the round-8 verdict named (media queries were
payload-local only; retrieval had no late-interaction re-rank stage).

* ``media_source_curation_join`` — the media-curation rollup: per-doc
  gradient BMPs (the deterministic fixture recipe of
  ``bmp_channel_stats``) are REAL-decoded payload-local
  (mapInPandas, zero payload shuffle), and only the typed scalar
  features cross the join back to the documents dim — count, bright
  share (r_mean ≥ 96, ~54% fixture prevalence), mean brightness, mean
  red-entropy, and total stored bytes per source. The 100 TB shape to
  demonstrate: feature-extract BEFORE the shuffle so the join moves a
  few scalars per image, never megabyte payloads; bytes are
  reconstructed arithmetically from the decoded dims (54-byte header +
  4-byte-padded rows) so the stats frame never has to rejoin the
  payload frame. Oracled: the gradient recipe gives every feature in
  closed form.
* ``crossenc_rerank_topk`` — two-stage retrieval: an IVF ANN shortlist
  (cheap bi-encoder analog: 32 cells / 16 probes, top-50 by embedding
  cosine) is re-scored by a late-interaction scorer over the PAIR's
  raw content — token-set Jaccard between the query doc's and the
  candidate doc's text (the deterministic stand-in for a cross-encoder
  forward pass; the fixture aligns vec_id ↔ doc_id) — blended
  0.5·cosine + 0.5·jaccard, top-5 per query. Exactly the production
  shape: the expensive pair scorer touches only ``n_queries × 50``
  (``_SHORTLIST_K``) shortlist rows (broadcast), never the corpus;
  text tokenization of
  candidates happens AFTER the shortlist join prunes the corpus scan.
  Hash-seeded IVF ⇒ rows-only driver check; a planted-truth test
  measures recall vs the exact brute-force two-stage scoring
  (tests/test_extras62.py).

Reference parity: no media/retrieval surface in the reference
(SURVEY.md §2.A); declared north-star §2.B additions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .core import QuerySpec, rnd, t

_BRIGHT_CUT = 96  # ~54% of fixture images (probed; memory: 20-80% rule)


def _media_source_curation_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmdata import multimodal

    d = t(spark, sf_dir, "documents")
    media = multimodal.synthesize_gradient_images(d, "doc_id")
    stats = multimodal.image_channel_stats(media)
    # stored size from the DECODED dims (BMP: 54-byte headers + rows
    # padded to 4 bytes), so the scalar stats frame never rejoins the
    # binary payload frame
    stats = stats.withColumn(
        "stored_bytes",
        (
            F.lit(54)
            + F.floor((3 * F.col("width") + 3) / 4) * 4 * F.col("height")
        ).cast("long"),
    )
    dim = d.select("doc_id", "source")
    joined = stats.join(dim, stats.media_id == dim.doc_id)
    return (
        joined.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_images"),
            F.sum((F.col("r_mean") >= _BRIGHT_CUT).cast("long"))
            .cast("long")
            .alias("n_bright"),
            rnd(F.avg("r_mean"), 6).alias("avg_r_mean"),
            rnd(F.avg("r_entropy_nats"), 6).alias("avg_r_entropy"),
            F.sum("stored_bytes").cast("long").alias("total_bytes"),
        )
        .withColumn(
            "bright_share",
            rnd(F.col("n_bright") / F.col("n_images"), 6),
        )
        .orderBy("source")
    )


_MEDIA_JOIN_SQL = f"""
WITH p AS (
  SELECT doc_id, source,
         4 + doc_id % 4 AS w,
         4 + doc_id % 5 AS h,
         doc_id % 192 AS base
  FROM documents
), feat AS (
  SELECT source,
         base + (w - 1) / 2.0 + 7 * (h - 1) / 2.0 AS r_mean,
         ln(CAST(w * h AS DOUBLE)) AS ent,
         54 + ((3 * w + 3) // 4) * 4 * h AS stored_bytes
  FROM p
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_images,
       CAST(sum(CASE WHEN r_mean >= {_BRIGHT_CUT} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_bright,
       floor(avg(r_mean) * 1000000 + 0.5) / 1000000 AS avg_r_mean,
       floor(avg(ent) * 1000000 + 0.5) / 1000000 AS avg_r_entropy,
       CAST(sum(stored_bytes) AS BIGINT) AS total_bytes,
       floor(sum(CASE WHEN r_mean >= {_BRIGHT_CUT} THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE) * 1000000 + 0.5) / 1000000
         AS bright_share
FROM feat
GROUP BY source
ORDER BY source
"""


_SHORTLIST_K = 50
_FINAL_K = 5


def _crossenc_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured on the sf0.01 fixture: the deep shortlist (50 @ 32
    cells / 16 probes) covers 0.86 of the exact full-candidate blended
    top-5; the residual misses are high-Jaccard / low-cosine candidates
    a pure vector retriever cannot surface at ANY shortlist depth
    (coverage saturates 25→50→75) — the textbook motivation for adding
    a lexical retrieval arm (hybrid BM25 ∪ ANN) in front of the
    re-ranker."""
    from ..llmdata import similarity

    emb = t(spark, sf_dir, "embeddings")
    docs = t(spark, sf_dir, "documents")
    queries = emb.filter(F.col("vec_id") < 10)
    shortlist = similarity.ivf_topk(
        emb, queries, k=_SHORTLIST_K, n_cells=32, n_probe=16
    ).select("query_id", "neighbor_id", "cosine_sim")

    def toks(col: str) -> F.Column:
        # trim + drop empty tokens (ADVICE r9): Spark's split keeps
        # leading/trailing empty strings (limit -1) where Python's
        # str.split() drops them — trim so the engine's token set
        # coincides with the exact-side recomputation by construction
        return F.array_remove(
            F.array_distinct(F.split(F.lower(F.trim(F.col(col))), r"\s+")),
            "",
        )

    # candidate text: the bounded shortlist (n_queries x _SHORTLIST_K rows)
    # broadcasts INTO the documents scan, so tokenization only ever
    # runs on join survivors — the corpus is pruned before the
    # expensive pair scorer, never after
    cand = docs.join(
        F.broadcast(shortlist), docs.doc_id == F.col("neighbor_id")
    ).select("query_id", "neighbor_id", "cosine_sim", toks("text").alias("c_toks"))
    q_txt = docs.join(
        F.broadcast(queries.select(F.col("vec_id").alias("qid"))),
        docs.doc_id == F.col("qid"),
    ).select(F.col("qid").alias("query_id"), toks("text").alias("q_toks"))
    pairs = cand.join(F.broadcast(q_txt), "query_id")
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        rnd(F.col("cosine_sim"), 6).alias("cosine_sim"),
        rnd(
            F.size(F.array_intersect("q_toks", "c_toks"))
            / F.size(F.array_union("q_toks", "c_toks")),
            6,
        ).alias("jaccard"),
    ).withColumn(
        "rerank_score",
        rnd(0.5 * F.col("cosine_sim") + 0.5 * F.col("jaccard"), 6),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("rerank_score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rerank_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rerank_rank") <= _FINAL_K)
        .orderBy("query_id", "rerank_rank")
    )


QUERIES: dict[str, QuerySpec] = {
    "media_source_curation_join": QuerySpec(
        _media_source_curation_join,
        _MEDIA_JOIN_SQL,
        "per-source media curation rollup: real BMP decode payload-local, "
        "scalar features joined to the documents dim (bright share, "
        "brightness, entropy, stored bytes)",
    ),
    "crossenc_rerank_topk": QuerySpec(
        _crossenc_rerank_topk,
        None,
        "two-stage retrieval: IVF ANN shortlist re-ranked by a "
        "late-interaction token-Jaccard + cosine blend (cross-encoder "
        "stand-in), top-5 per query",
    ),
}
