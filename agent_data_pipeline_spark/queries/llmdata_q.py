"""LLM-training-data queries: dedup, text analysis, similarity search,
multimodal carriage — wired to the `documents` / `embeddings` fixtures.

Queries with no ``oracle`` (MinHash-LSH, SimHash, SRP-LSH ANN) use
engine-side hash seeds DuckDB cannot reproduce; they get rows-only driver
checks plus pytest recall/parity checks against exact counterparts
(tests/test_dedup_quality.py, tests/test_similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llmdata import dedup, hygiene, multimodal, similarity, textstats
from .core import QuerySpec, duck_materialize, rnd, t


def _exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup(t(spark, sf_dir, "documents"))


_EXACT_DEDUP_SQL = """
SELECT md5(text) AS fingerprint, min(doc_id) AS doc_id, count(*) AS n_copies
FROM documents GROUP BY md5(text)
"""


def _bow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.content_fingerprint(t(spark, sf_dir, "documents")).select(
        "doc_id", "bow_fingerprint"
    )


_BOW_FINGERPRINT_SQL = r"""
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(
           regexp_split_to_array(lower(text), '\s+'))), ' ')) AS bow_fingerprint
FROM documents
"""


def _text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.with_text_stats(t(spark, sf_dir, "documents")).select(
        "doc_id",
        "n_chars_calc",
        "n_tokens",
        "n_distinct_tokens",
        "avg_token_len",
        "stopword_ratio",
        "punct_ratio",
        "quality_score",
    )


_TEXT_STATS_SQL = r"""
WITH s AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars_calc,
         regexp_split_to_array(trim(text), '\s+') AS toks,
         regexp_split_to_array(lower(text), '\s+') AS ltoks,
         length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct
  FROM documents
), c AS (
  SELECT doc_id, n_chars_calc,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
         CAST(len(list_filter(ltoks, x -> list_contains(
             ['the','a','of','and','to','in','is','it'], x))) AS BIGINT) AS n_stop,
         n_punct
  FROM s
)
SELECT doc_id, n_chars_calc, n_tokens, n_distinct_tokens,
       floor((CASE WHEN n_tokens > 0
                  THEN (n_chars_calc - (n_tokens - 1)) / CAST(n_tokens AS DOUBLE)
                  ELSE 0.0 END) * 1000000 + 0.5) / 1000000 AS avg_token_len,
       floor((CASE WHEN n_tokens > 0 THEN n_stop / CAST(n_tokens AS DOUBLE)
                  ELSE 0.0 END) * 1000000 + 0.5) / 1000000 AS stopword_ratio,
       floor((CASE WHEN n_chars_calc > 0 THEN n_punct / CAST(n_chars_calc AS DOUBLE)
                  ELSE 0.0 END) * 1000000 + 0.5) / 1000000 AS punct_ratio,
       floor((0.4 * least(n_chars_calc / 200.0, 1.0)
           + 0.3 * least(CASE WHEN n_tokens > 0
                              THEN n_stop / CAST(n_tokens AS DOUBLE) ELSE 0.0 END * 4, 1.0)
           + 0.3 * CASE WHEN n_tokens > 0
                        THEN n_distinct_tokens / CAST(n_tokens AS DOUBLE)
                        ELSE 0.0 END) * 1000000 + 0.5) / 1000000 AS quality_score
FROM c
"""


def _lang_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """avg_quality is rounded at 4dp, NOT the 6dp of the per-doc scores:
    the mean of ~100 6dp-quantized doubles differs across engines in the
    last ulp (summation order), and a 6dp grain sits close enough to
    that noise to flip — measured as a 1-digit hash mismatch."""
    stats = textstats.with_text_stats(t(spark, sf_dir, "documents"))
    return stats.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        rnd(F.avg("n_chars"), 4).alias("avg_chars"),
        rnd(F.avg("n_tokens"), 4).alias("avg_tokens"),
        rnd(F.avg("quality_score"), 4).alias("avg_quality"),
    )


_LANG_QUALITY_SQL = r"""
WITH s AS (
  SELECT lang, n_chars,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
         CAST(length(text) AS BIGINT) AS n_chars_calc,
         CAST(len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
           AS n_distinct_tokens,
         CAST(len(list_filter(regexp_split_to_array(lower(text), '\s+'),
              x -> list_contains(['the','a','of','and','to','in','is','it'], x))) AS BIGINT)
           AS n_stop
  FROM documents
), q AS (
  SELECT lang, n_chars, n_tokens,
         floor((0.4 * least(n_chars_calc / 200.0, 1.0)
             + 0.3 * least(CASE WHEN n_tokens > 0
                                THEN n_stop / CAST(n_tokens AS DOUBLE) ELSE 0.0 END * 4, 1.0)
             + 0.3 * CASE WHEN n_tokens > 0
                          THEN n_distinct_tokens / CAST(n_tokens AS DOUBLE)
                          ELSE 0.0 END) * 1000000 + 0.5) / 1000000 AS quality_score
  FROM s
)
SELECT lang, count(*) AS n_docs,
       floor((avg(n_chars)) * 10000 + 0.5) / 10000 AS avg_chars,
       floor((avg(n_tokens)) * 10000 + 0.5) / 10000 AS avg_tokens,
       floor((avg(quality_score)) * 10000 + 0.5) / 10000 AS avg_quality
FROM q GROUP BY lang
"""


def _token_count_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish token counting (SURVEY north-star: token
    counting as a first-class operator)."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        textstats.token_count(F.col("text")).alias("ws_tokens"),
        textstats.bpe_token_count(F.col("text")).alias("bpe_tokens"),
    )


_TOKEN_COUNT_SQL = r"""
SELECT doc_id,
       CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)
         AS bpe_tokens
FROM documents
"""


def _jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-Jaccard near-dup pairs on a bounded slice (df-cap off
    so semantics are pure Jaccard; threshold tuned to the fixture's
    shared-vocabulary density)."""
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return dedup.token_jaccard_pairs(docs, threshold=0.8, max_df_ratio=1.0)


_JACCARD_PAIRS_SQL = r"""
WITH toks AS (
  SELECT doc_id AS id,
         unnest(list_distinct(regexp_split_to_array(lower(text), '\s+'))) AS tok
  FROM documents WHERE doc_id < 100
), sizes AS (
  SELECT id, count(*) AS sz FROM toks GROUP BY id
), inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
  FROM toks a JOIN toks b ON a.tok = b.tok AND a.id < b.id
  GROUP BY a.id, b.id
)
SELECT id_a, id_b,
       floor((inter / CAST(sa.sz + sb.sz - inter AS DOUBLE)) * 1000000 + 0.5) / 1000000 AS jaccard
FROM inter
JOIN sizes sa ON sa.id = id_a
JOIN sizes sb ON sb.id = id_b
WHERE floor((inter / CAST(sa.sz + sb.sz - inter AS DOUBLE)) * 1000000 + 0.5) / 1000000 >= 0.8
"""


def _neardup_dedup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup DEDUP (not just pair detection): exact-Jaccard
    pairs -> greedy min-id representative keep (dedup.keep_representatives)
    -> per-source survivor counts. The greedy keep is one anti-join —
    no iterative connected components — matching production dedup at
    scale; exact pairs make the whole path oracle-checkable."""
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    pairs = dedup.token_jaccard_pairs(docs, threshold=0.8, max_df_ratio=1.0)
    kept = dedup.keep_representatives(docs, pairs).groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept")
    )
    totals = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    return totals.join(kept, "source", "left").select(
        "source",
        "n_docs",
        F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
    )


_NEARDUP_DEDUP_SQL = r"""
WITH toks AS (
  SELECT doc_id AS id,
         unnest(list_distinct(regexp_split_to_array(lower(text), '\s+'))) AS tok
  FROM documents WHERE doc_id < 100
), sizes AS (
  SELECT id, count(*) AS sz FROM toks GROUP BY id
), inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
  FROM toks a JOIN toks b ON a.tok = b.tok AND a.id < b.id
  GROUP BY a.id, b.id
), losers AS (
  SELECT DISTINCT id_b AS doc_id
  FROM inter
  JOIN sizes sa ON sa.id = id_a
  JOIN sizes sb ON sb.id = id_b
  WHERE floor((inter / CAST(sa.sz + sb.sz - inter AS DOUBLE)) * 1000000 + 0.5) / 1000000 >= 0.8
), d AS (
  SELECT doc_id, source FROM documents WHERE doc_id < 100
)
SELECT source, count(*) AS n_docs,
       CAST(sum(CASE WHEN l.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM d LEFT JOIN losers l USING (doc_id)
GROUP BY source
"""


def _minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded MinHash-LSH near-dup pairs (approx; hash-seeded => rows-only
    driver check; recall measured vs exact Jaccard in tests)."""
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return dedup.minhash_lsh_pairs(
        docs, num_hashes=64, bands=16, shingle_n=1, threshold=0.7
    )


def _simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints (hash-seeded => rows-only driver check)."""
    return dedup.simhash64(t(spark, sf_dir, "documents"))


def _embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.cosine_topk_bruteforce(emb, queries, k=5).select(
        "query_id", "neighbor_id", "cosine_sim", "sim_rank"
    )


_EMBEDDING_TOPK_SQL = """
WITH sims AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         floor((list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                      CAST(c.embedding AS DOUBLE[]))) * 1000000 + 0.5) / 1000000 AS cosine_sim
  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < 10
), ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                    ORDER BY cosine_sim DESC, neighbor_id) AS BIGINT)
              AS sim_rank
  FROM sims
)
SELECT query_id, neighbor_id, cosine_sim, sim_rank FROM ranked WHERE sim_rank <= 5
"""


def _cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding-cosine near-dup pairs above threshold."""
    return similarity.cosine_pairs(t(spark, sf_dir, "embeddings"), threshold=0.85)


_COSINE_NEARDUP_SQL = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       floor((list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[]))) * 1000000 + 0.5) / 1000000 AS cosine_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE floor((list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[]))) * 1000000 + 0.5) / 1000000 >= 0.85
"""


def _ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH bucketed ANN (approx => rows-only driver check; recall@k
    vs the brute-force oracle measured in tests)."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    # 128 tables x 8 bits: recall@5 0.96 on the (adversarially random)
    # synthetic embeddings (was 64x8 at 0.82; the round-5 sweep measured
    # 0.82/0.88/0.96 at 64/96/128 tables with flat wall cost at sf0.1).
    # n_bits stays the occupancy/scale knob (~n/2^8 candidates per
    # table-bucket — scan fraction, the thing that matters at 100 TB);
    # n_tables is the recall knob and costs one linear bucket-row term.
    return similarity.lsh_topk(emb, queries, dim=64, k=5, n_tables=128, n_bits=8)


def _ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (k-means cells + multi-probe) ANN — the clustered-data scale
    path beside SRP-LSH (approx => rows-only check; recall@5 floor in
    tests/test_similarity.py). 32 cells / 12 probes scans ~37% of the
    corpus at recall 0.88 on the adversarially-random fixture (measured
    vs the brute-force oracle; was 0.66 at 16/6 — more, finer cells at
    the same scan fraction shrink per-cell variance). Round-5 knob
    sweep, same fixture: 64/20 holds 0.88 at 31% scan; 128/40 reaches
    0.98 at 31% scan — finer cells keep paying, at the cost of a bigger
    (bounded-sample, one-time) k-means fit that dominates wall locally
    but amortizes at corpus scale. 32/12 stays this query's operating
    point for bench comparability; the measured high-recall point ships
    as the `ann_ivf_topk_hi` sibling (the same split LSH got in round
    5). At 100 TB pick the finest cell count the fit budget allows."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.ivf_topk(emb, queries, k=5, n_cells=32, n_probe=12)


def _ann_ivf_topk_hi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN at the measured high-recall operating point from the
    round-5 knob sweep: 128 cells / 40 probes = recall@5 0.98 at a 31%
    expected scan fraction on the adversarially-random fixture (the
    registry's 32/12 sibling holds 0.88 at 37%). Finer cells shrink
    per-cell variance so the SAME scan fraction buys more recall; the
    extra cost is the one-time bounded-sample k-means fit (driver-side,
    corpus-size-independent), which amortizes to noise at 100 TB —
    this is the operating point a production deployment would run."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.ivf_topk(emb, queries, k=5, n_cells=128, n_probe=40)


def _binary_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal carriage: opaque binary payload + typed metadata
    (decode kernels stubbed; plumbing real — llmdata/multimodal.py)."""
    media = multimodal.text_as_media(t(spark, sf_dir, "documents"))
    return media.select("media_id", "modality", "mime", "byte_len", "sha256")


_BINARY_MEDIA_SQL = """
SELECT doc_id AS media_id,
       'text' AS modality,
       'text/plain' AS mime,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       sha256(text) AS sha256
FROM documents
"""


def _media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode/featurize pipeline over binary payloads (stub
    kernel; Arrow batch plumbing real). Deterministic => oracle-free but
    stable rows-only check."""
    media = multimodal.text_as_media(t(spark, sf_dir, "documents"))
    feats = multimodal.decode_and_featurize(media)
    return feats.select(
        "media_id",
        "byte_len",
        "width",
        "height",
        "n_frames",
        rnd(F.element_at(F.col("feature"), 1).cast("double"), 6).alias("f0"),
    )


def _bmp_decode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image codec differential test: build a valid 24bpp BMP per
    document whose width/height/fill are arithmetic on doc_id
    (multimodal.synthesize_media), then decode with the stdlib header+
    pixel parser (codecs.parse_bmp via decode_and_featurize). A correct
    decoder must recover exactly what the arithmetic predicts — so the
    DuckDB oracle is that arithmetic, and the driver hash check becomes
    an end-to-end proof the binary round trip works. dominant_bucket is
    the argmax of the pixel histogram: constant-fill means exactly one
    bucket holds mass 1.0, at (doc_id % 256) % 8."""
    media = multimodal.synthesize_media(t(spark, sf_dir, "documents"), "doc_id")
    feats = multimodal.decode_and_featurize(media.filter(F.col("modality") == "image"))
    return feats.select(
        (F.col("media_id") / 2).cast("long").alias("doc_id"),
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.array_position(F.col("feature"), F.array_max(F.col("feature")))
        .cast("long")
        .alias("dominant_bucket"),
        rnd(F.array_max(F.col("feature")).cast("double"), 6).alias("peak_mass"),
    )


_BMP_ROUNDTRIP_SQL = """
SELECT doc_id,
       CAST(4 + doc_id % 13 AS BIGINT) AS width,
       CAST(4 + doc_id % 7 AS BIGINT)  AS height,
       CAST((doc_id % 256) % 8 + 1 AS BIGINT) AS dominant_bucket,
       CAST(1.0 AS DOUBLE) AS peak_mass
FROM documents
"""


def _unigram_logprob_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc mean unigram log-probability under the corpus's own
    unigram model (textstats.unigram_logprob) — the CCNet-style quality
    proxy used to perplexity-bucket web corpora. Oracle replays the
    identical count/ln math in SQL."""
    return textstats.unigram_logprob(t(spark, sf_dir, "documents"))


_UNIGRAM_LOGPROB_SQL = r"""
WITH toks AS (
  SELECT doc_id AS id,
         unnest(string_split_regex(lower(text), '\s+')) AS tok
  FROM documents
), vocab AS (
  SELECT tok, count(*) AS cnt FROM toks GROUP BY tok
), tot AS (
  SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM vocab
), logp AS (
  SELECT tok, ln(cnt / total) AS lp FROM vocab, tot
)
SELECT id AS doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       floor(avg(lp) * 10000 + 0.5) / 10000 AS avg_logprob
FROM toks JOIN logp USING (tok)
GROUP BY id
"""


def _html_strip_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-corpus text extraction: wrap each document in deterministic
    HTML (title/head/body/p/a markup derived from its own fields), then
    recover the clean text with tag-strip + whitespace-normalize, pull
    the title and href, and count tags — the trafilatura-lite cleaning
    pass every web-scrape training pipeline runs. All patterns are
    RE2-safe (no lookaround) so Spark (java.util.regex) and DuckDB (RE2)
    agree; cleaning is pure codegen'd regexp work, scan-bound at scale."""
    d = t(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("<html><head><title>Doc "), F.col("doc_id"),
        F.lit("</title></head><body><p class=\"m\">"), F.col("text"),
        F.lit("</p><br/><a href=\"https://ex.com/d/"), F.col("doc_id"),
        F.lit("?lang="), F.col("lang"), F.lit("\">go</a></body></html>"),
    )
    stripped = F.trim(
        F.regexp_replace(F.regexp_replace(html, "<[^>]+>", " "), r"\s+", " ")
    )
    return d.select(
        "doc_id",
        F.regexp_extract(html, "<title>([^<]*)</title>", 1).alias("title"),
        F.size(F.regexp_extract_all(html, F.lit("<[^>]+>"), 0)).cast("long").alias("n_tags"),
        F.regexp_extract(html, "href=\"([^\"]*)\"", 1).alias("href"),
        F.md5(stripped).alias("clean_md5"),
        F.length(stripped).cast("long").alias("clean_len"),
    )


_HTML_STRIP_SQL = r"""
WITH h AS (
  SELECT doc_id,
         '<html><head><title>Doc ' || doc_id ||
         '</title></head><body><p class="m">' || text ||
         '</p><br/><a href="https://ex.com/d/' || doc_id ||
         '?lang=' || lang || '">go</a></body></html>' AS html
  FROM documents
), s AS (
  SELECT doc_id, html,
         trim(regexp_replace(regexp_replace(html, '<[^>]+>', ' ', 'g'),
                             '\s+', ' ', 'g')) AS stripped
  FROM h
)
SELECT doc_id,
       regexp_extract(html, '<title>([^<]*)</title>', 1)           AS title,
       CAST(len(regexp_extract_all(html, '<[^>]+>')) AS BIGINT)    AS n_tags,
       regexp_extract(html, 'href="([^"]*)"', 1)                   AS href,
       md5(stripped)                                               AS clean_md5,
       CAST(length(stripped) AS BIGINT)                            AS clean_len
FROM s
"""


def _url_parse_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition for web-corpus provenance: scheme, host, port,
    path, a query parameter, and fragment — extracted with the same
    RE2-safe patterns in both engines from deterministically synthesized
    URLs. The per-host/per-domain grouping this enables is how crawl
    pipelines rate-limit, dedup by site, and attribute provenance."""
    d = t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://h"), F.col("doc_id") % 5,
        F.lit(".example.org:8443/c/"), F.col("source"),
        F.lit("/"), F.col("doc_id"),
        F.lit("?page="), F.col("doc_id") % 7,
        F.lit("&ref=feed#s"), F.col("doc_id") % 3,
    )
    return d.select(
        "doc_id",
        F.regexp_extract(url, "^([a-z]+)://", 1).alias("scheme"),
        F.regexp_extract(url, "^[a-z]+://([^/:?#]+)", 1).alias("host"),
        F.regexp_extract(url, "^[a-z]+://[^/:?#]+:([0-9]+)", 1).cast("long").alias("port"),
        F.regexp_extract(url, "^[a-z]+://[^/?#]+(/[^?#]*)", 1).alias("path"),
        F.regexp_extract(url, "[?&]page=([^&#]*)", 1).cast("long").alias("page"),
        F.regexp_extract(url, "#(.*)$", 1).alias("fragment"),
    )


_URL_PARSE_SQL = r"""
WITH u AS (
  SELECT doc_id,
         'https://h' || (doc_id % 5) || '.example.org:8443/c/' || source ||
         '/' || doc_id || '?page=' || (doc_id % 7) || '&ref=feed#s' ||
         (doc_id % 3) AS url
  FROM documents
)
SELECT doc_id,
       regexp_extract(url, '^([a-z]+)://', 1)                     AS scheme,
       regexp_extract(url, '^[a-z]+://([^/:?#]+)', 1)             AS host,
       CAST(regexp_extract(url, '^[a-z]+://[^/:?#]+:([0-9]+)', 1) AS BIGINT) AS port,
       regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1)       AS path,
       CAST(regexp_extract(url, '[?&]page=([^&#]*)', 1) AS BIGINT) AS page,
       regexp_extract(url, '#(.*)$', 1)                           AS fragment
FROM u
"""


def _semantic_dedup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic (embedding-space) dedup over the embeddings table:
    k-means cells bound the cosine self-join (SemDeDup shape), vectors
    with a >=0.92-cosine lower-id cell-mate flagged as duplicates.
    Seeded fit => deterministic, but k-means is not SQL-expressible =>
    rows-only driver check; flag semantics asserted on planted
    duplicates in tests/test_similarity.py."""
    emb = t(spark, sf_dir, "embeddings")
    out = similarity.semantic_dedup(emb, threshold=0.92, n_cells=16)
    return (
        out.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("is_dup").alias("n_dups"),
        )
        .orderBy(F.col("n_vecs").desc(), F.col("cell"))
    )


def _passage_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document (passage-level) dedup — the boilerplate-removal pass
    document-level dedup can't do: fixed 8-token passages, global
    keep-first by (doc_id, position), documents reassembled from their
    surviving passages. Hash-checked end to end: the oracle replays the
    identical split/rank/reassemble in SQL and md5-compares the
    reassembled text."""
    docs = t(spark, sf_dir, "documents")
    out = dedup.passage_dedup(docs, unit_tokens=8)
    return out.select(
        "doc_id",
        "n_units",
        "n_kept",
        F.md5(F.col("kept_text")).alias("kept_md5"),
    )


_PASSAGE_DEDUP_SQL = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents
),
pos_t AS (
  SELECT doc_id, t,
         unnest(generate_series(0, CAST(ceil(len(t) / 8.0) AS INT) - 1)) AS pos
  FROM toks
),
units AS (
  SELECT doc_id, pos,
         array_to_string(t[pos * 8 + 1 : pos * 8 + 8], ' ') AS unit
  FROM pos_t
),
ranked AS (
  SELECT doc_id, pos, unit,
         row_number() OVER (PARTITION BY md5(unit) ORDER BY doc_id, pos) AS rn
  FROM units
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_units,
       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       md5(coalesce(string_agg(CASE WHEN rn = 1 THEN unit END, ' ' ORDER BY pos), ''))
         AS kept_md5
FROM ranked
GROUP BY doc_id
"""


def _bmp_resize_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize differential test: synthesize real BMPs, nearest-neighbor
    resize to a fixed 8x6 (multimodal.resize_images -> codecs.resize_bmp),
    decode the RESIZED payloads. A correct resample of a constant-fill
    image preserves the fill, so the oracle can predict the decoded
    dims (8, 6 always) AND the dominant histogram bucket — resizing that
    corrupts pixels or emits broken headers fails the hash."""
    media = multimodal.synthesize_media(t(spark, sf_dir, "documents"), "doc_id")
    resized = multimodal.resize_images(media.filter(F.col("modality") == "image"), 8, 6)
    feats = multimodal.decode_and_featurize(resized)
    return feats.select(
        (F.col("media_id") / 2).cast("long").alias("doc_id"),
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.array_position(F.col("feature"), F.array_max(F.col("feature")))
        .cast("long")
        .alias("dominant_bucket"),
    )


_BMP_RESIZE_SQL = """
SELECT doc_id,
       CAST(8 AS BIGINT) AS width,
       CAST(6 AS BIGINT) AS height,
       CAST((doc_id % 256) % 8 + 1 AS BIGINT) AS dominant_bucket
FROM documents
"""


def _wav_decode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio codec differential test, same construction as
    bmp_decode_roundtrip: canonical PCM16 WAVs with id-derived
    sample_rate/channels/frame-count, parsed back by the stdlib RIFF
    chunk walker (codecs.parse_wav). Feature-schema overload: for audio,
    width carries sample_rate and height carries channels."""
    media = multimodal.synthesize_media(t(spark, sf_dir, "documents"), "doc_id")
    feats = multimodal.decode_and_featurize(media.filter(F.col("modality") == "audio"))
    return feats.select(
        ((F.col("media_id") - 1) / 2).cast("long").alias("doc_id"),
        F.col("width").cast("long").alias("sample_rate"),
        F.col("height").cast("long").alias("channels"),
        F.col("n_frames").cast("long").alias("n_frames"),
    )


_WAV_ROUNDTRIP_SQL = """
SELECT doc_id,
       CAST(8000 + (doc_id % 8) * 1000 AS BIGINT) AS sample_rate,
       CAST(1 + doc_id % 2 AS BIGINT)             AS channels,
       CAST(60 + doc_id % 40 AS BIGINT)           AS n_frames
FROM documents
"""


def _hash_split_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 dataset split by multiplicative id hash
    (llmdata/sampling.py): pure map-side arithmetic, reproducible across
    engines/partitionings — the oracle runs the SAME integer math, which
    df.sample()/randomSplit() could never satisfy."""
    from ..llmdata.sampling import hash_split

    d = hash_split(
        t(spark, sf_dir, "documents"),
        "doc_id",
        [("train", 0.8), ("val", 0.1), ("test", 0.1)],
    )
    return d.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.countDistinct("source").alias("n_sources"),
    )


_HASH_SPLIT_SQL = """
WITH b AS (
  SELECT *, ((doc_id % 2147483648) * 2654435761) % 1000 AS bucket FROM documents
)
SELECT CASE WHEN bucket < 800 THEN 'train'
            WHEN bucket < 900 THEN 'val'
            ELSE 'test' END AS split,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       count(DISTINCT source) AS n_sources
FROM b GROUP BY 1
"""


def _sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: documents fill 512-token context-window bins
    per shard, contiguous in doc_id order (llmdata/sampling.py
    pack_sequences — window cumsum, no driver state, shards set the
    parallelism). Result: per-bin document count and token load."""
    from ..llmdata.sampling import pack_sequences

    d = t(spark, sf_dir, "documents").select(
        "doc_id", textstats.token_count(F.col("text")).alias("n_tokens")
    )
    packed = pack_sequences(d, "doc_id", "n_tokens", budget=512, n_shards=8)
    return packed.groupBy("shard", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("sum_tokens")
    )


_SEQUENCE_PACKING_SQL = r"""
WITH d AS (
  SELECT doc_id, doc_id % 8 AS shard,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
  FROM documents
), c AS (
  SELECT *, coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM d
)
SELECT shard, CAST(floor(cum_before / 512) AS BIGINT) AS bin_id,
       count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
FROM c GROUP BY 1, 2
"""


def _stratified_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sampleBy analog with deterministic per-stratum keep fractions
    (llmdata/sampling.py stratified_sample): rebalancing a multilingual
    corpus by downsampling dominant languages, reproducibly."""
    from ..llmdata.sampling import stratified_sample

    s = stratified_sample(
        t(spark, sf_dir, "documents"),
        "lang",
        {"en": 0.5, "de": 1.0, "fr": 0.25, "es": 0.25, "zh": 0.1},
        "doc_id",
    )
    return s.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("sum_chars")
    )


_STRATIFIED_SAMPLE_SQL = """
WITH b AS (
  SELECT *, ((doc_id % 2147483648) * 2654435761) % 1000 AS bucket FROM documents
), kept AS (
  SELECT * FROM b
  WHERE bucket < CASE lang WHEN 'en' THEN 500 WHEN 'de' THEN 1000
                           WHEN 'fr' THEN 250 WHEN 'es' THEN 250
                           WHEN 'zh' THEN 100 ELSE 0 END
)
SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM kept GROUP BY lang
"""


def _weighted_mix_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted dataset mixing (llmdata/sampling.py weighted_mix):
    three language corpora mixed toward 50/30/20 target proportions by
    downsampling (keep fraction w_i*C/n_i, C = min n_i/w_i), membership
    by id hash. The oracle reproduces the same double arithmetic."""
    from ..llmdata.sampling import weighted_mix

    d = t(spark, sf_dir, "documents")
    mixed = weighted_mix(
        {
            "en": (d.filter(F.col("lang") == "en"), 0.5),
            "fr": (d.filter(F.col("lang") == "fr"), 0.3),
            "zh": (d.filter(F.col("lang") == "zh"), 0.2),
        },
        "doc_id",
    )
    return mixed.groupBy("mix_source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("sum_chars")
    )


_WEIGHTED_MIX_SQL = """
WITH src AS (
  SELECT *, lang AS mix_source,
         CAST(CASE lang WHEN 'en' THEN 0.5 WHEN 'fr' THEN 0.3 ELSE 0.2 END
              AS DOUBLE) AS w
  FROM documents WHERE lang IN ('en', 'fr', 'zh')
), n AS (
  SELECT mix_source, w, count(*) AS cnt FROM src GROUP BY 1, 2
), c AS (
  SELECT min(cnt / w) AS c FROM n
), thr AS (
  SELECT n.mix_source,
         CAST(floor(n.w * c.c / n.cnt * 1000 + 0.5) AS BIGINT) AS thr
  FROM n, c
)
SELECT s.mix_source, count(*) AS n_docs, CAST(sum(s.n_chars) AS BIGINT) AS sum_chars
FROM src s JOIN thr ON s.mix_source = thr.mix_source
WHERE ((s.doc_id % 2147483648) * 2654435761) % 1000 < thr.thr
GROUP BY s.mix_source
"""


def _chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window chunking with overlap (llmdata/sampling.py
    chunk_documents): 64-token windows, stride 48 — each chunk then fits
    a pack_sequences bin. Chunk text is carried as an md5 fingerprint so
    the result stays compact while still value-checking the slicing."""
    from ..llmdata.sampling import chunk_documents

    c = chunk_documents(
        t(spark, sf_dir, "documents"), "doc_id", "text", budget=64, overlap=16
    )
    return c.select(
        "doc_id", "chunk_id", "chunk_tokens", F.md5("chunk_text").alias("chunk_md5")
    )


_CHUNK_DOCUMENTS_SQL = r"""
WITH d AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n
  FROM documents
), e AS (
  SELECT doc_id, toks, n,
         unnest(generate_series(0,
           CASE WHEN n <= 64 THEN 0
                ELSE CAST(ceil((n - 64) / 48.0) AS BIGINT) END)) AS chunk_id
  FROM d
)
SELECT doc_id, chunk_id,
       CAST(len(toks[chunk_id * 48 + 1 : chunk_id * 48 + 64]) AS BIGINT)
         AS chunk_tokens,
       md5(array_to_string(toks[chunk_id * 48 + 1 : chunk_id * 48 + 64], ' '))
         AS chunk_md5
FROM e
"""


def _decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination (llmdata/hygiene.py): docs with doc_id%97==0
    act as the held-out benchmark; every other doc sharing any word 3-gram
    with it is flagged. Real pipelines use 8-13-gram overlap (GPT-3/PaLM
    methodology); the fixture's ~30-word vocabulary needs n=3 for signal.
    Plan: explode train grams -> broadcast semi-join eval grams -> distinct
    ids -> broadcast flag join. One narrow corpus scan, no cartesian."""
    docs = t(spark, sf_dir, "documents")
    eval_df = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    flagged = hygiene.flag_contaminated(
        train, hygiene.eval_ngram_set(eval_df, n=3), n=3
    )
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("is_contaminated").cast("bigint").alias("n_contaminated"),
    )


_DECONTAMINATE_SQL = r"""
WITH words AS (
  SELECT doc_id, source, regexp_split_to_array(trim(lower(text)), '\s+') AS w
  FROM documents
), pos AS (
  SELECT doc_id, source, w, unnest(generate_series(1, len(w) - 2)) AS i FROM words
), grams AS (
  SELECT doc_id, source, array_to_string(w[i:i+2], ' ') AS gram FROM pos
), eval_grams AS (
  SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0
), hits AS (
  SELECT DISTINCT g.doc_id FROM grams g JOIN eval_grams e USING (gram)
  WHERE g.doc_id % 97 <> 0
)
SELECT d.source, count(*) AS n_docs,
       CAST(sum(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % 97 <> 0
GROUP BY d.source
"""


def _repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style intra-doc repetition signals: duplicate-2/3-gram
    fraction + top-word frequency share. Pure higher-order array fns —
    per-row, shuffle-free (llmdata/hygiene.py)."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return hygiene.with_repetition_stats(docs).select(
        "doc_id", "dup_2gram_frac", "dup_3gram_frac", "top_word_frac"
    )


_REPETITION_STATS_SQL = r"""
WITH s AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
  FROM documents
), g AS (
  SELECT doc_id, toks,
    list_transform(generate_series(1, len(toks)-1),
                   i -> array_to_string(toks[i:i+1], ' ')) AS g2,
    list_transform(generate_series(1, len(toks)-2),
                   i -> array_to_string(toks[i:i+2], ' ')) AS g3
  FROM s
)
SELECT doc_id,
  CASE WHEN len(g2) > 0 THEN floor((1.0 - len(list_distinct(g2)) / CAST(len(g2) AS DOUBLE)) * 1000000 + 0.5) / 1000000 ELSE 0.0 END AS dup_2gram_frac,
  CASE WHEN len(g3) > 0 THEN floor((1.0 - len(list_distinct(g3)) / CAST(len(g3) AS DOUBLE)) * 1000000 + 0.5) / 1000000 ELSE 0.0 END AS dup_3gram_frac,
  CASE WHEN len(toks) > 0 THEN floor((list_max(list_transform(list_distinct(toks),
       w -> len(list_filter(toks, t -> t = w)))) / CAST(len(toks) AS DOUBLE)) * 1000000 + 0.5) / 1000000 ELSE 0.0 END AS top_word_frac
FROM g
"""


def _pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detect + redact (llmdata/hygiene.py). The synthetic corpus
    carries no PII, so deterministic emails/phones/IPs are injected first
    (doc_id-derived on BOTH engine and oracle sides), then scrubbed:
    counts per type + md5 of the redacted text prove exact redaction."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    injected = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.col("text"), F.lit(" contact user"),
                F.col("doc_id").cast("string"), F.lit("@example.com now"),
            ),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(
                F.col("text"), F.lit(" call 415-555-0"),
                F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
                F.lit(" or visit 10.0."),
                (F.col("doc_id") % 256).cast("string"), F.lit(".1"),
            ),
        )
        .otherwise(F.col("text")),
    )
    return hygiene.scrub_pii(injected).select(
        "doc_id", "n_emails", "n_phones", "n_ips",
        F.md5("redacted").alias("redacted_md5"),
    )


_PII_SCRUB_SQL = r"""
WITH inj AS (
  SELECT doc_id,
    CASE WHEN doc_id % 3 = 0 THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
         WHEN doc_id % 3 = 1 THEN text || ' call 415-555-0' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                                       || ' or visit 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1'
         ELSE text END AS text
  FROM documents
)
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(text, '\b\d{3}-\d{3}-\d{4}\b')) AS BIGINT) AS n_phones,
  CAST(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
  md5(regexp_replace(regexp_replace(regexp_replace(text,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        '\b\d{3}-\d{3}-\d{4}\b', '[PHONE]', 'g'),
        '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g')) AS redacted_md5
FROM inj
"""


def _global_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle-sharding for training-data interleave
    (llmdata/hygiene.py): shard from md5(seed:doc_id) hex digits — hash
    assignment, never a single-partition row_number, so it scales to any
    corpus. Per-shard count/bytes plus the md5 order endpoints (the
    within-shard interleave order) are hash-checked."""
    docs = t(spark, sf_dir, "documents")
    s = hygiene.shard_assign(docs, "doc_id", n_shards=8)
    return s.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.min("shuffle_key").alias("first_key"),
        F.max("shuffle_key").alias("last_key"),
    )


_GLOBAL_SHUFFLE_SQL = """
WITH h AS (
  SELECT doc_id, n_chars, md5('s42:' || CAST(doc_id AS VARCHAR)) AS k FROM documents
), v AS (
  SELECT *,
    (CASE WHEN ascii(substr(k,1,1)) >= 97 THEN ascii(substr(k,1,1)) - 87
          ELSE ascii(substr(k,1,1)) - 48 END) * 16
  + (CASE WHEN ascii(substr(k,2,1)) >= 97 THEN ascii(substr(k,2,1)) - 87
          ELSE ascii(substr(k,2,1)) - 48 END) AS hv
  FROM h
)
SELECT CAST(hv % 8 AS BIGINT) AS shard, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       min(k) AS first_key, max(k) AS last_key
FROM v GROUP BY 1
"""


def _training_data_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data pipeline, end to end: hold out an eval
    set -> quality gate (token floor + quality score) -> exact dedup
    (min-id representative per content hash) -> eval-set decontamination
    -> deterministic shuffle-sharding -> per-shard manifest. This is the
    production order of operations at 100 TB: each gate shrinks the data
    before the next, pricier one (quality is a scan, dedup one shuffle,
    decontamination an explode over survivors only), and every stage is a
    library call (textstats / dedup-shape / hygiene) composed lazily into
    ONE Catalyst plan — no materialization between stages."""
    docs = t(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 97 != 0)
    stats = textstats.with_text_stats(train)
    kept = stats.filter(
        (F.col("n_tokens") >= 20) & (F.col("quality_score") >= 0.45)
    )
    # min-id representative per content hash via one window pass: a
    # groupBy + semi-join-back would scan `kept` twice and shuffle twice.
    from pyspark.sql.window import Window as W

    w = W.partitionBy(F.md5("text")).orderBy("doc_id")
    uniq = (
        kept.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    eval_grams = hygiene.eval_ngram_set(
        docs.filter(F.col("doc_id") % 97 == 0), n=3
    )
    clean = hygiene.flag_contaminated(uniq, eval_grams, n=3).filter(
        F.col("is_contaminated") == 0
    )
    sharded = hygiene.shard_assign(clean, "doc_id", n_shards=4)
    return sharded.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    )


_TRAINING_DATA_PREP_SQL = r"""
WITH stats AS (
  SELECT doc_id, text, n_chars,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
         CAST(length(text) AS BIGINT) AS n_chars_calc,
         CAST(len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS n_distinct_tokens,
         CAST(len(list_filter(regexp_split_to_array(lower(text), '\s+'),
              x -> list_contains(['the','a','of','and','to','in','is','it'], x))) AS BIGINT) AS n_stop
  FROM documents WHERE doc_id % 97 <> 0
), q AS (
  SELECT doc_id, text, n_chars, n_tokens,
         floor((0.4 * least(n_chars_calc / 200.0, 1.0)
             + 0.3 * least(CASE WHEN n_tokens > 0 THEN n_stop / CAST(n_tokens AS DOUBLE) ELSE 0.0 END * 4, 1.0)
             + 0.3 * CASE WHEN n_tokens > 0 THEN n_distinct_tokens / CAST(n_tokens AS DOUBLE) ELSE 0.0 END)
           * 1000000 + 0.5) / 1000000 AS quality_score
  FROM stats
), kept AS (
  SELECT * FROM q WHERE n_tokens >= 20 AND quality_score >= 0.45
), reps AS (
  SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text)
), uniq AS (
  SELECT k.* FROM kept k JOIN reps r USING (doc_id)
), ew AS (
  SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS w
  FROM documents WHERE doc_id % 97 = 0
), ep AS (SELECT w, unnest(generate_series(1, len(w) - 2)) AS i FROM ew),
eval_grams AS (SELECT DISTINCT array_to_string(w[i:i+2], ' ') AS gram FROM ep),
uw AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS w FROM uniq
), up AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i FROM uw),
ug AS (SELECT doc_id, array_to_string(w[i:i+2], ' ') AS gram FROM up),
contaminated AS (SELECT DISTINCT ug.doc_id FROM ug JOIN eval_grams USING (gram)),
clean AS (
  SELECT u.* FROM uniq u LEFT JOIN contaminated c USING (doc_id)
  WHERE c.doc_id IS NULL
), sh AS (
  SELECT *, md5('s42:' || CAST(doc_id AS VARCHAR)) AS k FROM clean
), v AS (
  SELECT *,
    (CASE WHEN ascii(substr(k,1,1)) >= 97 THEN ascii(substr(k,1,1)) - 87
          ELSE ascii(substr(k,1,1)) - 48 END) * 16
  + (CASE WHEN ascii(substr(k,2,1)) >= 97 THEN ascii(substr(k,2,1)) - 87
          ELSE ascii(substr(k,2,1)) - 48 END) AS hv
  FROM sh
)
SELECT CAST(hv % 4 AS BIGINT) AS shard, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM v GROUP BY 1
"""


def _vector_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids (the reduce step of k-means /
    class-prototype computation): posexplode to (label, pos, val), then
    groupBy(label, pos) avg. Map-side partial aggregation collapses the
    exploded rows to labels x dim per task BEFORE the shuffle, so the
    exchange carries centroids, not vectors — the plan that survives a
    billion-vector corpus."""
    e = t(spark, sf_dir, "embeddings")
    ex = e.select("label", F.posexplode("embedding").alias("pos", "val"))
    return ex.groupBy("label", F.col("pos").cast("long").alias("pos")).agg(
        F.count(F.lit(1)).alias("n_vecs"),
        rnd(F.avg(F.col("val").cast("double")), 6).alias("centroid_val"),
    )


_VECTOR_CENTROIDS_SQL = """
WITH ex AS (
  SELECT label, unnest(range(len(embedding))) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS val
  FROM embeddings
)
SELECT label, pos, count(*) AS n_vecs,
       floor(avg(val) * 1000000 + 0.5) / 1000000 AS centroid_val
FROM ex GROUP BY label, pos
"""


def _frame_sample_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling manifest (llmdata/multimodal.py sample_frames):
    documents-as-media -> every 4th frame as its own row. The stub frame
    count/key derive deterministically from payload bytes, so DuckDB can
    oracle the full 1->N explode contract."""
    media = multimodal.text_as_media(t(spark, sf_dir, "documents"))
    return multimodal.sample_frames(media, stride=4, bytes_per_frame=16)


_FRAME_SAMPLE_SQL = """
WITH m AS (
  SELECT doc_id AS media_id, sha256(text) AS sha,
         octet_length(encode(text)) AS blen
  FROM documents
), f AS (
  SELECT media_id, sha,
         unnest(range(0, greatest(blen // 16, 1), 4)) AS frame_idx
  FROM m
)
SELECT media_id, frame_idx,
       md5(sha || ':' || CAST(frame_idx AS VARCHAR)) AS frame_key
FROM f
"""


def _vocab_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level vocabulary statistics: global token frequencies with a
    deterministic top-20 (count desc, token asc). explode -> two-phase
    hash aggregate: the map side pre-counts per partition, so the token
    shuffle carries one row per (partition x distinct token), not one per
    occurrence — at 100 TB that is vocabulary-sized, not corpus-sized.
    The top-k compiles to TakeOrderedAndProject (per-partition heaps +
    driver merge), never a global sort materialization."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    return (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("tok"))
        .limit(20)
    )


_VOCAB_TOP20_SQL = r"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS tok FROM documents
)
SELECT tok, count(*) AS n_occurrences
FROM toks WHERE tok <> ''
GROUP BY tok
ORDER BY n_occurrences DESC, tok
LIMIT 20
"""


def _tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document TF-IDF, top-3 terms per doc. The ranking key is
    integer-only (tf desc, doc-freq asc, token asc) so libm ln() ulp
    noise in the score can never flip which rows are selected; the score
    itself is rounded for the value hash. Plan shape: ONE explode pass —
    doc-frequency is an unordered count window over the tf rows
    partitioned by token (vocabulary-bounded state), not a second
    aggregate + self-join that would re-explode the corpus; the one-row
    corpus count joins as a broadcast cross join."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    from pyspark.sql.window import Window as W

    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(W.partitionBy("tok")))
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            rnd(F.col("tf") * F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))), 6),
        )
    )

    w = W.partitionBy("doc_id").orderBy(F.col("tf").desc(), F.col("df").asc(), F.col("tok"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "tok", "tf", "df", "tfidf", "rn")
    )


_TFIDF_TOP_TERMS_SQL = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
  FROM documents
), tf AS (
  SELECT doc_id, tok, count(*) AS tf FROM toks WHERE tok <> '' GROUP BY doc_id, tok
), dfreq AS (
  SELECT tok, count(*) AS df FROM tf GROUP BY tok
), nd AS (
  SELECT count(*) AS n_docs FROM documents
), scored AS (
  SELECT t.doc_id, t.tok, t.tf, d.df,
         floor((t.tf * ln((nd.n_docs + 1.0) / (d.df + 1.0))) * 1000000 + 0.5) / 1000000
           AS tfidf,
         row_number() OVER (PARTITION BY t.doc_id
                            ORDER BY t.tf DESC, d.df ASC, t.tok) AS rn
  FROM tf t JOIN dfreq d USING (tok) CROSS JOIN nd
)
SELECT doc_id, tok, tf, df, tfidf, rn FROM scored WHERE rn <= 3
"""


def _dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster discovery: exact Jaccard near-dup pairs ->
    connected components via iterative min-label propagation
    (dedup.connected_components — a genuinely iterative Spark algorithm,
    one shuffle per round, lineage checkpointed). The oracle computes
    the same components with a recursive-CTE transitive closure, so the
    driver hash-checks an iterative algorithm end-to-end. At the 0.95
    threshold on the 500-doc slice the fixture yields ~20 components
    including chained (transitive) clusters — the structure greedy
    pairwise dedup gets wrong and CC exists to fix. The id cap bounds
    the all-pairs candidate join at any SF (unbounded near-dup runs go
    through the LSH path, not exact token Jaccard)."""
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    pairs = dedup.token_jaccard_pairs(docs, threshold=0.95, max_df_ratio=1.0)
    labels = dedup.connected_components(pairs)
    return labels.groupBy(F.col("comp").alias("component")).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.max("node").alias("max_member"),
    )


_DUP_COMPONENTS_SQL = r"""
WITH RECURSIVE toks AS (
  SELECT doc_id AS id,
         unnest(list_distinct(regexp_split_to_array(lower(text), '\s+'))) AS tok
  FROM documents WHERE doc_id < 500
), sizes AS (
  SELECT id, count(*) AS sz FROM toks GROUP BY id
), inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
  FROM toks a JOIN toks b ON a.tok = b.tok AND a.id < b.id
  GROUP BY a.id, b.id
), pairs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sizes sa ON sa.id = id_a
  JOIN sizes sb ON sb.id = id_b
  WHERE floor((inter / CAST(sa.sz + sb.sz - inter AS DOUBLE)) * 1000000 + 0.5) / 1000000 >= 0.95
), edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
), reach AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
), comp AS (
  SELECT u AS node, least(u, min(v)) AS comp FROM reach GROUP BY u
)
SELECT comp AS component,
       CAST(count(*) AS BIGINT) AS n_members,
       max(node) AS max_member
FROM comp GROUP BY comp
"""


QUERIES: dict[str, QuerySpec] = {
    "dup_components": QuerySpec(
        _dup_components, duck_materialize(_DUP_COMPONENTS_SQL), "connected components of near-dup pairs"
    ),
    "vocab_top20": QuerySpec(_vocab_top20, _VOCAB_TOP20_SQL, "global token frequency top-k"),
    "tfidf_top_terms": QuerySpec(
        _tfidf_top_terms, _TFIDF_TOP_TERMS_SQL, "per-doc TF-IDF top terms"
    ),
    "frame_sample_manifest": QuerySpec(
        _frame_sample_manifest, _FRAME_SAMPLE_SQL, "mapInPandas frame sampling (stub kernel)"
    ),
    "vector_centroids": QuerySpec(
        _vector_centroids, _VECTOR_CENTROIDS_SQL, "per-label embedding centroids"
    ),
    "training_data_prep": QuerySpec(
        _training_data_prep, _TRAINING_DATA_PREP_SQL,
        "composed pipeline: quality -> dedup -> decontaminate -> shard",
    ),
    "decontaminate_ngrams": QuerySpec(
        _decontaminate, _DECONTAMINATE_SQL, "eval-set n-gram decontamination"
    ),
    "repetition_stats": QuerySpec(
        _repetition_stats, _REPETITION_STATS_SQL, "intra-doc repetition signals"
    ),
    "pii_scrub": QuerySpec(_pii_scrub, _PII_SCRUB_SQL, "PII detect + redact"),
    "global_shuffle_shards": QuerySpec(
        _global_shuffle_shards, _GLOBAL_SHUFFLE_SQL, "deterministic shuffle-sharding"
    ),
    "chunk_documents": QuerySpec(
        _chunk_documents, _CHUNK_DOCUMENTS_SQL, "token-window doc chunking"
    ),
    "stratified_sample_counts": QuerySpec(
        _stratified_sample_counts, _STRATIFIED_SAMPLE_SQL, "deterministic sampleBy"
    ),
    "weighted_mix_summary": QuerySpec(
        _weighted_mix_summary, _WEIGHTED_MIX_SQL, "weighted dataset mixing"
    ),
    "hash_split_summary": QuerySpec(
        _hash_split_summary, _HASH_SPLIT_SQL, "deterministic train/val/test split"
    ),
    "sequence_packing": QuerySpec(
        _sequence_packing, _SEQUENCE_PACKING_SQL, "token-budget sequence packing"
    ),
    "exact_dedup": QuerySpec(_exact_dedup, _EXACT_DEDUP_SQL, "exact dedup via content hash"),
    "bow_fingerprint": QuerySpec(_bow_fingerprint, _BOW_FINGERPRINT_SQL, "doc fingerprinting"),
    "text_stats": QuerySpec(_text_stats, _TEXT_STATS_SQL, "per-doc text statistics"),
    "lang_quality_summary": QuerySpec(_lang_quality, _LANG_QUALITY_SQL, "per-lang quality"),
    "token_count_kit": QuerySpec(_token_count_kit, _TOKEN_COUNT_SQL, "ws + BPE-ish tokens"),
    "jaccard_pairs": QuerySpec(_jaccard_pairs, _JACCARD_PAIRS_SQL, "exact n-gram Jaccard dedup"),
    "neardup_dedup_summary": QuerySpec(
        _neardup_dedup_summary, _NEARDUP_DEDUP_SQL, "near-dup pairs -> greedy keep"
    ),
    "minhash_lsh_pairs": QuerySpec(_minhash_lsh, None, "MinHash-LSH near-dup (approx)"),
    "simhash_fingerprints": QuerySpec(_simhash, None, "SimHash fingerprints"),
    "embedding_topk": QuerySpec(_embedding_topk, _EMBEDDING_TOPK_SQL, "brute-force cosine top-k"),
    "cosine_neardup_pairs": QuerySpec(_cosine_neardup, _COSINE_NEARDUP_SQL, "cosine near-dup"),
    "ann_lsh_topk": QuerySpec(_ann_lsh_topk, None, "SRP-LSH ANN top-k (approx)"),
    "ann_ivf_topk": QuerySpec(_ann_ivf_topk, None, "IVF k-means ANN top-k (approx)"),
    "ann_ivf_topk_hi": QuerySpec(
        _ann_ivf_topk_hi,
        None,
        "IVF ANN at the measured high-recall point (128 cells / 40 probes)",
    ),
    "binary_media_meta": QuerySpec(_binary_media, _BINARY_MEDIA_SQL, "multimodal carriage"),
    "media_features": QuerySpec(
        _media_features, None, "mapInPandas decode/featurize (real BMP/WAV, fallback else)"
    ),
    "bmp_decode_roundtrip": QuerySpec(
        _bmp_decode_roundtrip, _BMP_ROUNDTRIP_SQL, "real BMP build+parse vs arithmetic oracle"
    ),
    "wav_decode_roundtrip": QuerySpec(
        _wav_decode_roundtrip, _WAV_ROUNDTRIP_SQL, "real WAV build+parse vs arithmetic oracle"
    ),
    "bmp_resize_roundtrip": QuerySpec(
        _bmp_resize_roundtrip, _BMP_RESIZE_SQL, "nearest-neighbor resize then decode vs oracle"
    ),
    "passage_dedup_stats": QuerySpec(
        _passage_dedup_stats, _PASSAGE_DEDUP_SQL, "sub-document passage dedup, md5-checked"
    ),
    "semantic_dedup_summary": QuerySpec(
        _semantic_dedup_summary, None, "SemDeDup-shape embedding dedup (k-means cells)"
    ),
    "html_strip_kit": QuerySpec(
        _html_strip_kit, _HTML_STRIP_SQL, "HTML tag-strip/extract cleaning pass"
    ),
    "unigram_logprob_scores": QuerySpec(
        _unigram_logprob_scores, _UNIGRAM_LOGPROB_SQL, "CCNet-style LM-quality proxy"
    ),
    "url_parse_kit": QuerySpec(
        _url_parse_kit, _URL_PARSE_SQL, "URL scheme/host/port/path/query/fragment parse"
    ),
}
