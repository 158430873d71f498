"""Round-4 surface additions, part 11: corpus statistics and embedding
diagnostics for the training-data pipeline.

`readability_kit` is Flesch-style readability over a vowel-group
syllable proxy (pure regexp counts — all JVM-side); `zipf_fit` fits the
Zipf exponent of the token frequency distribution (log-log OLS over the
top-1000 ranks, the standard corpus-health check: natural text ≈ −1);
`embedding_norm_audit` is the vector-column quality gate (dim
consistency, zero/NaN vectors, norm range) run before any ANN/dedup
consumes the embeddings; `containment_pairs` detects quote/subset
duplication that symmetric Jaccard misses (directed |A∩B|/|A| via the
same posting-list join as the Jaccard path); `pca_variance` is the
one-pass distributed PCA moment computation with a driver-side d×d
eigensolve (rows-only: eigensolves aren't SQL — the pytest oracle
checks it against numpy's full-precision PCA).

Determinism: counts and ranks are exact integers; per-vector norms cast
float32 elements to double BEFORE squaring on both engines (identical
sequential fold), rounded at 6; corpus-level averages and OLS moments
round at 3-4 to absorb partial-aggregation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llmdata import dedup
from ..llmdata.decomp import pca_explained_variance
from .core import QuerySpec, bounded_collect, rnd, t


# --------------------------------------------------------------------------
# readability_kit — Flesch-style readability via regexp counts
# --------------------------------------------------------------------------


def _readability_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source readability: words (whitespace split), sentences
    (terminal-punctuation runs, min 1), syllable proxy (vowel-group
    runs, min 1), Flesch reading ease 206.835 − 1.015·(W/S) −
    84.6·(Syl/W). Every count is an exact JVM-side regexp count; the
    per-doc score is a fixed double chain; per-source averages round at
    4."""
    d = t(spark, sf_dir, "documents")
    words = F.greatest(
        F.lit(1).cast("long"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long"),
    )
    sents = F.greatest(
        F.lit(1).cast("long"), F.regexp_count(F.col("text"), F.lit(r"[.!?]+"))
    )
    syll = F.greatest(
        F.lit(1).cast("long"),
        F.regexp_count(F.lower(F.col("text")), F.lit(r"[aeiouy]+")),
    )
    per = d.select(
        "source",
        words.alias("w"),
        sents.alias("s"),
        syll.alias("y"),
    ).withColumn(
        "flesch",
        F.lit(206.835)
        - F.lit(1.015) * (F.col("w") / F.col("s"))
        - F.lit(84.6) * (F.col("y") / F.col("w")),
    )
    return (
        per.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            rnd(F.avg(F.col("w") / F.col("s")), 4).alias("avg_words_per_sent"),
            rnd(F.avg(F.col("y") / F.col("w")), 4).alias("avg_syll_per_word"),
            rnd(F.avg("flesch"), 4).alias("avg_flesch"),
        )
        .orderBy("source")
    )


_READABILITY_SQL = r"""
WITH per AS (
  SELECT source,
         greatest(1, len(regexp_split_to_array(trim(text), '\s+'))) AS w,
         greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS s,
         greatest(1, len(regexp_extract_all(lower(text), '[aeiouy]+'))) AS y
  FROM documents
), scored AS (
  SELECT source, w, s, y,
         206.835 - 1.015 * (w / CAST(s AS DOUBLE))
                 - 84.6 * (y / CAST(w AS DOUBLE)) AS flesch
  FROM per
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       floor(avg(w / CAST(s AS DOUBLE)) * 10000 + 0.5) / 10000
         AS avg_words_per_sent,
       floor(avg(y / CAST(w AS DOUBLE)) * 10000 + 0.5) / 10000
         AS avg_syll_per_word,
       floor(avg(flesch) * 10000 + 0.5) / 10000 AS avg_flesch
FROM scored
GROUP BY source ORDER BY source
"""


# --------------------------------------------------------------------------
# zipf_fit — Zipf exponent of the token frequency distribution
# --------------------------------------------------------------------------


def _zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit: token frequencies ranked (count desc, token
    tie-break), log-log OLS over the top-1000 ranks. Healthy natural
    text has slope ≈ −1; a synthetic or template-heavy corpus shows up
    immediately. Ranks/frequencies are exact integers; the ln-moment
    sums round at 3 (OLS over 1000 points is far from any rounding
    boundary). The rank window runs over the vocabulary aggregate, not
    the corpus."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    # window-free top-1000 (round-11 allowlist burn-down; was a global
    # row_number over the vocabulary aggregate): TakeOrderedAndProject
    # picks the ranks distributed, and the 1000-point log-log OLS runs
    # driver-side — the 3dp output grain absorbs ln/sum-order noise
    # exactly as it did between Spark and DuckDB before.
    import math

    top_rows = bounded_collect(
        vocab.orderBy(F.col("cnt").desc(), F.col("tok")).limit(1000),
        1000,
        "top-1000 vocabulary ranks",
    )
    n = len(top_rows)
    sx = sy = sxy = sxx = syy = 0.0
    for i, r in enumerate(top_rows):
        x = math.log(float(i + 1))
        y = math.log(float(r["cnt"]))
        sx += x
        sy += y
        sxy += x * y
        sxx += x * x
        syy += y * y
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    r2 = (n * sxy - sx * sy) * (n * sxy - sx * sy) / (
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )

    def r3(v: float) -> float:
        return math.floor(v * 1e3 + 0.5) / 1e3

    totals = toks.agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("tok").alias("n_distinct"),
    )
    return totals.select(
        "n_tokens",
        "n_distinct",
        F.lit(n).cast("long").alias("n_fit_points"),
        F.lit(r3(slope)).alias("zipf_slope"),
        F.lit(r3(r2)).alias("zipf_r2"),
    )


_ZIPF_SQL = r"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
  FROM documents
), toks2 AS (
  SELECT tok FROM toks WHERE tok != ''
), vocab AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM toks2 GROUP BY tok
), top AS (
  SELECT ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(cnt AS DOUBLE)) AS y
  FROM (SELECT cnt, CAST(row_number() OVER (ORDER BY cnt DESC, tok) AS BIGINT)
               AS rank
        FROM vocab)
  WHERE rank <= 1000
), totals AS (
  SELECT CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(count(DISTINCT tok) AS BIGINT) AS n_distinct
  FROM toks2
), mom AS (
  SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
  FROM top
)
SELECT n_tokens, n_distinct, n AS n_fit_points,
       floor((n * sxy - sx * sy) / (n * sxx - sx * sx) * 1000 + 0.5) / 1000
         AS zipf_slope,
       floor((n * sxy - sx * sy) * (n * sxy - sx * sy)
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)) * 1000 + 0.5) / 1000
         AS zipf_r2
FROM totals CROSS JOIN mom
"""


# --------------------------------------------------------------------------
# embedding_norm_audit — vector-column quality gate
# --------------------------------------------------------------------------


def _embedding_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-column audit (run before ANN/semantic dedup consume the
    vectors): per dimension-width — vector count, zero vectors, NaN
    vectors, and the norm range. Elements cast float32→double BEFORE
    squaring on both engines, identical sequential fold; per-row norms
    round at 6 (then min/max are exact on the rounded grid), the
    average at 4."""
    e = t(spark, sf_dir, "embeddings")
    sq = F.aggregate(
        F.col("embedding"),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    per = e.select(
        F.size("embedding").cast("long").alias("dim"),
        rnd(F.sqrt(sq), 6).alias("norm"),
        F.when(F.isnan(sq) | sq.isNull(), 1).otherwise(0).cast("long").alias(
            "is_nan"
        ),
        F.when(sq == 0.0, 1).otherwise(0).cast("long").alias("is_zero"),
    )
    return (
        per.groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("is_zero").alias("n_zero"),
            F.sum("is_nan").alias("n_nan"),
            F.min("norm").alias("min_norm"),
            F.max("norm").alias("max_norm"),
            rnd(F.avg("norm"), 4).alias("avg_norm"),
        )
        .orderBy("dim")
    )


_NORM_AUDIT_SQL = """
WITH per AS (
  SELECT CAST(len(embedding) AS BIGINT) AS dim,
         list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS sq
  FROM embeddings
), scored AS (
  SELECT dim,
         floor(sqrt(sq) * 1000000 + 0.5) / 1000000 AS norm,
         CASE WHEN isnan(sq) OR sq IS NULL THEN 1 ELSE 0 END AS is_nan,
         CASE WHEN sq = 0.0 THEN 1 ELSE 0 END AS is_zero
  FROM per
)
SELECT dim, CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(is_zero) AS BIGINT) AS n_zero,
       CAST(sum(is_nan) AS BIGINT) AS n_nan,
       min(norm) AS min_norm, max(norm) AS max_norm,
       floor(avg(norm) * 10000 + 0.5) / 10000 AS avg_norm
FROM scored
GROUP BY dim ORDER BY dim
"""


# --------------------------------------------------------------------------
# containment_pairs — directed subset/quote duplication
# --------------------------------------------------------------------------


def _containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed containment (|A∩B|/|A|) pairs on the bounded oracle
    slice — catches a short doc quoted inside a long one where Jaccard
    stays tiny. Same posting-list candidate join as `jaccard_pairs`."""
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return dedup.token_containment_pairs(docs, threshold=0.8)


_CONTAINMENT_SQL = r"""
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
), scored AS (
  SELECT id_a, id_b,
         floor(inter / CAST(sa.sz AS DOUBLE) * 1000000 + 0.5) / 1000000
           AS c_a_in_b,
         floor(inter / CAST(sb.sz AS DOUBLE) * 1000000 + 0.5) / 1000000
           AS c_b_in_a
  FROM inter
  JOIN sizes sa ON sa.id = id_a
  JOIN sizes sb ON sb.id = id_b
)
SELECT id_a, id_b, c_a_in_b, c_b_in_a
FROM scored
WHERE c_a_in_b >= 0.8 OR c_b_in_a >= 0.8
"""


# --------------------------------------------------------------------------
# pca_variance — distributed PCA moments, driver eigensolve (rows-only)
# --------------------------------------------------------------------------


def _pca_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-8 PCA explained-variance ratios over the embedding corpus —
    one mapInPandas moment pass (per-batch numpy matmul), d²-bounded
    shuffle, driver-side eigensolve. Rows-only: eigensolves aren't
    ANSI SQL; `tests/test_similarity.py` checks the ratios against
    numpy's full-precision PCA."""
    return pca_explained_variance(
        spark, t(spark, sf_dir, "embeddings"), vec_col="embedding", k=8
    )


QUERIES: dict[str, QuerySpec] = {
    "readability_kit": QuerySpec(
        _readability_kit,
        _READABILITY_SQL,
        "Flesch-style readability via JVM regexp counts",
    ),
    "zipf_fit": QuerySpec(
        _zipf_fit,
        _ZIPF_SQL,
        "Zipf exponent of token frequencies (log-log OLS, top-1000)",
    ),
    "embedding_norm_audit": QuerySpec(
        _embedding_norm_audit,
        _NORM_AUDIT_SQL,
        "embedding-column quality gate: dims, zero/NaN, norm range",
    ),
    "containment_pairs": QuerySpec(
        _containment_pairs,
        _CONTAINMENT_SQL,
        "directed containment pairs (quote/subset duplication)",
    ),
    "pca_variance": QuerySpec(
        _pca_variance,
        None,
        "one-pass PCA moments + driver d x d eigensolve (rows-only)",
    ),
}
