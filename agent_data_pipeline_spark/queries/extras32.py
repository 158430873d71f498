"""Round-6 fifth-wave surface: cross-source contamination and private
aggregate release.

* ``source_overlap_matrix`` — pairwise n-gram containment between
  sources: for every source pair, the count of shared distinct word
  5-grams plus Jaccard and containment (shared / min) coefficients.
  The curation diagnostic that catches mirrored crawls and bulk
  cross-posting BEFORE document-level dedup (two sources can share 80%
  of their n-grams with zero identical documents). Plan shape: one scan
  → distinct (source, gram) — an aggregate, so map-side partial — then
  a posting-list self-join on gram whose per-gram fan-out is bounded by
  |sources|² (≤190 pairs/gram at 20 sources), never by corpus size;
  per-source gram totals broadcast back onto the 190-row pair table.

* ``dp_lang_counts`` — ε-differentially-private per-language document
  counts by the Laplace mechanism, with the noise draw made
  engine-portable: per-group uniform u = Knuth-hash of the group's
  doc_id sum (the same (x % 2³¹)·2654435761 % 2³² scheme as
  sampling.hash_bucket, so ANSI-safe), Laplace via the standard inverse
  CDF −b·sign(u−½)·ln(1−2|u−½|), b = 1/ε. The release shape a corpus
  stats endpoint publishes when counts are user-derived. (True counts
  are included alongside for the differential check — a production
  release would drop that column.)

Reference parity: the reference has neither (SURVEY.md §2.A); both
belong to the declared LLM-data north-star surface (§2.B).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core import QuerySpec, rnd, t

_GRAM_N = 5


def _source_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        t(spark, sf_dir, "documents")
        .select(
            "source",
            F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("toks"),
        )
        .filter(F.size("toks") >= _GRAM_N)
    )
    return (
        d.select(
            "source",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(toks) - {_GRAM_N}),"
                    " i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2],"
                    " toks[i+3], toks[i+4]))"
                )
            ).alias("gram"),
        )
        .distinct()
    )


def _source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    sg = _source_grams(spark, sf_dir)
    totals = sg.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams")
    )
    a = sg.select(F.col("source").alias("src_a"), "gram")
    b = sg.select(F.col("source").alias("src_b"), "gram")
    shared = (
        a.join(b, "gram")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
    )
    ta = totals.select(
        F.col("source").alias("src_a"), F.col("n_grams").alias("n_a")
    )
    tb = totals.select(
        F.col("source").alias("src_b"), F.col("n_grams").alias("n_b")
    )
    return (
        shared.join(F.broadcast(ta), "src_a")
        .join(F.broadcast(tb), "src_b")
        .select(
            "src_a",
            "src_b",
            "shared",
            "n_a",
            "n_b",
            rnd(
                F.col("shared")
                / (F.col("n_a") + F.col("n_b") - F.col("shared")),
                6,
            ).alias("jaccard"),
            rnd(
                F.col("shared") / F.least(F.col("n_a"), F.col("n_b")), 6
            ).alias("containment"),
        )
        .orderBy("src_a", "src_b")
    )


_OVERLAP_SQL = rf"""
WITH dd AS (
  SELECT source, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
  FROM documents
), sg AS (
  SELECT DISTINCT source,
         toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
                 || toks[i+3] || ' ' || toks[i+4] AS gram
  FROM (SELECT source, toks,
               unnest(generate_series(1, len(toks) - {_GRAM_N - 1})) AS i
        FROM dd WHERE len(toks) >= {_GRAM_N})
), totals AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_grams FROM sg GROUP BY source
), shared AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(count(*) AS BIGINT) AS shared
  FROM sg a JOIN sg b ON a.gram = b.gram AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT s.src_a, s.src_b, s.shared, ta.n_grams AS n_a, tb.n_grams AS n_b,
       floor((s.shared / CAST(ta.n_grams + tb.n_grams - s.shared AS DOUBLE))
             * 1000000 + 0.5) / 1000000 AS jaccard,
       floor((s.shared / CAST(least(ta.n_grams, tb.n_grams) AS DOUBLE))
             * 1000000 + 0.5) / 1000000 AS containment
FROM shared s
JOIN totals ta ON s.src_a = ta.source
JOIN totals tb ON s.src_b = tb.source
ORDER BY src_a, src_b
"""


_EPS = 1.0


def _dp_lang_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select("doc_id", "lang")
    agg = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("doc_id").cast("long").alias("_seed"),
    )
    h = (F.col("_seed") % 2147483648) * 2654435761 % 4294967296
    u = (h + 0.5) / 4294967296.0
    noise = (
        F.lit(-1.0 / _EPS)
        * F.signum(u - 0.5)
        * F.log(1 - 2 * F.abs(u - 0.5))
    )
    return (
        agg.select(
            "lang",
            "n_docs",
            rnd(F.col("n_docs") + noise, 6).alias("noisy_n_docs"),
            F.lit(_EPS).alias("epsilon"),
        )
        .orderBy("lang")
    )


_DP_SQL = f"""
WITH agg AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(doc_id) AS BIGINT) AS seed
  FROM documents GROUP BY lang
), nz AS (
  SELECT lang, n_docs,
         (((seed % 2147483648) * 2654435761) % 4294967296 + 0.5)
           / 4294967296.0 AS u
  FROM agg
)
SELECT lang, n_docs,
       floor((n_docs + (-1.0 / {_EPS}) * sign(u - 0.5)
              * ln(1 - 2 * abs(u - 0.5))) * 1000000 + 0.5) / 1000000
         AS noisy_n_docs,
       {_EPS} AS epsilon
FROM nz ORDER BY lang
"""


QUERIES: dict[str, QuerySpec] = {
    "source_overlap_matrix": QuerySpec(
        _source_overlap_matrix,
        _OVERLAP_SQL,
        "pairwise 5-gram Jaccard/containment between sources",
    ),
    "dp_lang_counts": QuerySpec(
        _dp_lang_counts,
        _DP_SQL,
        "Laplace-mechanism DP release of per-language doc counts",
    ),
}
