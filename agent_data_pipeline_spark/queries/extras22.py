"""Round-4 surface additions, part 17: incremental corpus refresh —
the composed pipeline for the scheduled case.

`training_data_prep` is the full-recompute composition; real pipelines
run the INCREMENTAL version daily: a new batch arrives, and only the
batch is processed — gated on quality, deduplicated within itself AND
against the corpus that already shipped (an anti-join on fingerprints,
never a recompute of the existing corpus), decontaminated against the
eval set, then appended. `incremental_corpus_refresh` composes exactly
that and reports per-source: corpus size before, batch size, survivors
of each gate, and size after.

Scale notes (100 TB): the existing corpus contributes ONLY its
fingerprint column (16-byte digests) — scanned once, never its text;
every batch-side stage is bounded by the batch, not the corpus; the
decontamination blocklist is broadcast. This is the composition that
makes daily refresh O(batch) instead of O(corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..llmdata import hygiene, textstats
from .core import QuerySpec, t


def _incremental_corpus_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-refresh composition: base corpus = doc_id % 5 != 0 (already
    shipped), new batch = doc_id % 5 == 0. Batch flow: quality gate
    (token floor 20 + quality ≥ 0.45) → within-batch exact dedup
    (min-id per digest) → anti-join against base digests → 3-gram
    decontamination against the eval slice (doc_id % 97 == 0 of the
    base) → append. Emits per-source counts at every gate."""
    docs = t(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)

    stats = textstats.with_text_stats(batch)
    gated = stats.filter(
        (F.col("n_tokens") >= 20) & (F.col("quality_score") >= 0.45)
    )
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    uniq = (
        gated.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    base_fp = base.select(F.md5("text").alias("_fp")).distinct()
    fresh = uniq.join(
        base_fp, F.md5(uniq["text"]) == base_fp["_fp"], "left_anti"
    )
    eval_grams = hygiene.eval_ngram_set(
        base.filter(F.col("doc_id") % 97 == 0), n=3
    )
    clean = hygiene.flag_contaminated(fresh, eval_grams, n=3).filter(
        F.col("is_contaminated") == 0
    )

    def per_source(df: DataFrame, name: str) -> DataFrame:
        return df.groupBy("source").agg(F.count(F.lit(1)).alias(name))

    out = (
        per_source(base, "n_base")
        .join(per_source(batch, "n_batch"), "source", "full")
        .join(per_source(gated, "n_gated"), "source", "full")
        .join(per_source(fresh, "n_fresh"), "source", "full")
        .join(per_source(clean, "n_appended"), "source", "full")
    )
    fill = lambda c: F.coalesce(F.col(c), F.lit(0)).alias(c)
    return out.select(
        "source",
        fill("n_base"),
        fill("n_batch"),
        fill("n_gated"),
        fill("n_fresh"),
        fill("n_appended"),
        (
            F.coalesce(F.col("n_base"), F.lit(0))
            + F.coalesce(F.col("n_appended"), F.lit(0))
        ).alias("n_after"),
    ).orderBy("source")


_INCREMENTAL_SQL = r"""
WITH base AS (
  SELECT * FROM documents WHERE doc_id % 5 != 0
), batch AS (
  SELECT * FROM documents WHERE doc_id % 5 = 0
), stats AS (
  SELECT doc_id, source, text,
         CAST(length(text) AS BIGINT) AS n_chars_calc,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
           AS n_tokens,
         CAST(len(list_distinct(regexp_split_to_array(trim(text), '\s+')))
              AS BIGINT) AS n_distinct_tokens,
         CAST(len(list_filter(regexp_split_to_array(lower(text), '\s+'),
              x -> list_contains(['the','a','of','and','to','in','is','it'],
                                 x))) AS BIGINT) AS n_stop
  FROM batch
), scored AS (
  SELECT doc_id, source, text, n_tokens,
         floor((0.4 * least(n_chars_calc / 200.0, 1.0)
              + 0.3 * least(CASE WHEN n_tokens > 0
                            THEN n_stop / CAST(n_tokens AS DOUBLE)
                            ELSE 0.0 END * 4, 1.0)
              + 0.3 * CASE WHEN n_tokens > 0
                           THEN n_distinct_tokens / CAST(n_tokens AS DOUBLE)
                           ELSE 0.0 END) * 1000000 + 0.5) / 1000000
           AS quality_score
  FROM stats
), gated AS (
  SELECT * FROM scored WHERE n_tokens >= 20 AND quality_score >= 0.45
), uniq AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM gated) WHERE rn = 1
), fresh AS (
  SELECT u.* FROM uniq u
  WHERE NOT EXISTS (SELECT 1 FROM base b WHERE md5(b.text) = md5(u.text))
), ev_idx AS (
  SELECT toks, unnest(generate_series(1, len(toks) - 2)) AS i
  FROM (SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        FROM base WHERE doc_id % 97 = 0)
), eval_grams AS (
  SELECT DISTINCT array_to_string(toks[i:i+2], ' ') AS gram FROM ev_idx
), fr_idx AS (
  SELECT fid, toks, unnest(generate_series(1, len(toks) - 2)) AS i
  FROM (SELECT doc_id AS fid,
               regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        FROM fresh)
), fr_grams AS (
  SELECT DISTINCT fid, array_to_string(toks[i:i+2], ' ') AS gram FROM fr_idx
), contam AS (
  SELECT DISTINCT fid FROM fr_grams JOIN eval_grams USING (gram)
), clean AS (
  SELECT f.* FROM fresh f
  WHERE NOT EXISTS (SELECT 1 FROM contam c WHERE c.fid = f.doc_id)
)
SELECT s.source,
       CAST(coalesce(b.n, 0) AS BIGINT) AS n_base,
       CAST(coalesce(t.n, 0) AS BIGINT) AS n_batch,
       CAST(coalesce(g.n, 0) AS BIGINT) AS n_gated,
       CAST(coalesce(fr.n, 0) AS BIGINT) AS n_fresh,
       CAST(coalesce(cl.n, 0) AS BIGINT) AS n_appended,
       CAST(coalesce(b.n, 0) + coalesce(cl.n, 0) AS BIGINT) AS n_after
FROM (SELECT DISTINCT source FROM documents) s
LEFT JOIN (SELECT source, count(*) AS n FROM base GROUP BY 1) b USING (source)
LEFT JOIN (SELECT source, count(*) AS n FROM batch GROUP BY 1) t USING (source)
LEFT JOIN (SELECT source, count(*) AS n FROM gated GROUP BY 1) g USING (source)
LEFT JOIN (SELECT source, count(*) AS n FROM fresh GROUP BY 1) fr USING (source)
LEFT JOIN (SELECT source, count(*) AS n FROM clean GROUP BY 1) cl USING (source)
ORDER BY s.source
"""


QUERIES: dict[str, QuerySpec] = {
    "incremental_corpus_refresh": QuerySpec(
        _incremental_corpus_refresh,
        _INCREMENTAL_SQL,
        "O(batch) daily refresh: gate, dedup vs shipped corpus, decontam, append",
    ),
}
