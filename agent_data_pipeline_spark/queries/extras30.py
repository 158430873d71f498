"""Round-6 third-wave surface: model-based quality gating, token-budget
mixture planning, and n-gram novelty — three standard curation steps of
a large-scale training-data pipeline not yet in the registry.

* ``nb_source_classifier`` — the CCNet/FineWeb quality-gate shape: a
  text classifier trained to separate a curated source group from the
  wild half of the corpus, reported as a held-out confusion matrix.
  Multinomial Naive Bayes keeps the whole train+score computation one
  declarative plan (llmdata/classify.py), so the DuckDB oracle replays
  it hash-exactly — the SQL-expressible stand-in for the fastText gate.

* ``mixture_budget_plan`` — given per-source token inventories and a
  uniform target mixture over a half-corpus token budget, the per-source
  sampling rate / epoch count / oversample flag (the Llama-style data
  mixture sheet). Pure integer inventory + one exact division per
  source; trivially SQL-expressible and hash-stable.

* ``ngram_novelty_scores`` — per-document novelty: the share of a
  document's word-3-gram occurrences that are globally unique in the
  corpus (count == 1). The diversity-weighting signal dedup leaves
  behind: boilerplate scores ~0, fresh text ~1. One keyed window over
  the gram-partitioned occurrence stream (no global window), then a
  doc-keyed re-aggregate and a TakeOrdered top-20.

Reference parity: the reference has none of these (its transforms are
single-table SQL shipped to Postgres — dags/taxi_transform_dag.py:42-79);
all three belong to the declared LLM-data north-star surface
(SURVEY.md §2.B).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..llmdata import classify
from .core import QuerySpec, rnd, t


def _nb_source_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out confusion matrix of a curated-vs-wild NB source
    classifier: sources src0–src9 are 'curated' (positive), src10+ are
    'wild'; even doc_ids train, odd doc_ids score. Counts are integers;
    the mean posterior log-odds per cell is rounded to 6 dp on both
    engines."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        (F.expr("cast(substring(source, 4) as int)") < 10).alias("curated"),
        (F.col("doc_id") % 2 == 0).alias("is_train"),
    )
    scored = classify.nb_train_score(
        d,
        id_col="doc_id",
        text_col="text",
        label_col="curated",
        train_col="is_train",
    )
    return (
        scored.select(
            F.col("label").alias("actual_curated"),
            (F.col("margin") > 0).alias("predicted_curated"),
            "margin",
        )
        .groupBy("actual_curated", "predicted_curated")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            rnd(F.avg("margin"), 6).alias("avg_margin"),
        )
        .orderBy("actual_curated", "predicted_curated")
    )


_NB_SQL = r"""
WITH d AS (
  SELECT doc_id,
         regexp_split_to_array(lower(trim(text)), '\s+') AS toks,
         CAST(substring(source, 4) AS INT) < 10 AS curated,
         doc_id % 2 = 0 AS is_train
  FROM documents
), tok AS (
  SELECT doc_id, curated, is_train, unnest(toks) AS tok FROM d
), counts AS (
  SELECT tok,
         CAST(sum(CASE WHEN curated THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         CAST(sum(CASE WHEN curated THEN 0 ELSE 1 END) AS BIGINT) AS n_neg
  FROM tok WHERE is_train GROUP BY tok
), consts AS (
  SELECT CAST(sum(n_pos) AS BIGINT) AS tot_pos,
         CAST(sum(n_neg) AS BIGINT) AS tot_neg,
         CAST(count(*) AS BIGINT) AS vsize
  FROM counts
), priors AS (
  SELECT c.tot_pos, c.tot_neg, c.vsize,
         ln((p.d_pos + 1) / CAST(p.d_neg + 1 AS DOUBLE)) AS prior,
         ln(1.0 / (c.tot_pos + c.vsize))
           - ln(1.0 / (c.tot_neg + c.vsize)) AS w_oov
  FROM (SELECT CAST(sum(CASE WHEN curated THEN 1 ELSE 0 END) AS BIGINT)
                 AS d_pos,
               CAST(sum(CASE WHEN curated THEN 0 ELSE 1 END) AS BIGINT)
                 AS d_neg
        FROM d WHERE is_train) p
  CROSS JOIN consts c
), weights AS (
  SELECT w.tok,
         ln((w.n_pos + 1) / CAST(c.tot_pos + c.vsize AS DOUBLE))
           - ln((w.n_neg + 1) / CAST(c.tot_neg + c.vsize AS DOUBLE)) AS w
  FROM counts w CROSS JOIN consts c
), scored AS (
  SELECT t.doc_id, t.curated,
         p.prior + sum(COALESCE(w.w, p.w_oov)) AS margin
  FROM tok t
  LEFT JOIN weights w ON t.tok = w.tok
  CROSS JOIN priors p
  WHERE NOT t.is_train
  GROUP BY t.doc_id, t.curated, p.prior
)
SELECT curated AS actual_curated,
       margin > 0 AS predicted_curated,
       CAST(count(*) AS BIGINT) AS n_docs,
       floor(avg(margin) * 1000000 + 0.5) / 1000000 AS avg_margin
FROM scored
GROUP BY actual_curated, predicted_curated
ORDER BY actual_curated, predicted_curated
"""


def _mixture_budget_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture sheet: per-source available tokens, the
    uniform target allocation over a half-corpus budget, the sampling
    rate (capped at 1), the epoch count the target implies, and whether
    the source must be oversampled (epochs > 1). Integer inventory;
    ratios are one exact BIGINT/BIGINT divide, rounded to 6 dp."""
    inv = (
        t(spark, sf_dir, "documents")
        .select(
            "source",
            F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
            .cast("long")
            .alias("ntok"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("ntok").alias("avail_tokens"),
        )
    )
    tot = inv.agg(
        F.sum("avail_tokens").alias("total_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_sources"),
    )
    target = F.floor(
        F.floor(F.col("total_tokens") / 2) / F.col("n_sources")
    ).cast("long")
    ratio = F.col("target_tokens") / F.col("avail_tokens")
    return (
        inv.crossJoin(F.broadcast(tot))
        .withColumn("target_tokens", target)
        .select(
            "source",
            "n_docs",
            "avail_tokens",
            "target_tokens",
            rnd(F.least(F.lit(1.0), ratio), 6).alias("sample_rate"),
            rnd(ratio, 6).alias("epochs"),
            (F.col("target_tokens") > F.col("avail_tokens")).alias(
                "oversampled"
            ),
        )
        .orderBy("source")
    )


_MIXTURE_SQL = r"""
WITH inv AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(regexp_split_to_array(lower(trim(text)), '\s+')))
              AS BIGINT) AS avail_tokens
  FROM documents GROUP BY source
), tot AS (
  SELECT CAST(sum(avail_tokens) AS BIGINT) AS total_tokens,
         CAST(count(*) AS BIGINT) AS n_sources
  FROM inv
), plan AS (
  SELECT i.source, i.n_docs, i.avail_tokens,
         CAST(floor(floor(t.total_tokens / 2.0) / t.n_sources) AS BIGINT)
           AS target_tokens
  FROM inv i CROSS JOIN tot t
)
SELECT source, n_docs, avail_tokens, target_tokens,
       floor(least(1.0, target_tokens / CAST(avail_tokens AS DOUBLE))
             * 1000000 + 0.5) / 1000000 AS sample_rate,
       floor((target_tokens / CAST(avail_tokens AS DOUBLE))
             * 1000000 + 0.5) / 1000000 AS epochs,
       target_tokens > avail_tokens AS oversampled
FROM plan ORDER BY source
"""


def _ngram_novelty_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most-novel documents: novelty = share of the document's
    word-3-gram occurrences that appear exactly once in the whole
    corpus. Gram counting is a keyed window over the gram-partitioned
    occurrence stream; novelty is a mean of exact 0/1 doubles (an exact
    integer ratio — no rounding drift), rounded to 6 dp for the hash."""
    d = (
        t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("toks"),
        )
        .filter(F.size("toks") >= 3)
    )
    grams = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(toks) - 3),"
                " i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"
            )
        ).alias("gram"),
    )
    gcount = F.count(F.lit(1)).over(Window.partitionBy("gram"))
    return (
        grams.withColumn("gcount", gcount)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            rnd(
                F.avg(F.when(F.col("gcount") == 1, 1.0).otherwise(0.0)), 6
            ).alias("novelty"),
        )
        .orderBy(F.col("novelty").desc(), "doc_id")
        .limit(20)
    )


_NOVELTY_SQL = r"""
WITH dd AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
  FROM documents
), g AS (
  SELECT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS gram
  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
        FROM dd WHERE len(toks) >= 3)
), c AS (
  SELECT doc_id, count(*) OVER (PARTITION BY gram) AS gcount FROM g
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       floor(avg(CASE WHEN gcount = 1 THEN 1.0 ELSE 0.0 END)
             * 1000000 + 0.5) / 1000000 AS novelty
FROM c GROUP BY doc_id ORDER BY novelty DESC, doc_id LIMIT 20
"""


QUERIES: dict[str, QuerySpec] = {
    "nb_source_classifier": QuerySpec(
        _nb_source_classifier,
        _NB_SQL,
        "CCNet-style NB quality gate: held-out curated-vs-wild confusion",
    ),
    "mixture_budget_plan": QuerySpec(
        _mixture_budget_plan,
        _MIXTURE_SQL,
        "token-budget mixture sheet: per-source rate/epochs/oversample",
    ),
    "ngram_novelty_scores": QuerySpec(
        _ngram_novelty_scores,
        _NOVELTY_SQL,
        "per-doc 3-gram novelty share, top-20 most novel",
    ),
}
