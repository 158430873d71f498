"""Round-10 second wave: DSIR data selection, end to end and fully
oracled.

* ``dsir_importance_weights`` — per-source census of DSIR-style hashed
  n-gram importance weights (Xie et al. 2023, "Data Selection for
  Language Models via Importance Resampling"): target = the ``en``
  slice of the corpus, raw = the whole corpus; features are word
  unigrams+bigrams hashed portably (md5 hex prefix → int, the
  extras35 CMS hash) into 1024 buckets; per-doc weight is the summed
  occurrence-level log-ratio of the two add-one-smoothed bucket
  models (``llmdata/classify.py dsir_doc_weights``). The census
  reports per-source doc count, mean weight, share of target-like
  (w > 0) docs, and the weight envelope — the sheet a curation team
  reads before resampling.
* ``dsir_resample_census`` — the RESAMPLING half of DSIR composed from
  the weights: Efraimidis–Spirakis A-Res weighted sampling without
  replacement (the ``weighted_reservoir_sample`` construction) with
  weight exp(clamp(w, ±30)), uniform u = the engine-portable Knuth
  hash of doc_id (extras33 convention), top-50 by key — then a
  per-language census of the selected set against the corpus
  composition. The readout IS the method's point: the selected mix
  shifts toward the target language while keeping non-target mass.

Scale shape (100 TB): the weight pipeline is two aggregates over the
ngram stream (a 1024-row broadcast model + the one doc-key shuffle —
see dsir_doc_weights docstring); the resample is a TakeOrdered top-k
over the doc-grain weight frame (per-partition top-k + merge, no
global sort), and both censuses are dim-grain. Nothing here
materializes pairs or windows over fact-scale frames.

Determinism: weights are fns.rnd-rounded to 9dp at the doc grain on
both engines (summation-order proofing), so every downstream compare
(w > 0 threshold, A-Res keys, 6dp census stats) sees identical doubles.

Reference parity: the reference has no data-selection surface
(SURVEY.md §2.A); both queries belong to the declared LLM-data
north-star §2.B surface. Planted-fixture test (vocabulary-separated
corpora, pure-Python md5 reference): tests/test_extras64.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core import QuerySpec, rnd, t

_B = 1024  # hashed feature buckets (model rows, broadcast-bounded)
_RESAMPLE_K = 50


def _weights(spark: SparkSession, sf_dir: str, keep: tuple[str, ...]) -> DataFrame:
    from ..llmdata import classify

    d = t(spark, sf_dir, "documents").withColumn(
        "is_target", F.coalesce(F.col("lang") == "en", F.lit(False))
    )
    return classify.dsir_doc_weights(d, keep=keep, n_buckets=_B)


def _dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = _weights(spark, sf_dir, keep=("source",))
    return (
        w.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            rnd(F.avg("w"), 6).alias("mean_w"),
            rnd(F.avg((F.col("w") > 0).cast("double")), 6).alias("pos_share"),
            rnd(F.max("w"), 6).alias("max_w"),
            rnd(F.min("w"), 6).alias("min_w"),
        )
        .orderBy("source")
    )


# the shared model/weight CTE chain (kept textually identical between
# the two oracles; {sel} appends the per-doc columns each query needs)
def _w_ctes(keep: str) -> str:
    return rf"""
WITH base AS (
  SELECT doc_id, {keep},
         coalesce(lang = 'en', false) AS is_t,
         list_filter(regexp_split_to_array(lower(trim(coalesce(text, ''))),
                                           '\s+'),
                     x -> x <> '') AS tc
  FROM documents
), grams AS (
  SELECT doc_id, {keep}, is_t, g.ng
  FROM base, unnest(
    CASE WHEN len(tc) >= 2
         THEN list_concat(tc,
                list_transform(generate_series(1, len(tc) - 1),
                               i -> tc[i] || ' ' || tc[i + 1]))
         ELSE tc END) AS g(ng)
), bucketed AS (
  SELECT doc_id, {keep}, is_t,
         CAST(concat('0x', substr(md5(ng), 1, 8)) AS BIGINT) % {_B} AS b
  FROM grams
), model AS (
  SELECT b, count(*) AS r_cnt,
         sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS t_cnt
  FROM bucketed GROUP BY b
), tot AS (
  SELECT sum(r_cnt) AS rr, sum(t_cnt) AS tt FROM model
), lr AS (
  SELECT b, ln((t_cnt + 1.0) / (tt + {_B}.0))
            - ln((r_cnt + 1.0) / (rr + {_B}.0)) AS lr
  FROM model, tot
), per_doc AS (
  SELECT doc_id, {keep},
         floor(sum(lr) * 1000000000 + 0.5) / 1000000000 AS w
  FROM bucketed JOIN lr USING (b)
  GROUP BY doc_id, {keep}
)"""


_DSIR_WEIGHTS_SQL = (
    _w_ctes("source")
    + """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       floor(avg(w) * 1000000 + 0.5) / 1000000 AS mean_w,
       floor(avg(CASE WHEN w > 0 THEN 1.0 ELSE 0.0 END) * 1000000 + 0.5)
         / 1000000 AS pos_share,
       floor(max(w) * 1000000 + 0.5) / 1000000 AS max_w,
       floor(min(w) * 1000000 + 0.5) / 1000000 AS min_w
FROM per_doc
GROUP BY source
ORDER BY source
"""
)


def _dsir_resample_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = _weights(spark, sf_dir, keep=("lang",))
    # Efraimidis–Spirakis A-Res: key = ln(u) / W, W = exp(clamp(w, ±30)),
    # u = Knuth-hash uniform of doc_id (portable, the extras33 scheme);
    # top-k by key is sampling WITHOUT replacement ∝ W
    u = (
        F.pmod(F.col("doc_id"), F.lit(2147483648)) * F.lit(2654435761)
    ) % F.lit(4294967296)
    u = (u + F.lit(0.5)) / F.lit(4294967296.0)
    wc = F.greatest(F.least(F.col("w"), F.lit(30.0)), F.lit(-30.0))
    sel = (
        w.withColumn("_key", F.log(u) / F.exp(wc))
        .orderBy(F.col("_key").desc(), "doc_id")
        .limit(_RESAMPLE_K)
    )
    sel_lang = sel.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("_n_sel"),
        F.avg("w").alias("_mw"),
    )
    corpus = (
        t(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_corpus"))
    )
    ctot = corpus.agg(F.sum("n_corpus").alias("_nc"))
    stot = sel.agg(F.count(F.lit(1)).cast("long").alias("_ns"))
    return (
        corpus.join(F.broadcast(sel_lang), "lang", "left")
        .crossJoin(F.broadcast(ctot))
        .crossJoin(F.broadcast(stot))
        .select(
            "lang",
            "n_corpus",
            rnd(F.col("n_corpus") / F.col("_nc"), 6).alias("corpus_share"),
            F.coalesce(F.col("_n_sel"), F.lit(0)).cast("long").alias("n_sel"),
            rnd(F.coalesce(F.col("_n_sel"), F.lit(0)) / F.col("_ns"), 6).alias(
                "sel_share"
            ),
            rnd(F.col("_mw"), 6).alias("mean_w_sel"),
        )
        .orderBy("lang")
    )


_DSIR_RESAMPLE_SQL = (
    _w_ctes("lang")
    + f"""
, keyed AS (
  SELECT doc_id, lang, w,
         ln((((doc_id % 2147483648) * 2654435761) % 4294967296 + 0.5)
            / 4294967296.0)
           / exp(greatest(least(w, 30.0), -30.0)) AS k
  FROM per_doc
), sel AS (
  SELECT doc_id, lang, w FROM keyed
  ORDER BY k DESC, doc_id LIMIT {_RESAMPLE_K}
), sel_lang AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_sel, avg(w) AS mw
  FROM sel GROUP BY lang
), corpus AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_corpus
  FROM documents GROUP BY lang
), ctot AS (SELECT sum(n_corpus) AS nc FROM corpus),
stot AS (SELECT CAST(count(*) AS BIGINT) AS ns FROM sel)
SELECT c.lang AS lang,
       c.n_corpus AS n_corpus,
       floor(CAST(c.n_corpus AS DOUBLE) / ctot.nc * 1000000 + 0.5)
         / 1000000 AS corpus_share,
       CAST(coalesce(s.n_sel, 0) AS BIGINT) AS n_sel,
       floor(CAST(coalesce(s.n_sel, 0) AS DOUBLE) / stot.ns * 1000000 + 0.5)
         / 1000000 AS sel_share,
       floor(s.mw * 1000000 + 0.5) / 1000000 AS mean_w_sel
FROM corpus c
LEFT JOIN sel_lang s USING (lang)
CROSS JOIN ctot CROSS JOIN stot
ORDER BY c.lang
"""
)


QUERIES: dict[str, QuerySpec] = {
    "dsir_importance_weights": QuerySpec(
        _dsir_importance_weights,
        _DSIR_WEIGHTS_SQL,
        "DSIR hashed n-gram importance weights (target = en slice): "
        "per-source mean weight, target-like share, weight envelope",
    ),
    "dsir_resample_census": QuerySpec(
        _dsir_resample_census,
        _DSIR_RESAMPLE_SQL,
        "DSIR importance RESAMPLING (A-Res top-50 with weight exp(w)): "
        "per-language selected-set composition vs corpus composition",
    ),
}
