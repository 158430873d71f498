"""Round-6 sixth-wave surface: label transfer through dedup clusters,
weighted reservoir sampling, and group-integral k-fold assignment —
three ML-data operations between dedup and training.

* ``component_label_propagation`` — propagate a keep/drop label from
  labeled documents to their unlabeled near-duplicates via the
  connected components of the exact-Jaccard dup graph (strict-majority
  vote among a component's labeled members; components with no labeled
  member stay NULL). The standard "label once, apply to every copy"
  step after cluster discovery. Spark side reuses the iterative
  min-label-propagation CC (llmdata/dedup.py); the oracle replays it
  with a recursive-CTE transitive closure — the same
  iterative-vs-declarative differential ``dup_components`` pioneered.

* ``weighted_reservoir_sample`` — Efraimidis–Spirakis A-Res: each row
  draws key = ln(u)/w (order-equivalent to u^(1/w)) and the global
  top-k by key is an exact weighted sample without replacement. The
  uniform u is the engine-portable Knuth hash of doc_id (ANSI-safe
  mod-2³¹ form), so both engines draw identical keys; the top-k is a
  TakeOrdered with a doc_id tie-break — THE distributed
  weighted-sampling algorithm (one scan, no shuffle beyond top-k).

* ``group_kfold_assign`` — k-fold assignment with group integrity:
  every document of a source lands in the same fold (fold = Knuth hash
  of the source's min doc_id, mod k), reported as per-fold source/doc/
  token balance. Group k-fold is how eval splits avoid near-dup
  leakage across folds when duplicates cluster within sources.

Reference parity: none of these exist in the reference (SURVEY.md
§2.A); all belong to the declared LLM-data north-star surface (§2.B).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llmdata import dedup
from .core import QuerySpec, duck_materialize, rnd, t


def _component_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    pairs = dedup.token_jaccard_pairs(docs, threshold=0.95, max_df_ratio=1.0)
    comp = dedup.connected_components(pairs)
    lab = docs.select(
        "doc_id",
        (F.col("doc_id") % 2 == 0).alias("is_lab"),
        (F.col("n_chars") >= 150).alias("keep"),
    )
    m = comp.join(lab, comp["node"] == lab["doc_id"]).select(
        "node", "comp", "is_lab", "keep"
    )
    votes = (
        m.filter(F.col("is_lab"))
        .groupBy("comp")
        .agg(
            F.sum(F.when(F.col("keep"), 1).otherwise(0))
            .cast("long")
            .alias("n_keep"),
            F.count(F.lit(1)).cast("long").alias("n_lab"),
        )
    )
    return (
        m.filter(~F.col("is_lab"))
        .join(votes, "comp", "left")
        .select(
            F.col("node").alias("doc_id"),
            F.col("comp").alias("component"),
            F.coalesce(F.col("n_lab"), F.lit(0)).cast("long").alias(
                "n_labeled"
            ),
            F.when(
                F.col("n_lab").isNotNull(),
                2 * F.col("n_keep") > F.col("n_lab"),
            ).alias("propagated_keep"),
        )
        .orderBy("doc_id")
    )


_PROPAGATION_SQL = r"""
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
  WHERE floor((inter / CAST(sa.sz + sb.sz - inter AS DOUBLE))
              * 1000000 + 0.5) / 1000000 >= 0.95
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
), lab AS (
  SELECT doc_id, doc_id % 2 = 0 AS is_lab, n_chars >= 150 AS keep
  FROM documents WHERE doc_id < 500
), m AS (
  SELECT c.node, c.comp, l.is_lab, l.keep
  FROM comp c JOIN lab l ON c.node = l.doc_id
), votes AS (
  SELECT comp,
         CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
         CAST(count(*) AS BIGINT) AS n_lab
  FROM m WHERE is_lab GROUP BY comp
)
SELECT m.node AS doc_id, m.comp AS component,
       CAST(COALESCE(v.n_lab, 0) AS BIGINT) AS n_labeled,
       CASE WHEN v.n_lab IS NULL THEN NULL
            ELSE 2 * v.n_keep > v.n_lab END AS propagated_keep
FROM m LEFT JOIN votes v ON m.comp = v.comp
WHERE NOT m.is_lab
ORDER BY doc_id
"""


def _weighted_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    h = (F.col("doc_id") % 2147483648) * 2654435761 % 4294967296
    u = (h + 0.5) / 4294967296.0
    key = F.log(u) / F.col("n_chars")
    return (
        d.select(
            "doc_id",
            F.col("n_chars").alias("weight"),
            rnd(key, 6).alias("res_key"),
        )
        .orderBy(F.col("res_key").desc(), "doc_id")
        .limit(50)
    )


_RESERVOIR_SQL = """
SELECT doc_id, n_chars AS weight,
       floor((ln((((doc_id % 2147483648) * 2654435761) % 4294967296 + 0.5)
                 / 4294967296.0) / n_chars) * 1000000 + 0.5) / 1000000
         AS res_key
FROM documents WHERE n_chars > 0
ORDER BY res_key DESC, doc_id LIMIT 50
"""


def _group_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    seeds = (
        t(spark, sf_dir, "documents")
        .select(
            "source",
            "doc_id",
            F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
            .cast("long")
            .alias("ntok"),
        )
        .groupBy("source")
        .agg(
            F.min("doc_id").alias("_seed"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("ntok").alias("n_tokens"),
        )
    )
    fold = (
        (F.col("_seed") % 2147483648) * 2654435761 % 4294967296 % 5
    ).cast("long")
    return (
        seeds.withColumn("fold", fold)
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sources"),
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
        .orderBy("fold")
    )


_KFOLD_SQL = r"""
WITH seeds AS (
  SELECT source, min(doc_id) AS seed,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(regexp_split_to_array(lower(trim(text)), '\s+')))
              AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
)
SELECT CAST((((seed % 2147483648) * 2654435761) % 4294967296) % 5 AS BIGINT)
         AS fold,
       CAST(count(*) AS BIGINT) AS n_sources,
       CAST(sum(n_docs) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens
FROM seeds GROUP BY fold ORDER BY fold
"""


QUERIES: dict[str, QuerySpec] = {
    "component_label_propagation": QuerySpec(
        _component_label_propagation,
        duck_materialize(_PROPAGATION_SQL),
        "majority label transfer through near-dup connected components",
    ),
    "weighted_reservoir_sample": QuerySpec(
        _weighted_reservoir_sample,
        _RESERVOIR_SQL,
        "Efraimidis-Spirakis weighted sample without replacement (top-50)",
    ),
    "group_kfold_assign": QuerySpec(
        _group_kfold_assign,
        _KFOLD_SQL,
        "group-integral k-fold assignment with per-fold balance",
    ),
}
