"""Round-4 surface additions, part 16: boilerplate line removal,
normalized near-exact dedup, hierarchy shares, and exact kNN label
voting.

`boilerplate_line_removal` is the C4/CCNet-style line-level filter:
lines repeated across many documents (navigation chrome, cookie
banners, boilerplate headers) are removed corpus-wide and documents are
reassembled from their surviving lines, preserving order.
`normalized_exact_dedup` is near-exact dedup after text normalization
(case-fold, whitespace collapse, punctuation strip) — the cheap dedup
tier between byte-exact hashing and MinHash. `share_of_parent` is the
BI hierarchy rollup (nation revenue as share of region, region of
total). `knn_label_vote` classifies query embeddings by majority label
of their exact top-5 cosine neighbors and emits the confusion census —
the standard embedding-quality eval, with the whole vote
SQL-expressible so it is hash-checked (unlike the ANN paths, which are
approximate by design).

Determinism: line membership and document reassembly are exact string
ops keyed by (doc, line index); shares are exact-cents ratios;
neighbor ranks order by (rounded sim desc, neighbor id) — a total
order at the rounded grain.

Scale notes (100 TB): the line filter is explode → line-hash DF count
→ broadcast blocklist back — the same shape as decontamination (the
blocklist is the df>cap tail, vocabulary-bounded); normalized dedup is
one shuffle on the normalized hash; shares are dim-scale; the kNN demo
bounds its query set (20 vectors) and documents the ANN kits as the
corpus-scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import QuerySpec, rnd, t


# --------------------------------------------------------------------------
# boilerplate_line_removal — corpus-wide repeated-line filter
# --------------------------------------------------------------------------


def _boilerplate_line_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remove lines whose document frequency exceeds 5 (boilerplate),
    reassemble documents from surviving lines in order, and report
    per-source totals: docs, lines kept/removed, and chars after
    cleaning. Lines here are sentence-ish segments (split on '. ' —
    the fixture is single-line text); the blocklist is the df>cap tail,
    broadcast back onto the exploded lines."""
    d = t(spark, sf_dir, "documents")
    lines = d.select(
        "doc_id",
        "source",
        F.posexplode(F.split(F.col("text"), r"\. ")).alias("pos", "line"),
    )
    dfreq = (
        lines.groupBy("line")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") > 5)
        .select("line")
    )
    flagged = lines.join(
        F.broadcast(dfreq.withColumn("_bl", F.lit(1))), "line", "left"
    )
    # One aggregate over ALL docs (collect_list skips null entries), so a
    # fully-boilerplate doc still yields a row with an empty clean text —
    # matching the oracle's group-over-flagged semantics.
    rebuilt = flagged.groupBy("doc_id", "source").agg(
        F.array_join(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("_bl").isNull(), F.struct("pos", "line"))
                )
            ).getField("line"),
            ". ",
        ).alias("clean_text"),
        F.count_if(F.col("_bl").isNull()).alias("n_kept"),
        F.count_if(F.col("_bl") == 1).alias("n_removed"),
    )
    return (
        rebuilt.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_kept").alias("lines_kept"),
            F.sum("n_removed").alias("lines_removed"),
            F.sum(F.length("clean_text")).alias("clean_chars"),
        )
        .orderBy("source")
    )


_BOILERPLATE_SQL = r"""
WITH lines AS (
  SELECT doc_id, source, u.pos, u.line
  FROM documents,
       LATERAL (SELECT unnest(string_split(text, '. ')) AS line,
                       generate_subscripts(string_split(text, '. '), 1) AS pos)
         AS u
), bl AS (
  SELECT line FROM lines GROUP BY line HAVING count(DISTINCT doc_id) > 5
), flagged AS (
  SELECT l.*, CASE WHEN b.line IS NOT NULL THEN 1 ELSE 0 END AS is_bl
  FROM lines l LEFT JOIN bl b ON l.line = b.line
), rebuilt AS (
  SELECT doc_id, source,
         string_agg(line, '. ' ORDER BY pos)
           FILTER (WHERE is_bl = 0) AS clean_text,
         count(*) FILTER (WHERE is_bl = 0) AS n_kept,
         count(*) FILTER (WHERE is_bl = 1) AS n_removed
  FROM flagged
  GROUP BY doc_id, source
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_kept) AS BIGINT) AS lines_kept,
       CAST(sum(n_removed) AS BIGINT) AS lines_removed,
       CAST(sum(length(coalesce(clean_text, ''))) AS BIGINT) AS clean_chars
FROM rebuilt
GROUP BY source ORDER BY source
"""


# --------------------------------------------------------------------------
# normalized_exact_dedup — near-exact dedup after normalization
# --------------------------------------------------------------------------


def _normalized_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-exact dedup tier: normalize (lowercase, strip punctuation,
    collapse whitespace), hash, keep the min-id representative per
    normalized form. Reports per-source kept/dropped — the cheap tier
    that catches case/punctuation variants byte-exact hashing misses,
    before MinHash spends real money. One shuffle on the 32-hex
    digest, explicitly projected to (source, digest, id) — Catalyst
    already prunes the text through the window (the digest is computed
    map-side as the partition key), the projection just makes the
    shuffle-narrowing contract visible (same as exact_dedup)."""
    d = t(spark, sf_dir, "documents")
    norm = F.regexp_replace(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower(F.col("text")), r"[^\sa-z0-9]", ""),
                r"\s+",
                " ",
            )
        ),
        r"^$",
        "<empty>",
    )
    slim = d.select("source", "doc_id", F.md5(norm).alias("_h"))
    w = Window.partitionBy("_h").orderBy("doc_id")
    ranked = slim.withColumn("_rn", F.row_number().over(w))
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("_rn") == 1, 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(F.col("_rn") > 1, 1).otherwise(0)).alias(
                "n_dropped"
            ),
        )
        .orderBy("source")
    )


_NORM_DEDUP_SQL = r"""
WITH norm AS (
  SELECT doc_id, source,
         md5(CASE WHEN trim(regexp_replace(regexp_replace(lower(text),
                  '[^\sa-z0-9]', '', 'g'), '\s+', ' ', 'g')) = ''
             THEN '<empty>'
             ELSE trim(regexp_replace(regexp_replace(lower(text),
                  '[^\sa-z0-9]', '', 'g'), '\s+', ' ', 'g')) END) AS h
  FROM documents
), ranked AS (
  SELECT source,
         row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
  FROM norm
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
FROM ranked
GROUP BY source ORDER BY source
"""


# --------------------------------------------------------------------------
# share_of_parent — hierarchy percent-of-parent rollup
# --------------------------------------------------------------------------


def _share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BI hierarchy shares: nation revenue as a share of its region and
    of the grand total (exact cents; shares are single divisions of
    exact integers, rounded at 6). Dims broadcast; one fact rollup.

    Window-free since round 12 (allowlist burn-down): the region and
    grand totals are ordinary aggregates of the 25-row nation-grain
    rollup, broadcast back — same exact integer sums the partition-by
    windows computed, without the Exchange SinglePartition the global
    window forced. The oracle keeps its window form (DuckDB windows
    are engine-local there; integer sums make them value-identical)."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    rev = (
        o.join(F.broadcast(c.select("c_custkey", "c_nationkey")),
               o.o_custkey == c.c_custkey)
        .join(F.broadcast(n.select("n_nationkey", "n_name", "n_regionkey")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r.select("r_regionkey", "r_name")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            ).alias("cents")
        )
    )
    reg = rev.groupBy("r_name").agg(F.sum("cents").alias("reg_cents"))
    tot = rev.agg(F.sum("cents").alias("tot_cents"))
    return (
        rev.join(F.broadcast(reg), "r_name")
        .crossJoin(F.broadcast(tot))
        .select(
            "r_name",
            "n_name",
            "cents",
            rnd(F.col("cents") / F.col("reg_cents"), 6).alias(
                "share_of_region"
            ),
            rnd(F.col("cents") / F.col("tot_cents"), 6).alias(
                "share_of_total"
            ),
        )
        .orderBy("r_name", "n_name")
    )


_SHARE_SQL = """
WITH rev AS (
  SELECT r.r_name, n.n_name,
         CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2
)
SELECT r_name, n_name, cents,
       floor(cents / CAST(sum(cents) OVER (PARTITION BY r_name) AS DOUBLE)
             * 1000000 + 0.5) / 1000000 AS share_of_region,
       floor(cents / CAST(sum(cents) OVER () AS DOUBLE)
             * 1000000 + 0.5) / 1000000 AS share_of_total
FROM rev
ORDER BY r_name, n_name
"""


# --------------------------------------------------------------------------
# knn_label_vote — exact kNN majority-label classification + confusion
# --------------------------------------------------------------------------


def _knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 5-NN majority-label vote for a bounded query set (vec_id <
    20) against the rest of the corpus, emitting the confusion census
    (true label × predicted label counts). Neighbor rank orders by
    (cosine rounded at 6 desc, neighbor id); vote ties break toward the
    smaller label. The all-pairs join is query-bounded (|Q| × corpus) —
    the ANN kits are the corpus-scale path."""
    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("true_label"),
    )
    c = e.filter(F.col("vec_id") >= 20).select(
        F.col("vec_id").alias("nid"),
        F.col("embedding").alias("cv"),
        F.col("label").alias("nlabel"),
    )
    dot = F.aggregate(
        F.zip_with("qv", "cv", lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = lambda col: F.sqrt(
        F.aggregate(
            col,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    sims = q.crossJoin(c).select(
        "qid",
        "true_label",
        "nid",
        "nlabel",
        rnd(dot / (nrm(F.col("qv")) * nrm(F.col("cv"))), 6).alias("sim"),
    )
    wk = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid"))
    top5 = sims.withColumn("rk", F.row_number().over(wk)).filter(
        F.col("rk") <= 5
    )
    votes = top5.groupBy("qid", "true_label", "nlabel").agg(
        F.count(F.lit(1)).alias("v")
    )
    wv = Window.partitionBy("qid").orderBy(
        F.col("v").desc(), F.col("nlabel")
    )
    pred = (
        votes.withColumn("vr", F.row_number().over(wv))
        .filter(F.col("vr") == 1)
        .select(
            "qid",
            F.col("true_label").cast("long").alias("true_label"),
            F.col("nlabel").cast("long").alias("pred_label"),
        )
    )
    return (
        pred.groupBy("true_label", "pred_label")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("true_label", "pred_label")
    )


_KNN_SQL = """
WITH q AS (
  SELECT vec_id AS qid, embedding AS qv, label AS true_label
  FROM embeddings WHERE vec_id < 20
), c AS (
  SELECT vec_id AS nid, embedding AS cv, label AS nlabel
  FROM embeddings WHERE vec_id >= 20
), sims AS (
  SELECT qid, true_label, nid, nlabel,
         floor(list_cosine_similarity(qv, cv) * 1000000 + 0.5) / 1000000
           AS sim
  FROM q CROSS JOIN c
), top5 AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY qid
                ORDER BY sim DESC, nid) AS rk
    FROM sims)
  WHERE rk <= 5
), votes AS (
  SELECT qid, true_label, nlabel, count(*) AS v
  FROM top5 GROUP BY qid, true_label, nlabel
), pred AS (
  SELECT qid, CAST(true_label AS BIGINT) AS true_label,
         CAST(nlabel AS BIGINT) AS pred_label
  FROM (SELECT *, row_number() OVER (PARTITION BY qid
               ORDER BY v DESC, nlabel) AS vr
        FROM votes)
  WHERE vr = 1
)
SELECT true_label, pred_label, CAST(count(*) AS BIGINT) AS n
FROM pred
GROUP BY true_label, pred_label
ORDER BY true_label, pred_label
"""


QUERIES: dict[str, QuerySpec] = {
    "boilerplate_line_removal": QuerySpec(
        _boilerplate_line_removal,
        _BOILERPLATE_SQL,
        "C4-style repeated-line boilerplate filter + doc reassembly",
    ),
    "normalized_exact_dedup": QuerySpec(
        _normalized_exact_dedup,
        _NORM_DEDUP_SQL,
        "near-exact dedup after case/punct/whitespace normalization",
    ),
    "share_of_parent": QuerySpec(
        _share_of_parent,
        _SHARE_SQL,
        "hierarchy percent-of-parent rollup (nation/region/total)",
    ),
    "knn_label_vote": QuerySpec(
        _knn_label_vote,
        _KNN_SQL,
        "exact 5-NN majority-label vote with confusion census",
    ),
}
