"""Round-7 fifth wave: embedding-corpus diagnostics that stay ONE-PASS
at any scale, both DuckDB-oracled.

* ``embedding_diversity_by_label`` — mean pairwise cosine similarity
  within each label, WITHOUT a pair join: for unit vectors,
  Σ_{i≠j} cos(u_i, u_j) = ‖Σu‖² − n, so
  mean = (‖Σu‖² − n) / (n(n−1)). What a naive implementation computes
  with an O(n²) self-join collapses to one normalize + one per-(label,
  dim) sum + a d-element fold — the measurement teams run to catch a
  collapsing (over-deduplicated or mode-collapsed) embedding slice.
  A LOW mean pairwise cosine = diverse slice; near 1 = redundant.
* ``embedding_centroid_shift`` — per-label cosine between the mean
  vectors of two corpus cohorts (vec_id parity as the snapshot stand-
  in): the embedding-drift monitor run when re-embedding with a new
  model build. Same one-pass shape (per-(label, cohort, dim) sums →
  64-element folds).

Plan shape (both): explode to (label, dim, component) → two-phase hash
aggregate (the ONLY fact-scale work, shuffle keyed on label×64 dims) →
label-grain folds. No window, no join, no UDF.

Reference parity: no embedding surface in the reference (SURVEY.md
§2.A); declared north-star §2.B (embedding diagnostics family, next to
``embedding_norm_audit`` / ``pca_variance``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core import QuerySpec, rnd, t


def _with_unit(df: DataFrame, *keep: str) -> DataFrame:
    """Add a unit-normalized `u` column. The norm is MATERIALIZED as its
    own projection first: inlining the aggregate into the transform
    lambda makes Catalyst re-evaluate the d-element fold for EVERY
    element (O(d²) per row — measured 2.2× slower end-to-end at d=64)."""
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    nrm = F.sqrt(F.aggregate(dbl, F.lit(0.0), lambda a, x: a + x * x))
    return df.withColumn("_nrm", nrm).select(
        *keep, F.transform(dbl, lambda x: x / F.col("_nrm")).alias("u")
    )


def _embedding_diversity_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _with_unit(t(spark, sf_dir, "embeddings"), "label")
    # posexplode_outer + null-filter on the GENERATED attribute: the
    # non-outer form makes InferFiltersFromGenerate re-evaluate the whole
    # inlined normalize fold inside a pushed-down Filter (plan_audit
    # hof_filter_recompute; SCALING.md round-13 pathology). Outer skips
    # the rule; the dim filter drops the same empty-array rows and cannot
    # be pushed below the Generate.
    comp = emb.select("label", F.posexplode_outer("u").alias("dim", "c")).filter(
        F.col("dim").isNotNull()
    )
    sums = comp.groupBy("label", "dim").agg(
        F.sum("c").alias("s"), F.count(F.lit(1)).alias("n")
    )
    per_label = sums.groupBy("label").agg(
        F.first("n").alias("n"),  # n is identical across dims of a label
        F.sum(F.col("s") * F.col("s")).alias("norm2"),
    )
    return (
        per_label.select(
            "label",
            F.col("n").cast("long").alias("n"),
            rnd(
                (F.col("norm2") - F.col("n"))
                / (F.col("n") * (F.col("n") - F.lit(1))),
                6,
            ).alias("mean_pairwise_cosine"),
        )
        .orderBy("label")
    )


_DIVERSITY_SQL = """
WITH unit AS (
  SELECT label,
         list_transform(CAST(embedding AS DOUBLE[]),
           x -> x / sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                                 y -> y * y)))) AS u
  FROM embeddings
), comp AS (
  SELECT label, i - 1 AS dim, u[i] AS c
  FROM unit, unnest(generate_series(1, len(u))) AS t(i)
), sums AS (
  SELECT label, dim, sum(c) AS s, count(*) AS n
  FROM comp GROUP BY label, dim
)
SELECT label,
       CAST(any_value(n) AS BIGINT) AS n,
       floor((sum(s * s) - any_value(n))
             / (any_value(n) * (any_value(n) - 1)) * 1000000 + 0.5) / 1000000
         AS mean_pairwise_cosine
FROM sums GROUP BY label ORDER BY label
"""


def _embedding_centroid_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _with_unit(
        t(spark, sf_dir, "embeddings").withColumn(
            "is_a", F.col("vec_id") % 2 == 0
        ),
        "label",
        "is_a",
    )
    # posexplode_outer + generated-attr filter: see _embedding_diversity
    comp = emb.select(
        "label", "is_a", F.posexplode_outer("u").alias("dim", "c")
    ).filter(F.col("dim").isNotNull())
    sums = comp.groupBy("label", "dim").agg(
        F.sum(F.when(F.col("is_a"), F.col("c")).otherwise(0.0)).alias("sa"),
        F.sum(F.when(~F.col("is_a"), F.col("c")).otherwise(0.0)).alias("sb"),
        F.sum(F.col("is_a").cast("long")).alias("na"),
        F.sum((~F.col("is_a")).cast("long")).alias("nb"),
    )
    per_label = sums.groupBy("label").agg(
        F.first("na").alias("na"),
        F.first("nb").alias("nb"),
        F.sum(F.col("sa") * F.col("sb")).alias("dot"),
        F.sum(F.col("sa") * F.col("sa")).alias("a2"),
        F.sum(F.col("sb") * F.col("sb")).alias("b2"),
    )
    return (
        per_label.select(
            "label",
            F.col("na").cast("long").alias("n_a"),
            F.col("nb").cast("long").alias("n_b"),
            rnd(
                F.col("dot") / (F.sqrt(F.col("a2")) * F.sqrt(F.col("b2"))), 6
            ).alias("centroid_cosine"),
        )
        .orderBy("label")
    )


_CENTROID_SHIFT_SQL = """
WITH unit AS (
  SELECT label, vec_id % 2 = 0 AS is_a,
         list_transform(CAST(embedding AS DOUBLE[]),
           x -> x / sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                                 y -> y * y)))) AS u
  FROM embeddings
), comp AS (
  SELECT label, is_a, i - 1 AS dim, u[i] AS c
  FROM unit, unnest(generate_series(1, len(u))) AS t(i)
), sums AS (
  SELECT label, dim,
         sum(CASE WHEN is_a THEN c ELSE 0.0 END) AS sa,
         sum(CASE WHEN is_a THEN 0.0 ELSE c END) AS sb,
         sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS na,
         sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS nb
  FROM comp GROUP BY label, dim
)
SELECT label,
       CAST(any_value(na) AS BIGINT) AS n_a,
       CAST(any_value(nb) AS BIGINT) AS n_b,
       floor(sum(sa * sb) / (sqrt(sum(sa * sa)) * sqrt(sum(sb * sb)))
             * 1000000 + 0.5) / 1000000 AS centroid_cosine
FROM sums GROUP BY label ORDER BY label
"""


QUERIES: dict[str, QuerySpec] = {
    "embedding_diversity_by_label": QuerySpec(
        _embedding_diversity_by_label,
        _DIVERSITY_SQL,
        "mean pairwise cosine per label via the sum-vector identity "
        "(one pass, no pair join)",
    ),
    "embedding_centroid_shift": QuerySpec(
        _embedding_centroid_shift,
        _CENTROID_SHIFT_SQL,
        "per-label centroid cosine between vec_id-parity cohorts",
    ),
}
