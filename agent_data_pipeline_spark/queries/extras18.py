"""Round-4 surface additions, part 13: higher-order map functions and
the built-in regression-aggregate family.

`map_transform_kit` closes the last higher-order gap: transform_keys /
transform_values / map_filter / map_zip_with / inline (array-of-struct
explode) — the property-bag rewriting idiom (map_kit2 covers
construction/lookup/concat; higher_order_kit covers the array family).
`regr_builtin_kit` exercises the full regr_* aggregate family
(count/avgx/avgy/slope/intercept/r2) per group — the one-pass linear
fit SQL-2003 defines (covar_regr_by_flag covers covar/corr; this is
the regression side).

Determinism: map results flatten to scalars before returning (MAP/ARRAY
columns are not driver-safe); regr_* run over exact integer-cents
inputs and round at 2 (slope/intercept/means — magnitudes are cents) or
6 (r2), wide margins over both engines' stable accumulators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core import QuerySpec, rnd, t


def _map_transform_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order map rewriting over a per-document property bag:
    build {chars, words} metrics, transform_keys (prefix),uppercase-
    count transform_values, map_filter (keep large metrics),
    map_zip_with (merge two bags by summing), and inline over an
    arrays_zip pair list. Every output is a flattened scalar computed
    from the transformed bag, so the oracle states the equivalent
    arithmetic directly."""
    d = t(spark, sf_dir, "documents")
    words = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    m1 = F.create_map(
        F.lit("chars"), F.col("n_chars"), F.lit("words"), words
    )
    m2 = F.transform_values(m1, lambda k, v: v * 2)
    m3 = F.transform_keys(m1, lambda k, v: F.concat(F.lit("x_"), k))
    big = F.map_filter(m1, lambda k, v: v >= 100)
    merged = F.map_zip_with(
        m1,
        m2,
        lambda k, v1, v2: F.coalesce(v1, F.lit(0)) + F.coalesce(v2, F.lit(0)),
    )
    pairs = F.arrays_zip(
        F.array(F.lit("c"), F.lit("w")).alias("k"),
        F.array(F.col("n_chars"), words).alias("v"),
    )
    inlined = d.select("doc_id", F.inline(pairs))
    inline_sum = inlined.groupBy("doc_id").agg(
        F.sum("v").alias("inline_sum"), F.count(F.lit(1)).alias("inline_rows")
    )
    base = d.select(
        "doc_id",
        F.element_at(m2, "chars").alias("chars_doubled"),
        F.element_at(m3, "x_words").alias("x_words_val"),
        F.size(F.map_keys(big)).cast("long").alias("n_big_metrics"),
        F.element_at(merged, "words").alias("words_tripled"),
    )
    return base.join(inline_sum, "doc_id").orderBy("doc_id")


_MAP_TRANSFORM_SQL = r"""
WITH d AS (
  SELECT doc_id, n_chars,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS words
  FROM documents
)
SELECT doc_id,
       n_chars * 2 AS chars_doubled,
       words AS x_words_val,
       CAST(CASE WHEN n_chars >= 100 THEN 1 ELSE 0 END
            + CASE WHEN words >= 100 THEN 1 ELSE 0 END AS BIGINT)
         AS n_big_metrics,
       words * 3 AS words_tripled,
       n_chars + words AS inline_sum,
       CAST(2 AS BIGINT) AS inline_rows
FROM d
ORDER BY doc_id
"""


def _regr_builtin_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-2003 one-pass regression family per return flag:
    regr_count/avgx/avgy/slope/intercept/r2 of extended-price cents (y)
    on quantity (x). Integer inputs; both engines' stable accumulators
    agree far inside the 2-decimal rounding."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("x"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("y"),
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.regr_count("y", "x").cast("long").alias("r_count"),
            rnd(F.regr_avgx("y", "x"), 2).alias("r_avgx"),
            rnd(F.regr_avgy("y", "x"), 2).alias("r_avgy"),
            rnd(F.regr_slope("y", "x"), 2).alias("r_slope"),
            rnd(F.regr_intercept("y", "x"), 2).alias("r_intercept"),
            rnd(F.regr_r2("y", "x"), 6).alias("r_r2"),
        )
        .orderBy("l_returnflag")
    )


_REGR_SQL = """
WITH li AS (
  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
  FROM lineitem
)
SELECT l_returnflag,
       CAST(regr_count(y, x) AS BIGINT) AS r_count,
       floor(regr_avgx(y, x) * 100 + 0.5) / 100 AS r_avgx,
       floor(regr_avgy(y, x) * 100 + 0.5) / 100 AS r_avgy,
       floor(regr_slope(y, x) * 100 + 0.5) / 100 AS r_slope,
       floor(regr_intercept(y, x) * 100 + 0.5) / 100 AS r_intercept,
       floor(regr_r2(y, x) * 1000000 + 0.5) / 1000000 AS r_r2
FROM li
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


QUERIES: dict[str, QuerySpec] = {
    "map_transform_kit": QuerySpec(
        _map_transform_kit,
        _MAP_TRANSFORM_SQL,
        "higher-order map fns: transform_keys/values, filter, zip_with, inline",
    ),
    "regr_builtin_kit": QuerySpec(
        _regr_builtin_kit,
        _REGR_SQL,
        "SQL-2003 regr_* one-pass regression family per group",
    ),
}
