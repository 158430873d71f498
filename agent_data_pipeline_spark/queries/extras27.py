"""Round-4 surface additions, part 22: one-way ANOVA.

`anova_oneway` tests whether mean order value differs across order
priorities: the classic F statistic from between-group and within-group
sums of squares. Completes the inference family (two-proportion z-test,
chi-square independence, mean CIs) with the k-group mean comparison.

Determinism: all sums of squares derive from exact BIGINT moments over
integer dollars (the overflow-safe unit the CI kit established); the F
ratio is a fixed chain of double ops rounded at 4.

Scale: one partial-aggregated pass computes per-group (n, Σx, Σx²);
the F assembly runs over k rows on the driver side of the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core import QuerySpec, rnd, t


def _anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of order value (integer dollars) across the k=5
    priorities: SSB = Σ nᵢ(x̄ᵢ − x̄)², SSW = Σᵢ (Σx² − nᵢx̄ᵢ²),
    F = (SSB/(k−1)) / (SSW/(N−k)). Emits one row: group count, N, the
    sums of squares and F — every input an exact BIGINT moment."""
    o = t(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.floor(F.col("o_totalprice")).cast("long").alias("x"),
    )
    g = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s1"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
    )
    tot = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("N"),
        F.sum("s1").alias("S1"),
        F.sum("s2").alias("S2"),
        # Cast BEFORE squaring: s1² overflows BIGINT under ANSI at ~10x
        # this corpus; the double square rounds identically on both
        # engines (inputs < 2^53).
        F.sum(
            F.col("s1").cast("double") * F.col("s1") / F.col("n")
        ).alias("sum_sq_means"),
    )
    grand_sq = F.col("S1").cast("double") * F.col("S1") / F.col("N")
    ssb = F.col("sum_sq_means") - grand_sq
    ssw = F.col("S2") - F.col("sum_sq_means")
    f_stat = (ssb / (F.col("k") - 1)) / (ssw / (F.col("N") - F.col("k")))
    # SS magnitudes (~1e13+) sit past double's decimal-cent precision,
    # so they report in 1e9-scaled units where 4 decimals are far above
    # the accumulation-order noise floor; F is O(1) and rounds at 4.
    return tot.select(
        F.col("k").alias("n_groups"),
        F.col("N").alias("n_rows"),
        rnd(ssb / 1e9, 4).alias("ss_between_1e9"),
        rnd(ssw / 1e9, 4).alias("ss_within_1e9"),
        rnd(f_stat, 4).alias("f_stat"),
    )


_ANOVA_SQL = """
WITH o AS (
  SELECT o_orderpriority, CAST(floor(o_totalprice) AS BIGINT) AS x
  FROM orders
), g AS (
  SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS s1, CAST(sum(x * x) AS BIGINT) AS s2
  FROM o GROUP BY 1
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS N,
         CAST(sum(s1) AS BIGINT) AS S1, CAST(sum(s2) AS BIGINT) AS S2,
         sum(CAST(s1 AS DOUBLE) * s1 / n) AS sum_sq_means
  FROM g
)
SELECT k AS n_groups, N AS n_rows,
       floor((sum_sq_means - CAST(S1 AS DOUBLE) * S1 / N) / 1e9
             * 10000 + 0.5) / 10000 AS ss_between_1e9,
       floor((S2 - sum_sq_means) / 1e9 * 10000 + 0.5) / 10000
         AS ss_within_1e9,
       floor(((sum_sq_means - CAST(S1 AS DOUBLE) * S1 / N) / (k - 1))
             / ((S2 - sum_sq_means) / (N - k)) * 10000 + 0.5) / 10000
         AS f_stat
FROM tot
"""


QUERIES: dict[str, QuerySpec] = {
    "anova_oneway": QuerySpec(
        _anova_oneway,
        _ANOVA_SQL,
        "one-way ANOVA F statistic from exact integer moments",
    ),
}
