"""Round-4 surface additions, part 21: imputation, robust fences,
inference intervals, cohort value curves, and dedup diagnostics.

`mode_imputation` fills missing measures with the group mode (the
categorical-imputation workhorse; mode picked deterministically by
(count desc, value asc)); `iqr_fences` is Tukey's outlier rule with
exact quartiles from the integer-domain counting-sort histogram (the
same scale-safe pattern as `ship_latency_percentiles`);
`mean_confidence_intervals` is the normal-approximation 95% CI per
group (the "is this shift real?" readout); `cohort_ltv_curve` is the
cumulative-revenue-by-cohort-age matrix every growth team tracks;
`dup_cluster_histogram` is the dedup diagnostic: the distribution of
duplicate-group sizes (how much mass a dedup pass would remove, and
whether one giant cluster dominates — the skew signal for the dedup
shuffle itself).

Determinism: modes/quartiles/cluster sizes are integer decisions with
total-order tie-breaks; CIs round at 4 over exact integer sums;
LTV cents are exact integers, shares rounded at 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import QuerySpec, rnd, t


# --------------------------------------------------------------------------
# mode_imputation — fill nulls with the per-group mode
# --------------------------------------------------------------------------


def _mode_imputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simulate missingness (quantity withheld where orderkey ≡ 0 mod
    7), impute with the per-returnflag mode of the OBSERVED values
    (mode = (count desc, value asc) — deterministic under ties), and
    audit: rows imputed, the mode used, and the mean before/after.
    The mode derives from a (flag, value) aggregate — value domain ≤ 50
    — so nothing fact-scale sorts."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.when(F.col("l_orderkey") % 7 == 0, None)
        .otherwise(F.col("l_quantity").cast("long"))
        .alias("qty"),
    )
    counts = (
        li.filter(F.col("qty").isNotNull())
        .groupBy("l_returnflag", "qty")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wm = Window.partitionBy("l_returnflag").orderBy(
        F.col("c").desc(), F.col("qty").asc()
    )
    modes = (
        counts.withColumn("_r", F.row_number().over(wm))
        .filter(F.col("_r") == 1)
        .select("l_returnflag", F.col("qty").alias("mode_qty"))
    )
    j = li.join(F.broadcast(modes), "l_returnflag")
    return (
        j.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_if(F.col("qty").isNull()).alias("n_imputed"),
            F.min("mode_qty").alias("mode_qty"),
            rnd(F.avg("qty"), 4).alias("mean_observed"),
            rnd(
                F.avg(F.coalesce(F.col("qty"), F.col("mode_qty"))), 4
            ).alias("mean_imputed"),
        )
        .orderBy("l_returnflag")
    )


_MODE_IMPUTE_SQL = """
WITH li AS (
  SELECT l_returnflag,
         CASE WHEN l_orderkey % 7 = 0 THEN NULL
              ELSE CAST(l_quantity AS BIGINT) END AS qty
  FROM lineitem
), counts AS (
  SELECT l_returnflag, qty, count(*) AS c
  FROM li WHERE qty IS NOT NULL GROUP BY 1, 2
), modes AS (
  SELECT l_returnflag, qty AS mode_qty
  FROM (SELECT *, row_number() OVER (PARTITION BY l_returnflag
               ORDER BY c DESC, qty ASC) AS r FROM counts)
  WHERE r = 1
)
SELECT li.l_returnflag,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) FILTER (WHERE qty IS NULL) AS BIGINT) AS n_imputed,
       CAST(min(mode_qty) AS BIGINT) AS mode_qty,
       floor(avg(qty) * 10000 + 0.5) / 10000 AS mean_observed,
       floor(avg(coalesce(qty, mode_qty)) * 10000 + 0.5) / 10000
         AS mean_imputed
FROM li JOIN modes USING (l_returnflag)
GROUP BY 1 ORDER BY li.l_returnflag
"""


# --------------------------------------------------------------------------
# iqr_fences — Tukey outlier fences from the integer histogram
# --------------------------------------------------------------------------


def _iqr_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey outlier rule per return flag over quantity: exact
    percentile_cont Q1/Q3 from the (flag, qty) counting-sort histogram,
    fences at Q1−1.5·IQR / Q3+1.5·IQR, and the outlier counts outside
    them. The quantity domain is ≤ 50 values, so every window runs over
    the histogram."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("long").alias("qty")
    )
    hist = li.groupBy("l_returnflag", "qty").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wp = Window.partitionBy("l_returnflag")
    wc = wp.orderBy("qty").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("cnt").over(wc)).withColumn(
        "n", F.sum("cnt").over(wp)
    )

    def pct(q: float):
        tgt = F.lit(q) * (F.col("n") - 1)
        lo = F.min(F.when(F.col("cum") >= F.floor(tgt) + 1, F.col("qty")))
        hi = F.min(F.when(F.col("cum") >= F.ceil(tgt) + 1, F.col("qty")))
        return lo + F.first(tgt - F.floor(tgt)) * (hi - lo)

    qs = cum.groupBy("l_returnflag").agg(
        pct(0.25).alias("q1"), pct(0.75).alias("q3")
    )
    fences = qs.select(
        "l_returnflag",
        rnd(F.col("q1"), 4).alias("q1"),
        rnd(F.col("q3"), 4).alias("q3"),
        (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("lo_fence"),
        (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("hi_fence"),
    )
    j = li.join(F.broadcast(fences), "l_returnflag")
    return (
        j.groupBy("l_returnflag", "q1", "q3")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_if(F.col("qty") < F.col("lo_fence")).alias("n_below"),
            F.count_if(F.col("qty") > F.col("hi_fence")).alias("n_above"),
        )
        .orderBy("l_returnflag")
    )


_IQR_SQL = """
WITH li AS (
  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty FROM lineitem
), qs AS (
  SELECT l_returnflag,
         CAST(percentile_cont(0.25) WITHIN GROUP (ORDER BY qty) AS DOUBLE)
           AS q1r,
         CAST(percentile_cont(0.75) WITHIN GROUP (ORDER BY qty) AS DOUBLE)
           AS q3r
  FROM li GROUP BY 1
), fences AS (
  SELECT l_returnflag,
         floor(q1r * 10000 + 0.5) / 10000 AS q1,
         floor(q3r * 10000 + 0.5) / 10000 AS q3,
         q1r - 1.5 * (q3r - q1r) AS lo_fence,
         q3r + 1.5 * (q3r - q1r) AS hi_fence
  FROM qs
)
SELECT li.l_returnflag, f.q1, f.q3,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) FILTER (WHERE qty < lo_fence) AS BIGINT) AS n_below,
       CAST(count(*) FILTER (WHERE qty > hi_fence) AS BIGINT) AS n_above
FROM li JOIN fences f USING (l_returnflag)
GROUP BY 1, 2, 3 ORDER BY li.l_returnflag
"""


# --------------------------------------------------------------------------
# mean_confidence_intervals — normal-approx 95% CI per group
# --------------------------------------------------------------------------


def _mean_confidence_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% CI for mean order value per priority: mean ± 1.96·s/√n over
    exact integer DOLLARS. Units are load-bearing: the second moment of
    cents overflows BIGINT past ~10⁵ rows of 10⁵-dollar orders (the 10×
    sweep caught exactly that under ANSI mode), while Σ dollars² stays
    exact to ~100× this corpus — so the only float steps are two
    divisions and a sqrt, rounded at 4."""
    o = t(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.floor(F.col("o_totalprice")).cast("long").alias("dollars"),
    )
    mom = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dollars").alias("s1"),
        F.sum(F.col("dollars") * F.col("dollars")).alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    var = (F.col("s2") - F.col("s1") * mean) / (F.col("n") - 1)
    half = 1.96 * F.sqrt(var / F.col("n"))
    return mom.select(
        "o_orderpriority",
        F.col("n").alias("n_orders"),
        rnd(mean, 4).alias("mean_dollars"),
        rnd(mean - half, 4).alias("ci_lo"),
        rnd(mean + half, 4).alias("ci_hi"),
    ).orderBy("o_orderpriority")


_MEAN_CI_SQL = """
WITH o AS (
  SELECT o_orderpriority,
         CAST(floor(o_totalprice) AS BIGINT) AS dollars
  FROM orders
), mom AS (
  SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(dollars) AS BIGINT) AS s1,
         CAST(sum(dollars * dollars) AS BIGINT) AS s2
  FROM o GROUP BY 1
)
SELECT o_orderpriority, n AS n_orders,
       floor(s1 / CAST(n AS DOUBLE) * 10000 + 0.5) / 10000 AS mean_dollars,
       floor((s1 / CAST(n AS DOUBLE)
              - 1.96 * sqrt((s2 - s1 * (s1 / CAST(n AS DOUBLE))) / (n - 1)
                            / n)) * 10000 + 0.5) / 10000 AS ci_lo,
       floor((s1 / CAST(n AS DOUBLE)
              + 1.96 * sqrt((s2 - s1 * (s1 / CAST(n AS DOUBLE))) / (n - 1)
                            / n)) * 10000 + 0.5) / 10000 AS ci_hi
FROM mom
ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------------
# cohort_ltv_curve — cumulative revenue by cohort age
# --------------------------------------------------------------------------


def _cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTV curves: customers cohorted by first-order month, revenue
    accumulated by cohort age in months (0-11 shown), as exact cents
    plus cumulative per-customer value. Everything beyond the first
    fact rollup runs at (cohort, age) grain."""
    o = t(spark, sf_dir, "orders")
    first = o.groupBy("o_custkey").agg(
        F.min(F.trunc("o_orderdate", "month")).alias("cohort_m")
    )
    j = o.join(F.broadcast(first), "o_custkey").select(
        F.date_format("cohort_m", "yyyy-MM").alias("cohort"),
        (
            (F.year("o_orderdate") - F.year("cohort_m")) * 12
            + (F.month("o_orderdate") - F.month("cohort_m"))
        )
        .cast("long")
        .alias("age"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    sizes = first.groupBy(
        F.date_format("cohort_m", "yyyy-MM").alias("cohort")
    ).agg(F.count(F.lit(1)).alias("cohort_size"))
    curve = (
        j.groupBy("cohort", "age")
        .agg(F.sum("cents").alias("rev_cents"))
        .filter(F.col("age") < 12)
    )
    wc = Window.partitionBy("cohort").orderBy("age").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        curve.join(F.broadcast(sizes), "cohort")
        .select(
            "cohort",
            "age",
            "rev_cents",
            F.sum("rev_cents").over(wc).alias("cum_cents"),
            rnd(
                F.sum("rev_cents").over(wc) / F.col("cohort_size"), 2
            ).alias("cum_per_customer"),
        )
        .orderBy("cohort", "age")
    )


_COHORT_LTV_SQL = """
WITH first AS (
  SELECT o_custkey, date_trunc('month', min(o_orderdate)) AS cohort_m
  FROM orders GROUP BY 1
), j AS (
  SELECT strftime(f.cohort_m, '%Y-%m') AS cohort,
         CAST((year(o.o_orderdate) - year(f.cohort_m)) * 12
              + (month(o.o_orderdate) - month(f.cohort_m)) AS BIGINT) AS age,
         CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders o JOIN first f USING (o_custkey)
), sizes AS (
  SELECT strftime(cohort_m, '%Y-%m') AS cohort,
         CAST(count(*) AS BIGINT) AS cohort_size
  FROM first GROUP BY 1
), curve AS (
  SELECT cohort, age, CAST(sum(cents) AS BIGINT) AS rev_cents
  FROM j GROUP BY 1, 2 HAVING age < 12
)
SELECT c.cohort, c.age, c.rev_cents,
       CAST(sum(c.rev_cents) OVER (PARTITION BY c.cohort ORDER BY c.age
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_cents,
       floor(sum(c.rev_cents) OVER (PARTITION BY c.cohort ORDER BY c.age
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             / CAST(s.cohort_size AS DOUBLE) * 100 + 0.5) / 100
         AS cum_per_customer
FROM curve c JOIN sizes s USING (cohort)
ORDER BY c.cohort, c.age
"""


# --------------------------------------------------------------------------
# dup_cluster_histogram — duplicate-group size distribution
# --------------------------------------------------------------------------


def _dup_cluster_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup diagnostic: histogram of exact-duplicate cluster sizes
    (by content digest), with the mass a keep-one dedup would remove
    per size. The fixture corpus is fully unique, so the feed simulates
    a re-crawl (docs ≡ 0 mod 10 ingested twice, ≡ 0 mod 50 three
    times) — the histogram must report exactly those cluster sizes.
    One digest aggregate, one size aggregate — both narrow."""
    d = t(spark, sf_dir, "documents")
    feed = d.unionAll(d.filter(F.col("doc_id") % 10 == 0)).unionAll(
        d.filter(F.col("doc_id") % 50 == 0)
    )
    clusters = feed.groupBy(F.md5("text").alias("h")).agg(
        F.count(F.lit(1)).alias("sz")
    )
    return (
        clusters.groupBy("sz")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .withColumn("n_docs", F.col("sz") * F.col("n_clusters"))
        .withColumn(
            "n_removable", (F.col("sz") - 1) * F.col("n_clusters")
        )
        .orderBy("sz")
    )


_DUP_CLUSTER_SQL = """
WITH feed AS (
  SELECT text FROM documents
  UNION ALL SELECT text FROM documents WHERE doc_id % 10 = 0
  UNION ALL SELECT text FROM documents WHERE doc_id % 50 = 0
), clusters AS (
  SELECT md5(text) AS h, CAST(count(*) AS BIGINT) AS sz
  FROM feed GROUP BY 1
)
SELECT sz, CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(sz * count(*) AS BIGINT) AS n_docs,
       CAST((sz - 1) * count(*) AS BIGINT) AS n_removable
FROM clusters
GROUP BY sz ORDER BY sz
"""


QUERIES: dict[str, QuerySpec] = {
    "mode_imputation": QuerySpec(
        _mode_imputation,
        _MODE_IMPUTE_SQL,
        "group-mode imputation with before/after audit",
    ),
    "iqr_fences": QuerySpec(
        _iqr_fences,
        _IQR_SQL,
        "Tukey IQR outlier fences from the integer histogram",
    ),
    "mean_confidence_intervals": QuerySpec(
        _mean_confidence_intervals,
        _MEAN_CI_SQL,
        "normal-approx 95% CI per group from exact moments",
    ),
    "cohort_ltv_curve": QuerySpec(
        _cohort_ltv_curve,
        _COHORT_LTV_SQL,
        "cumulative revenue by cohort age (LTV curves)",
    ),
    "dup_cluster_histogram": QuerySpec(
        _dup_cluster_histogram,
        _DUP_CLUSTER_SQL,
        "duplicate-cluster size distribution (dedup diagnostics)",
    ),
}
