"""Round-7 seventh wave: causal matching, rolling regression,
information-theoretic association, and quantile normalization.

* ``cem_att`` — coarsened exact matching (Iacus, King & Porro 2012)
  estimate of the average treatment effect on the treated: customers
  who ever placed a ``1-URGENT`` order (treated) vs those who never
  did, matched on coarsened covariate cells (market segment ×
  fixed-width account-balance bucket), outcome = total order spend.
  Cells missing either group are pruned (the CEM trim); the ATT
  weights control cell means by the treated cell mass. Naive
  unmatched difference reported alongside — the bias the matching
  removes. Everything is cell-grain aggregation: three hash
  aggregates and a broadcast of ≤|segments|·|buckets| cells.
* ``rolling_ols_slope`` — per-priority 28-day rolling OLS slope of
  daily revenue vs a day index, from windowed sufficient statistics
  (Σx, Σy, Σxy, Σx², n): slope = (nΣxy−ΣxΣy)/(nΣx²−(Σx)²). The
  window runs on the DAY grain (fact rows collapse to ≤2,400
  day×priority rows first), partitioned by priority — bounded by the
  calendar at any fact scale. Last 60 days per priority returned.
* ``mutual_information_lang_source`` — mutual information (nats),
  marginal entropies, and normalized MI (Strehl & Ghosh 2002,
  NMI = MI/√(H₁H₂)) between ``lang`` and ``source`` over documents:
  a 100-cell joint histogram, two re-aggregated marginals, one
  broadcast total — the standard feature-association audit before
  stratifying a corpus on correlated facets.
* ``quantile_normalize_scores`` — classic quantile normalization
  (Bolstad et al. 2003) of ``n_chars`` across sources on a 1000-point
  probability grid: per-source midpoint-ECDF percentile (value-grain
  cumulative histogram, partitioned by source), pooled inverse CDF
  materialized as an equi-joinable (grid-point → value) table via
  interval explosion — NO theta/nested-loop join anywhere, and every
  window input is the integer ``n_chars`` value grain (≤~550 rows per
  source at any corpus size), so the whole plan is bucket-equi-join
  shaped at 100 TB.

Reference parity: no statistics/normalization surface in the reference
(SURVEY.md §2.A); declared north-star §2.B additions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .core import QuerySpec, bounded_collect, rnd, t


def _cem_att(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 2500.0).cast("long").alias("bal_bucket"),
    )
    o = t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_totalprice"
    )
    per_cust = o.groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("spend"),
        F.max(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
        ).alias("treated"),
    )
    u = c.join(per_cust, c.c_custkey == per_cust.o_custkey).select(
        "c_mktsegment", "bal_bucket", "treated", "spend"
    )
    cells = u.groupBy("c_mktsegment", "bal_bucket").agg(
        F.sum("treated").cast("long").alias("n_t"),
        F.sum(1 - F.col("treated")).cast("long").alias("n_c"),
        F.sum(F.when(F.col("treated") == 1, F.col("spend"))).alias("y_t"),
        F.sum(F.when(F.col("treated") == 0, F.col("spend"))).alias("y_c"),
    )
    matched = cells.filter((F.col("n_t") > 0) & (F.col("n_c") > 0))
    att = matched.agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sum("n_t").cast("long").alias("n_treated"),
        F.sum("n_c").cast("long").alias("n_control"),
        rnd(
            F.sum(
                F.col("n_t")
                * (F.col("y_t") / F.col("n_t") - F.col("y_c") / F.col("n_c"))
            )
            / F.sum("n_t"),
            6,
        ).alias("att"),
    )
    naive = u.agg(
        rnd(
            F.avg(F.when(F.col("treated") == 1, F.col("spend")))
            - F.avg(F.when(F.col("treated") == 0, F.col("spend"))),
            6,
        ).alias("naive_diff")
    )
    return att.crossJoin(F.broadcast(naive))


_CEM_SQL = """
WITH per_cust AS (
  SELECT o_custkey, sum(o_totalprice) AS spend,
         max(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS treated
  FROM orders GROUP BY o_custkey
), u AS (
  SELECT c.c_mktsegment,
         CAST(floor(c.c_acctbal / 2500.0) AS BIGINT) AS bal_bucket,
         p.treated, p.spend
  FROM customer c JOIN per_cust p ON c.c_custkey = p.o_custkey
), cells AS (
  SELECT c_mktsegment, bal_bucket,
         CAST(sum(treated) AS BIGINT) AS n_t,
         CAST(sum(1 - treated) AS BIGINT) AS n_c,
         sum(CASE WHEN treated = 1 THEN spend END) AS y_t,
         sum(CASE WHEN treated = 0 THEN spend END) AS y_c
  FROM u GROUP BY c_mktsegment, bal_bucket
), matched AS (
  SELECT * FROM cells WHERE n_t > 0 AND n_c > 0
), att AS (
  SELECT CAST(count(*) AS BIGINT) AS n_cells,
         CAST(sum(n_t) AS BIGINT) AS n_treated,
         CAST(sum(n_c) AS BIGINT) AS n_control,
         floor(sum(n_t * (y_t / n_t - y_c / n_c)) / sum(n_t)
               * 1000000 + 0.5) / 1000000 AS att
  FROM matched
), naive AS (
  SELECT floor((avg(CASE WHEN treated = 1 THEN spend END)
              - avg(CASE WHEN treated = 0 THEN spend END))
               * 1000000 + 0.5) / 1000000 AS naive_diff
  FROM u
)
SELECT a.n_cells, a.n_treated, a.n_control, a.att, n.naive_diff
FROM att a CROSS JOIN naive n
"""


def _rolling_ols_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Numerical-portability design (found by the sf0.1 cross-scale
    # differential): the raw-moment slope (nΣxy−ΣxΣy)/(nΣx²−(Σx)²)
    # cancels catastrophically, and the daily revenue sum picks up
    # engine-specific summation-association noise (Spark partial-agg
    # tree vs DuckDB window segment tree) that crosses the 6dp output
    # grain at sf0.1. Fix: quantize revenue to integer CENTS per order
    # row, so every aggregate/window sum is an exactly-representable
    # integer (< 2^53 through the 10x stress corpus) — exact under ANY
    # summation order — and the slope is one deterministic division of
    # exact integers. Bit-identical across engines at every scale.
    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        F.to_date("o_orderdate").alias("day"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).alias("cents"),
    )
    daily = o.groupBy("prio", "day").agg(
        F.sum("cents").cast("double").alias("y")
    ).withColumn("x", F.datediff(F.col("day"), F.lit("1995-01-01")).cast("double"))
    w = (
        W.partitionBy("prio")
        .orderBy("day")
        .rowsBetween(-27, 0)
    )
    stats = daily.select(
        "prio",
        "day",
        F.count(F.lit(1)).over(w).cast("double").alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
    )
    denom = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.when(
        denom > 0,
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / denom,
    )
    rk = F.row_number().over(W.partitionBy("prio").orderBy(F.col("day").desc()))
    return (
        stats.withColumn("rk", rk)
        .filter(F.col("rk") <= 60)
        .select(
            "prio",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("n").cast("long").alias("n_days"),
            rnd(slope / 100.0, 6).alias("slope"),
        )
        .orderBy("prio", "day")
    )


_ROLLING_SQL = """
WITH daily AS (
  SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
           AS y,
         CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
              AS DOUBLE) AS x
  FROM orders GROUP BY 1, 2, 4
), stats AS (
  SELECT prio, day,
         CAST(count(*) OVER w AS DOUBLE) AS n,
         sum(x) OVER w AS sx,
         sum(y) OVER w AS sy,
         sum(x * y) OVER w AS sxy,
         sum(x * x) OVER w AS sxx,
         row_number() OVER (PARTITION BY prio ORDER BY day DESC) AS rk
  FROM daily
  WINDOW w AS (PARTITION BY prio ORDER BY day
               ROWS BETWEEN 27 PRECEDING AND CURRENT ROW)
)
SELECT prio, strftime(day, '%Y-%m-%d') AS day,
       CAST(n AS BIGINT) AS n_days,
       floor((CASE WHEN n * sxx - sx * sx > 0
                   THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END)
             / 100.0 * 1000000 + 0.5) / 1000000 AS slope
FROM stats
WHERE rk <= 60
ORDER BY prio, day
"""


def _mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select("lang", "source")
    joint = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("double").alias("c_xy")
    )
    n = joint.agg(F.sum("c_xy").alias("n"))
    ml = joint.groupBy("lang").agg(F.sum("c_xy").alias("c_x"))
    ms = joint.groupBy("source").agg(F.sum("c_xy").alias("c_y"))
    j = (
        joint.join(F.broadcast(ml), "lang")
        .join(F.broadcast(ms), "source")
        .crossJoin(F.broadcast(n))
    )
    mi = F.sum(
        (F.col("c_xy") / F.col("n"))
        * F.log(
            F.col("c_xy") * F.col("n") / (F.col("c_x") * F.col("c_y"))
        )
    )
    agg = j.agg(
        F.max("n").cast("long").alias("n_docs"),
        rnd(mi, 6).alias("mi_nats"),
    )
    hl = ml.crossJoin(F.broadcast(n)).agg(
        rnd(
            -F.sum((F.col("c_x") / F.col("n")) * F.log(F.col("c_x") / F.col("n"))),
            6,
        ).alias("h_lang")
    )
    hs = ms.crossJoin(F.broadcast(n)).agg(
        rnd(
            -F.sum((F.col("c_y") / F.col("n")) * F.log(F.col("c_y") / F.col("n"))),
            6,
        ).alias("h_source")
    )
    return (
        agg.crossJoin(F.broadcast(hl))
        .crossJoin(F.broadcast(hs))
        .select(
            "n_docs",
            "mi_nats",
            "h_lang",
            "h_source",
            rnd(
                F.col("mi_nats") / F.sqrt(F.col("h_lang") * F.col("h_source")),
                6,
            ).alias("nmi"),
        )
    )


_MI_SQL = """
WITH joint AS (
  SELECT lang, source, CAST(count(*) AS DOUBLE) AS c_xy
  FROM documents GROUP BY lang, source
), tot AS (
  SELECT sum(c_xy) AS n FROM joint
), ml AS (
  SELECT lang, sum(c_xy) AS c_x FROM joint GROUP BY lang
), ms AS (
  SELECT source, sum(c_xy) AS c_y FROM joint GROUP BY source
), mi AS (
  SELECT CAST(max(t.n) AS BIGINT) AS n_docs,
         floor(sum((j.c_xy / t.n) * ln(j.c_xy * t.n / (l.c_x * s.c_y)))
               * 1000000 + 0.5) / 1000000 AS mi_nats
  FROM joint j JOIN ml l ON j.lang = l.lang
  JOIN ms s ON j.source = s.source CROSS JOIN tot t
), hl AS (
  SELECT floor(-sum((c_x / t.n) * ln(c_x / t.n)) * 1000000 + 0.5) / 1000000
           AS h_lang
  FROM ml CROSS JOIN tot t
), hs AS (
  SELECT floor(-sum((c_y / t.n) * ln(c_y / t.n)) * 1000000 + 0.5) / 1000000
           AS h_source
  FROM ms CROSS JOIN tot t
)
SELECT mi.n_docs, mi.mi_nats, hl.h_lang, hs.h_source,
       floor(mi.mi_nats / sqrt(hl.h_lang * hs.h_source) * 1000000 + 0.5)
         / 1000000 AS nmi
FROM mi CROSS JOIN hl CROSS JOIN hs
"""

_QN_GRID = 1000


def _quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    hist = d.groupBy("source", "n_chars").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wsrc = W.partitionBy("source").orderBy("n_chars")
    full = W.partitionBy("source").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    src = hist.select(
        "source",
        "n_chars",
        F.coalesce(
            F.sum("c").over(wsrc.rowsBetween(W.unboundedPreceding, -1)), F.lit(0)
        ).alias("cumb"),
        F.col("c"),
        F.sum("c").over(full).alias("n_s"),
    ).select(
        "source",
        "n_chars",
        ((F.col("cumb") + F.col("c") / 2.0) / F.col("n_s")).alias("p_mid"),
    ).select(
        "source",
        "n_chars",
        "p_mid",
        F.least(
            F.greatest(F.ceil(F.col("p_mid") * _QN_GRID).cast("long"), F.lit(1)),
            F.lit(_QN_GRID),
        ).alias("g"),
    )
    # Window-free pooled inverse-CDF since round 12 (allowlist
    # burn-down; was a global cumsum over the pooled value grain): the
    # pooled histogram is domain-bounded (≤ ~550 distinct n_chars
    # values at any corpus size), so the grid-cell → value mapping is
    # computed driver-side over the collected histogram and shipped
    # back as a literal broadcast frame (it was broadcast-joined
    # already). Same floor(cum·G/n) arithmetic — Python's int/int
    # division is the same IEEE double as Spark's long/long.
    import math

    pooled_rows = bounded_collect(
        d.groupBy("n_chars")
        .agg(F.count(F.lit(1)).cast("long").alias("cp"))
        .orderBy("n_chars"),
        20_000,
        "pooled n_chars value grain",
    )
    n_tot = sum(int(r["cp"]) for r in pooled_rows)
    grid_rows: list[tuple[int, int]] = []
    cumb = 0
    for r in pooled_rows:
        cp = int(r["cp"])
        cum = cumb + cp
        lo = math.floor(cumb * _QN_GRID / n_tot) + 1
        hi = math.floor(cum * _QN_GRID / n_tot)
        for g in range(lo, hi + 1):
            grid_rows.append((g, int(r["n_chars"])))
        cumb = cum
    grid = spark.createDataFrame(grid_rows, "g LONG, qnorm BIGINT")
    return (
        d.join(src, ["source", "n_chars"])
        .join(F.broadcast(grid), "g")
        .select(
            "doc_id",
            "source",
            "n_chars",
            rnd("p_mid", 6).alias("pct"),
            "qnorm",
        )
        .orderBy("doc_id")
    )


_QN_SQL = f"""
WITH hist AS (
  SELECT source, n_chars, CAST(count(*) AS BIGINT) AS c
  FROM documents GROUP BY source, n_chars
), src AS (
  SELECT source, n_chars,
         (COALESCE(sum(c) OVER (PARTITION BY source ORDER BY n_chars
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          + c / 2.0)
         / sum(c) OVER (PARTITION BY source) AS p_mid
  FROM hist
), src_g AS (
  SELECT source, n_chars, p_mid,
         least(greatest(CAST(ceil(p_mid * {_QN_GRID}) AS BIGINT), 1),
               {_QN_GRID}) AS g
  FROM src
), pooled AS (
  SELECT n_chars, CAST(count(*) AS BIGINT) AS cp
  FROM documents GROUP BY n_chars
), cums AS (
  SELECT n_chars,
         COALESCE(sum(cp) OVER (ORDER BY n_chars
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb,
         COALESCE(sum(cp) OVER (ORDER BY n_chars
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + cp AS cum,
         sum(cp) OVER () AS n
  FROM pooled
), inv AS (
  SELECT n_chars,
         CAST(floor(cumb * {_QN_GRID} / CAST(n AS DOUBLE)) + 1 AS BIGINT) AS lo,
         CAST(floor(cum * {_QN_GRID} / CAST(n AS DOUBLE)) AS BIGINT) AS hi
  FROM cums
), grid AS (
  SELECT unnest(generate_series(lo, hi)) AS g, n_chars AS qnorm
  FROM inv WHERE hi >= lo
)
SELECT d.doc_id, d.source, d.n_chars,
       floor(s.p_mid * 1000000 + 0.5) / 1000000 AS pct,
       gr.qnorm
FROM documents d
JOIN src_g s ON d.source = s.source AND d.n_chars = s.n_chars
JOIN grid gr ON s.g = gr.g
ORDER BY d.doc_id
"""


QUERIES: dict[str, QuerySpec] = {
    "cem_att": QuerySpec(
        _cem_att,
        _CEM_SQL,
        "Coarsened-exact-matching ATT (segment × balance-bucket cells) "
        "of urgent-order treatment on customer spend, vs the naive diff",
    ),
    "rolling_ols_slope": QuerySpec(
        _rolling_ols_slope,
        _ROLLING_SQL,
        "28-day rolling OLS revenue-trend slope per priority from "
        "windowed sufficient statistics on the day grain",
    ),
    "mutual_information_lang_source": QuerySpec(
        _mutual_information,
        _MI_SQL,
        "Mutual information / entropies / NMI between lang and source "
        "(100-cell joint histogram, broadcast marginals)",
    ),
    "quantile_normalize_scores": QuerySpec(
        _quantile_normalize,
        _QN_SQL,
        "Quantile normalization of n_chars across sources on a "
        "1000-point grid (value-grain ECDF, equi-join inverse CDF)",
    ),
}
