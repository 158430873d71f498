"""Round-7 nineteenth wave: share-trend surveillance, Simpson's
paradox scanning, and overdispersion checks.

* ``brand_share_trend`` — per-brand OLS slope of the monthly revenue
  SHARE (brand revenue / corpus revenue that month): the
  drift-surveillance query behind "which product lines are quietly
  taking over". Facts collapse to the bounded month × brand grain;
  shares make the slopes scale-free; the slope is the closed-form
  moment ratio on exact month indices (the `trend_forecast` recipe
  applied to a ratio series). Top movers both directions surface via
  the ordering; all 25 brands emitted.
* ``simpsons_paradox_scan`` — Simpson's paradox detector (Simpson
  1951) over the day-grain order-count ↔ revenue association (the
  one STRONG correlation in the fixture, pooled r ≈ 0.7; the first
  cut used line-grain qty ↔ price where every correlation was
  ~0.003 and flips were pure noise), pooled vs within each priority
  stratum, from ONE pass of per-stratum moment sums (the pooled
  moments are the SUMS of the stratum moments — no second scan).
  Sign reversals are SIGNIFICANCE-GATED (|r|·√(n−3) > 1.96 on both
  sides) so the census cannot fire on noise. On this fixture the
  association is consistently positive (n_flips = 0 — a real
  answer); the detector's positive path is proven on a planted
  textbook-paradox dataset in tests/test_properties.py.
* ``overdispersion_check`` — Poisson overdispersion audit (Fisher
  dispersion index) of daily event arrivals per event type: D =
  s²/x̄ on the bounded type × day grain with the χ² dispersion
  statistic (n−1)·D. The fixture's synthetic arrivals are genuinely
  Poisson-ish, so a correct implementation lands D ≈ 1 for every
  type — the calibration read — while real burst traffic drives
  D ≫ 1.

Reference parity: no surveillance/paradox/dispersion surface in the
reference (SURVEY.md §2.A); declared north-star §2.B additions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core import QuerySpec, rnd, t


def _brand_share_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_shipdate",
        F.floor(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
        ).alias("cents"),
    )
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    month = F.months_between(
        F.date_trunc("month", F.col("l_shipdate")), F.lit("1995-01-01")
    ).cast("double")
    bm = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select("p_brand", month.alias("m"), "cents")
        .groupBy("p_brand", "m")
        .agg(F.sum("cents").cast("double").alias("rev"))
    )
    tot = bm.groupBy("m").agg(F.sum("rev").alias("tot"))
    shares = bm.join(tot, "m").select(
        "p_brand", "m", (F.col("rev") / F.col("tot")).alias("s")
    )
    g = shares.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("m").alias("sx"),
        F.sum("s").alias("sy"),
        F.sum(F.col("m") * F.col("s")).alias("sxy"),
        F.sum(F.col("m") * F.col("m")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return g.select(
        "p_brand",
        F.col("n").cast("long").alias("n_months"),
        rnd(F.col("sy") / F.col("n") * 100, 4).alias("mean_share_pct"),
        rnd(slope * 100 * 12, 6).alias("share_trend_pct_per_year"),
    ).orderBy("p_brand")


_BRAND_TREND_SQL = """
WITH bm AS (
  SELECT p.p_brand,
         CAST(datediff('month', DATE '1995-01-01',
              date_trunc('month', CAST(l.l_shipdate AS DATE))) AS DOUBLE)
           AS m,
         CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100
                             + 0.5) AS BIGINT)) AS DOUBLE) AS rev
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
), tot AS (
  SELECT m, sum(rev) AS tot FROM bm GROUP BY 1
), shares AS (
  SELECT b.p_brand, b.m, b.rev / t.tot AS s
  FROM bm b JOIN tot t ON b.m = t.m
), g AS (
  SELECT p_brand, CAST(count(*) AS DOUBLE) AS n, sum(m) AS sx,
         sum(s) AS sy, sum(m * s) AS sxy, sum(m * m) AS sxx
  FROM shares GROUP BY 1
)
SELECT p_brand, CAST(n AS BIGINT) AS n_months,
       floor(sy / n * 100 * 10000 + 0.5) / 10000 AS mean_share_pct,
       floor((n * sxy - sx * sy) / (n * sxx - sx * sx) * 100 * 12
             * 1000000 + 0.5) / 1000000 AS share_trend_pct_per_year
FROM g
ORDER BY p_brand
"""


# --------------------------------------------------------------------------
# simpsons_paradox_scan
# --------------------------------------------------------------------------

def _stratum_moments(df: DataFrame, strat: str) -> DataFrame:
    return df.groupBy(strat).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )


def _corr_from(n, sx, sy, sxy, sxx, syy):
    num = n * sxy - sx * sy
    den = F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return F.when(den > 0, num / den)


def _simpsons_paradox_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    # day-grain count vs revenue: the one STRONG association in the
    # fixture (pooled r ~ 0.7), so stratum correlations are far from
    # zero and the sign-flip census is meaningful rather than noise
    # (the first cut used line-grain qty vs price: every correlation
    # was ~0.003 and "flips" were pure noise).
    daily = (
        t(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("stratum"),
            F.to_date("o_orderdate").alias("day"),
        )
        .agg(
            F.count(F.lit(1)).cast("double").alias("x"),
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5))
            .cast("double")
            .alias("y"),
        )
    )
    per = _stratum_moments(daily, "stratum")
    pooled = per.agg(
        F.sum("n").alias("n"),
        F.sum("sx").alias("sx"),
        F.sum("sy").alias("sy"),
        F.sum("sxy").alias("sxy"),
        F.sum("sxx").alias("sxx"),
        F.sum("syy").alias("syy"),
    ).select(
        F.col("n").alias("n_pooled"),
        _corr_from(
            F.col("n"), F.col("sx"), F.col("sy"), F.col("sxy"),
            F.col("sxx"), F.col("syy"),
        ).alias("pooled_corr"),
    )
    strata = per.select(
        "stratum",
        F.col("n").cast("long").alias("n_rows"),
        _corr_from(
            F.col("n"), F.col("sx"), F.col("sy"), F.col("sxy"),
            F.col("sxx"), F.col("syy"),
        ).alias("c"),
    )
    j = strata.crossJoin(F.broadcast(pooled))
    # significance-gated flips: a reversal only counts when BOTH
    # correlations clear |r|*sqrt(n-3) > 1.96 (Fisher-z approx) — an
    # ungated census fires on near-zero noise correlations.
    sig_s = F.abs(F.col("c")) * F.sqrt(F.col("n_rows") - 3) > 1.959964
    sig_p = (
        F.abs(F.col("pooled_corr")) * F.sqrt(F.col("n_pooled") - 3)
        > 1.959964
    )
    flips = j.agg(
        F.sum(
            (
                (F.signum(F.col("c")) != F.signum(F.col("pooled_corr")))
                & sig_s
                & sig_p
            ).cast("long")
        ).alias("n_sign_flips")
    )
    return (
        j.crossJoin(F.broadcast(flips))
        .select(
            "stratum",
            "n_rows",
            rnd("c", 6).alias("stratum_corr"),
            sig_s.alias("stratum_significant"),
            rnd("pooled_corr", 6).alias("pooled_corr"),
            "n_sign_flips",
        )
        .orderBy("stratum")
    )


_SIMPSONS_SQL = """
WITH base AS (
  SELECT o_orderpriority AS stratum,
         CAST(count(*) AS DOUBLE) AS x,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS DOUBLE) AS y
  FROM orders GROUP BY o_orderpriority, CAST(o_orderdate AS DATE)
), per AS (
  SELECT stratum, CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx,
         sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx,
         sum(y * y) AS syy
  FROM base GROUP BY 1
), pooled AS (
  SELECT sum(n) AS n_pooled,
         CASE WHEN (sum(n) * sum(sxx) - sum(sx) * sum(sx))
                   * (sum(n) * sum(syy) - sum(sy) * sum(sy)) > 0
              THEN (sum(n) * sum(sxy) - sum(sx) * sum(sy))
                   / sqrt((sum(n) * sum(sxx) - sum(sx) * sum(sx))
                          * (sum(n) * sum(syy) - sum(sy) * sum(sy)))
         END AS pooled_corr
  FROM per
), strata AS (
  SELECT stratum, CAST(n AS BIGINT) AS n_rows,
         CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) > 0
              THEN (n * sxy - sx * sy)
                   / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
         END AS c
  FROM per
), flips AS (
  SELECT CAST(sum(CASE WHEN sign(s.c) <> sign(p.pooled_corr)
                        AND abs(s.c) * sqrt(s.n_rows - 3) > 1.959964
                        AND abs(p.pooled_corr) * sqrt(p.n_pooled - 3)
                            > 1.959964
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_sign_flips
  FROM strata s CROSS JOIN pooled p
)
SELECT s.stratum, s.n_rows,
       floor(s.c * 1000000 + 0.5) / 1000000 AS stratum_corr,
       abs(s.c) * sqrt(s.n_rows - 3) > 1.959964 AS stratum_significant,
       floor(p.pooled_corr * 1000000 + 0.5) / 1000000 AS pooled_corr,
       f.n_sign_flips
FROM strata s CROSS JOIN pooled p CROSS JOIN flips f
ORDER BY s.stratum
"""


# --------------------------------------------------------------------------
# overdispersion_check
# --------------------------------------------------------------------------

def _overdispersion_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day")
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    g = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("c").alias("sc"),
        F.sum(F.col("c") * F.col("c")).alias("scc"),
    )
    mean = F.col("sc") / F.col("n")
    var = (F.col("scc") - F.col("sc") * F.col("sc") / F.col("n")) / (
        F.col("n") - 1
    )
    disp = var / mean
    return g.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        rnd(mean, 4).alias("mean_daily"),
        rnd(var, 4).alias("var_daily"),
        rnd(disp, 6).alias("dispersion_index"),
        rnd((F.col("n") - 1) * disp, 4).alias("chi2_stat"),
    ).orderBy("event_type")


_OVERDISP_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(count(*) AS DOUBLE) AS c
  FROM events GROUP BY 1, 2
), g AS (
  SELECT event_type, CAST(count(*) AS DOUBLE) AS n, sum(c) AS sc,
         sum(c * c) AS scc
  FROM daily GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
       floor(sc / n * 10000 + 0.5) / 10000 AS mean_daily,
       floor((scc - sc * sc / n) / (n - 1) * 10000 + 0.5) / 10000
         AS var_daily,
       floor((scc - sc * sc / n) / (n - 1) / (sc / n)
             * 1000000 + 0.5) / 1000000 AS dispersion_index,
       floor((n - 1) * (scc - sc * sc / n) / (n - 1) / (sc / n)
             * 10000 + 0.5) / 10000 AS chi2_stat
FROM g
ORDER BY event_type
"""


QUERIES: dict[str, QuerySpec] = {
    "brand_share_trend": QuerySpec(
        _brand_share_trend,
        _BRAND_TREND_SQL,
        "Per-brand OLS slope of monthly revenue SHARE (scale-free "
        "drift surveillance on the bounded month x brand grain)",
    ),
    "simpsons_paradox_scan": QuerySpec(
        _simpsons_paradox_scan,
        _SIMPSONS_SQL,
        "Pooled vs per-stratum correlation with sign-flip census "
        "(Simpson detector); stratum moments summed for the pooled pass",
    ),
    "overdispersion_check": QuerySpec(
        _overdispersion_check,
        _OVERDISP_SQL,
        "Fisher dispersion index of daily event arrivals per type "
        "(Poisson calibration: D ~ 1 on this fixture)",
    ),
}
