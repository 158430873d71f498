"""Round-7 fourteenth wave: seasonal exponential smoothing,
distribution-free median intervals, and Granger causality.

* ``holt_winters_daily`` — additive Holt-Winters (Holt 1957, Winters
  1960) over daily revenue with a weekly season (m = 7, α = 0.2,
  β = 0.05, γ = 0.1): the fact stream collapses to the
  calendar-bounded day grain distributed, then the smoothing
  recursion runs driver-side over the collected ≤2,400-point series
  (the PACF/IPF bounded-driver-fit envelope — the recursion is
  inherently sequential, and the series is bounded by the calendar at
  ANY fact scale). Emits the last 14 fitted days plus a 7-day-ahead
  forecast. Sequential recursion ⇒ rows-only; a planted
  trend+weekly-season series must be tracked with near-zero
  forecast error in tests/test_timeseries.py.
* ``median_ci_order_stats`` — distribution-free 95% confidence
  interval for the median per market segment from binomial order
  statistics (ranks n/2 ∓ z·√n/2): the three exact order statistics
  are located WITHOUT sorting the fact table — the
  bucket-histogram + refine pattern (value buckets of $100, a
  bounded per-segment cumulative window locates each rank's bucket,
  and only that bucket's rows are ranked). The same machinery as
  ``kmv_distinct_shingles``'s k-th-hash, here for money quantiles.
* ``granger_daily`` — Granger (1969) causality test, lag 1: does
  yesterday's ORDER COUNT improve the prediction of today's REVENUE
  beyond yesterday's revenue? Full vs restricted OLS solved in
  closed form from centered moments of cents-exact day-grain sums
  (Cramer 2×2 — every input moment is a deterministic function of
  exact integer sums, so both engines produce bit-identical
  coefficients), F = (RSS_r − RSS_f)/(RSS_f/(n−3)). The lag window
  runs on the bounded calendar grain (adjudicated in PLAN_AUDIT.md).

Reference parity: no forecasting/causality surface in the reference
(SURVEY.md §2.A); declared north-star §2.B additions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .core import QuerySpec, duck_materialize, bounded_collect, rnd, t

_ALPHA, _BETA, _GAMMA, _M = 0.2, 0.05, 0.1, 7


def _daily_series(spark: SparkSession, sf_dir: str):
    return (
        t(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5))
            .cast("double")
            .alias("cents"),
            F.count(F.lit(1)).cast("double").alias("n_orders"),
        )
    )


def holt_winters_additive(
    ys: list[float], m: int = _M, alpha: float = _ALPHA,
    beta: float = _BETA, gamma: float = _GAMMA, horizon: int = 7
) -> tuple[list[float], list[float]]:
    """Pure additive Holt-Winters recursion. Returns (fitted one-step
    predictions aligned to ys, forecasts for the next ``horizon``).
    Initialization: level = mean of season 1, trend = mean season-over-
    season step between seasons 1 and 2, seasonals = season-1
    deviations from its mean."""
    if len(ys) < 2 * m:
        raise ValueError("need at least two full seasons")
    mean1 = sum(ys[:m]) / m
    mean2 = sum(ys[m : 2 * m]) / m
    level = mean1
    trend = (mean2 - mean1) / m
    season = [ys[i] - mean1 for i in range(m)]
    fitted = []
    for i, y in enumerate(ys):
        s = season[i % m]
        fitted.append(level + trend + s)
        new_level = alpha * (y - s) + (1 - alpha) * (level + trend)
        trend = beta * (new_level - level) + (1 - beta) * trend
        season[i % m] = gamma * (y - new_level) + (1 - gamma) * s
        level = new_level
    fc = [
        level + (h + 1) * trend + season[(len(ys) + h) % m]
        for h in range(horizon)
    ]
    return fitted, fc


def _holt_winters_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    rows = bounded_collect(
        _daily_series(spark, sf_dir).orderBy("day"),
        3_000,
        "daily calendar grain (TPC-H order-date span is ~2,406 days)",
    )
    days = [r["day"] for r in rows]
    ys = [float(r["cents"]) / 100.0 for r in rows]
    fitted, fc = holt_winters_additive(ys)
    out = []
    for i in range(max(0, len(ys) - 14), len(ys)):
        out.append(
            (
                days[i].isoformat(),
                "fitted",
                math.floor(ys[i] * 100 + 0.5) / 100,
                math.floor(fitted[i] * 100 + 0.5) / 100,
            )
        )
    last = days[-1]
    from datetime import timedelta

    for h, v in enumerate(fc):
        out.append(
            (
                (last + timedelta(days=h + 1)).isoformat(),
                "forecast",
                None,
                math.floor(v * 100 + 0.5) / 100,
            )
        )
    return spark.createDataFrame(
        out, "day STRING, kind STRING, actual DOUBLE, value DOUBLE"
    ).orderBy("day")


# --------------------------------------------------------------------------
# median_ci_order_stats
# --------------------------------------------------------------------------

_Z95 = 1.959964


def _median_ci_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = t(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", "o_orderkey"
    )
    u = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        F.col("o_totalprice").alias("x"),
        "o_orderkey",
    )
    stats = u.groupBy("seg").agg(F.count(F.lit(1)).alias("n"))
    r_lo = F.greatest(
        F.lit(1),
        F.floor((F.col("n") - _Z95 * F.sqrt(F.col("n"))) / 2).cast("long"),
    )
    # floor() explicitly: Spark's cast-to-long TRUNCATES n+1/2 = x.5
    # while DuckDB's CAST rounds half-to-even — classic half-grain trap
    r_med = F.floor((F.col("n") + 1) / 2).cast("long")
    r_hi = F.least(
        F.col("n"),
        (F.col("n") - F.floor(
            (F.col("n") - _Z95 * F.sqrt(F.col("n"))) / 2
        ) + 1).cast("long"),
    )
    targets = (
        stats.select("seg", "n", r_lo.alias("r"), F.lit("ci_lo").alias("lbl"))
        .unionAll(
            stats.select(
                "seg", "n", r_med.alias("r"), F.lit("median").alias("lbl")
            )
        )
        .unionAll(
            stats.select(
                "seg", "n", r_hi.alias("r"), F.lit("ci_hi").alias("lbl")
            )
        )
    )
    bucketed = u.withColumn("b", F.floor(F.col("x") / 100).cast("long"))
    bcnt = bucketed.groupBy("seg", "b").agg(F.count(F.lit(1)).alias("cnt"))
    wb = W.partitionBy("seg").orderBy("b").rowsBetween(
        W.unboundedPreceding, -1
    )
    bcum = bcnt.withColumn(
        "cum_before", F.coalesce(F.sum("cnt").over(wb), F.lit(0))
    )
    located = targets.join(bcum, "seg").filter(
        (F.col("cum_before") < F.col("r"))
        & (F.col("r") <= F.col("cum_before") + F.col("cnt"))
    )
    refined = bucketed.join(
        F.broadcast(
            located.select("seg", "b", "lbl", "r", "cum_before", "n")
        ),
        ["seg", "b"],
    )
    ranked = refined.withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("seg", "lbl").orderBy("x", "o_orderkey")
        ),
    ).filter(F.col("rk") == F.col("r") - F.col("cum_before"))
    picked = ranked.groupBy("seg").agg(
        F.max("n").alias("n"),
        F.max(F.when(F.col("lbl") == "ci_lo", F.col("x"))).alias("ci_lo"),
        F.max(F.when(F.col("lbl") == "median", F.col("x"))).alias("median"),
        F.max(F.when(F.col("lbl") == "ci_hi", F.col("x"))).alias("ci_hi"),
    )
    return picked.select(
        F.col("seg").alias("segment"),
        F.col("n").cast("long").alias("n"),
        rnd("ci_lo", 2).alias("ci_lo"),
        rnd("median", 2).alias("median"),
        rnd("ci_hi", 2).alias("ci_hi"),
    ).orderBy("segment")


_MEDIAN_CI_SQL = f"""
WITH u AS (
  SELECT c.c_mktsegment AS seg, o.o_totalprice AS x, o.o_orderkey
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), ranked AS (
  SELECT seg, x,
         row_number() OVER (PARTITION BY seg ORDER BY x, o_orderkey) AS rk,
         count(*) OVER (PARTITION BY seg) AS n
  FROM u
), stats AS (
  SELECT DISTINCT seg, n,
         greatest(1, CAST(floor((n - {_Z95} * sqrt(n)) / 2) AS BIGINT))
           AS r_lo,
         CAST(floor((n + 1) / 2) AS BIGINT) AS r_med,
         least(n, CAST(n - floor((n - {_Z95} * sqrt(n)) / 2) + 1 AS BIGINT))
           AS r_hi
  FROM ranked
)
SELECT s.seg AS segment, CAST(s.n AS BIGINT) AS n,
       floor(max(CASE WHEN r.rk = s.r_lo THEN r.x END) * 100 + 0.5) / 100
         AS ci_lo,
       floor(max(CASE WHEN r.rk = s.r_med THEN r.x END) * 100 + 0.5) / 100
         AS median,
       floor(max(CASE WHEN r.rk = s.r_hi THEN r.x END) * 100 + 0.5) / 100
         AS ci_hi
FROM stats s JOIN ranked r ON s.seg = r.seg
GROUP BY 1, 2
ORDER BY 1
"""


# --------------------------------------------------------------------------
# granger_daily
# --------------------------------------------------------------------------

def _granger_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Window-free since round 12 (allowlist burn-down; was a lag window
    # over the single daily series): the series is calendar-bounded
    # (~2,400 rows at ANY fact scale), so the lag-1 pairing and the ten
    # sufficient sums run driver-side. The integer-cents inputs are
    # exact; the u*u-class products exceed the 2^53 exact-sum range, so
    # sums carry last-ulp order sensitivity exactly as the distributed
    # form's did — the sequential Python sum matches the oracle's scan
    # order at least as closely as Spark's partial-aggregate tree did
    # (which already hash-matched through the 6dp output grain).
    import math

    daily_rows = sorted(
        (r["day"], int(r["cents"]), int(r["n_orders"]))
        for r in bounded_collect(
            _daily_series(spark, sf_dir),
            5_000,
            "daily calendar grain (~2,400 days)",
        )
    )
    n = 0
    su = sv = sw = suu = svv = suv = suw = svw = sww = 0.0
    for i in range(1, len(daily_rows)):
        w = float(daily_rows[i][1])
        u = float(daily_rows[i - 1][1])
        v = float(daily_rows[i - 1][2])
        n += 1
        su += u
        sv += v
        sw += w
        suu += u * u
        svv += v * v
        suv += u * v
        suw += u * w
        svw += v * w
        sww += w * w
    nf = float(n)
    cuu = suu - su * su / nf
    cvv = svv - sv * sv / nf
    cuv = suv - su * sv / nf
    cuw = suw - su * sw / nf
    cvw = svw - sv * sw / nf
    cww = sww - sw * sw / nf
    det = cuu * cvv - cuv * cuv
    b = (cvv * cuw - cuv * cvw) / det
    c2 = (cuu * cvw - cuv * cuw) / det
    rss_f = cww - b * cuw - c2 * cvw
    rss_r = cww - cuw * cuw / cuu
    fstat = (rss_r - rss_f) / (rss_f / (nf - 3))

    def fl6(x: float) -> float:
        return (
            math.floor(x * 1e6 + 0.5) / 1e6
        )

    return spark.createDataFrame(
        [(n, fl6(b), fl6(c2 / 100.0), fl6(fstat), n - 3)],
        "n_days BIGINT, beta_rev_lag DOUBLE, "
        "beta_count_lag_dollars DOUBLE, f_stat DOUBLE, df2 BIGINT",
    )


_GRANGER_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
           AS cents,
         CAST(count(*) AS DOUBLE) AS n_orders
  FROM orders GROUP BY 1
), lagged AS (
  SELECT cents AS w,
         lag(cents) OVER (ORDER BY day) AS u,
         lag(n_orders) OVER (ORDER BY day) AS v
  FROM daily
), l2 AS (
  SELECT * FROM lagged WHERE u IS NOT NULL
), g AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         sum(u) AS su, sum(v) AS sv, sum(w) AS sw,
         sum(u * u) AS suu, sum(v * v) AS svv, sum(u * v) AS suv,
         sum(u * w) AS suw, sum(v * w) AS svw, sum(w * w) AS sww
  FROM l2
), m AS (
  SELECT n,
         suu - su * su / n AS cuu,
         svv - sv * sv / n AS cvv,
         suv - su * sv / n AS cuv,
         suw - su * sw / n AS cuw,
         svw - sv * sw / n AS cvw,
         sww - sw * sw / n AS cww
  FROM g
), k AS (
  SELECT n, cuw, cvw, cww, cuu,
         (cvv * cuw - cuv * cvw) / (cuu * cvv - cuv * cuv) AS b,
         (cuu * cvw - cuv * cuw) / (cuu * cvv - cuv * cuv) AS c2
  FROM m
), r AS (
  SELECT n, b, c2,
         cww - b * cuw - c2 * cvw AS rss_f,
         cww - cuw * cuw / cuu AS rss_r
  FROM k
)
SELECT CAST(n AS BIGINT) AS n_days,
       floor(b * 1000000 + 0.5) / 1000000 AS beta_rev_lag,
       floor(c2 / 100.0 * 1000000 + 0.5) / 1000000
         AS beta_count_lag_dollars,
       floor((rss_r - rss_f) / (rss_f / (n - 3)) * 1000000 + 0.5) / 1000000
         AS f_stat,
       CAST(n - 3 AS BIGINT) AS df2
FROM r
"""


# --- holt_winters_daily oracle (round 11) --------------------------------
#
# The smoothing recursion is a fixed chain of IEEE +,-,*,/ ops — all
# correctly rounded in BOTH engines — over integer-exact daily cents,
# so a DuckDB recursive CTE that executes the SAME op tree in the SAME
# association produces bit-identical doubles to the Python driver-side
# recursion. No rounding grid is needed anywhere inside the recursion;
# the only discipline is mirroring the association exactly:
#   * season-1/2 means are LEFT-ASSOC chains (Python sum());
#   * smoothing constants are embedded via repr() so `1 - alpha`
#     evaluates to the identical double both sides;
#   * new_trend repeats the new_level expression (SQL cannot reference
#     a sibling alias) — recomputation of an identical op tree is
#     bit-identical, not a divergence.
# The recursion is calendar-bounded (~2,406 rows) on both sides.


def _hw_chain(names: list[str]) -> str:
    expr = names[0]
    for nm in names[1:]:
        expr = f"({expr} + {nm})"
    return expr


def _hw_walk_ctes() -> str:
    """The shared WITH-RECURSIVE body (daily → ys → nn → head → init →
    walk) that replays the Holt-Winters recursion bit-exactly — reused
    by the holt_winters_daily oracle here and the
    ljung_box_hw_residuals oracle (queries/extras59.py), which needs
    the same fitted values to residualize."""
    m = _M
    oma, omb, omg = repr(1 - _ALPHA), repr(1 - _BETA), repr(1 - _GAMMA)

    def scase(idx: str) -> str:
        whens = " ".join(f"WHEN {j} THEN w.s{j}" for j in range(m))
        return f"CASE {idx} % {m} {whens} END"

    scur = scase("w.i")
    new_level = (
        f"({_ALPHA!r} * (ys.y - {scur}) + {oma} * (w.level + w.trend))"
    )
    new_trend = f"({_BETA!r} * ({new_level} - w.level) + {omb} * w.trend)"
    new_seasons = ",\n         ".join(
        f"CASE WHEN w.i % {m} = {j} THEN {_GAMMA!r} * (ys.y - {new_level})"
        f" + {omg} * w.s{j} ELSE w.s{j} END"
        for j in range(m)
    )
    heads = ",\n         ".join(
        f"max(CASE WHEN i = {j} THEN y END) AS y{j}" for j in range(2 * m)
    )
    mean1 = f"{_hw_chain([f'y{j}' for j in range(m)])} / {float(m)!r}"
    mean2 = f"{_hw_chain([f'y{j}' for j in range(m, 2 * m)])} / {float(m)!r}"
    s_init = ",\n         ".join(
        f"y{j} - mean1 AS s{j}" for j in range(m)
    )
    s_fc = scase("(nn.n + h.h - 1)")
    return f"""
WITH RECURSIVE daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
  FROM orders GROUP BY 1
), ys AS (
  SELECT CAST(day AS VARCHAR) AS day_s, day,
         CAST(row_number() OVER (ORDER BY day) - 1 AS INT) AS i,
         CAST(cents AS DOUBLE) / 100.0 AS y
  FROM daily
), nn AS (
  SELECT CAST(count(*) AS INT) AS n FROM ys
), head AS (
  SELECT {heads}
  FROM ys WHERE i < {2 * m}
), init AS (
  SELECT h.*, {mean1} AS mean1, {mean2} AS mean2 FROM head h
), walk AS (
  SELECT 0 AS i, mean1 AS level, (mean2 - mean1) / {float(m)!r} AS trend,
         {s_init}
  FROM init
  UNION ALL
  SELECT w.i + 1,
         {new_level},
         {new_trend},
         {new_seasons}
  FROM walk w JOIN ys ON ys.i = w.i
)"""


def _hw_sql() -> str:
    m = _M

    def scase(idx: str) -> str:
        whens = " ".join(f"WHEN {j} THEN w.s{j}" for j in range(m))
        return f"CASE {idx} % {m} {whens} END"

    scur = scase("w.i")
    s_fc = scase("(nn.n + h.h - 1)")
    return _hw_walk_ctes() + f""", outp AS (
  SELECT ys.day_s AS day, 'fitted' AS kind,
         floor(ys.y * 100 + 0.5) / 100 AS actual,
         floor(((w.level + w.trend) + {scur}) * 100 + 0.5) / 100 AS value
  FROM walk w JOIN ys ON ys.i = w.i CROSS JOIN nn
  WHERE w.i >= nn.n - 14
  UNION ALL
  SELECT strftime(ld.last_day + h.h * INTERVAL 1 DAY, '%Y-%m-%d'),
         'forecast',
         CAST(NULL AS DOUBLE),
         floor((w.level + h.h * w.trend + {s_fc}) * 100 + 0.5) / 100
  FROM walk w CROSS JOIN nn
  CROSS JOIN (SELECT unnest(generate_series(1, 7)) AS h) h
  CROSS JOIN (SELECT max(day) AS last_day FROM ys) ld
  WHERE w.i = nn.n
)
SELECT day, kind, actual, value FROM outp ORDER BY day
"""


_HW_SQL = _hw_sql()


QUERIES: dict[str, QuerySpec] = {
    "holt_winters_daily": QuerySpec(
        _holt_winters_daily,
        duck_materialize(_HW_SQL),
        "Additive Holt-Winters (weekly season) over daily revenue: "
        "last-14 fitted + 7-day forecast; bounded driver-side recursion "
        "(oracle: bit-exact recursive-CTE replay of the smoothing chain)",
    ),
    "median_ci_order_stats": QuerySpec(
        _median_ci_order_stats,
        _MEDIAN_CI_SQL,
        "Distribution-free 95% median CI per segment from binomial "
        "order statistics, located by bucket-histogram + refine",
    ),
    "granger_daily": QuerySpec(
        _granger_daily,
        _GRANGER_SQL,
        "Lag-1 Granger causality (order count -> revenue): closed-form "
        "full-vs-restricted OLS F-test on cents-exact day-grain moments",
    ),
}
