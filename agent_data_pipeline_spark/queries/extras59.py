"""Round-7 twenty-fifth wave: scale decomposition and forecast
residual diagnostics.

* ``haar_energy_decomposition`` — Haar wavelet energy spectrum of
  the last 256 days of daily revenue: 8 levels of pairwise
  average/difference, energy per detail level + the approximation
  remainder, as fractions of total energy. The fact stream collapses
  to the calendar-bounded day grain distributed; the 256-point
  transform runs driver-side (the PACF/Holt-Winters bounded
  recursion envelope). Which time scale carries the variance —
  day-to-day noise vs weekly structure — read off one table.
  Oracled since round 11 (bit-exact recursive-CTE butterfly).
  Orthogonality ⇒ exact energy conservation, pinned to 1e-9 in
  tests/test_timeseries.py along with a planted single-scale series
  concentrating in its own level.
* ``ljung_box_hw_residuals`` — the Ljung-Box (1978) portmanteau test
  Q = n(n+2)·Σ r_k²/(n−k) at lags 1..14 on the one-step residuals of
  the Holt-Winters fit (``holt_winters_daily``'s recursion): the
  standard "is anything left in the residuals" diagnostic that
  closes the forecasting loop (fit → score → residual whiteness).
  Oracled since round 11 (the extras48 HW walk CTE residualizes
  bit-exactly; the ACF sums sit inside the 4dp grain); a planted
  still-seasonal residual series must blow Q up while white noise
  stays small (tests/test_timeseries.py).
* ``arch_effect_acf`` — volatility clustering (Engle 1982 ARCH
  effect) check: the autocorrelation of SQUARED day-over-day revenue
  changes at lags 1..7, from the same lag-join shape as ``acf_lags``
  (distributed, day grain, exact cents inputs). On this fixture the
  squared-change ACF is ~0 (no volatility clustering in synthetic
  arrivals) — the calibration read; real markets show strongly
  positive low-lag values.

Reference parity: no wavelet/diagnostics surface in the reference
(SURVEY.md §2.A); declared north-star §2.B additions.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core import QuerySpec, duck_materialize, bounded_collect, rnd, t

_HAAR_N = 256


def haar_energies(ys: list[float]) -> list[tuple[str, float]]:
    """Haar detail energies per level (level 1 = finest / 2-day scale)
    plus the final approximation energy, from a power-of-two series.
    Energies use the orthonormal normalization (avg and diff scaled by
    1/sqrt(2)), so they sum EXACTLY to the series' total energy."""
    n = len(ys)
    if n & (n - 1) or n == 0:
        raise ValueError("need a power-of-two length")
    out = []
    cur = list(ys)
    level = 1
    while len(cur) > 1:
        avgs, diffs = [], []
        for i in range(0, len(cur), 2):
            avgs.append((cur[i] + cur[i + 1]) / math.sqrt(2))
            diffs.append((cur[i] - cur[i + 1]) / math.sqrt(2))
        out.append((f"detail_{level}", sum(d * d for d in diffs)))
        cur = avgs
        level += 1
    out.append(("approx", cur[0] * cur[0]))
    return out


def _haar_energy_decomposition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    rows = bounded_collect(
        t(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5))
            .cast("double")
            .alias("cents")
        )
        .orderBy(F.col("day").desc())
        .limit(_HAAR_N)
        .orderBy("day"),
        _HAAR_N,
        "trailing _HAAR_N-day window",
    )
    ys = [r["cents"] / 1e6 for r in rows]  # millions of dollars
    if len(ys) < _HAAR_N:
        pad = [ys[0]] * (_HAAR_N - len(ys))
        ys = pad + ys
    total = sum(y * y for y in ys)
    out = [
        (
            name,
            math.floor(e / 1e0 * 100 + 0.5) / 100,
            math.floor(e / total * 1e6 + 0.5) / 1e6,
        )
        for name, e in haar_energies(ys)
    ]
    return spark.createDataFrame(
        out, "level STRING, energy DOUBLE, energy_frac DOUBLE"
    ).orderBy("level")


# Haar oracle (round 11): each butterfly level is a fixed op DAG —
# (x+y)/sqrt(2) and (x-y)/sqrt(2) over exact pair members, and IEEE
# addition is commutative, so a 2-row SUM aggregate reproduces the
# Python pair arithmetic bit-exactly regardless of which member the
# engine visits first. The recursion carries 'a' (approximation) rows
# and emits 'd' (detail) rows per level; HAVING count(*)=2 terminates
# at the lone level-8 approximation (the oracle assumes the fixture's
# >=256-day span, so the Python left-padding branch never fires).
# Level energies are ordinary order-dependent double sums absorbed by
# the 2dp/6dp output grain.
_HAAR_SQL = f"""
WITH RECURSIVE daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
  FROM orders GROUP BY 1
), sel AS (
  SELECT day, cents FROM daily ORDER BY day DESC LIMIT {_HAAR_N}
), ser AS (
  SELECT CAST(row_number() OVER (ORDER BY day) - 1 AS BIGINT) AS i,
         CAST(cents AS DOUBLE) / 1000000.0 AS y
  FROM sel
), walk(lvl, i, kind, v) AS (
  SELECT 0, i, 'a', y FROM ser
  UNION ALL
  SELECT w.lvl + 1, w.i // 2, k.kind,
         sum(CASE WHEN k.kind = 'a' THEN w.v
                  ELSE CASE WHEN w.i % 2 = 0 THEN w.v ELSE -w.v END
             END) / sqrt(2.0)
  FROM walk w CROSS JOIN (VALUES ('a'), ('d')) k(kind)
  WHERE w.kind = 'a'
  GROUP BY w.lvl, w.i // 2, k.kind
  HAVING count(*) = 2
), lv AS (
  SELECT 'detail_' || CAST(lvl AS VARCHAR) AS level, sum(v * v) AS e
  FROM walk WHERE kind = 'd' GROUP BY lvl
  UNION ALL
  SELECT 'approx', v * v FROM walk
  WHERE kind = 'a' AND lvl = {_HAAR_N.bit_length() - 1}
), tot AS (
  SELECT sum(y * y) AS total FROM ser
)
SELECT level,
       floor(e / 1.0 * 100 + 0.5) / 100 AS energy,
       floor(e / total * 1000000 + 0.5) / 1000000 AS energy_frac
FROM lv CROSS JOIN tot
ORDER BY level
"""


# --------------------------------------------------------------------------
# ljung_box_hw_residuals (oracled since round 11)
# --------------------------------------------------------------------------

_LB_LAGS = 14


def ljung_box_q(resid: list[float], lags: int = _LB_LAGS) -> tuple[float, int]:
    """Ljung-Box portmanteau statistic on a residual series."""
    n = len(resid)
    mu = sum(resid) / n
    c0 = sum((x - mu) ** 2 for x in resid) / n
    q = 0.0
    for k in range(1, lags + 1):
        ck = (
            sum(
                (resid[i] - mu) * (resid[i - k] - mu)
                for i in range(k, n)
            )
            / n
        )
        rk = ck / c0 if c0 > 0 else 0.0
        q += rk * rk / (n - k)
    return n * (n + 2) * q, lags


def _ljung_box_hw_residuals(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from .extras48 import _daily_series, holt_winters_additive

    rows = bounded_collect(
        _daily_series(spark, sf_dir).orderBy("day"),
        3_000,
        "daily calendar grain (TPC-H order-date span is ~2,406 days)",
    )
    ys = [float(r["cents"]) / 100.0 for r in rows]
    fitted, _fc = holt_winters_additive(ys)
    burn = 28  # discard initialization transient
    resid = [y - f for y, f in zip(ys[burn:], fitted[burn:])]
    q, lags = ljung_box_q(resid)

    def r4(x):
        return math.floor(x * 1e4 + 0.5) / 1e4

    # chi2 critical value at alpha=.05, df=14 is 23.685 (fixed constant)
    return spark.createDataFrame(
        [
            (
                len(resid),
                lags,
                r4(q),
                23.685,
                bool(q > 23.685),
            )
        ],
        "n_resid BIGINT, lags INT, ljung_box_q DOUBLE, "
        "chi2_crit_05 DOUBLE, reject_whiteness BOOLEAN",
    )


# Oracled since round 11, unblocked by the extras48 recursive-CTE
# Holt-Winters replay: fitted values join back to the day series
# bit-exactly, so the residual stream is identical across engines; the
# ACF sums themselves are ordinary order-dependent double sums whose
# divergence (~1e-13 relative) sits far inside the 4dp output grain —
# the same tolerance class every avg()-based oracle in the repo
# already carries.
def _lb_sql() -> str:
    from .extras48 import _M, _hw_walk_ctes

    burn, lags = 28, _LB_LAGS
    whens = " ".join(f"WHEN {j} THEN w.s{j}" for j in range(_M))
    scur = f"CASE w.i % {_M} {whens} END"
    return _hw_walk_ctes() + f""", fit AS (
  SELECT ys.i, ys.y, (w.level + w.trend) + {scur} AS f
  FROM walk w JOIN ys ON ys.i = w.i
), resid AS (
  SELECT i - {burn} AS tx, y - f AS r FROM fit WHERE i >= {burn}
), nr AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM resid
), mu AS (
  SELECT sum(r) / CAST(nr.n AS DOUBLE) AS mu FROM resid CROSS JOIN nr
  GROUP BY nr.n
), c0 AS (
  SELECT sum((r.r - mu.mu) * (r.r - mu.mu)) / CAST(nr.n AS DOUBLE) AS c0
  FROM resid r CROSS JOIN mu CROSS JOIN nr
  GROUP BY mu.mu, nr.n
), cks AS (
  SELECT kk.k,
         sum((a.r - mu.mu) * (b.r - mu.mu)) / CAST(nr.n AS DOUBLE) AS ck
  FROM (SELECT unnest(generate_series(1, {lags})) AS k) kk
  JOIN resid a ON a.tx >= kk.k
  JOIN resid b ON b.tx = a.tx - kk.k
  CROSS JOIN mu CROSS JOIN nr
  GROUP BY kk.k, mu.mu, nr.n
), q AS (
  SELECT sum(
           (CASE WHEN c0.c0 > 0 THEN ck / c0.c0 ELSE 0.0 END)
           * (CASE WHEN c0.c0 > 0 THEN ck / c0.c0 ELSE 0.0 END)
           / (nr.n - cks.k)
         ) AS q
  FROM cks CROSS JOIN c0 CROSS JOIN nr
  GROUP BY c0.c0, nr.n
)
SELECT nr.n AS n_resid,
       CAST({lags} AS INT) AS lags,
       floor(nr.n * (nr.n + 2) * q.q * 10000 + 0.5) / 10000
         AS ljung_box_q,
       23.685 AS chi2_crit_05,
       nr.n * (nr.n + 2) * q.q > 23.685 AS reject_whiteness
FROM nr CROSS JOIN q
"""


_LB_SQL = _lb_sql()


# --------------------------------------------------------------------------
# arch_effect_acf
# --------------------------------------------------------------------------

def _arch_effect_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        t(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5))
            .cast("double")
            .alias("rev")
        )
    )
    nxt = daily.select(
        F.col("d").alias("d2"), F.col("rev").alias("rev2")
    )
    sq = (
        daily.join(nxt, F.col("d2") == F.date_add(F.col("d"), 1))
        .select(
            "d",
            (
                (F.col("rev2") - F.col("rev"))
                * (F.col("rev2") - F.col("rev"))
                / 1e12
            ).alias("s"),
        )
    )
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("lag"))
    shifted = sq.select(F.col("d").alias("ds"), F.col("s").alias("s2"))
    return (
        sq.crossJoin(F.broadcast(lags))
        .join(shifted, F.col("ds") == F.date_add(F.col("d"), F.col("lag")))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            rnd(F.corr("s", "s2"), 6).alias("acf_sq_changes"),
        )
        .orderBy("lag")
    )


_ARCH_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
           AS rev
  FROM orders GROUP BY 1
), sq AS (
  SELECT a.d, (b.rev - a.rev) * (b.rev - a.rev) / 1e12 AS s
  FROM daily a JOIN daily b ON b.d = a.d + 1
), lags AS (
  SELECT unnest(generate_series(1, 7)) AS lag
), j AS (
  SELECT l.lag, a.s AS s, b.s AS s2
  FROM sq a CROSS JOIN lags l
  JOIN sq b ON b.d = a.d + CAST(l.lag AS INTEGER)
)
SELECT CAST(lag AS INTEGER) AS lag,
       CAST(count(*) AS BIGINT) AS n_pairs,
       floor(corr(s, s2) * 1000000 + 0.5) / 1000000 AS acf_sq_changes
FROM j GROUP BY lag ORDER BY lag
"""


QUERIES: dict[str, QuerySpec] = {
    "haar_energy_decomposition": QuerySpec(
        _haar_energy_decomposition,
        _HAAR_SQL,
        "Haar wavelet energy per scale over the last 256 days of "
        "revenue (bounded driver-side transform, exact conservation; "
        "oracle: bit-exact recursive-CTE butterfly)",
    ),
    "ljung_box_hw_residuals": QuerySpec(
        _ljung_box_hw_residuals,
        duck_materialize(_LB_SQL),
        "Ljung-Box Q at 14 lags on Holt-Winters one-step residuals — "
        "the residual-whiteness diagnostic closing the forecast loop "
        "(oracle: the extras48 bit-exact HW walk CTE + ACF in SQL)",
    ),
    "arch_effect_acf": QuerySpec(
        _arch_effect_acf,
        _ARCH_SQL,
        "ARCH-effect check: ACF of squared day-over-day revenue "
        "changes at lags 1..7 (volatility clustering detector)",
    ),
}
