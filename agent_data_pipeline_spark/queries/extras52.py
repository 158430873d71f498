"""Round-7 eighteenth wave: optimal transport, elastic series
distance, and mixture modeling.

* ``wasserstein_sources`` — 1-D earth-mover distance (Wasserstein-1)
  between each source's ``n_chars`` distribution and the pooled
  corpus: W₁ = Σ |F_s(v) − F_pool(v)|·Δv over the INTEGER VALUE
  GRAIN (the closed form of 1-D optimal transport — no LP needed).
  The ECDF difference lives on the bounded distinct-value spine
  (≤~550 rows at any corpus size, the `mann_whitney_u` /
  `quantile_normalize` class), cumsum windows partitioned by source;
  the Δv spine window is domain-bounded and adjudicated. Completes
  the distribution-drift triad: KS (sup-norm), JSD (information),
  W₁ (transport cost in characters).
* ``dtw_priority_series`` — dynamic time warping (Sakoe & Chiba
  1978, L1 local cost) between the five priorities' weekly revenue
  profiles: facts collapse to the ≤350-point week × priority grain
  distributed; the 5×5 pairwise DP runs driver-side (the bounded
  recursion envelope — 10 alignments of ≤350² cells). Output pairs
  carry the Manhattan distance alongside: DTW ≤ L1 by construction
  (the diagonal is one admissible path), and the gap is the
  alignment slack. Rows-only; identity/symmetry/upper-bound and
  shift-invariance ("DTW of a 3-step-shifted copy ≈ 0 while L1
  stays large") invariants in tests/test_timeseries.py.
* ``gmm2_em_fit`` — two-component 1-D Gaussian mixture on
  ``n_chars`` by EM: the E-step responsibilities are computed
  JVM-side from the current 5 scalars, the M-step is ONE distributed
  aggregate of 7 sufficient sums — 10 iterations in the
  Platt/Huber/PageRank iterative envelope. Output: weights, means,
  sigmas, mean log-likelihood. Iterative ⇒ rows-only; a planted
  two-cluster sample must recover the components in
  tests/test_classify.py.

Reference parity: no transport/DTW/mixture surface in the reference
(SURVEY.md §2.A); declared north-star §2.B additions.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .core import QuerySpec, bounded_collect, rnd, t


def _wasserstein_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select("source", "n_chars")
    vals = d.select(F.col("n_chars").alias("v")).distinct()
    # Δv spine: gap to the next distinct value (domain-bounded window)
    spine = vals.withColumn(
        "dv",
        F.lead("v").over(W.orderBy("v")).cast("double") - F.col("v"),
    ).filter(F.col("dv").isNotNull())
    pool = d.groupBy(F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).cast("double").alias("cp")
    )
    per_s = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("double").alias("n_s")
    )
    sv = d.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).cast("double").alias("cs")
    )
    tot = d.agg(F.count(F.lit(1)).cast("double").alias("nn"))
    grid = (
        per_s.crossJoin(F.broadcast(spine))
        .join(sv, ["source", "v"], "left")
        .join(F.broadcast(pool), "v", "left")
        .crossJoin(F.broadcast(tot))
        .withColumn("cs", F.coalesce(F.col("cs"), F.lit(0.0)))
        .withColumn("cp", F.coalesce(F.col("cp"), F.lit(0.0)))
    )
    wv = W.partitionBy("source").orderBy("v").rowsBetween(
        W.unboundedPreceding, 0
    )
    ecdf = grid.select(
        "source",
        "n_s",
        "dv",
        (F.sum("cs").over(wv) / F.col("n_s")).alias("fs"),
        (F.sum("cp").over(wv) / F.col("nn")).alias("fp"),
    )
    return (
        ecdf.groupBy("source")
        .agg(
            F.max("n_s").cast("long").alias("n_docs"),
            rnd(
                F.sum(F.abs(F.col("fs") - F.col("fp")) * F.col("dv")), 4
            ).alias("w1_chars"),
        )
        .orderBy("source")
    )


_WASSERSTEIN_SQL = """
WITH d AS (
  SELECT source, n_chars AS v FROM documents
), vals AS (
  SELECT DISTINCT v FROM d
), spine AS (
  SELECT v, CAST(lead(v) OVER (ORDER BY v) AS DOUBLE) - v AS dv
  FROM vals
), spine2 AS (
  SELECT * FROM spine WHERE dv IS NOT NULL
), pool AS (
  SELECT v, CAST(count(*) AS DOUBLE) AS cp FROM d GROUP BY 1
), per_s AS (
  SELECT source, CAST(count(*) AS DOUBLE) AS n_s FROM d GROUP BY 1
), sv AS (
  SELECT source, v, CAST(count(*) AS DOUBLE) AS cs FROM d GROUP BY 1, 2
), tot AS (
  SELECT CAST(count(*) AS DOUBLE) AS nn FROM d
), grid AS (
  SELECT p.source, p.n_s, s.v, s.dv,
         COALESCE(x.cs, 0.0) AS cs, COALESCE(q.cp, 0.0) AS cp, t.nn
  FROM per_s p CROSS JOIN spine2 s
  LEFT JOIN sv x ON x.source = p.source AND x.v = s.v
  LEFT JOIN pool q ON q.v = s.v
  CROSS JOIN tot t
), ecdf AS (
  SELECT source, n_s, dv,
         sum(cs) OVER (PARTITION BY source ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / n_s AS fs,
         sum(cp) OVER (PARTITION BY source ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / nn AS fp
  FROM grid
)
SELECT source, CAST(max(n_s) AS BIGINT) AS n_docs,
       floor(sum(abs(fs - fp) * dv) * 10000 + 0.5) / 10000 AS w1_chars
FROM ecdf
GROUP BY source
ORDER BY source
"""


# --------------------------------------------------------------------------
# dtw_priority_series (rows-only)
# --------------------------------------------------------------------------

def dtw_l1(a: list[float], b: list[float]) -> float:
    """Classic O(n*m) DTW with L1 local cost, full window. Pure
    function (invariant-tested)."""
    n, m = len(a), len(b)
    inf = float("inf")
    prev = [inf] * (m + 1)
    prev[0] = 0.0
    for i in range(1, n + 1):
        cur = [inf] * (m + 1)
        ai = a[i - 1]
        for j in range(1, m + 1):
            c = abs(ai - b[j - 1])
            best = prev[j]
            if prev[j - 1] < best:
                best = prev[j - 1]
            if cur[j - 1] < best:
                best = cur[j - 1]
            cur[j] = c + best
        prev = cur
    return prev[m]


def _dtw_priority_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    weekly = bounded_collect(
        t(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("prio"),
            F.date_trunc("week", F.col("o_orderdate")).alias("wk"),
        )
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5))
            .cast("double")
            .alias("cents")
        )
        .orderBy("prio", "wk"),
        5_000,
        "priority × week grain (5 priorities × ~350 weeks)",
    )
    series: dict[str, list[float]] = {}
    for r in weekly:
        series.setdefault(r["prio"], []).append(r["cents"] / 1e6)
    prios = sorted(series)
    out = []
    for i, pa in enumerate(prios):
        for pb in prios[i + 1 :]:
            a, b = series[pa], series[pb]
            d = dtw_l1(a, b)
            k = min(len(a), len(b))
            l1 = sum(abs(a[j] - b[j]) for j in range(k))
            out.append(
                (
                    pa,
                    pb,
                    math.floor(d * 100 + 0.5) / 100,
                    math.floor(l1 * 100 + 0.5) / 100,
                )
            )
    return spark.createDataFrame(
        out, "prio_a STRING, prio_b STRING, dtw_l1 DOUBLE, manhattan DOUBLE"
    ).orderBy("prio_a", "prio_b")


# --------------------------------------------------------------------------
# gmm2_em_fit (rows-only)
# --------------------------------------------------------------------------

_EM_ITERS = 10


def _gmm2_fit(u: DataFrame, mu1: float, mu2: float, sd: float,
              iters: int = _EM_ITERS):
    """EM for a 2-component 1-D GMM; ``u`` has column x. Each
    iteration = one aggregate of 7 sufficient sums."""
    w2, s1, s2 = 0.5, sd, sd
    ll = None
    for _ in range(iters):
        c1 = F.lit(math.log(max(1 - w2, 1e-12))) - F.lit(
            math.log(s1)
        ) - ((F.col("x") - F.lit(mu1)) / F.lit(s1)) ** 2 / 2
        c2 = F.lit(math.log(max(w2, 1e-12))) - F.lit(math.log(s2)) - (
            (F.col("x") - F.lit(mu2)) / F.lit(s2)
        ) ** 2 / 2
        mx = F.greatest(c1, c2)
        lse = mx + F.log(F.exp(c1 - mx) + F.exp(c2 - mx))
        r2 = F.exp(c2 - lse)
        agg = u.agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(r2).alias("sr"),
            F.sum(r2 * F.col("x")).alias("srx"),
            F.sum(r2 * F.col("x") * F.col("x")).alias("srxx"),
            F.sum((1 - r2) * F.col("x")).alias("s1x"),
            F.sum((1 - r2) * F.col("x") * F.col("x")).alias("s1xx"),
            F.avg(lse).alias("ll"),
        ).collect()[0]
        n, sr = agg["n"], agg["sr"]
        n1 = max(n - sr, 1e-9)
        sr = max(sr, 1e-9)
        mu1 = agg["s1x"] / n1
        mu2 = agg["srx"] / sr
        v1 = max(agg["s1xx"] / n1 - mu1 * mu1, 1e-9)
        v2 = max(agg["srxx"] / sr - mu2 * mu2, 1e-9)
        s1, s2 = math.sqrt(v1), math.sqrt(v2)
        w2 = sr / n
        ll = agg["ll"] - 0.5 * math.log(2 * math.pi)
    return w2, mu1, s1, mu2, s2, ll


def _gmm2_em_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        F.col("n_chars").cast("double").alias("x")
    )
    seed = d.agg(
        F.expr("percentile_approx(x, 0.25, 10000)").alias("q1"),
        F.expr("percentile_approx(x, 0.75, 10000)").alias("q3"),
        F.stddev_samp("x").alias("sd"),
        F.count(F.lit(1)).cast("long").alias("n"),
    ).collect()[0]
    u = d.localCheckpoint()
    w2, mu1, s1, mu2, s2, ll = _gmm2_fit(
        u, float(seed["q1"]), float(seed["q3"]), float(seed["sd"])
    )

    def r4(x):
        return math.floor(x * 1e4 + 0.5) / 1e4 if x >= 0 else -(
            math.floor(-x * 1e4 + 0.5) / 1e4
        )

    return spark.createDataFrame(
        [
            (
                int(seed["n"]),
                r4(1 - w2),
                r4(mu1),
                r4(s1),
                r4(w2),
                r4(mu2),
                r4(s2),
                r4(ll),
            )
        ],
        "n BIGINT, weight1 DOUBLE, mu1 DOUBLE, sigma1 DOUBLE, "
        "weight2 DOUBLE, mu2 DOUBLE, sigma2 DOUBLE, mean_loglik DOUBLE",
    )


QUERIES: dict[str, QuerySpec] = {
    "wasserstein_sources": QuerySpec(
        _wasserstein_sources,
        _WASSERSTEIN_SQL,
        "1-D Wasserstein-1 distance of each source's n_chars "
        "distribution vs the pooled corpus on the bounded value grain",
    ),
    "dtw_priority_series": QuerySpec(
        _dtw_priority_series,
        None,
        "Pairwise DTW (L1) between weekly revenue profiles of the 5 "
        "priorities; Manhattan distance alongside (DTW <= L1)",
    ),
    "gmm2_em_fit": QuerySpec(
        _gmm2_em_fit,
        None,
        "Two-component 1-D Gaussian mixture on n_chars by EM: 10 "
        "one-aggregate iterations, JVM-side responsibilities",
    ),
}
