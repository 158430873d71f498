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
  alignment slack. Oracled since round 11 (the DP is a fixed op DAG
  of correctly-rounded IEEE ops, replayed bit-exactly by an
  anti-diagonal recursive CTE); identity/symmetry/upper-bound and
  shift-invariance ("DTW of a 3-step-shifted copy ≈ 0 while L1
  stays large") invariants in tests/test_timeseries.py.
* ``gmm2_em_fit`` — two-component 1-D Gaussian mixture on
  ``n_chars`` by EM over the bounded value-grain histogram: ONE
  distributed hash aggregate collapses the facts, then the 10 EM
  iterations recurse driver-side (the Holt-Winters/binseg bounded
  envelope). Oracled since round 11: standardized values from
  integer-exact moments + the Platt 2^-24 term grid make the fit
  bit-identical across engines, replayed by an unrolled recursive
  oracle. A planted two-cluster sample must recover the components
  in tests/test_classify.py.

Reference parity: no transport/DTW/mixture surface in the reference
(SURVEY.md §2.A); declared north-star §2.B additions.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .core import QuerySpec, duck_materialize, assert_grid_headroom, bounded_collect, rnd, t


def _wasserstein_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select("source", "n_chars")
    vals = d.select(F.col("n_chars").alias("v")).distinct()
    # Δv spine: gap to the next distinct value. Window-free since
    # round 12 (allowlist burn-down; was a global lead window over the
    # distinct-value table): the value grain is domain-bounded
    # (≤ ~550 rows at any corpus size — the quantile_normalize class),
    # so the spine is built driver-side over the collected distinct
    # values and shipped back as a literal broadcast frame. dv stays
    # integer-difference-exact cast to double, as the lead form was.
    vs = sorted(
        int(r["v"])
        for r in bounded_collect(
            vals, 20_000, "distinct n_chars value grain"
        )
    )
    spine = spark.createDataFrame(
        [(v, float(nxt - v)) for v, nxt in zip(vs, vs[1:])],
        "v LONG, dv DOUBLE",
    )
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
    """Oracled since round 11: the DTW DP is a fixed op DAG (abs,
    min, add — all correctly-rounded IEEE ops on identical inputs), so
    a DuckDB anti-diagonal recursive CTE executing the same DAG over
    the same cents-exact weekly series is bit-identical to the Python
    recursion — no rounding grid needed. The Manhattan baseline moves
    to an integer-cents sum (exact in any order) divided once."""
    weekly = bounded_collect(
        t(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("prio"),
            F.date_trunc("week", F.col("o_orderdate")).alias("wk"),
        )
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5))
            .cast("long")
            .alias("cents")
        )
        .orderBy("prio", "wk"),
        5_000,
        "priority × week grain (5 priorities × ~350 weeks)",
    )
    cents: dict[str, list[int]] = {}
    for r in weekly:
        cents.setdefault(r["prio"], []).append(int(r["cents"]))
    series = {
        p: [float(c) / 1000000.0 for c in cs] for p, cs in cents.items()
    }
    prios = sorted(series)
    out = []
    for i, pa in enumerate(prios):
        for pb in prios[i + 1 :]:
            a, b = series[pa], series[pb]
            d = dtw_l1(a, b)
            k = min(len(a), len(b))
            s_l1 = sum(
                abs(cents[pa][j] - cents[pb][j]) for j in range(k)
            )
            l1 = float(s_l1) / 1000000.0
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


# The DTW DP as an anti-diagonal recursive CTE: the working set holds
# the last two diagonals ('new' = diag d-1, 'old' = diag d-2); each
# level forms candidate targets (one-steps from 'new', diagonal steps
# from 'old'), min-aggregates them per cell, adds the local |Δy| cost,
# and passes 'new' through as next level's 'old'. Border cells other
# than (0,0) never exist — absence IS the +inf of the array DP. All
# ten priority pairs ride one recursion (cells keyed by pair).
_DTW_SQL = """
WITH RECURSIVE weekly AS (
  SELECT o_orderpriority AS prio,
         date_trunc('week', CAST(o_orderdate AS DATE)) AS wk,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY 1, 2
), ser AS (
  SELECT prio,
         CAST(row_number() OVER (PARTITION BY prio ORDER BY wk)
              AS BIGINT) AS idx,
         cents,
         CAST(cents AS DOUBLE) / 1000000.0 AS y
  FROM weekly
), lens AS (
  SELECT prio, CAST(count(*) AS BIGINT) AS n FROM ser GROUP BY prio
), pairs AS (
  SELECT a.prio AS pa, a.n AS na, b.prio AS pb, b.n AS nb
  FROM lens a JOIN lens b ON a.prio < b.prio
), walk(pa, pb, i, j, v, role) AS (
  SELECT pa, pb, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
         CAST(0.0 AS DOUBLE), 'new'
  FROM pairs
  UNION ALL
  SELECT * FROM (
    WITH tgt AS (
      SELECT pa, pb, i + 1 AS ti, j AS tj, v FROM walk WHERE role = 'new'
      UNION ALL
      SELECT pa, pb, i, j + 1, v FROM walk WHERE role = 'new'
      UNION ALL
      SELECT pa, pb, i + 1, j + 1, v FROM walk WHERE role = 'old'
    ), newcells AS (
      SELECT t.pa, t.pb, t.ti, t.tj, min(t.v) AS mv
      FROM tgt t JOIN pairs p ON p.pa = t.pa AND p.pb = t.pb
      WHERE t.ti >= 1 AND t.tj >= 1 AND t.ti <= p.na AND t.tj <= p.nb
      GROUP BY t.pa, t.pb, t.ti, t.tj
    )
    SELECT n.pa, n.pb, n.ti, n.tj, abs(sa.y - sb.y) + n.mv, 'new'
    FROM newcells n
    JOIN ser sa ON sa.prio = n.pa AND sa.idx = n.ti
    JOIN ser sb ON sb.prio = n.pb AND sb.idx = n.tj
    UNION ALL
    SELECT pa, pb, i, j, v, 'old' FROM walk WHERE role = 'new'
  )
), dtw AS (
  SELECT w.pa, w.pb, w.v
  FROM walk w JOIN pairs p ON p.pa = w.pa AND p.pb = w.pb
  WHERE w.i = p.na AND w.j = p.nb AND w.role = 'new'
), l1 AS (
  SELECT a.prio AS pa, b.prio AS pb,
         CAST(sum(abs(a.cents - b.cents)) AS DOUBLE) / 1000000.0 AS l1
  FROM ser a JOIN ser b ON a.prio < b.prio AND a.idx = b.idx
  GROUP BY 1, 2
)
SELECT d.pa AS prio_a, d.pb AS prio_b,
       floor(d.v * 100 + 0.5) / 100 AS dtw_l1,
       floor(l1.l1 * 100 + 0.5) / 100 AS manhattan
FROM dtw d JOIN l1 ON l1.pa = d.pa AND l1.pb = d.pb
ORDER BY prio_a, prio_b
"""


# --------------------------------------------------------------------------
# gmm2_em_fit (oracled since round 11: value-grain histogram EM)
# --------------------------------------------------------------------------
#
# Round-11 rework for hash-exactness AND a better scale shape: the
# fact stream collapses to the bounded integer n_chars VALUE GRAIN in
# ONE distributed hash aggregate (the wasserstein_sources spine), and
# the EM recursion runs driver-side over the collected histogram —
# replacing 10 fact-scale passes with one. Cross-engine exactness
# follows the Platt 2^-24 grid discipline: every per-value sufficient-
# statistic term is snapped to the binary grid before summation, so a
# 1-ulp libm exp()/ln() divergence cannot move a term off its grid
# point and grid-multiple sums are order-independent and exact. The
# fit runs on STANDARDIZED values (z = (x-mu)/sd from integer-exact
# moments) so the grid terms stay O(1); outputs transform back
# affinely (mu + sd·mu_z, sd·s_z, ll_z − ln sd) — ops mirrored 1:1 in
# the unrolled DuckDB oracle.

_EM_ITERS = 10
_GMM_Q = 16777216  # 2^24 term grid, see queries/extras50.py


def _gq(v: float) -> float:
    return math.floor(v * _GMM_Q + 0.5) / _GMM_Q


def _gmm2_em_hist(hist, mu1: float, mu2: float, sd: float,
                  iters: int = _EM_ITERS):
    """EM over a (value, count) histogram — pure driver-side floats,
    op-for-op the DuckDB oracle's unrolled stages."""
    w2, s1, s2 = 0.5, sd, sd
    ll = None
    n = float(sum(c for _, c in hist))
    # mechanical 2^-24 headroom contract (ADVICE r11): every grid term
    # is c-weighted, so the running sums are bounded by n * per-unit
    # bound; |r2*x^2| <= x^2max, |lse| <= x^2max/2 + O(log) terms
    if hist:
        xmax = max(abs(x) for x, _ in hist)
        assert_grid_headroom(
            n, max(1.0, xmax * xmax + 30.0), "gmm2 EM sufficient sums"
        )
    for _ in range(iters):
        l1 = math.log(max(1 - w2, 1e-12)) - math.log(s1)
        l2 = math.log(max(w2, 1e-12)) - math.log(s2)
        sr = srx = srxx = s1x = s1xx = lls = 0.0
        for x, c in hist:
            dz1 = (x - mu1) / s1
            dz2 = (x - mu2) / s2
            c1 = l1 - dz1 * dz1 / 2
            c2 = l2 - dz2 * dz2 / 2
            mx = c1 if c1 >= c2 else c2
            lse = mx + math.log(
                math.exp(c1 - mx) + math.exp(c2 - mx)
            )
            r2 = math.exp(c2 - lse)
            sr += _gq(c * r2)
            srx += _gq(c * r2 * x)
            srxx += _gq(c * r2 * x * x)
            s1x += _gq(c * (1 - r2) * x)
            s1xx += _gq(c * (1 - r2) * x * x)
            lls += _gq(c * lse)
        n1 = max(n - sr, 1e-9)
        srm = max(sr, 1e-9)
        mu1 = s1x / n1
        mu2 = srx / srm
        v1 = max(s1xx / n1 - mu1 * mu1, 1e-9)
        v2 = max(srxx / srm - mu2 * mu2, 1e-9)
        s1, s2 = math.sqrt(v1), math.sqrt(v2)
        w2 = srm / n
        ll = lls / n - 0.5 * math.log(2 * math.pi)
    return w2, mu1, s1, mu2, s2, ll


def _gmm2_fit(u: DataFrame, mu1: float, mu2: float, sd: float,
              iters: int = _EM_ITERS):
    """EM for a 2-component 1-D GMM; ``u`` has column x. Collapses to
    the (x, count) histogram once, then recurses driver-side."""
    hist = [
        (float(r["x"]), int(r["c"]))
        for r in bounded_collect(
            u.groupBy("x").agg(F.count(F.lit(1)).cast("long").alias("c")),
            200_000,
            "bounded value grain (distinct x values)",
        )
    ]
    hist.sort()
    return _gmm2_em_hist(hist, mu1, mu2, sd, iters=iters)


def _gmm2_em_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    hist_rows = bounded_collect(
        t(spark, sf_dir, "documents")
        .groupBy(F.col("n_chars").cast("long").alias("xi"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .orderBy("xi"),
        200_000,
        "bounded value grain (distinct n_chars values)",
    )
    xs = [int(r["xi"]) for r in hist_rows]
    cs = [int(r["c"]) for r in hist_rows]
    n = sum(cs)
    sx = sum(c * x for x, c in zip(xs, cs))
    sxx = sum(c * x * x for x, c in zip(xs, cs))
    mu = float(sx) / float(n)
    sd = math.sqrt(
        (float(sxx) - float(sx) * float(sx) / float(n)) / float(n - 1)
    )
    r1, r3 = max(1, (n + 1) // 4), max(1, (3 * (n + 1)) // 4)
    q1 = q3 = None
    cum = 0
    for x, c in zip(xs, cs):
        cum += c
        if q1 is None and cum >= r1:
            q1 = x
        if q3 is None and cum >= r3:
            q3 = x
    hz = [((x - mu) / sd, c) for x, c in zip(xs, cs)]
    w2, mu1z, s1z, mu2z, s2z, llz = _gmm2_em_hist(
        hz, (q1 - mu) / sd, (q3 - mu) / sd, 1.0
    )

    def r4(x):
        return math.floor(x * 1e4 + 0.5) / 1e4 if x >= 0 else -(
            math.floor(-x * 1e4 + 0.5) / 1e4
        )

    return spark.createDataFrame(
        [
            (
                int(n),
                r4(1 - w2),
                r4(mu + sd * mu1z),
                r4(sd * s1z),
                r4(w2),
                r4(mu + sd * mu2z),
                r4(sd * s2z),
                r4(llz - math.log(sd)),
            )
        ],
        "n BIGINT, weight1 DOUBLE, mu1 DOUBLE, sigma1 DOUBLE, "
        "weight2 DOUBLE, mu2 DOUBLE, sigma2 DOUBLE, mean_loglik DOUBLE",
    )


def _gmm2_sql() -> str:
    q = _GMM_Q

    def Q(expr: str) -> str:
        return f"floor(({expr}) * {q} + 0.5) / {q}"

    stages = ""
    for k in range(1, _EM_ITERS + 1):
        p = f"par{k - 1}"
        stages += f""", e{k} AS (
  SELECT sum({Q("c * r2")}) AS sr,
         sum({Q("c * r2 * x")}) AS srx,
         sum({Q("c * r2 * x * x")}) AS srxx,
         sum({Q("c * (1 - r2) * x")}) AS s1x,
         sum({Q("c * (1 - r2) * x * x")}) AS s1xx,
         sum({Q("c * lse")}) AS lls
  FROM (
    SELECT c, x, lse, exp(c2 - lse) AS r2
    FROM (
      SELECT c, x, c2, mx + ln(exp(c1 - mx) + exp(c2 - mx)) AS lse
      FROM (
        SELECT c, x, c1, c2, greatest(c1, c2) AS mx
        FROM (
          SELECT h.c, h.x,
                 (ln(greatest(1 - p.w2, 1e-12)) - ln(p.s1))
                   - ((h.x - p.mu1) / p.s1) * ((h.x - p.mu1) / p.s1) / 2
                   AS c1,
                 (ln(greatest(p.w2, 1e-12)) - ln(p.s2))
                   - ((h.x - p.mu2) / p.s2) * ((h.x - p.mu2) / p.s2) / 2
                   AS c2
          FROM hz h CROSS JOIN {p} p
        )
      )
    )
  )
), par{k} AS (
  SELECT e.s1x / greatest(nn.n - e.sr, 1e-9) AS mu1,
         e.srx / greatest(e.sr, 1e-9) AS mu2,
         sqrt(greatest(e.s1xx / greatest(nn.n - e.sr, 1e-9)
              - (e.s1x / greatest(nn.n - e.sr, 1e-9))
                * (e.s1x / greatest(nn.n - e.sr, 1e-9)), 1e-9)) AS s1,
         sqrt(greatest(e.srxx / greatest(e.sr, 1e-9)
              - (e.srx / greatest(e.sr, 1e-9))
                * (e.srx / greatest(e.sr, 1e-9)), 1e-9)) AS s2,
         greatest(e.sr, 1e-9) / nn.n AS w2,
         e.lls / nn.n - 0.5 * ln(2 * pi()) AS ll
  FROM e{k} e CROSS JOIN nn
)"""
    r4 = (
        "CASE WHEN {x} >= 0 THEN floor(({x}) * 10000 + 0.5) / 10000 "
        "ELSE -(floor(-({x}) * 10000 + 0.5) / 10000) END"
    )
    last = f"par{_EM_ITERS}"
    return f"""
WITH hist AS (
  SELECT CAST(n_chars AS BIGINT) AS xi, CAST(count(*) AS BIGINT) AS c
  FROM documents GROUP BY 1
), mom AS (
  SELECT CAST(sum(c) AS BIGINT) AS n,
         CAST(sum(c * xi) AS HUGEINT) AS sx,
         CAST(sum(c * xi * xi) AS HUGEINT) AS sxx
  FROM hist
), sc AS (
  SELECT n,
         CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
         sqrt((CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                 / CAST(n AS DOUBLE))
              / CAST(n - 1 AS DOUBLE)) AS sd
  FROM mom
), cum AS (
  SELECT xi, sum(c) OVER (ORDER BY xi) AS cumc FROM hist
), q13 AS (
  SELECT (SELECT min(xi) FROM cum CROSS JOIN mom
          WHERE cumc >= greatest(1, (n + 1) // 4)) AS q1,
         (SELECT min(xi) FROM cum CROSS JOIN mom
          WHERE cumc >= greatest(1, (3 * (n + 1)) // 4)) AS q3
), hz AS (
  SELECT (h.xi - sc.mu) / sc.sd AS x, h.c FROM hist h CROSS JOIN sc
), nn AS (
  SELECT CAST(n AS DOUBLE) AS n FROM mom
), par0 AS (
  SELECT (q13.q1 - sc.mu) / sc.sd AS mu1,
         (q13.q3 - sc.mu) / sc.sd AS mu2,
         1.0 AS s1, 1.0 AS s2, 0.5 AS w2, 0.0 AS ll
  FROM q13 CROSS JOIN sc
){stages}
SELECT sc.n AS n,
       {r4.format(x="1 - p.w2")} AS weight1,
       {r4.format(x="sc.mu + sc.sd * p.mu1")} AS mu1,
       {r4.format(x="sc.sd * p.s1")} AS sigma1,
       {r4.format(x="p.w2")} AS weight2,
       {r4.format(x="sc.mu + sc.sd * p.mu2")} AS mu2,
       {r4.format(x="sc.sd * p.s2")} AS sigma2,
       {r4.format(x="p.ll - ln(sc.sd)")} AS mean_loglik
FROM {last} p CROSS JOIN sc
"""


_GMM2_SQL = _gmm2_sql()


QUERIES: dict[str, QuerySpec] = {
    "wasserstein_sources": QuerySpec(
        _wasserstein_sources,
        _WASSERSTEIN_SQL,
        "1-D Wasserstein-1 distance of each source's n_chars "
        "distribution vs the pooled corpus on the bounded value grain",
    ),
    "dtw_priority_series": QuerySpec(
        _dtw_priority_series,
        duck_materialize(_DTW_SQL),
        "Pairwise DTW (L1) between weekly revenue profiles of the 5 "
        "priorities; Manhattan distance alongside (DTW <= L1; "
        "anti-diagonal recursive-CTE oracle, bit-exact DP)",
    ),
    "gmm2_em_fit": QuerySpec(
        _gmm2_em_fit,
        _GMM2_SQL,
        "Two-component 1-D Gaussian mixture on n_chars by EM over the "
        "bounded value-grain histogram (one fact-scale aggregate; "
        "2^-24 term grid makes the unrolled oracle hash-exact)",
    ),
}
