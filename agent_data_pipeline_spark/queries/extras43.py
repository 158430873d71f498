"""Round-7 ninth wave: rank correlation, two-sample and k-sample
tests, categorical association strength, distribution divergence, and
string-similarity record linkage.

* ``spearman_daily_corr`` — Spearman rank correlation (Spearman 1904)
  between daily order COUNT and daily revenue per priority, with
  tie-averaged ranks (``rank() + (ties-1)/2``). Fact rows collapse to
  the day × priority grain first (≤2,400 rows per priority at any
  fact scale — calendar-bounded), so every rank window is partitioned
  AND bounded. Ranks are exact half-integers and revenue is quantized
  to integer cents (the `rolling_ols_slope` lesson: cancelling
  sufficient statistics get exactly-representable inputs), so all
  five sufficient sums are exact under any summation order and rho is
  bit-identical across engines at every scale.
* ``welch_ttest`` — Welch's unequal-variance t-test (Welch 1947)
  comparing order totals of BUILDING vs MACHINERY customers: mean
  difference, t statistic, and Welch–Satterthwaite degrees of
  freedom, all from per-group (n, Σx, Σx²) — two hash aggregates and
  a broadcast of 2 rows; no window anywhere.
* ``kruskal_wallis_h`` — Kruskal–Wallis H (1952) across the 20
  document sources on ``n_chars``, with the tie-correction factor
  C = 1 − Σ(t³−t)/(N³−N). Ranks come from the VALUE-grain cumulative
  histogram (the `mann_whitney_u` pattern); window-free since round
  12: one distributed aggregate to the (source × n_chars) grain
  (domain-bounded, ≤ ~6×550 rows), ranks and H driver-side.
* ``cramers_v_assoc`` — χ² association between ``lang`` and
  ``source`` with Cramér's V and the Bergsma (2013) bias-corrected
  V. The expected-count grid is a full marginal cross join (|langs| ×
  |sources| ≤ 100 broadcast rows) so zero-observed cells contribute
  their expected mass — the textbook χ² that a sparse observed-only
  sum would get wrong.
* ``js_divergence_sources`` — Jensen–Shannon divergence (Lin 1991,
  in bits) of each source's language distribution against the pooled
  corpus distribution: the standard "which slice is distributionally
  weird" audit before mixing corpus sources. Vocabulary-bounded grid,
  zero-probability terms handled by the 0·log0 = 0 convention.
* ``jaro_winkler_linkage`` — dirty-record linkage: every part name
  gets a deterministic arithmetic typo (delete / double / transpose
  at a key-derived interior position — reproducible in ANSI SQL, no
  RNG), then is matched back to the distinct-name catalog within a
  first-character block by Jaro–Winkler similarity (Winkler 1990;
  prefix bonus p=0.1 over ≤4 chars, applied above the classic 0.7
  boost threshold — verified bit-identical to DuckDB's
  ``jaro_winkler_similarity`` builtin across 400+ pairs). The scorer
  is an Arrow-batched pandas UDF (never row-at-a-time Python); the
  catalog side is vocabulary-bounded and broadcast, so at 100 TB the
  probe stream is read once and never shuffled on anything wider
  than the block key. Scores are quantized to 9dp BEFORE the argmax
  rank so last-ulp noise can never flip which candidate wins.

Reference parity: no statistics/linkage surface in the reference
(SURVEY.md §2.A); declared north-star §2.B additions.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType
from pyspark.sql.window import Window as W

from .core import QuerySpec, bounded_collect, rnd, t


# --------------------------------------------------------------------------
# spearman_daily_corr
# --------------------------------------------------------------------------

def _spearman_daily_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        F.to_date("o_orderdate").alias("day"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).alias("cents"),
    )
    daily = o.groupBy("prio", "day").agg(
        F.count(F.lit(1)).cast("double").alias("x"),
        F.sum("cents").cast("double").alias("y"),
    )
    # tie-averaged ranks: rank() gives the min rank of the tie run;
    # adding (run_size - 1)/2 centres it. Exact half-integers.
    rx = (
        F.rank().over(W.partitionBy("prio").orderBy("x"))
        + (F.count(F.lit(1)).over(W.partitionBy("prio", "x")) - 1) / 2.0
    )
    ry = (
        F.rank().over(W.partitionBy("prio").orderBy("y"))
        + (F.count(F.lit(1)).over(W.partitionBy("prio", "y")) - 1) / 2.0
    )
    ranked = daily.select("prio", rx.alias("rx"), ry.alias("ry"))
    s = ranked.groupBy("prio").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
    )
    denom = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")) * (
        F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    )
    rho = F.when(
        denom > 0,
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        / F.sqrt(denom),
    )
    return s.select(
        "prio",
        F.col("n").cast("long").alias("n_days"),
        rnd(rho, 6).alias("spearman_rho"),
    ).orderBy("prio")


_SPEARMAN_SQL = """
WITH daily AS (
  SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS day,
         CAST(count(*) AS DOUBLE) AS x,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
           AS y
  FROM orders GROUP BY 1, 2
), ranked AS (
  SELECT prio,
         rank() OVER (PARTITION BY prio ORDER BY x)
           + (count(*) OVER (PARTITION BY prio, x) - 1) / 2.0 AS rx,
         rank() OVER (PARTITION BY prio ORDER BY y)
           + (count(*) OVER (PARTITION BY prio, y) - 1) / 2.0 AS ry
  FROM daily
), s AS (
  SELECT prio, CAST(count(*) AS DOUBLE) AS n,
         sum(rx) AS sx, sum(ry) AS sy, sum(rx * ry) AS sxy,
         sum(rx * rx) AS sxx, sum(ry * ry) AS syy
  FROM ranked GROUP BY prio
)
SELECT prio, CAST(n AS BIGINT) AS n_days,
       floor((CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) > 0
                   THEN (n * sxy - sx * sy)
                        / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
              END) * 1000000 + 0.5) / 1000000 AS spearman_rho
FROM s
ORDER BY prio
"""


# --------------------------------------------------------------------------
# welch_ttest
# --------------------------------------------------------------------------

def _welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    u = o.join(
        F.broadcast(c.filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))),
        o.o_custkey == c.c_custkey,
    ).select("c_mktsegment", F.col("o_totalprice").alias("x"))
    g = u.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    p = g.select(
        F.when(F.col("c_mktsegment") == "BUILDING", F.col("n")).alias("n1"),
        F.when(F.col("c_mktsegment") == "BUILDING", F.col("sx")).alias("s1"),
        F.when(F.col("c_mktsegment") == "BUILDING", F.col("sxx")).alias("q1"),
        F.when(F.col("c_mktsegment") == "MACHINERY", F.col("n")).alias("n2"),
        F.when(F.col("c_mktsegment") == "MACHINERY", F.col("sx")).alias("s2"),
        F.when(F.col("c_mktsegment") == "MACHINERY", F.col("sxx")).alias("q2"),
    ).agg(
        F.max("n1").alias("n1"),
        F.max("s1").alias("s1"),
        F.max("q1").alias("q1"),
        F.max("n2").alias("n2"),
        F.max("s2").alias("s2"),
        F.max("q2").alias("q2"),
    )
    m1 = F.col("s1") / F.col("n1")
    m2 = F.col("s2") / F.col("n2")
    v1 = (F.col("q1") - F.col("s1") * F.col("s1") / F.col("n1")) / (
        F.col("n1") - 1
    )
    v2 = (F.col("q2") - F.col("s2") * F.col("s2") / F.col("n2")) / (
        F.col("n2") - 1
    )
    se2 = v1 / F.col("n1") + v2 / F.col("n2")
    tstat = (m1 - m2) / F.sqrt(se2)
    df = (se2 * se2) / (
        (v1 / F.col("n1")) * (v1 / F.col("n1")) / (F.col("n1") - 1)
        + (v2 / F.col("n2")) * (v2 / F.col("n2")) / (F.col("n2") - 1)
    )
    return p.select(
        F.col("n1").cast("long").alias("n_building"),
        F.col("n2").cast("long").alias("n_machinery"),
        rnd(m1 - m2, 4).alias("mean_diff"),
        rnd(tstat, 6).alias("t_stat"),
        rnd(df, 2).alias("welch_df"),
    )


_WELCH_SQL = """
WITH u AS (
  SELECT c.c_mktsegment, o.o_totalprice AS x
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
), g AS (
  SELECT c_mktsegment, CAST(count(*) AS DOUBLE) AS n,
         sum(x) AS sx, sum(x * x) AS sxx
  FROM u GROUP BY 1
), p AS (
  SELECT max(CASE WHEN c_mktsegment = 'BUILDING' THEN n END) AS n1,
         max(CASE WHEN c_mktsegment = 'BUILDING' THEN sx END) AS s1,
         max(CASE WHEN c_mktsegment = 'BUILDING' THEN sxx END) AS q1,
         max(CASE WHEN c_mktsegment = 'MACHINERY' THEN n END) AS n2,
         max(CASE WHEN c_mktsegment = 'MACHINERY' THEN sx END) AS s2,
         max(CASE WHEN c_mktsegment = 'MACHINERY' THEN sxx END) AS q2
  FROM g
), k AS (
  SELECT n1, n2, s1 / n1 AS m1, s2 / n2 AS m2,
         (q1 - s1 * s1 / n1) / (n1 - 1) AS v1,
         (q2 - s2 * s2 / n2) / (n2 - 1) AS v2
  FROM p
), z AS (
  SELECT n1, n2, m1, m2, v1, v2, v1 / n1 + v2 / n2 AS se2 FROM k
)
SELECT CAST(n1 AS BIGINT) AS n_building,
       CAST(n2 AS BIGINT) AS n_machinery,
       floor((m1 - m2) * 10000 + 0.5) / 10000 AS mean_diff,
       floor((m1 - m2) / sqrt(se2) * 1000000 + 0.5) / 1000000 AS t_stat,
       floor((se2 * se2)
             / ((v1 / n1) * (v1 / n1) / (n1 - 1)
                + (v2 / n2) * (v2 / n2) / (n2 - 1)) * 100 + 0.5) / 100
         AS welch_df
FROM z
"""


# --------------------------------------------------------------------------
# kruskal_wallis_h
# --------------------------------------------------------------------------

def _kruskal_wallis_h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-free since round 12 (allowlist burn-down; was a global
    cumulative window over the n_chars value grain): ONE distributed
    aggregate collapses facts to the (source × n_chars) grain (≤ ~6 ×
    550 rows at any fact scale — the quantile_normalize class); the
    tie-averaged ranks and H statistic run driver-side. Exactness:
    rank terms are 0.5-grain multiples and tie terms integer-valued
    doubles with totals far below 2^53, so the driver sums are
    bit-equal to the window form's; the remaining 6-term double sum
    (rr) sits ~1e-14 relative from any engine order, 8 orders below
    the 6dp output grain (the same argument that kept the window form
    hash-green)."""
    import math

    d = t(spark, sf_dir, "documents").select("source", "n_chars")
    per_sv_rows = bounded_collect(
        d.groupBy("source", "n_chars")
        .agg(F.count(F.lit(1)).cast("long").alias("c_sv"))
        .orderBy("source", "n_chars"),
        20_000,
        "source × n_chars value grain",
    )
    # value grain: total count per n_chars (summed from the collected
    # per-source cells — integer arithmetic, no second distributed pass)
    tv: dict[int, int] = {}
    for r in per_sv_rows:
        v = int(r["n_chars"])
        tv[v] = tv.get(v, 0) + int(r["c_sv"])
    cum = 0
    avg_rank: dict[int, float] = {}
    tie_t = 0.0
    for v in sorted(tv):
        c = tv[v]
        avg_rank[v] = cum + (c + 1) / 2.0
        tie_t += float(c) * c * c - c
        cum += c
    n_s: dict[str, int] = {}
    r_s: dict[str, float] = {}
    for r in per_sv_rows:
        s, v, c = r["source"], int(r["n_chars"]), int(r["c_sv"])
        n_s[s] = n_s.get(s, 0) + c
        r_s[s] = r_s.get(s, 0.0) + c * avg_rank[v]
    n = float(sum(n_s.values()))
    k = len(n_s)
    rr = sum(r_s[s] * r_s[s] / float(n_s[s]) for s in sorted(n_s))
    h = 12.0 / (n * (n + 1)) * rr - 3 * (n + 1)
    cc = 1 - tie_t / (n * n * n - n)

    def fl(x: float) -> float:
        return math.floor(x * 1e6 + 0.5) / 1e6

    return spark.createDataFrame(
        [(int(n), k, fl(h), fl(cc), fl(h / cc))],
        "n_total BIGINT, n_groups BIGINT, h_stat DOUBLE, "
        "tie_correction DOUBLE, h_adjusted DOUBLE",
    )


_KRUSKAL_SQL = """
WITH grain AS (
  SELECT n_chars, CAST(count(*) AS BIGINT) AS tv
  FROM documents GROUP BY 1
), ranks AS (
  SELECT n_chars,
         COALESCE(sum(tv) OVER (ORDER BY n_chars
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + (tv + 1) / 2.0 AS avg_rank
  FROM grain
), per_sv AS (
  SELECT source, n_chars, CAST(count(*) AS BIGINT) AS c_sv
  FROM documents GROUP BY 1, 2
), rs AS (
  SELECT p.source, CAST(sum(p.c_sv) AS DOUBLE) AS n_s,
         sum(p.c_sv * r.avg_rank) AS r_s
  FROM per_sv p JOIN ranks r ON p.n_chars = r.n_chars
  GROUP BY 1
), ties AS (
  SELECT sum(CAST(tv AS DOUBLE) * tv * tv - tv) AS tie_t FROM grain
), agg AS (
  SELECT sum(n_s) AS n, CAST(count(*) AS BIGINT) AS k,
         sum(r_s * r_s / n_s) AS rr
  FROM rs
)
SELECT CAST(a.n AS BIGINT) AS n_total, a.k AS n_groups,
       floor((12.0 / (a.n * (a.n + 1)) * a.rr - 3 * (a.n + 1))
             * 1000000 + 0.5) / 1000000 AS h_stat,
       floor((1 - t.tie_t / (a.n * a.n * a.n - a.n))
             * 1000000 + 0.5) / 1000000 AS tie_correction,
       floor((12.0 / (a.n * (a.n + 1)) * a.rr - 3 * (a.n + 1))
             / (1 - t.tie_t / (a.n * a.n * a.n - a.n))
             * 1000000 + 0.5) / 1000000 AS h_adjusted
FROM agg a CROSS JOIN ties t
"""


# --------------------------------------------------------------------------
# cramers_v_assoc
# --------------------------------------------------------------------------

def _cramers_v_assoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select("lang", "source")
    obs = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("double").alias("o")
    )
    rowm = d.groupBy("lang").agg(F.count(F.lit(1)).cast("double").alias("rl"))
    colm = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("double").alias("cs")
    )
    tot = d.agg(F.count(F.lit(1)).cast("double").alias("nn"))
    grid = (
        rowm.crossJoin(F.broadcast(colm))
        .crossJoin(F.broadcast(tot))
        .join(obs, ["lang", "source"], "left")
        .withColumn("o", F.coalesce(F.col("o"), F.lit(0.0)))
        .withColumn("e", F.col("rl") * F.col("cs") / F.col("nn"))
    )
    chi = grid.agg(
        F.sum(
            (F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e")
        ).alias("chi2"),
        F.max("nn").alias("n"),
        F.count_distinct(F.col("lang")).cast("double").alias("r"),
        F.count_distinct(F.col("source")).cast("double").alias("c"),
    )
    phi2 = F.col("chi2") / F.col("n")
    mind = F.least(F.col("r") - 1, F.col("c") - 1)
    phi2c = F.greatest(
        F.lit(0.0),
        phi2 - (F.col("r") - 1) * (F.col("c") - 1) / (F.col("n") - 1),
    )
    rc = F.col("r") - (F.col("r") - 1) * (F.col("r") - 1) / (F.col("n") - 1)
    cc = F.col("c") - (F.col("c") - 1) * (F.col("c") - 1) / (F.col("n") - 1)
    return chi.select(
        F.col("n").cast("long").alias("n_docs"),
        F.col("r").cast("long").alias("n_langs"),
        F.col("c").cast("long").alias("n_sources"),
        rnd(F.col("chi2"), 6).alias("chi2"),
        ((F.col("r") - 1) * (F.col("c") - 1)).cast("long").alias("dof"),
        rnd(F.sqrt(phi2 / mind), 6).alias("cramers_v"),
        rnd(F.sqrt(phi2c / F.least(rc - 1, cc - 1)), 6).alias(
            "cramers_v_corrected"
        ),
    )


_CRAMERS_SQL = """
WITH obs AS (
  SELECT lang, source, CAST(count(*) AS DOUBLE) AS o
  FROM documents GROUP BY 1, 2
), rowm AS (
  SELECT lang, CAST(count(*) AS DOUBLE) AS rl FROM documents GROUP BY 1
), colm AS (
  SELECT source, CAST(count(*) AS DOUBLE) AS cs FROM documents GROUP BY 1
), tot AS (
  SELECT CAST(count(*) AS DOUBLE) AS nn FROM documents
), grid AS (
  SELECT r.lang, c.source, r.rl, c.cs, t.nn,
         COALESCE(o.o, 0.0) AS o, r.rl * c.cs / t.nn AS e
  FROM rowm r CROSS JOIN colm c CROSS JOIN tot t
  LEFT JOIN obs o ON o.lang = r.lang AND o.source = c.source
), chi AS (
  SELECT sum((o - e) * (o - e) / e) AS chi2, max(nn) AS n,
         CAST(count(DISTINCT lang) AS DOUBLE) AS r,
         CAST(count(DISTINCT source) AS DOUBLE) AS c
  FROM grid
)
SELECT CAST(n AS BIGINT) AS n_docs,
       CAST(r AS BIGINT) AS n_langs,
       CAST(c AS BIGINT) AS n_sources,
       floor(chi2 * 1000000 + 0.5) / 1000000 AS chi2,
       CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
       floor(sqrt(chi2 / n / least(r - 1, c - 1)) * 1000000 + 0.5) / 1000000
         AS cramers_v,
       floor(sqrt(greatest(0.0, chi2 / n - (r - 1) * (c - 1) / (n - 1))
                  / least(r - (r - 1) * (r - 1) / (n - 1) - 1,
                          c - (c - 1) * (c - 1) / (n - 1) - 1))
             * 1000000 + 0.5) / 1000000 AS cramers_v_corrected
FROM chi
"""


# --------------------------------------------------------------------------
# js_divergence_sources
# --------------------------------------------------------------------------

def _js_divergence_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select("source", "lang")
    pool = d.groupBy("lang").agg(F.count(F.lit(1)).cast("double").alias("cl"))
    tot = d.agg(F.count(F.lit(1)).cast("double").alias("nn"))
    per_s = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("double").alias("n_s")
    )
    obs = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("double").alias("c_sl")
    )
    grid = (
        per_s.crossJoin(F.broadcast(pool))
        .crossJoin(F.broadcast(tot))
        .join(obs, ["source", "lang"], "left")
        .withColumn("p", F.coalesce(F.col("c_sl"), F.lit(0.0)) / F.col("n_s"))
        .withColumn("q", F.col("cl") / F.col("nn"))
        .withColumn("m", (F.col("p") + F.col("q")) / 2.0)
    )
    term = 0.5 * F.when(
        F.col("p") > 0, F.col("p") * F.log2(F.col("p") / F.col("m"))
    ).otherwise(0.0) + 0.5 * F.col("q") * F.log2(F.col("q") / F.col("m"))
    return (
        grid.groupBy("source")
        .agg(
            F.max("n_s").cast("long").alias("n_docs"),
            rnd(F.sum(term), 6).alias("jsd_bits"),
        )
        .orderBy("source")
    )


_JSD_SQL = """
WITH pool AS (
  SELECT lang, CAST(count(*) AS DOUBLE) AS cl FROM documents GROUP BY 1
), tot AS (
  SELECT CAST(count(*) AS DOUBLE) AS nn FROM documents
), per_s AS (
  SELECT source, CAST(count(*) AS DOUBLE) AS n_s FROM documents GROUP BY 1
), obs AS (
  SELECT source, lang, CAST(count(*) AS DOUBLE) AS c_sl
  FROM documents GROUP BY 1, 2
), grid AS (
  SELECT s.source, s.n_s, COALESCE(o.c_sl, 0.0) / s.n_s AS p,
         p2.cl / t.nn AS q,
         (COALESCE(o.c_sl, 0.0) / s.n_s + p2.cl / t.nn) / 2.0 AS m
  FROM per_s s CROSS JOIN pool p2 CROSS JOIN tot t
  LEFT JOIN obs o ON o.source = s.source AND o.lang = p2.lang
)
SELECT source, CAST(max(n_s) AS BIGINT) AS n_docs,
       floor(sum(0.5 * (CASE WHEN p > 0 THEN p * log2(p / m) ELSE 0.0 END)
                 + 0.5 * q * log2(q / m)) * 1000000 + 0.5) / 1000000
         AS jsd_bits
FROM grid
GROUP BY source
ORDER BY source
"""


# --------------------------------------------------------------------------
# jaro_winkler_linkage
# --------------------------------------------------------------------------

def _jw_one(s1: str, s2: str) -> float:
    """Jaro-Winkler, bit-identical to DuckDB's builtin (validated on
    400+ pairs): classic Jaro with the floor(max/2)-1 match window,
    prefix bonus p=0.1 over at most 4 chars, applied only when the
    Jaro similarity exceeds the 0.7 boost threshold."""
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    md = max(l1, l2) // 2 - 1
    m1 = [False] * l1
    m2 = [False] * l2
    matches = 0
    for i, ch in enumerate(s1):
        lo = 0 if i - md < 0 else i - md
        hi = l2 if i + md + 1 > l2 else i + md + 1
        for j in range(lo, hi):
            if not m2[j] and s2[j] == ch:
                m1[i] = m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    trans = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                trans += 1
            k += 1
    trans //= 2
    j = (matches / l1 + matches / l2 + (matches - trans) / matches) / 3
    if j > 0.7:
        p = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            p += 1
        j = j + p * 0.1 * (1 - j)
    return j


@F.pandas_udf(DoubleType())
def _jw_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [_jw_one(x, y) for x, y in zip(a, b)], dtype="float64"
    )


def _jaro_winkler_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part").select("p_partkey", "p_name")
    ln = F.length("p_name")
    pos = (2 + F.col("p_partkey") % (ln - 2)).cast("int")
    ps = F.least(pos, ln - 1)
    dirty = (
        F.when(
            F.col("p_partkey") % 3 == 0,
            F.concat(
                F.expr("substring(p_name, 1, pos - 1)"),
                F.expr("substring(p_name, pos + 1)"),
            ),
        )
        .when(
            F.col("p_partkey") % 3 == 1,
            F.concat(
                F.expr("substring(p_name, 1, pos)"),
                F.expr("substring(p_name, pos, 1)"),
                F.expr("substring(p_name, pos + 1)"),
            ),
        )
        .otherwise(
            F.concat(
                F.expr("substring(p_name, 1, ps - 1)"),
                F.expr("substring(p_name, ps + 1, 1)"),
                F.expr("substring(p_name, ps, 1)"),
                F.expr("substring(p_name, ps + 2)"),
            )
        )
    )
    probes = p.withColumn("pos", pos).withColumn("ps", ps).select(
        "p_partkey",
        F.col("p_name").alias("true_name"),
        dirty.alias("dirty"),
    ).withColumn("blk", F.substring("dirty", 1, 1))
    catalog = (
        p.select(F.col("p_name").alias("cand"))
        .distinct()
        .withColumn("cblk", F.substring("cand", 1, 1))
    )
    cand = probes.join(
        F.broadcast(catalog), probes.blk == catalog.cblk
    ).withColumn(
        "score",
        F.floor(_jw_udf(F.col("dirty"), F.col("cand")) * 1e9 + 0.5) / 1e9,
    )
    best = cand.withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("p_partkey").orderBy(
                F.col("score").desc(), F.col("cand").asc()
            )
        ),
    ).filter(F.col("rk") == 1)
    return (
        best.groupBy("blk")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_probes"),
            F.sum(
                F.when(F.col("cand") == F.col("true_name"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_correct"),
            rnd(F.avg("score"), 6).alias("mean_best_jw"),
        )
        .withColumn(
            "accuracy",
            rnd(F.col("n_correct") / F.col("n_probes").cast("double"), 6),
        )
        .select("blk", "n_probes", "n_correct", "accuracy", "mean_best_jw")
        .orderBy("blk")
    )


_JW_SQL = """
WITH base AS (
  SELECT p_partkey, p_name,
         CAST(2 + p_partkey % (length(p_name) - 2) AS INT) AS pos,
         CAST(least(2 + p_partkey % (length(p_name) - 2),
                    length(p_name) - 1) AS INT) AS ps
  FROM part
), probes AS (
  SELECT p_partkey, p_name AS true_name,
         CASE WHEN p_partkey % 3 = 0
                THEN substr(p_name, 1, pos - 1) || substr(p_name, pos + 1)
              WHEN p_partkey % 3 = 1
                THEN substr(p_name, 1, pos) || substr(p_name, pos, 1)
                     || substr(p_name, pos + 1)
              ELSE substr(p_name, 1, ps - 1) || substr(p_name, ps + 1, 1)
                   || substr(p_name, ps, 1) || substr(p_name, ps + 2)
         END AS dirty
  FROM base
), pr AS (
  SELECT p_partkey, true_name, dirty, substr(dirty, 1, 1) AS blk FROM probes
), catalog AS (
  SELECT DISTINCT p_name AS cand, substr(p_name, 1, 1) AS cblk FROM part
), cand AS (
  SELECT pr.p_partkey, pr.true_name, pr.blk, c.cand,
         floor(jaro_winkler_similarity(pr.dirty, c.cand) * 1e9 + 0.5) / 1e9
           AS score
  FROM pr JOIN catalog c ON pr.blk = c.cblk
), best AS (
  SELECT *, row_number() OVER (PARTITION BY p_partkey
              ORDER BY score DESC, cand ASC) AS rk
  FROM cand
)
SELECT blk, CAST(count(*) AS BIGINT) AS n_probes,
       CAST(sum(CASE WHEN cand = true_name THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       floor(sum(CASE WHEN cand = true_name THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE) * 1000000 + 0.5) / 1000000
         AS accuracy,
       floor(avg(score) * 1000000 + 0.5) / 1000000 AS mean_best_jw
FROM best
WHERE rk = 1
GROUP BY blk
ORDER BY blk
"""


QUERIES: dict[str, QuerySpec] = {
    "spearman_daily_corr": QuerySpec(
        _spearman_daily_corr,
        _SPEARMAN_SQL,
        "Spearman rank correlation of daily order count vs daily revenue "
        "per priority (tie-averaged ranks on the bounded day grain)",
    ),
    "welch_ttest": QuerySpec(
        _welch_ttest,
        _WELCH_SQL,
        "Welch unequal-variance t-test of order totals, BUILDING vs "
        "MACHINERY (two hash aggregates, Welch-Satterthwaite df)",
    ),
    "kruskal_wallis_h": QuerySpec(
        _kruskal_wallis_h,
        _KRUSKAL_SQL,
        "Tie-corrected Kruskal-Wallis H of n_chars across sources from "
        "the value-grain rank histogram",
    ),
    "cramers_v_assoc": QuerySpec(
        _cramers_v_assoc,
        _CRAMERS_SQL,
        "Chi-square association lang x source with Cramer's V and the "
        "Bergsma bias-corrected V (full expected-count grid)",
    ),
    "js_divergence_sources": QuerySpec(
        _js_divergence_sources,
        _JSD_SQL,
        "Jensen-Shannon divergence (bits) of each source's language "
        "distribution vs the pooled corpus distribution",
    ),
    "jaro_winkler_linkage": QuerySpec(
        _jaro_winkler_linkage,
        _JW_SQL,
        "Dirty-record linkage: deterministic typo probes matched back to "
        "the name catalog by Jaro-Winkler within first-char blocks",
    ),
}
