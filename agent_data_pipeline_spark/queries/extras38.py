"""Round-7 fourth wave: sampling-design & calibration statistics.

* ``poisson_bootstrap_ci`` — bootstrap confidence interval for the mean
  order value via the POISSON bootstrap (Chamandy et al., "Estimating
  Uncertainty for Massive Data Streams", Google 2012 — the public
  streaming-scale bootstrap): instead of resampling n rows with
  replacement (undistributable), every (row, replicate) pair draws an
  independent Poisson(1) weight, here by inverse-CDF over a portable
  Knuth-hash uniform — fully deterministic and engine-portable, so the
  whole bootstrap is DuckDB-oracled. The fact table explodes ×R=100
  into a two-phase aggregate on the replicate grain (map-side partial
  sums ⇒ the shuffle carries R rows per partition, never the exploded
  stream); the percentile picks run over the 100-row replicate table.
* ``neyman_allocation`` — optimal stratified-sampling design
  (Neyman 1934): allocate a fixed eval budget across language strata
  ∝ N_h·S_h, the allocation minimizing the stratified-mean variance.
  One stratum-grain aggregate + one broadcast total. Oracled.
* ``isotonic_calibration`` — PAV isotonic calibration of the quality
  score against a binary label (n_chars >= 300, ~51% positive) on a 1000-bin grid
  (ops/calibrate.py): the monotone-projection optimum of the binned
  empirical rates. Oracled since round 12 via the minimax closed form
  (see _ISOTONIC_SQL); monotonicity, pool-mean and planted-recovery
  invariants in tests/test_classify.py.

Reference parity: no statistics/calibration surface in the reference
(SURVEY.md §2.A); declared north-star §2.B.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ops import calibrate
from .core import QuerySpec, bounded_collect, rnd, t

_BOOT_R = 100
_KNUTH = 2654435761
# Poisson(1) cumulative probabilities, fixed 12-dp literals so BOTH
# engines compare the identical constants (k = 0..8; tail mass 1.1e-6
# truncated to weight 9 — bias far below the CI rounding grain)
_POIS_CDF = (
    "0.367879441171",
    "0.735758882343",
    "0.919698602929",
    "0.981011843124",
    "0.996340153173",
    "0.999405815182",
    "0.999916758851",
    "0.999989750803",
    "0.999998874797",
)


def _pois_weight_expr(u):
    """Inverse-CDF Poisson(1) from a uniform column (SQL-expressible)."""
    w = F.lit(9)
    expr = None
    for k, thr in enumerate(_POIS_CDF):
        cond = u < F.lit(float(thr))
        expr = F.when(cond, k) if expr is None else expr.when(cond, k)
    return expr.otherwise(w)


def _poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    reps = spark.range(0, _BOOT_R).select(F.col("id").alias("rep"))
    # u = Knuth hash of (orderkey * R + rep) in [0, 1)
    key = F.col("o_orderkey") * _BOOT_R + F.col("rep")
    u = (
        F.pmod(F.pmod(key, F.lit(2**31)) * F.lit(_KNUTH), F.lit(2**31))
        / F.lit(float(2**31))
    )
    weighted = o.crossJoin(F.broadcast(reps)).select(
        "rep",
        _pois_weight_expr(u).cast("long").alias("w"),
        "o_totalprice",
    )
    rep_means = weighted.groupBy("rep").agg(
        rnd(
            F.sum(F.col("w") * F.col("o_totalprice")) / F.sum("w"), 6
        ).alias("rep_mean")
    )
    # 95% percentile CI: ranks 3 and 98 of the 100 sorted replicate
    # means — picked DRIVER-SIDE over the collected R=100 frame
    # (round-11 allowlist burn-down; was a global row_number over the
    # replicate grain). Same (rep_mean asc, rep asc) order the window
    # used; the replicate grain is R rows at any fact scale.
    rep_rows = bounded_collect(
        rep_means, _BOOT_R, f"bootstrap replicate means (R={_BOOT_R})"
    )
    ordered = sorted(
        (float(r["rep_mean"]), int(r["rep"])) for r in rep_rows
    )
    if len(ordered) < 98:
        # loud (ADVICE r11): fewer replicate means than the CI ranks
        # need means the replicate generator itself is broken — an
        # IndexError here would misattribute it to the driver pick
        raise ValueError(
            f"bootstrap CI needs {_BOOT_R} replicate means, "
            f"got {len(ordered)}"
        )
    base = o.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        rnd(F.avg("o_totalprice"), 6).alias("mean_value"),
    )
    return base.select(
        "n",
        "mean_value",
        F.lit(ordered[2][0]).alias("ci_lo"),
        F.lit(ordered[97][0]).alias("ci_hi"),
    )


_POIS_CASE = " ".join(
    f"WHEN u < {thr} THEN {k}" for k, thr in enumerate(_POIS_CDF)
)

_BOOT_SQL = f"""
WITH reps AS (
  SELECT unnest(generate_series(0, {_BOOT_R - 1})) AS rep
), hashed AS (
  SELECT r.rep, o.o_totalprice,
         ((((o.o_orderkey * {_BOOT_R} + r.rep) % 2147483648) * {_KNUTH})
           % 2147483648) / 2147483648.0 AS u
  FROM orders o CROSS JOIN reps r
), weighted AS (
  SELECT rep, CASE {_POIS_CASE} ELSE 9 END AS w, o_totalprice
  FROM hashed
), rep_means AS (
  SELECT rep,
         floor(sum(w * o_totalprice) / sum(w) * 1000000 + 0.5) / 1000000
           AS rep_mean
  FROM weighted GROUP BY rep
), ranked AS (
  SELECT rep_mean, row_number() OVER (ORDER BY rep_mean, rep) AS rk
  FROM rep_means
), base AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         floor(avg(o_totalprice) * 1000000 + 0.5) / 1000000 AS mean_value
  FROM orders
)
SELECT b.n, b.mean_value,
       (SELECT rep_mean FROM ranked WHERE rk = 3) AS ci_lo,
       (SELECT rep_mean FROM ranked WHERE rk = 98) AS ci_hi
FROM base b
"""


def _neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    strata = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_h"),
        F.stddev_pop("n_chars").alias("s_h"),
    )
    tot = strata.agg(F.sum(F.col("n_h") * F.col("s_h")).alias("tot_ns"))
    budget = 100
    return (
        strata.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "n_h",
            rnd("s_h", 6).alias("s_h"),
            F.floor(
                F.lit(budget) * F.col("n_h") * F.col("s_h") / F.col("tot_ns") + 0.5
            )
            .cast("long")
            .alias("alloc"),
        )
        .orderBy("lang")
    )


_NEYMAN_SQL = """
WITH strata AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_h, stddev_pop(n_chars) AS s_h
  FROM documents GROUP BY lang
), tot AS (
  SELECT sum(n_h * s_h) AS tot_ns FROM strata
)
SELECT s.lang, s.n_h,
       floor(s.s_h * 1000000 + 0.5) / 1000000 AS s_h,
       CAST(floor(100 * s.n_h * s.s_h / t.tot_ns + 0.5) AS BIGINT) AS alloc
FROM strata s CROSS JOIN tot t
ORDER BY s.lang
"""


def _isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmdata import textstats

    d = textstats.with_text_stats(t(spark, sf_dir, "documents"))
    return calibrate.isotonic_calibrate_binned(
        d, F.col("quality_score"), F.col("n_chars") >= 300, bins=1000
    ).orderBy("bin")


# Oracle (round 12): PAV via its minimax characterization. The isotonic
# fit has the closed form ŷ_i = max_{j≤i} min_{k≥i} avg(j,k) where
# avg(j,k) = Σpos[j..k] / Σn[j..k] over the CONTIGUOUS run of non-empty
# bins (Ayer et al. 1955; Robertson-Wright-Dykstra 1988, public
# methods). Exactness across engines: the run sums are exact integers
# (prefix-sum differences), each avg is ONE correctly-rounded double
# division, and IEEE rounding is MONOTONE (x ≤ y ⇒ fl(x) ≤ fl(y)), so
# min/max over the rounded doubles equals the rounded min/max of the
# rationals — i.e. exactly fl(block rate), the same double the stack
# PAV's final s/w division produces. Cost: the oracle is O(B²) pairs
# with B ≤ 1000 bins (corpus-size-independent), windowed twice; the
# ENGINE side keeps the O(B) stack PAV inside one bounded group.
_ISOTONIC_SQL = """
WITH s AS (
  SELECT n_chars,
         CAST(length(text) AS BIGINT) AS n_chars_calc,
         regexp_split_to_array(trim(text), '\\s+') AS toks,
         regexp_split_to_array(lower(text), '\\s+') AS ltoks
  FROM documents
), c AS (
  SELECT n_chars, n_chars_calc,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
         CAST(len(list_filter(ltoks, x -> list_contains(
             ['the','a','of','and','to','in','is','it'], x)))
           AS BIGINT) AS n_stop
  FROM s
), scored AS (
  SELECT n_chars,
         floor((0.4 * least(n_chars_calc / 200.0, 1.0)
             + 0.3 * least(CASE WHEN n_tokens > 0
                                THEN n_stop / CAST(n_tokens AS DOUBLE)
                                ELSE 0.0 END * 4, 1.0)
             + 0.3 * CASE WHEN n_tokens > 0
                          THEN n_distinct_tokens / CAST(n_tokens AS DOUBLE)
                          ELSE 0.0 END) * 1000000 + 0.5) / 1000000
           AS quality_score
  FROM c
), binned AS (
  SELECT greatest(CAST(0 AS BIGINT),
                  least(CAST(floor(quality_score * 1000) AS BIGINT),
                        CAST(999 AS BIGINT))) AS bin,
         CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS y
  FROM scored
), agg AS (
  SELECT bin, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT)
           AS n_pos
  FROM binned GROUP BY bin
), seq AS (
  SELECT bin, n, n_pos,
         row_number() OVER (ORDER BY bin) AS i,
         CAST(sum(n) OVER (ORDER BY bin) AS BIGINT) AS cw,
         CAST(sum(n_pos) OVER (ORDER BY bin) AS BIGINT) AS cs
  FROM agg
), pairs AS (
  SELECT a.i AS j, b.i AS k,
         CAST(b.cs - a.cs + a.n_pos AS DOUBLE)
           / CAST(b.cw - a.cw + a.n AS DOUBLE) AS avgjk
  FROM seq a JOIN seq b ON b.i >= a.i
), suffmin AS (
  SELECT j, k AS i,
         min(avgjk) OVER (PARTITION BY j ORDER BY k DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
  FROM pairs
), iso AS (
  SELECT i,
         max(m) OVER (PARTITION BY i ORDER BY j
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS yhat,
         row_number() OVER (PARTITION BY i ORDER BY j DESC) AS rn
  FROM suffmin
  WHERE j <= i
)
SELECT q.bin, q.n,
       floor(CAST(q.n_pos AS DOUBLE) / CAST(q.n AS DOUBLE)
             * 1000000 + 0.5) / 1000000 AS pos_rate,
       floor(o.yhat * 1000000 + 0.5) / 1000000 AS calibrated
FROM seq q JOIN iso o ON o.i = q.i AND o.rn = 1
ORDER BY q.bin
"""


QUERIES: dict[str, QuerySpec] = {
    "poisson_bootstrap_ci": QuerySpec(
        _poisson_bootstrap_ci,
        _BOOT_SQL,
        "Poisson-bootstrap 95% CI for the mean order value (R=100, "
        "deterministic portable-hash weights)",
    ),
    "neyman_allocation": QuerySpec(
        _neyman_allocation,
        _NEYMAN_SQL,
        "Neyman-optimal stratified eval-budget allocation per language",
    ),
    "isotonic_calibration": QuerySpec(
        _isotonic_calibration,
        _ISOTONIC_SQL,
        "PAV isotonic calibration of quality score on a 1000-bin grid "
        "(oracled r12: minimax closed form over bounded bin pairs; "
        "monotone IEEE rounding makes min/max of rounded run-averages "
        "bit-equal to the stack PAV's block rates)",
    ),
}
