"""Round-7 sixteenth wave: source ablation, parametric calibration,
and local differential privacy.

* ``loso_source_influence`` — leave-one-source-out ablation of the
  corpus quality rate (share of docs with ``n_chars`` ≥ 300): each
  source's influence is the change in the corpus metric when that
  source is removed, computed ALGEBRAICALLY from per-source and
  global sums (loo = (P − p_s)/(N − n_s)) — one aggregate pass, no
  per-source rescan, which is what makes source valuation viable
  when "one source" is 5 TB. The standard pre-training data
  ablation question answered with two hash aggregates.
* ``platt_scaling_irls`` — Platt (1999) parametric calibration:
  logistic fit P(y=1 | z) = σ(a + b·z) by Newton-IRLS, where each of
  the 8 iterations is ONE distributed aggregate of the 5 sufficient
  sums (Σw, Σwz, Σwz², Σ(y−p), Σ(y−p)z) with p computed JVM-side —
  the PageRank/Huber iterative envelope with 2 scalars of state.
  Label = lang='en', feature = standardized ``n_chars`` (weakly
  informative ⇒ no separation, finite MLE). Iterative ⇒ rows-only;
  a planted-parameter test (labels drawn by deterministic md5
  uniforms from σ(1 + 2z)) must recover (a, b) ≈ (1, 2), and the
  distributed fit must equal a pure-Python Newton run to float
  precision (tests/test_classify.py).
* ``randomized_response_freq`` — k-ary randomized response (Warner
  1965 generalized): each doc reports its true language with
  probability 3/4, otherwise one of the k languages uniformly, with
  BOTH draws taken from deterministic md5 uniforms (the engine's
  reproducible-noise convention, like dp_lang_counts) so the oracle
  replays them bit-identically. The debiased estimator
  π̂ = (f_obs − (1−p)/k)/p is compared against the true counts in
  the output — the local-DP counterpart to the central-DP Laplace
  release.

Reference parity: no ablation/calibration/LDP surface in the
reference (SURVEY.md §2.A); declared north-star §2.B additions.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .core import QuerySpec, duck_materialize, assert_grid_headroom, rnd, t

_GATE = 300


def _loso_source_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "source", (F.col("n_chars") >= _GATE).cast("double").alias("y")
    )
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("double").alias("n_s"),
        F.sum("y").alias("p_s"),
    )
    tot = d.agg(
        F.count(F.lit(1)).cast("double").alias("nn"),
        F.sum("y").alias("pp"),
    )
    j = per.crossJoin(F.broadcast(tot))
    full = F.col("pp") / F.col("nn")
    loo = (F.col("pp") - F.col("p_s")) / (F.col("nn") - F.col("n_s"))
    return j.select(
        "source",
        F.col("n_s").cast("long").alias("n_docs"),
        rnd(full, 6).alias("full_rate"),
        rnd(loo, 6).alias("loo_rate"),
        rnd(full - loo, 6).alias("influence"),
    ).orderBy("source")


_LOSO_SQL = f"""
WITH d AS (
  SELECT source,
         CASE WHEN n_chars >= {_GATE} THEN 1.0 ELSE 0.0 END AS y
  FROM documents
), per AS (
  SELECT source, CAST(count(*) AS DOUBLE) AS n_s, sum(y) AS p_s
  FROM d GROUP BY 1
), tot AS (
  SELECT CAST(count(*) AS DOUBLE) AS nn, sum(y) AS pp FROM d
)
SELECT p.source, CAST(p.n_s AS BIGINT) AS n_docs,
       floor(t.pp / t.nn * 1000000 + 0.5) / 1000000 AS full_rate,
       floor((t.pp - p.p_s) / (t.nn - p.n_s) * 1000000 + 0.5) / 1000000
         AS loo_rate,
       floor((t.pp / t.nn - (t.pp - p.p_s) / (t.nn - p.n_s))
             * 1000000 + 0.5) / 1000000 AS influence
FROM per p CROSS JOIN tot t
ORDER BY p.source
"""


# --------------------------------------------------------------------------
# platt_scaling_irls (oracled since round 11: grid-exact Newton)
# --------------------------------------------------------------------------

_NEWTON_ITERS = 8

# Cross-engine portability grid (round 11): every per-row gradient /
# Hessian / log-loss TERM is snapped to the binary 2^-24 grid before
# summation. Two effects: (1) a 1-ulp JVM-vs-libm exp()/ln()
# divergence cannot move a term off its grid point (straddle odds
# ~1e-16/6e-8 per term); (2) sums of exact multiples of 2^-24 whose
# running total stays under 2^53·2^-24 ≈ 5.4e8 are EXACT in IEEE
# arithmetic in ANY summation order — Spark's partition-order sums and
# DuckDB's sequential sums produce identical doubles with no integer
# casting. The Newton trajectory is therefore bit-identical across
# engines, and the pure-Python reference summing the same grid terms
# is exactly equal, not approximately.
_QGRID = 16777216  # 2^24


def _q(t: float) -> float:
    return math.floor(t * _QGRID + 0.5) / _QGRID


def _qc(col):
    return F.floor(col * _QGRID + 0.5) / _QGRID


def platt_newton_step(a: float, b: float, rows) -> tuple[float, float]:
    """One Newton step from (gradient, Hessian) sufficient sums.
    ``rows`` yields (z, y) pairs; pure-Python reference used by tests.
    Terms are snapped to the 2^-24 grid — the same spec the
    distributed fit executes, so the two are exactly equal."""
    g0 = g1 = h00 = h01 = h11 = 0.0
    for z, y in rows:
        p = 1.0 / (1.0 + math.exp(-(a + b * z)))
        w = p * (1.0 - p)
        g0 += _q(y - p)
        g1 += _q((y - p) * z)
        h00 += _q(w)
        h01 += _q(w * z)
        h11 += _q(w * z * z)
    det = h00 * h11 - h01 * h01
    if abs(det) < 1e-12:
        return a, b
    da = (h11 * g0 - h01 * g1) / det
    db = (h00 * g1 - h01 * g0) / det
    return a + da, b + db


def _platt_fit(u: DataFrame, iters: int = _NEWTON_ITERS):
    a, b = 0.0, 0.0
    n = None
    for _ in range(iters):
        p = 1.0 / (1.0 + F.exp(-(F.lit(a) + F.lit(b) * F.col("z"))))
        w = p * (1.0 - p)
        agg = u.agg(
            F.sum(_qc(F.col("y") - p)).alias("g0"),
            F.sum(_qc((F.col("y") - p) * F.col("z"))).alias("g1"),
            F.sum(_qc(w)).alias("h00"),
            F.sum(_qc(w * F.col("z"))).alias("h01"),
            F.sum(_qc(w * F.col("z") * F.col("z"))).alias("h11"),
            F.count(F.lit(1)).cast("double").alias("n"),
        ).collect()[0]
        det = agg["h00"] * agg["h11"] - agg["h01"] * agg["h01"]
        if abs(det) < 1e-12:
            break
        a += (agg["h11"] * agg["g0"] - agg["h01"] * agg["g1"]) / det
        b += (agg["h00"] * agg["g1"] - agg["h01"] * agg["g0"]) / det
        n = agg["n"]
    return a, b, n


def _platt_scaling_irls(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        (F.col("lang") == "en").cast("double").alias("y"),
        F.col("n_chars").cast("long").alias("x"),
    )
    # standardization moments from INTEGER sums (exact in any order),
    # converted then divided — bit-identical across engines, unlike
    # avg/stddev_samp whose accumulation order is engine-private
    mom = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("y").cast("long").alias("npos"),
        F.max("x").alias("xmax"),
        F.min("x").alias("xmin"),
    ).collect()[0]
    n_i, sx, sxx, npos = (
        int(mom["n"]), int(mom["sx"]), int(mom["sxx"]), int(mom["npos"])
    )
    mu = float(sx) / float(n_i)
    var = (
        float(sxx) - float(sx) * float(sx) / float(n_i)
    ) / float(n_i - 1)
    sd = math.sqrt(var)
    # mechanical 2^-24 headroom contract (ADVICE r11): the five Newton
    # sufficient sums have |term| <= max(1, |z|max, 0.25*z^2max); the
    # log-loss sum has |term| <= -ln(eps) ~ 27.64. Enforce both before
    # fitting so a corpus that outgrows the exact-sum ceiling fails
    # loudly instead of silently de-exactifying the oracle.
    zmax = max(
        abs(float(mom["xmax"]) - mu), abs(float(mom["xmin"]) - mu)
    ) / sd
    assert_grid_headroom(
        float(n_i),
        max(1.0, zmax, 0.25 * zmax * zmax),
        "platt Newton gradient/Hessian sums",
    )
    assert_grid_headroom(float(n_i), 27.7, "platt log-loss sum")
    u = d.select(
        "y", ((F.col("x") - F.lit(mu)) / F.lit(sd)).alias("z")
    ).localCheckpoint()
    a, b, n = _platt_fit(u)
    p = 1.0 / (1.0 + F.exp(-(F.lit(a) + F.lit(b) * F.col("z"))))
    eps = 1e-12
    ll_sum = u.agg(
        F.sum(
            _qc(
                -(
                    F.col("y") * F.log(p + eps)
                    + (1 - F.col("y")) * F.log(1 - p + eps)
                )
            )
        ).alias("lls")
    ).collect()[0]["lls"]
    ll = float(ll_sum) / float(n_i)
    br = float(npos) / float(n_i)
    ll_base = -(
        br * math.log(br + 1e-12) + (1 - br) * math.log(1 - br + 1e-12)
    )

    def r6(x):
        return (
            math.floor(x * 1e6 + 0.5) / 1e6
            if x >= 0
            else -(math.floor(-x * 1e6 + 0.5) / 1e6)
        )

    return spark.createDataFrame(
        [(int(n), r6(a), r6(b), r6(ll_base), r6(float(ll)))],
        "n BIGINT, platt_a DOUBLE, platt_b DOUBLE, "
        "logloss_baseline DOUBLE, logloss_fit DOUBLE",
    )


def _platt_sql() -> str:
    """Unrolled 8-step Newton in SQL over the same 2^-24-grid terms.
    ab0 = (0,0); step k recomputes the five sufficient sums from the
    standardized stream and applies the closed-form 2x2 solve; a
    near-singular Hessian freezes (a,b), mirroring the loop break."""
    q = _QGRID

    def Q(expr: str) -> str:
        return f"floor(({expr}) * {q} + 0.5) / {q}"

    stages = ""
    for k in range(1, _NEWTON_ITERS + 1):
        stages += f""", s{k} AS (
  SELECT sum({Q("y - p")}) AS g0,
         sum({Q("(y - p) * z")}) AS g1,
         sum({Q("p * (1 - p)")}) AS h00,
         sum({Q("p * (1 - p) * z")}) AS h01,
         sum({Q("p * (1 - p) * z * z")}) AS h11
  FROM (SELECT u.y, u.z,
               1.0 / (1.0 + exp(-(ab.a + ab.b * u.z))) AS p
        FROM u CROSS JOIN ab{k - 1} ab)
), ab{k} AS (
  SELECT CASE WHEN abs(s.h00 * s.h11 - s.h01 * s.h01) < 1e-12 THEN ab.a
              ELSE ab.a + (s.h11 * s.g0 - s.h01 * s.g1)
                          / (s.h00 * s.h11 - s.h01 * s.h01) END AS a,
         CASE WHEN abs(s.h00 * s.h11 - s.h01 * s.h01) < 1e-12 THEN ab.b
              ELSE ab.b + (s.h00 * s.g1 - s.h01 * s.g0)
                          / (s.h00 * s.h11 - s.h01 * s.h01) END AS b
  FROM s{k} s CROSS JOIN ab{k - 1} ab
)"""
    r6 = (
        "CASE WHEN {x} >= 0 THEN floor({x} * 1000000 + 0.5) / 1000000 "
        "ELSE -(floor(-({x}) * 1000000 + 0.5) / 1000000) END"
    )
    last = f"ab{_NEWTON_ITERS}"
    return f"""
WITH d AS (
  SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
         CAST(n_chars AS BIGINT) AS x
  FROM documents
), mom AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y) AS BIGINT) AS npos
  FROM d
), sc AS (
  SELECT n, npos,
         CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
         sqrt((CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                 / CAST(n AS DOUBLE))
              / CAST(n - 1 AS DOUBLE)) AS sd
  FROM mom
), u AS (
  SELECT d.y, (d.x - sc.mu) / sc.sd AS z FROM d CROSS JOIN sc
), ab0 AS (SELECT 0.0 AS a, 0.0 AS b){stages}, lls AS (
  SELECT sum({Q(
        "-(y * ln(p + 1e-12) + (1 - y) * ln(1 - p + 1e-12))"
    )}) AS s
  FROM (SELECT u.y, u.z,
               1.0 / (1.0 + exp(-(ab.a + ab.b * u.z))) AS p
        FROM u CROSS JOIN {last} ab)
), base AS (
  SELECT CAST(npos AS DOUBLE) / CAST(n AS DOUBLE) AS br, n FROM sc
)
SELECT base.n AS n,
       {r6.format(x="ab.a")} AS platt_a,
       {r6.format(x="ab.b")} AS platt_b,
       {r6.format(
        x="-(base.br * ln(base.br + 1e-12)"
          " + (1 - base.br) * ln(1 - base.br + 1e-12))"
    )} AS logloss_baseline,
       {r6.format(x="lls.s / CAST(base.n AS DOUBLE)")} AS logloss_fit
FROM {last} ab CROSS JOIN lls CROSS JOIN base
"""


_PLATT_SQL = _platt_sql()


# --------------------------------------------------------------------------
# randomized_response_freq
# --------------------------------------------------------------------------

_RR_P = 0.75


def _randomized_response_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.col("lang").alias("true_lang")
    )
    langs = d.select(F.col("true_lang").alias("noise_lang")).distinct()
    # window-free since round 12 (allowlist burn-down; was a global
    # row_number over the distinct-language table): the language domain
    # is bounded, so the replacement ranks are enumerated driver-side
    # over the collected distinct table and shipped back as a literal
    # broadcast frame (the vocab_encode_stats pattern) — same
    # alphabetical order, same rk values, oracle unchanged.
    from ..fns import bounded_collect

    lang_sorted = sorted(
        r["noise_lang"]
        for r in bounded_collect(langs, 10_000, "distinct language domain")
    )
    k_val = float(len(lang_sorted))
    ordered = spark.createDataFrame(
        [(lang, i) for i, lang in enumerate(lang_sorted)],
        "noise_lang STRING, rk LONG",
    )
    k = F.col("k_langs")
    # deterministic md5 uniforms: u1 decides truth-vs-noise, u2 picks
    # the replacement rank among the alphabetically ordered languages
    u1 = (
        F.conv(F.substring(F.md5(F.concat_ws("|", F.lit("rr1"), "doc_id")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(float(1 << 32))
    )
    pick = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.lit("rr2"), "doc_id")), 1, 8),
        16,
        10,
    ).cast("long")
    with_noise = (
        d.withColumn("k_langs", F.lit(k_val))
        .withColumn("keep", u1 < _RR_P)
        .withColumn("pick_rk", pick % k.cast("long"))
    )
    reported = (
        with_noise.join(
            F.broadcast(ordered), with_noise.pick_rk == ordered.rk, "left"
        )
        .select(
            F.when(F.col("keep"), F.col("true_lang"))
            .otherwise(F.col("noise_lang"))
            .alias("obs_lang"),
            "k_langs",
        )
    )
    obs = reported.groupBy(F.col("obs_lang").alias("lang")).agg(
        F.count(F.lit(1)).cast("double").alias("f_obs"),
        F.max("k_langs").alias("k"),
    )
    true = d.groupBy(F.col("true_lang").alias("lang")).agg(
        F.count(F.lit(1)).cast("long").alias("n_true")
    )
    tot = d.agg(F.count(F.lit(1)).cast("double").alias("nn"))
    est = (
        F.col("f_obs") / F.col("nn") - (1 - _RR_P) / F.col("k")
    ) / _RR_P * F.col("nn")
    return (
        obs.join(true, "lang")
        .crossJoin(F.broadcast(tot))
        .select(
            "lang",
            F.col("f_obs").cast("long").alias("n_observed"),
            "n_true",
            rnd(est, 2).alias("est_count"),
            rnd(F.abs(est - F.col("n_true")) / F.col("n_true"), 4).alias(
                "rel_err"
            ),
        )
        .orderBy("lang")
    )


_RR_SQL = f"""
WITH d AS (
  SELECT doc_id, lang FROM documents
), langs AS (
  SELECT lang, row_number() OVER (ORDER BY lang) - 1 AS rk
  FROM (SELECT DISTINCT lang FROM d)
), kc AS (
  SELECT CAST(count(*) AS DOUBLE) AS k FROM langs
), noisy AS (
  SELECT d.lang AS true_lang,
         CAST(('0x' || substring(md5('rr1' || '|' ||
              CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
           / {float(1 << 32)} < {_RR_P} AS keep,
         CAST(('0x' || substring(md5('rr2' || '|' ||
              CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
           % CAST(kc.k AS BIGINT) AS pick_rk,
         kc.k
  FROM d CROSS JOIN kc
), reported AS (
  SELECT n.true_lang,
         CASE WHEN n.keep THEN n.true_lang ELSE l.lang END AS obs_lang,
         n.k
  FROM noisy n LEFT JOIN langs l ON n.pick_rk = l.rk
), obs AS (
  SELECT obs_lang AS lang, CAST(count(*) AS DOUBLE) AS f_obs, max(k) AS k
  FROM reported GROUP BY 1
), tru AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_true FROM d GROUP BY 1
), tot AS (
  SELECT CAST(count(*) AS DOUBLE) AS nn FROM d
)
SELECT o.lang,
       CAST(o.f_obs AS BIGINT) AS n_observed,
       t.n_true,
       floor((o.f_obs / x.nn - (1 - {_RR_P}) / o.k) / {_RR_P} * x.nn
             * 100 + 0.5) / 100 AS est_count,
       floor(abs((o.f_obs / x.nn - (1 - {_RR_P}) / o.k) / {_RR_P} * x.nn
                 - t.n_true) / t.n_true * 10000 + 0.5) / 10000 AS rel_err
FROM obs o JOIN tru t ON o.lang = t.lang
CROSS JOIN tot x
ORDER BY o.lang
"""


QUERIES: dict[str, QuerySpec] = {
    "loso_source_influence": QuerySpec(
        _loso_source_influence,
        _LOSO_SQL,
        "Leave-one-source-out ablation of the corpus quality rate, "
        "computed algebraically from one aggregate pass",
    ),
    "platt_scaling_irls": QuerySpec(
        _platt_scaling_irls,
        duck_materialize(_PLATT_SQL),
        "Platt logistic calibration by Newton-IRLS: 8 one-aggregate "
        "iterations with 2 scalars of state; log-loss vs baseline "
        "(2^-24 term grid makes the unrolled oracle hash-exact)",
    ),
    "randomized_response_freq": QuerySpec(
        _randomized_response_freq,
        _RR_SQL,
        "k-ary randomized response with deterministic md5 noise and "
        "the debiased frequency estimator vs true counts",
    ),
}
