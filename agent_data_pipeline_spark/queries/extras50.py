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

from .core import QuerySpec, rnd, t

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
# platt_scaling_irls (rows-only: Newton iterations)
# --------------------------------------------------------------------------

_NEWTON_ITERS = 8


def platt_newton_step(a: float, b: float, rows) -> tuple[float, float]:
    """One Newton step from (gradient, Hessian) sufficient sums.
    ``rows`` yields (z, y) pairs; pure-Python reference used by tests."""
    g0 = g1 = h00 = h01 = h11 = 0.0
    for z, y in rows:
        p = 1.0 / (1.0 + math.exp(-(a + b * z)))
        w = p * (1.0 - p)
        g0 += y - p
        g1 += (y - p) * z
        h00 += w
        h01 += w * z
        h11 += w * z * z
    det = h00 * h11 - h01 * h01
    if abs(det) < 1e-12:
        return a, b
    da = (h11 * g0 - h01 * g1) / det
    db = (h00 * g1 - h01 * g0) / det
    return a + da, b + db


def _platt_fit(u: DataFrame, iters: int = _NEWTON_ITERS):
    a, b = 0.0, 0.0
    n = ll0 = None
    for _ in range(iters):
        p = 1.0 / (1.0 + F.exp(-(F.lit(a) + F.lit(b) * F.col("z"))))
        w = p * (1.0 - p)
        agg = u.agg(
            F.sum(F.col("y") - p).alias("g0"),
            F.sum((F.col("y") - p) * F.col("z")).alias("g1"),
            F.sum(w).alias("h00"),
            F.sum(w * F.col("z")).alias("h01"),
            F.sum(w * F.col("z") * F.col("z")).alias("h11"),
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
        F.col("n_chars").cast("double").alias("x"),
    )
    mom = d.agg(
        F.avg("x").alias("mu"),
        F.stddev_samp("x").alias("sd"),
        F.avg("y").alias("base_rate"),
    ).collect()[0]
    u = d.select(
        "y", ((F.col("x") - mom["mu"]) / mom["sd"]).alias("z")
    ).localCheckpoint()
    a, b, n = _platt_fit(u)
    p = 1.0 / (1.0 + F.exp(-(F.lit(a) + F.lit(b) * F.col("z"))))
    eps = 1e-12
    ll = u.agg(
        F.avg(
            -(
                F.col("y") * F.log(p + eps)
                + (1 - F.col("y")) * F.log(1 - p + eps)
            )
        ).alias("ll")
    ).collect()[0]["ll"]
    br = float(mom["base_rate"])
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


# --------------------------------------------------------------------------
# randomized_response_freq
# --------------------------------------------------------------------------

_RR_P = 0.75


def _randomized_response_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.col("lang").alias("true_lang")
    )
    langs = d.select(F.col("true_lang").alias("noise_lang")).distinct()
    k = F.col("k_langs")
    kcnt = langs.agg(F.count(F.lit(1)).cast("double").alias("k_langs"))
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
    ordered = langs.select(
        "noise_lang",
        (F.row_number().over(W.orderBy("noise_lang")) - 1).alias("rk"),
    )
    with_noise = (
        d.crossJoin(F.broadcast(kcnt))
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
        None,
        "Platt logistic calibration by Newton-IRLS: 8 one-aggregate "
        "iterations with 2 scalars of state; log-loss vs baseline",
    ),
    "randomized_response_freq": QuerySpec(
        _randomized_response_freq,
        _RR_SQL,
        "k-ary randomized response with deterministic md5 noise and "
        "the debiased frequency estimator vs true counts",
    ),
}
