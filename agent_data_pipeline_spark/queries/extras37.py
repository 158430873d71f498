"""Round-7 third wave: experimentation & governance statistics — the
analyses a data platform runs around releases, all DuckDB-oracled.

* ``cuped_adjusted_ab`` — CUPED variance reduction (Deng, Xu, Kohavi &
  Walker, WSDM 2013 — public method): adjust the experiment metric with
  the pre-period covariate, Y' = Y − θ(X − X̄), θ = cov(X,Y)/var(X).
  The standard trick that makes A/B tests decisive at a fraction of the
  sample; reported per variant with the achieved variance-reduction %.
  One fact scan → user-grain aggregate (the only fact-scale work) →
  1-row pooled stats broadcast → variant-grain re-aggregate.
* ``k_anonymity_audit`` — re-identification risk census per language:
  group sizes over the quasi-identifier (lang, source, n_chars-bucket),
  minimum k, #groups and #rows below k=5. The governance gate before
  releasing a user-adjacent slice. Everything past the QI aggregate is
  QI-cardinality-bounded.
* ``weighted_log_odds_terms`` — Monroe, Colaresi & Quinn "Fightin'
  Words" (Political Analysis 2008 — public method): informative-
  Dirichlet-prior weighted log-odds z-scores for which tokens
  distinguish one corpus half from the other; the principled version of
  "top distinctive terms" (plain log-odds overweights rare words; the
  prior shrinks them). Vocabulary-bounded throughout; top-10 per
  direction with a rounded-z + token total order.
* ``fdr_bh_tests`` — Benjamini–Hochberg FDR control (JRSS-B 1995 —
  public method) over the 25 per-nation revenue z-tests: the multiple-
  comparisons correction any metrics platform needs once it tests 25
  segments at once. The normal-tail p-value uses the Abramowitz &
  Stegun 7.1.26 erf polynomial — identical arithmetic on both engines
  (|approx error| ≤ 1.5e-7, far above the 6-dp rounding grain).
  Window-free since round 12: the z/p stats stay distributed; the BH
  step-up ranking runs driver-side over the collected 25-row nation
  frame.

Reference parity: the reference has no statistics surface at all
(SURVEY.md §2.A); all four belong to the declared north-star §2.B
surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


from .core import QuerySpec, bounded_collect, rnd, t

_CUPED_CUTOFF = "2024-01-16"


def _cuped_adjusted_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    per_user = ev.groupBy((F.col("user_id") % 2).alias("variant"), "user_id").agg(
        F.sum(
            F.when(F.to_date("ts") < F.lit(_CUPED_CUTOFF).cast("date"), F.col("value"))
            .otherwise(0.0)
        ).alias("x"),
        F.sum(
            F.when(F.to_date("ts") >= F.lit(_CUPED_CUTOFF).cast("date"), F.col("value"))
            .otherwise(0.0)
        ).alias("y"),
    )
    stats = per_user.agg(
        rnd(F.covar_pop("x", "y") / F.var_pop("x"), 6).alias("theta"),
        rnd(F.avg("x"), 6).alias("xbar"),
    )
    adj = per_user.crossJoin(F.broadcast(stats)).withColumn(
        "y_cuped", F.col("y") - F.col("theta") * (F.col("x") - F.col("xbar"))
    )
    return (
        adj.groupBy("variant")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            rnd(F.avg("y"), 6).alias("mean_y"),
            rnd(F.var_pop("y"), 6).alias("var_y"),
            rnd(F.avg("y_cuped"), 6).alias("mean_y_cuped"),
            rnd(F.var_pop("y_cuped"), 6).alias("var_y_cuped"),
            rnd((1 - F.var_pop("y_cuped") / F.var_pop("y")) * 100, 4).alias(
                "var_reduction_pct"
            ),
        )
        .orderBy("variant")
    )


_CUPED_SQL = f"""
WITH per_user AS (
  SELECT user_id % 2 AS variant, user_id,
         sum(CASE WHEN CAST(ts AS DATE) < DATE '{_CUPED_CUTOFF}'
                  THEN value ELSE 0.0 END) AS x,
         sum(CASE WHEN CAST(ts AS DATE) >= DATE '{_CUPED_CUTOFF}'
                  THEN value ELSE 0.0 END) AS y
  FROM events GROUP BY 1, 2
), stats AS (
  SELECT floor(covar_pop(x, y) / var_pop(x) * 1000000 + 0.5) / 1000000 AS theta,
         floor(avg(x) * 1000000 + 0.5) / 1000000 AS xbar
  FROM per_user
), adj AS (
  SELECT p.variant, p.y, p.y - s.theta * (p.x - s.xbar) AS y_cuped
  FROM per_user p CROSS JOIN stats s
)
SELECT variant,
       CAST(count(*) AS BIGINT) AS n_users,
       floor(avg(y) * 1000000 + 0.5) / 1000000 AS mean_y,
       floor(var_pop(y) * 1000000 + 0.5) / 1000000 AS var_y,
       floor(avg(y_cuped) * 1000000 + 0.5) / 1000000 AS mean_y_cuped,
       floor(var_pop(y_cuped) * 1000000 + 0.5) / 1000000 AS var_y_cuped,
       floor((1 - var_pop(y_cuped) / var_pop(y)) * 100 * 10000 + 0.5) / 10000
         AS var_reduction_pct
FROM adj GROUP BY variant ORDER BY variant
"""

_K_THRESHOLD = 5


def _k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "lang", "source", F.floor(F.col("n_chars") / 100).alias("size_bucket")
    )
    groups = d.groupBy("lang", "source", "size_bucket").agg(
        F.count(F.lit(1)).alias("k")
    )
    return (
        groups.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.min("k").cast("long").alias("min_k"),
            F.sum((F.col("k") < _K_THRESHOLD).cast("long")).alias("n_groups_below_k"),
            F.sum(F.when(F.col("k") < _K_THRESHOLD, F.col("k")).otherwise(0))
            .cast("long")
            .alias("n_rows_at_risk"),
        )
        .orderBy("lang")
    )


_K_ANON_SQL = f"""
WITH groups AS (
  SELECT lang, source, n_chars // 100 AS size_bucket, count(*) AS k
  FROM documents GROUP BY 1, 2, 3
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(min(k) AS BIGINT) AS min_k,
       CAST(sum(CASE WHEN k < {_K_THRESHOLD} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_groups_below_k,
       CAST(sum(CASE WHEN k < {_K_THRESHOLD} THEN k ELSE 0 END) AS BIGINT)
         AS n_rows_at_risk
FROM groups GROUP BY lang ORDER BY lang
"""

_LOGODDS_A0 = 500.0
_LOGODDS_MIN_TOTAL = 20


def _weighted_log_odds_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus A = sources src0..src9 (lexicographic first half), B =
    the rest. Informative Dirichlet prior α_w = a0·y_w/n (overall
    usage); z = δ̂ / sqrt(1/(y_aw+α_w) + 1/(y_bw+α_w))."""
    d = t(spark, sf_dir, "documents")
    is_a = F.col("source").isin(*[f"src{i}" for i in range(10)])
    toks = d.select(
        is_a.alias("in_a"),
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    counts = toks.groupBy("tok").agg(
        F.sum(F.col("in_a").cast("long")).alias("ya"),
        F.sum((~F.col("in_a")).cast("long")).alias("yb"),
    )
    totals = counts.agg(
        F.sum("ya").cast("double").alias("na"), F.sum("yb").cast("double").alias("nb")
    )
    c = (
        counts.filter((F.col("ya") + F.col("yb")) >= _LOGODDS_MIN_TOTAL)
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "alpha",
            F.lit(_LOGODDS_A0)
            * (F.col("ya") + F.col("yb"))
            / (F.col("na") + F.col("nb")),
        )
    )
    delta = (
        F.log((F.col("ya") + F.col("alpha")) / (F.col("na") + _LOGODDS_A0 - F.col("ya") - F.col("alpha")))
        - F.log((F.col("yb") + F.col("alpha")) / (F.col("nb") + _LOGODDS_A0 - F.col("yb") - F.col("alpha")))
    )
    var = 1.0 / (F.col("ya") + F.col("alpha")) + 1.0 / (F.col("yb") + F.col("alpha"))
    z = rnd(delta / F.sqrt(var), 6)
    scored = c.select("tok", F.col("ya").cast("long").alias("ya"),
                      F.col("yb").cast("long").alias("yb"), z.alias("z"))
    top_a = (
        scored.orderBy(F.col("z").desc(), "tok")
        .limit(10)
        .select(F.lit("a_over_b").alias("direction"), "tok", "ya", "yb", "z")
    )
    top_b = (
        scored.orderBy(F.col("z").asc(), "tok")
        .limit(10)
        .select(F.lit("b_over_a").alias("direction"), "tok", "ya", "yb", "z")
    )
    return top_a.unionByName(top_b).orderBy("direction", F.col("z").desc(), "tok")


_LOGODDS_SQL = rf"""
WITH toks AS (
  SELECT source IN ('src0','src1','src2','src3','src4',
                    'src5','src6','src7','src8','src9') AS in_a,
         unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
  FROM documents
), counts AS (
  SELECT tok,
         sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS ya,
         sum(CASE WHEN in_a THEN 0 ELSE 1 END) AS yb
  FROM toks WHERE tok <> '' GROUP BY tok
), totals AS (
  SELECT CAST(sum(ya) AS DOUBLE) AS na, CAST(sum(yb) AS DOUBLE) AS nb FROM counts
), scored AS (
  SELECT c.tok, CAST(c.ya AS BIGINT) AS ya, CAST(c.yb AS BIGINT) AS yb,
         floor((
           ln((c.ya + {_LOGODDS_A0} * (c.ya + c.yb) / (t.na + t.nb))
              / (t.na + {_LOGODDS_A0} - c.ya
                 - {_LOGODDS_A0} * (c.ya + c.yb) / (t.na + t.nb)))
         - ln((c.yb + {_LOGODDS_A0} * (c.ya + c.yb) / (t.na + t.nb))
              / (t.nb + {_LOGODDS_A0} - c.yb
                 - {_LOGODDS_A0} * (c.ya + c.yb) / (t.na + t.nb)))
         ) / sqrt(1.0 / (c.ya + {_LOGODDS_A0} * (c.ya + c.yb) / (t.na + t.nb))
                + 1.0 / (c.yb + {_LOGODDS_A0} * (c.ya + c.yb) / (t.na + t.nb)))
           * 1000000 + 0.5) / 1000000 AS z
  FROM counts c CROSS JOIN totals t
  WHERE c.ya + c.yb >= {_LOGODDS_MIN_TOTAL}
), top_a AS (
  SELECT 'a_over_b' AS direction, tok, ya, yb, z
  FROM scored ORDER BY z DESC, tok LIMIT 10
), top_b AS (
  SELECT 'b_over_a' AS direction, tok, ya, yb, z
  FROM scored ORDER BY z ASC, tok LIMIT 10
)
SELECT * FROM (SELECT * FROM top_a UNION ALL SELECT * FROM top_b)
ORDER BY direction, z DESC, tok
"""

_BH_Q = 0.10
# Abramowitz & Stegun 7.1.26 erf coefficients
_AS_P = 0.3275911
_AS_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)


def _erfc_as(x):
    """erfc(x) for x >= 0 via the A&S 7.1.26 polynomial — pure
    arithmetic (exp + powers), so both engines evaluate the identical
    expression tree."""
    tt = 1.0 / (1.0 + _AS_P * x)
    poly = (
        _AS_A[0] * tt
        + _AS_A[1] * tt**2
        + _AS_A[2] * tt**3
        + _AS_A[3] * tt**4
        + _AS_A[4] * tt**5
    )
    return poly * F.exp(-(x * x))


def _fdr_bh_tests(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").join(
        t(spark, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey")
    ).join(
        F.broadcast(t(spark, sf_dir, "nation")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select(F.col("n_name").alias("nation"), "o_totalprice")
    per_nation = o.groupBy("nation").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg("o_totalprice").alias("mean_i"),
    )
    glob = o.agg(
        F.avg("o_totalprice").alias("mean_g"), F.var_pop("o_totalprice").alias("var_g")
    )
    zed = per_nation.crossJoin(F.broadcast(glob)).withColumn(
        "z",
        rnd(
            (F.col("mean_i") - F.col("mean_g"))
            / F.sqrt(F.col("var_g") / F.col("n")),
            6,
        ),
    )
    # two-sided p from the ROUNDED z so the erf input is engine-identical
    p = rnd(_erfc_as(F.abs(F.col("z")) / F.lit(2.0**0.5)), 6)
    # Window-free since round 12 (allowlist burn-down; was a global
    # row_number over the nation grain): the z/p statistics stay
    # distributed (the fact-scale work); the BH step-up ranking runs
    # driver-side over the collected 25-row nation frame — sort by the
    # same (p, nation) key, same p <= rank*q/m comparison on the same
    # 6dp-rounded doubles.
    stat_rows = bounded_collect(
        zed.select("nation", "n", "z", p.alias("p")),
        1_000,
        "nation grain (25 rows)",
    )
    ordered = sorted(
        ((float(r["p"]), r["nation"], int(r["n"]), float(r["z"])) for r in stat_rows),
    )
    m = len(ordered)
    kstar = 0
    for i, (pv, _nat, _n, _z) in enumerate(ordered, start=1):
        if pv <= i * _BH_Q / m:
            kstar = i
    return spark.createDataFrame(
        [
            (nat, n_i, z_v, pv, i, i <= kstar)
            for i, (pv, nat, n_i, z_v) in enumerate(ordered, start=1)
        ],
        "nation STRING, n BIGINT, z DOUBLE, p DOUBLE, bh_rank BIGINT, "
        "rejected BOOLEAN",
    )


_FDR_SQL = f"""
WITH o AS (
  SELECT n.n_name AS nation, ord.o_totalprice
  FROM orders ord
  JOIN customer c ON ord.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
), per_nation AS (
  SELECT nation, CAST(count(*) AS BIGINT) AS n, avg(o_totalprice) AS mean_i
  FROM o GROUP BY nation
), gstats AS (
  SELECT avg(o_totalprice) AS mean_g, var_pop(o_totalprice) AS var_g FROM o
), zed AS (
  SELECT p.nation, p.n,
         floor((p.mean_i - g.mean_g) / sqrt(g.var_g / p.n) * 1000000 + 0.5)
           / 1000000 AS z
  FROM per_nation p CROSS JOIN gstats g
), pv AS (
  SELECT nation, n, z,
         floor((({_AS_A[0]} * (1.0 / (1.0 + {_AS_P} * (abs(z) / sqrt(2.0))))
               + {_AS_A[1]} * pow(1.0 / (1.0 + {_AS_P} * (abs(z) / sqrt(2.0))), 2)
               + {_AS_A[2]} * pow(1.0 / (1.0 + {_AS_P} * (abs(z) / sqrt(2.0))), 3)
               + {_AS_A[3]} * pow(1.0 / (1.0 + {_AS_P} * (abs(z) / sqrt(2.0))), 4)
               + {_AS_A[4]} * pow(1.0 / (1.0 + {_AS_P} * (abs(z) / sqrt(2.0))), 5))
               * exp(-((abs(z) / sqrt(2.0)) * (abs(z) / sqrt(2.0)))))
               * 1000000 + 0.5) / 1000000 AS p
  FROM zed
), ranked AS (
  SELECT *, CAST(row_number() OVER (ORDER BY p, nation) AS BIGINT) AS bh_rank,
         count(*) OVER () AS m
  FROM pv
), kstar AS (
  SELECT max(CASE WHEN p <= bh_rank * {_BH_Q} / m THEN bh_rank ELSE 0 END)
           AS kstar
  FROM ranked
)
SELECT r.nation, r.n, r.z, r.p, r.bh_rank, r.bh_rank <= k.kstar AS rejected
FROM ranked r CROSS JOIN kstar k
ORDER BY r.bh_rank
"""


QUERIES: dict[str, QuerySpec] = {
    "cuped_adjusted_ab": QuerySpec(
        _cuped_adjusted_ab,
        _CUPED_SQL,
        "CUPED pre-period variance reduction per A/B variant",
    ),
    "k_anonymity_audit": QuerySpec(
        _k_anonymity_audit,
        _K_ANON_SQL,
        "k-anonymity risk census over the (lang, source, size) QI",
    ),
    "weighted_log_odds_terms": QuerySpec(
        _weighted_log_odds_terms,
        _LOGODDS_SQL,
        "Monroe weighted log-odds distinctive terms between corpus halves",
    ),
    "fdr_bh_tests": QuerySpec(
        _fdr_bh_tests,
        _FDR_SQL,
        "Benjamini-Hochberg FDR over per-nation revenue z-tests",
    ),
}
