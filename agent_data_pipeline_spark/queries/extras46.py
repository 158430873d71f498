"""Round-7 twelfth wave: mergeable distinct sketches, collocation
strength, time-constrained funnels, and importance-weighting
diagnostics.

* ``kmv_distinct_shingles`` — KMV / bottom-k distinct-count sketch
  (Bar-Yossef et al. 2002) of 12-char text shingles per source:
  est = (k−1)/U_(k) with U_(k) the k-th smallest normalized distinct
  hash, k = 256. The k-th order statistic is found WITHOUT a
  per-source sort of the corpus: distinct hashes bucket by their top
  bits (4096 buckets), a bounded bucket-grain cumulative window
  locates the cutoff bucket containing the k-th value, and only the
  ~k survivors below the cutoff are ranked — the bucket-histogram +
  refine pattern that fixed the r4 low-cardinality window traps,
  here applied to an order statistic. Exact distinct (the same
  two-phase hash agg every dedup op pays) is reported alongside as
  the accuracy contrast; hashes are md5 slices, so both engines
  compute bit-identical sketches.
* ``g2_collocations`` — Dunning log-likelihood-ratio collocation
  strength (Dunning 1993) for adjacent token bigrams — the
  recommended replacement for PMI on sparse counts (PMI over-ranks
  hapax pairs; G² does not): full 2×2 contingency per bigram
  (a,b,c,d vs independence expectations), G² = 2·Σ O·ln(O/E) with
  the 0·ln0 = 0 convention, top-20 with 9dp quantization before the
  rank. Vocabulary-bounded throughout (the bigram grid is ≤|V|²).
* ``funnel_within_window`` — time-constrained conversion funnel:
  signup → click within 1 day → purchase within a further day
  (the measured per-user event cadence makes hour-scale windows
  vacuous: median inter-event gap ≈ 7.3 h), per
  user, via a min-timestamp cascade (three conditional aggregates on
  the user grain — no self-join, no window over fact rows). Interval
  arithmetic only (the TZ-safe comparison class for the events
  fixture).
* ``ess_weighted_estimate`` — self-normalized importance weighting
  diagnostics per source: language-balancing weights
  w = 1/n_lang(doc) (source-balancing weights are vacuous on this
  fixture — every source has exactly 25 docs, so w would be
  constant; the lang margin is genuinely skewed, 218 en vs 64 fr),
  weighted mean of ``n_chars``, Kish effective sample size
  ESS = (Σw)²/Σw², and the ESS/n design-effect ratio — the number
  that says whether a reweighted corpus estimate can be trusted
  (pairs with ``raking_ipf`` / ``neyman_allocation``).

Reference parity: no sketch/collocation/funnel surface in the
reference (SURVEY.md §2.A); declared north-star §2.B additions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..fns import spread
from .core import QuerySpec, rnd, t

_K = 256
_SHINGLE = 12
_BUCKET_SHIFT = 20  # 32-bit hash >> 20 -> 4096 buckets


def _kmv_distinct_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark's sequence(1, n) DESCENDS for n < 1 instead of returning
    # empty (DuckDB's generate_series is empty there) — filter short
    # texts first so both engines see identical shingle sets.
    # spread: ~n_chars 12-char shingles per doc are md5'd in the SCAN
    # stage (~5M hashes at sf0.1) — serial on a one-split source, the
    # winnowing-class pathology. No-op on a well-split corpus. The three
    # consumers of `dh` share ONE evaluation via ReuseExchange.
    d = spread(
        t(spark, sf_dir, "documents")
        .select("source", "text")
        .filter(F.length("text") >= _SHINGLE)
    )
    sh = d.select(
        "source",
        F.explode(
            F.sequence(F.lit(1), F.length("text") - (_SHINGLE - 1))
        ).alias("i"),
        "text",
    ).select(
        "source",
        F.expr(f"substring(text, i, {_SHINGLE})").alias("g"),
    )
    hashed = sh.select(
        "source",
        F.conv(F.substring(F.md5("g"), 1, 8), 16, 10)
        .cast("long")
        .alias("h"),
    )
    # two-phase distinct (the standard dedup cost), then everything
    # below runs on bucket- or k-grain inputs only.
    dh = hashed.groupBy("source", "h").agg(F.count(F.lit(1)).alias("_n"))
    exact = dh.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact")
    )
    buckets = dh.groupBy(
        "source", (F.col("h") / (1 << _BUCKET_SHIFT)).cast("long").alias("b")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    wb = W.partitionBy("source").orderBy("b").rowsBetween(
        W.unboundedPreceding, 0
    )
    cut = (
        buckets.withColumn("cum", F.sum("cnt").over(wb))
        .filter(F.col("cum") >= _K)
        .groupBy("source")
        .agg(F.min("b").alias("cutoff"))
    )
    survivors = dh.join(F.broadcast(cut), "source").filter(
        (F.col("h") / (1 << _BUCKET_SHIFT)).cast("long") <= F.col("cutoff")
    )
    ranked = survivors.withColumn(
        "rk", F.row_number().over(W.partitionBy("source").orderBy("h"))
    ).filter(F.col("rk") == _K)
    est = ranked.select(
        "source",
        (
            (_K - 1) / (F.col("h").cast("double") / F.lit(float(1 << 32)))
        ).alias("kmv_raw"),
    )
    return (
        exact.join(est, "source")
        .select(
            "source",
            "n_exact",
            rnd("kmv_raw", 2).alias("kmv_est"),
            rnd(
                F.abs(F.col("kmv_raw") - F.col("n_exact"))
                / F.col("n_exact"),
                4,
            ).alias("rel_err"),
        )
        .orderBy("source")
    )


_KMV_SQL = f"""
WITH sh AS (
  SELECT source, substr(text, CAST(i AS INT), {_SHINGLE}) AS g
  FROM (
    SELECT source, text,
           unnest(generate_series(1, length(text) - {_SHINGLE - 1})) AS i
    FROM documents
  )
), dh AS (
  SELECT source,
         CAST(('0x' || substring(md5(g), 1, 8)) AS BIGINT) AS h
  FROM sh GROUP BY 1, 2
), exact AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_exact FROM dh GROUP BY 1
), buckets AS (
  SELECT source, h // {1 << _BUCKET_SHIFT} AS b, count(*) AS cnt
  FROM dh GROUP BY 1, 2
), cum AS (
  SELECT source, b,
         sum(cnt) OVER (PARTITION BY source ORDER BY b
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM buckets
), cut AS (
  SELECT source, min(b) AS cutoff FROM cum WHERE cum >= {_K} GROUP BY 1
), survivors AS (
  SELECT d.source, d.h
  FROM dh d JOIN cut c ON d.source = c.source
  WHERE d.h // {1 << _BUCKET_SHIFT} <= c.cutoff
), ranked AS (
  SELECT source, h,
         row_number() OVER (PARTITION BY source ORDER BY h) AS rk
  FROM survivors
), est AS (
  SELECT source,
         ({_K} - 1) / (CAST(h AS DOUBLE) / {float(1 << 32)}) AS kmv_raw
  FROM ranked WHERE rk = {_K}
)
SELECT e.source, e.n_exact,
       floor(s.kmv_raw * 100 + 0.5) / 100 AS kmv_est,
       floor(abs(s.kmv_raw - e.n_exact) / e.n_exact * 10000 + 0.5) / 10000
         AS rel_err
FROM exact e JOIN est s ON e.source = s.source
ORDER BY e.source
"""


# --------------------------------------------------------------------------
# g2_collocations
# --------------------------------------------------------------------------

def _g2_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = d.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col("text")), r"\s+")).alias(
            "idx", "w1"
        ),
    ).filter(F.col("w1") != "")
    wd = W.partitionBy("doc_id").orderBy("idx")
    bi = toks.withColumn("w2", F.lead("w1").over(wd)).filter(
        F.col("w2").isNotNull()
    )
    pair = bi.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("double").alias("a")
    )
    left = bi.groupBy("w1").agg(F.count(F.lit(1)).cast("double").alias("c1"))
    right = bi.groupBy("w2").agg(F.count(F.lit(1)).cast("double").alias("c2"))
    tot = bi.agg(F.count(F.lit(1)).cast("double").alias("nn"))
    g = (
        pair.join(F.broadcast(left), "w1")
        .join(F.broadcast(right), "w2")
        .crossJoin(F.broadcast(tot))
    )
    bb = F.col("c1") - F.col("a")
    cc = F.col("c2") - F.col("a")
    dd = F.col("nn") - F.col("c1") - F.col("c2") + F.col("a")

    def term(o, e):
        return F.when(o > 0, o * F.log(o / e)).otherwise(0.0)

    ea = F.col("c1") * F.col("c2") / F.col("nn")
    eb = F.col("c1") * (F.col("nn") - F.col("c2")) / F.col("nn")
    ec = (F.col("nn") - F.col("c1")) * F.col("c2") / F.col("nn")
    ed = (F.col("nn") - F.col("c1")) * (F.col("nn") - F.col("c2")) / F.col(
        "nn"
    )
    g2 = 2 * (
        term(F.col("a"), ea) + term(bb, eb) + term(cc, ec) + term(dd, ed)
    )
    scored = g.withColumn("g29", F.floor(g2 * 1e9 + 0.5) / 1e9)
    return (
        scored.orderBy(
            F.col("g29").desc(), F.col("w1").asc(), F.col("w2").asc()
        )
        .limit(20)
        .select(
            "w1",
            "w2",
            F.col("a").cast("long").alias("n_pair"),
            rnd("g29", 6).alias("g2_llr"),
        )
        .orderBy(F.col("g2_llr").desc(), "w1", "w2")
    )


_G2_SQL = r"""
WITH d AS (
  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS l
  FROM documents
), toks0 AS (
  SELECT doc_id, unnest(l) AS w1,
         unnest(generate_series(1, len(l))) AS idx
  FROM d
), toks AS (
  SELECT * FROM toks0 WHERE w1 <> ''
), bi AS (
  SELECT w1, w2 FROM (
    SELECT doc_id, w1,
           lead(w1) OVER (PARTITION BY doc_id ORDER BY idx) AS w2
    FROM toks
  ) WHERE w2 IS NOT NULL
), pair AS (
  SELECT w1, w2, CAST(count(*) AS DOUBLE) AS a FROM bi GROUP BY 1, 2
), lft AS (
  SELECT w1, CAST(count(*) AS DOUBLE) AS c1 FROM bi GROUP BY 1
), rgt AS (
  SELECT w2, CAST(count(*) AS DOUBLE) AS c2 FROM bi GROUP BY 1
), tot AS (
  SELECT CAST(count(*) AS DOUBLE) AS nn FROM bi
), g AS (
  SELECT p.w1, p.w2, p.a, l.c1, r.c2, t.nn
  FROM pair p JOIN lft l ON p.w1 = l.w1
  JOIN rgt r ON p.w2 = r.w2
  CROSS JOIN tot t
), scored AS (
  SELECT w1, w2, a,
         floor(2 * (
             (CASE WHEN a > 0
               THEN a * ln(a / (c1 * c2 / nn)) ELSE 0.0 END)
           + (CASE WHEN c1 - a > 0
               THEN (c1 - a) * ln((c1 - a) / (c1 * (nn - c2) / nn))
               ELSE 0.0 END)
           + (CASE WHEN c2 - a > 0
               THEN (c2 - a) * ln((c2 - a) / ((nn - c1) * c2 / nn))
               ELSE 0.0 END)
           + (CASE WHEN nn - c1 - c2 + a > 0
               THEN (nn - c1 - c2 + a)
                    * ln((nn - c1 - c2 + a)
                         / ((nn - c1) * (nn - c2) / nn))
               ELSE 0.0 END)
         ) * 1e9 + 0.5) / 1e9 AS g29
  FROM g
)
SELECT w1, w2, CAST(a AS BIGINT) AS n_pair,
       floor(g29 * 1000000 + 0.5) / 1000000 AS g2_llr
FROM scored
ORDER BY g29 DESC, w1, w2
LIMIT 20
"""


# --------------------------------------------------------------------------
# funnel_within_window
# --------------------------------------------------------------------------

def _funnel_within_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    t1 = ev.filter(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("ts").alias("t1")
    )
    t2 = (
        ev.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter(
            (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 1 DAY"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    t3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter(
            (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t2") + F.expr("INTERVAL 1 DAY"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    a0 = ev.agg(
        F.count_distinct(F.col("user_id")).cast("long").alias("n_users")
    )
    a1 = t1.agg(F.count(F.lit(1)).cast("long").alias("n_signup"))
    a2 = t2.agg(F.count(F.lit(1)).cast("long").alias("n_click_1d"))
    a3 = t3.agg(F.count(F.lit(1)).cast("long").alias("n_purchase_1d"))
    return (
        a0.crossJoin(F.broadcast(a1))
        .crossJoin(F.broadcast(a2))
        .crossJoin(F.broadcast(a3))
        .select(
            "n_users",
            "n_signup",
            "n_click_1d",
            "n_purchase_1d",
            rnd(
                F.when(
                    F.col("n_signup") > 0,
                    F.col("n_click_1d").cast("double") / F.col("n_signup"),
                ),
                6,
            ).alias("click_rate"),
            rnd(
                F.when(
                    F.col("n_click_1d") > 0,
                    F.col("n_purchase_1d").cast("double")
                    / F.col("n_click_1d"),
                ),
                6,
            ).alias("purchase_rate"),
        )
    )


_FUNNEL_SQL = """
WITH t1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'signup' GROUP BY 1
), t2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'click'
    AND e.ts > t1.t1 AND e.ts <= t1.t1 + INTERVAL 1 DAY
  GROUP BY 1
), t3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = 'purchase'
    AND e.ts > t2.t2 AND e.ts <= t2.t2 + INTERVAL 1 DAY
  GROUP BY 1
)
SELECT (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events)
         AS n_users,
       (SELECT CAST(count(*) AS BIGINT) FROM t1) AS n_signup,
       (SELECT CAST(count(*) AS BIGINT) FROM t2) AS n_click_1d,
       (SELECT CAST(count(*) AS BIGINT) FROM t3) AS n_purchase_1d,
       floor(CASE WHEN (SELECT count(*) FROM t1) > 0
                  THEN CAST((SELECT count(*) FROM t2) AS DOUBLE)
                       / (SELECT count(*) FROM t1) END
             * 1000000 + 0.5) / 1000000 AS click_rate,
       floor(CASE WHEN (SELECT count(*) FROM t2) > 0
                  THEN CAST((SELECT count(*) FROM t3) AS DOUBLE)
                       / (SELECT count(*) FROM t2) END
             * 1000000 + 0.5) / 1000000 AS purchase_rate
"""


# --------------------------------------------------------------------------
# ess_weighted_estimate
# --------------------------------------------------------------------------

def _ess_weighted_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select("lang", "source", "n_chars")
    lang_n = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("double").alias("n_lang")
    )
    wdf = d.join(F.broadcast(lang_n), "lang").select(
        "source",
        F.col("n_chars").cast("double").alias("x"),
        (1.0 / F.col("n_lang")).alias("w"),
    )
    g = wdf.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("w").alias("sw"),
        F.sum(F.col("w") * F.col("w")).alias("sww"),
        F.sum(F.col("w") * F.col("x")).alias("swx"),
        F.avg("x").alias("raw_mean"),
    )
    ess = F.col("sw") * F.col("sw") / F.col("sww")
    return g.select(
        "source",
        "n",
        rnd("raw_mean", 6).alias("unweighted_mean"),
        rnd(F.col("swx") / F.col("sw"), 6).alias("weighted_mean"),
        rnd(ess, 4).alias("ess"),
        rnd(ess / F.col("n"), 6).alias("ess_ratio"),
    ).orderBy("source")


_ESS_SQL = """
WITH lang_n AS (
  SELECT lang, CAST(count(*) AS DOUBLE) AS n_lang
  FROM documents GROUP BY 1
), w AS (
  SELECT d.source, CAST(d.n_chars AS DOUBLE) AS x, 1.0 / l.n_lang AS w
  FROM documents d JOIN lang_n l ON d.lang = l.lang
), g AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n, sum(w) AS sw,
         sum(w * w) AS sww, sum(w * x) AS swx, avg(x) AS raw_mean
  FROM w GROUP BY 1
)
SELECT source, n,
       floor(raw_mean * 1000000 + 0.5) / 1000000 AS unweighted_mean,
       floor(swx / sw * 1000000 + 0.5) / 1000000 AS weighted_mean,
       floor(sw * sw / sww * 10000 + 0.5) / 10000 AS ess,
       floor(sw * sw / sww / n * 1000000 + 0.5) / 1000000 AS ess_ratio
FROM g
ORDER BY source
"""


QUERIES: dict[str, QuerySpec] = {
    "kmv_distinct_shingles": QuerySpec(
        _kmv_distinct_shingles,
        _KMV_SQL,
        "KMV bottom-k distinct sketch of 12-char shingles per source "
        "(bucket-histogram + refine order statistic, no corpus sort), "
        "exact contrast + relative error",
    ),
    "g2_collocations": QuerySpec(
        _g2_collocations,
        _G2_SQL,
        "Dunning log-likelihood-ratio collocations over adjacent "
        "bigrams (full 2x2 contingency, 9dp-quantized top-20)",
    ),
    "funnel_within_window": QuerySpec(
        _funnel_within_window,
        _FUNNEL_SQL,
        "Time-constrained funnel signup -> click (1d) -> purchase "
        "(1d) via min-timestamp cascade on the user grain",
    ),
    "ess_weighted_estimate": QuerySpec(
        _ess_weighted_estimate,
        _ESS_SQL,
        "Self-normalized importance weighting per source (lang-"
        "balancing weights): weighted mean, Kish ESS, ESS/n design "
        "effect",
    ),
}
