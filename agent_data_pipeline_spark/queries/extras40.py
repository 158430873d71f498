"""Round-7 sixth wave: nonparametric tests, association rules, and
classifier-evaluation kits.

* ``mann_whitney_u`` — two-sample Mann-Whitney U rank-sum test (Mann &
  Whitney 1947) comparing the ``l_quantity`` distribution of returned
  (``l_returnflag='R'``) vs never-returned (``'N'``) line items. The
  classic formulation ranks every row (a global sort); here the ranks
  are recovered from the VALUE GRAIN: ``l_quantity`` has ≤50 distinct
  values, so a groupBy to (value, per-group counts) followed by a
  cumulative window over ≤50 rows yields the exact tie-averaged ranks
  with a constant-size window no matter how many fact rows feed it —
  the 100 TB plan shuffles 50 rows, not 600 M. Tie-corrected normal
  approximation for the z score.
* ``assoc_rules_lift`` — market-basket association rules over orders
  (baskets) × part brands (items): support / confidence / lift
  (Agrawal et al. 1993), top-20 by lift. Brand lives on a 500-row dim
  ⇒ broadcast join; candidate pairs come from a self-equi-join on
  ``l_orderkey`` (bounded by lines-per-order, ~7) and aggregate onto
  the brand-pair grain (≤25² rows). lift = n_ab·n_baskets/(n_a·n_b)
  is a pure integer ratio — bit-identical across engines; the sort key
  rounds it first and tie-breaks on the (antecedent, consequent) key.
* ``threshold_sweep_pr`` — precision / recall / F1 sweep of the
  ``quality_score`` heuristic against the ``n_chars >= 300`` label over
  a 19-point threshold grid: a broadcast 19-row grid × one map-side
  combined aggregate at the threshold grain (the fact stream is read
  once; no shuffle wider than 19×counters). The score is the shared
  6dp-quantized quality heuristic, so threshold compares are
  engine-portable.
* ``conformal_intervals`` — split-conformal prediction intervals
  (Vovk et al. 2005; Lei et al. 2018): deterministic Knuth-hash split
  into train (60%) / calibration (20%) / test (20%); a per-priority
  mean model fit on train; the 95% conformal radius q̂ = the
  ⌈0.95·(n+1)⌉-th smallest absolute calibration residual, recovered on
  the residual VALUE GRAIN (groupBy 6dp residual + cumulative count)
  rather than a per-row global rank; empirical coverage + width
  reported on the held-out test split. Finite-sample guarantee
  coverage ≥ 0.95 regardless of model quality.

Reference parity: no statistics surface in the reference (SURVEY.md
§2.A — it delegates analytics to Postgres/Metabase); declared
north-star §2.B additions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..llmdata import textstats
from .core import QuerySpec, bounded_collect, rnd, t

_KNUTH = 2654435761


def _mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-free since round 12 (allowlist burn-down; was a global
    cumulative-count window over the value grain): ONE distributed
    hash aggregate collapses the facts to the bounded l_quantity
    value grain (integer domain, ≤ ~50 rows at any fact scale); the
    tie-averaged ranks and sufficient sums run driver-side over the
    collected grain. Exactness: every rank term is a multiple of 0.5
    with running sums far below 2^52, so the driver-side sums are
    bit-equal to the window form's in any order; the z expression
    mirrors the oracle op-for-op."""
    import math

    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("R", "N")
    )
    grain = li.groupBy("l_quantity").agg(
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("long")
        .alias("n1_v"),
        F.sum(F.when(F.col("l_returnflag") == "N", 1).otherwise(0))
        .cast("long")
        .alias("n2_v"),
    )
    rows = bounded_collect(
        grain.orderBy("l_quantity"),
        600,
        "l_quantity value grain (integer domain 1..50)",
    )
    n1 = n2 = tie_t = 0
    cum = 0
    r1 = 0.0
    for r in rows:
        a, b = int(r["n1_v"]), int(r["n2_v"])
        cnt = a + b
        avg_rank = cum + (cnt + 1) / 2.0
        r1 += a * avg_rank
        tie_t += cnt * cnt * cnt - cnt
        n1 += a
        n2 += b
        cum += cnt
    u = r1 - n1 * (n1 + 1) / 2.0
    auc = u / (n1 * n2)
    z = (r1 - n1 * (n1 + 1) / 2.0 - n1 * n2 / 2.0) / math.sqrt(
        n1 * n2 / 12.0
        * ((n1 + n2 + 1) - tie_t / ((n1 + n2) * (n1 + n2 - 1.0)))
    )

    def fl(x: float, s: float) -> float:
        return math.floor(x * s + 0.5) / s

    return spark.createDataFrame(
        [(n1, n2, fl(u, 100), fl(auc, 1e6), fl(z, 1e6))],
        "n1 BIGINT, n2 BIGINT, u_stat DOUBLE, auc DOUBLE, "
        "z_score DOUBLE",
    )


_MWU_SQL = """
WITH grain AS (
  SELECT l_quantity,
         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n1_v,
         CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS n2_v
  FROM lineitem WHERE l_returnflag IN ('R', 'N')
  GROUP BY l_quantity
), ranked AS (
  SELECT n1_v, n2_v, (n1_v + n2_v) AS cnt,
         COALESCE(sum(n1_v + n2_v) OVER (ORDER BY l_quantity
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM grain
), agg AS (
  SELECT CAST(sum(n1_v) AS BIGINT) AS n1,
         CAST(sum(n2_v) AS BIGINT) AS n2,
         sum(n1_v * (cum_before + (cnt + 1) / 2.0)) AS r1,
         sum(cnt * cnt * cnt - cnt) AS tie_t
  FROM ranked
)
SELECT n1, n2,
       floor((r1 - n1 * (n1 + 1) / 2.0) * 100 + 0.5) / 100 AS u_stat,
       floor((r1 - n1 * (n1 + 1) / 2.0) / (n1 * n2) * 1000000 + 0.5) / 1000000
         AS auc,
       floor((r1 - n1 * (n1 + 1) / 2.0 - n1 * n2 / 2.0)
             / sqrt(n1 * n2 / 12.0 * ((n1 + n2 + 1)
                    - tie_t / ((n1 + n2) * (n1 + n2 - 1.0))))
             * 1000000 + 0.5) / 1000000 AS z_score
FROM agg
"""

_RULE_MIN_PAIR = 5


def _assoc_rules_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    bi = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("l_orderkey", F.col("p_brand").alias("brand"))
        .distinct()
    )
    n_b = bi.agg(
        F.countDistinct("l_orderkey").cast("double").alias("n_b")
    )
    items = bi.groupBy("brand").agg(F.count(F.lit(1)).cast("long").alias("n_i"))
    a = bi.alias("a")
    b = bi.alias("b")
    pairs = (
        a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey")))
        .filter(F.col("a.brand") < F.col("b.brand"))
        .groupBy(
            F.col("a.brand").alias("b1"), F.col("b.brand").alias("b2")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
        .filter(F.col("n_ab") >= _RULE_MIN_PAIR)
    )
    directed = pairs.select(
        F.col("b1").alias("antecedent"), F.col("b2").alias("consequent"), "n_ab"
    ).unionAll(
        pairs.select(
            F.col("b2").alias("antecedent"),
            F.col("b1").alias("consequent"),
            "n_ab",
        )
    )
    ia = items.select(
        F.col("brand").alias("antecedent"), F.col("n_i").alias("n_a")
    )
    ic = items.select(
        F.col("brand").alias("consequent"), F.col("n_i").alias("n_c")
    )
    rules = (
        directed.join(F.broadcast(ia), "antecedent")
        .join(F.broadcast(ic), "consequent")
        .crossJoin(F.broadcast(n_b))
        .select(
            "antecedent",
            "consequent",
            "n_ab",
            rnd(F.col("n_ab") / F.col("n_b"), 6).alias("support"),
            rnd(F.col("n_ab") / F.col("n_a"), 6).alias("confidence"),
            rnd(
                F.col("n_ab") * F.col("n_b") / (F.col("n_a") * F.col("n_c")),
                6,
            ).alias("lift"),
        )
    )
    return rules.orderBy(
        F.col("lift").desc(), F.col("antecedent"), F.col("consequent")
    ).limit(20)


_RULES_SQL = f"""
WITH bi AS (
  SELECT DISTINCT l.l_orderkey, p.p_brand AS brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
), nb AS (
  SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS n_b FROM bi
), items AS (
  SELECT brand, CAST(count(*) AS BIGINT) AS n_i FROM bi GROUP BY brand
), pairs AS (
  SELECT a.brand AS b1, b.brand AS b2, CAST(count(*) AS BIGINT) AS n_ab
  FROM bi a JOIN bi b ON a.l_orderkey = b.l_orderkey AND a.brand < b.brand
  GROUP BY a.brand, b.brand
  HAVING count(*) >= {_RULE_MIN_PAIR}
), directed AS (
  SELECT b1 AS antecedent, b2 AS consequent, n_ab FROM pairs
  UNION ALL
  SELECT b2 AS antecedent, b1 AS consequent, n_ab FROM pairs
)
SELECT d.antecedent, d.consequent, d.n_ab,
       floor(d.n_ab / nb.n_b * 1000000 + 0.5) / 1000000 AS support,
       floor(d.n_ab / CAST(ia.n_i AS DOUBLE) * 1000000 + 0.5) / 1000000
         AS confidence,
       floor(d.n_ab * nb.n_b / (ia.n_i * CAST(ic.n_i AS DOUBLE))
             * 1000000 + 0.5) / 1000000 AS lift
FROM directed d
JOIN items ia ON d.antecedent = ia.brand
JOIN items ic ON d.consequent = ic.brand
CROSS JOIN nb
ORDER BY lift DESC, d.antecedent, d.consequent
LIMIT 20
"""


def _threshold_sweep_pr(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = textstats.with_text_stats(t(spark, sf_dir, "documents")).select(
        "quality_score", (F.col("n_chars") >= 300).alias("label")
    )
    grid = spark.range(1, 20).select(
        (F.col("id") / F.lit(20.0)).alias("th")
    )
    scored = d.crossJoin(F.broadcast(grid))
    agg = scored.groupBy("th").agg(
        F.sum(
            F.when((F.col("quality_score") >= F.col("th")) & F.col("label"), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("tp"),
        F.sum(
            F.when(
                (F.col("quality_score") >= F.col("th")) & ~F.col("label"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("fp"),
        F.sum(
            F.when((F.col("quality_score") < F.col("th")) & F.col("label"), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("fn"),
    )
    p = F.when(F.col("tp") + F.col("fp") > 0, F.col("tp") / (F.col("tp") + F.col("fp"))).otherwise(
        F.lit(0.0)
    )
    r = F.when(F.col("tp") + F.col("fn") > 0, F.col("tp") / (F.col("tp") + F.col("fn"))).otherwise(
        F.lit(0.0)
    )
    return (
        agg.select(
            rnd("th", 2).alias("th"),
            "tp",
            "fp",
            "fn",
            rnd(p, 6).alias("precision"),
            rnd(r, 6).alias("recall"),
            rnd(
                F.when(p + r > 0, 2 * p * r / (p + r)).otherwise(F.lit(0.0)), 6
            ).alias("f1"),
        )
        .orderBy("th")
    )


# the score-side CTE mirrors the shared quality heuristic used by every
# other textstats oracle (llmdata_q.py) — 6dp floor-quantized on BOTH
# engines so threshold compares are portable
_SWEEP_SQL = r"""
WITH s AS (
  SELECT CAST(length(text) AS BIGINT) AS n_chars_calc, n_chars,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
           AS n_distinct_tokens,
         CAST(len(list_filter(regexp_split_to_array(lower(text), '\s+'),
              x -> list_contains(['the','a','of','and','to','in','is','it'], x))) AS BIGINT)
           AS n_stop
  FROM documents
), q AS (
  SELECT (n_chars >= 300) AS label,
         floor((0.4 * least(n_chars_calc / 200.0, 1.0)
             + 0.3 * least(CASE WHEN n_tokens > 0
                                THEN n_stop / CAST(n_tokens AS DOUBLE) ELSE 0.0 END * 4, 1.0)
             + 0.3 * CASE WHEN n_tokens > 0
                          THEN n_distinct_tokens / CAST(n_tokens AS DOUBLE)
                          ELSE 0.0 END) * 1000000 + 0.5) / 1000000 AS quality_score
  FROM s
), grid AS (
  SELECT unnest(generate_series(1, 19)) / 20.0 AS th
), agg AS (
  SELECT th,
         CAST(sum(CASE WHEN quality_score >= th AND label THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(sum(CASE WHEN quality_score >= th AND NOT label THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(sum(CASE WHEN quality_score < th AND label THEN 1 ELSE 0 END) AS BIGINT) AS fn
  FROM q CROSS JOIN grid
  GROUP BY th
)
SELECT floor(th * 100 + 0.5) / 100 AS th, tp, fp, fn,
       floor((CASE WHEN tp + fp > 0 THEN tp / CAST(tp + fp AS DOUBLE) ELSE 0.0 END)
             * 1000000 + 0.5) / 1000000 AS precision,
       floor((CASE WHEN tp + fn > 0 THEN tp / CAST(tp + fn AS DOUBLE) ELSE 0.0 END)
             * 1000000 + 0.5) / 1000000 AS recall,
       floor((CASE WHEN (CASE WHEN tp + fp > 0 THEN tp / CAST(tp + fp AS DOUBLE) ELSE 0.0 END)
                      + (CASE WHEN tp + fn > 0 THEN tp / CAST(tp + fn AS DOUBLE) ELSE 0.0 END) > 0
                   THEN 2 * (CASE WHEN tp + fp > 0 THEN tp / CAST(tp + fp AS DOUBLE) ELSE 0.0 END)
                          * (CASE WHEN tp + fn > 0 THEN tp / CAST(tp + fn AS DOUBLE) ELSE 0.0 END)
                        / ((CASE WHEN tp + fp > 0 THEN tp / CAST(tp + fp AS DOUBLE) ELSE 0.0 END)
                           + (CASE WHEN tp + fn > 0 THEN tp / CAST(tp + fn AS DOUBLE) ELSE 0.0 END))
                   ELSE 0.0 END) * 1000000 + 0.5) / 1000000 AS f1
FROM agg
ORDER BY th
"""


def _conformal_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    bucket = F.pmod(
        F.pmod(F.col("o_orderkey"), F.lit(2**31)) * F.lit(_KNUTH), F.lit(1000)
    )
    o = o.withColumn("b", bucket)
    train = o.filter(F.col("b") < 600)
    calib = o.filter((F.col("b") >= 600) & (F.col("b") < 800))
    test = o.filter(F.col("b") >= 800)
    model = train.groupBy("o_orderpriority").agg(
        rnd(F.avg("o_totalprice"), 6).alias("pred")
    )
    resid = (
        calib.join(F.broadcast(model), "o_orderpriority")
        .select(rnd(F.abs(F.col("o_totalprice") - F.col("pred")), 6).alias("r"))
    )
    n_cal = resid.groupBy().agg(F.count(F.lit(1)).cast("long").alias("n_cal"))
    # conformal rank k = ceil(0.95 * (n_cal + 1)), capped at n_cal
    k = F.least(
        F.ceil(F.lit(0.95) * (F.col("n_cal") + 1)).cast("long"), F.col("n_cal")
    )
    grain = resid.groupBy("r").agg(F.count(F.lit(1)).cast("long").alias("c"))
    cum = grain.withColumn(
        "cum", F.sum("c").over(W.orderBy("r").rowsBetween(W.unboundedPreceding, 0))
    )
    q_hat = (
        cum.crossJoin(F.broadcast(n_cal.select(k.alias("k"))))
        .filter(F.col("cum") >= F.col("k"))
        .agg(F.min("r").alias("q_hat"))
    )
    tested = (
        test.join(F.broadcast(model), "o_orderpriority")
        .crossJoin(F.broadcast(q_hat))
        .select(
            F.when(
                F.abs(F.col("o_totalprice") - F.col("pred")) <= F.col("q_hat"), 1
            )
            .otherwise(0)
            .alias("cov"),
            "q_hat",
        )
    )
    return (
        tested.groupBy("q_hat")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            rnd(F.avg("cov"), 6).alias("coverage"),
        )
        .crossJoin(F.broadcast(n_cal))
        .select(
            "n_cal",
            "n_test",
            rnd("q_hat", 6).alias("q_hat"),
            "coverage",
            rnd(F.col("q_hat") * 2, 6).alias("avg_width"),
        )
    )


_CONFORMAL_SQL = f"""
WITH o AS (
  SELECT o_orderkey, o_orderpriority, o_totalprice,
         ((o_orderkey % 2147483648) * {_KNUTH}) % 1000 AS b
  FROM orders
), model AS (
  SELECT o_orderpriority,
         floor(avg(o_totalprice) * 1000000 + 0.5) / 1000000 AS pred
  FROM o WHERE b < 600 GROUP BY o_orderpriority
), resid AS (
  SELECT floor(abs(c.o_totalprice - m.pred) * 1000000 + 0.5) / 1000000 AS r
  FROM o c JOIN model m ON c.o_orderpriority = m.o_orderpriority
  WHERE c.b >= 600 AND c.b < 800
), ncal AS (
  SELECT CAST(count(*) AS BIGINT) AS n_cal,
         least(CAST(ceil(0.95 * (count(*) + 1)) AS BIGINT),
               CAST(count(*) AS BIGINT)) AS k
  FROM resid
), grain AS (
  SELECT r, CAST(count(*) AS BIGINT) AS c FROM resid GROUP BY r
), cum AS (
  SELECT r, sum(c) OVER (ORDER BY r
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM grain
), qhat AS (
  SELECT min(r) AS q_hat FROM cum CROSS JOIN ncal WHERE cum >= ncal.k
), tested AS (
  SELECT CASE WHEN abs(c.o_totalprice - m.pred) <= q.q_hat THEN 1 ELSE 0 END AS cov,
         q.q_hat
  FROM o c JOIN model m ON c.o_orderpriority = m.o_orderpriority
  CROSS JOIN qhat q
  WHERE c.b >= 800
)
SELECT n.n_cal, CAST(count(*) AS BIGINT) AS n_test,
       floor(t.q_hat * 1000000 + 0.5) / 1000000 AS q_hat,
       floor(avg(cov) * 1000000 + 0.5) / 1000000 AS coverage,
       floor(t.q_hat * 2 * 1000000 + 0.5) / 1000000 AS avg_width
FROM tested t CROSS JOIN ncal n
GROUP BY n.n_cal, t.q_hat
"""


QUERIES: dict[str, QuerySpec] = {
    "mann_whitney_u": QuerySpec(
        _mann_whitney_u,
        _MWU_SQL,
        "Mann-Whitney U rank-sum test (tie-corrected z) on the value "
        "grain — constant-size window regardless of fact rows",
    ),
    "assoc_rules_lift": QuerySpec(
        _assoc_rules_lift,
        _RULES_SQL,
        "Market-basket association rules (support/confidence/lift) over "
        "order baskets × part brands, top-20 by lift",
    ),
    "threshold_sweep_pr": QuerySpec(
        _threshold_sweep_pr,
        _SWEEP_SQL,
        "Precision/recall/F1 sweep of the quality-score heuristic over a "
        "19-point threshold grid (broadcast grid, one fact scan)",
    ),
    "conformal_intervals": QuerySpec(
        _conformal_intervals,
        _CONFORMAL_SQL,
        "Split-conformal 95% prediction intervals (hash-split "
        "train/calib/test, value-grain conformal quantile, held-out "
        "coverage)",
    ),
}
