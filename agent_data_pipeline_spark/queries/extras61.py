"""Round-8 second wave: embedding outlier detection, sequential
pattern mining, and robust (trimmed) aggregation.

* ``embedding_mahalanobis_outliers`` — per-label embedding outliers by
  diagonal Mahalanobis distance: per-(label, dim) mean/variance from
  one posexplode + hash agg (map-side partials collapse the d-fold
  fan-out to labels×d rows), z² = Σ_dim (v−μ)²/σ² per vector, top-5
  per label. The top-k is located WITHOUT a per-label window over the
  fact rows (10 labels over N vectors is the low-cardinality window
  trap): z² buckets by floor, a bucket-grain cumulative window finds
  the per-label cutoff bucket, and only the ≥-cutoff candidates are
  ranked — the bucket-histogram + refine pattern (median_ci /
  kmv_distinct_shingles), here for a top-k. Ranking uses the ROUNDED
  6dp z² with vec_id tie-break so engine ulp noise cannot flip ranks.
  The mislabeled/corrupt-vector screen of an embedding-store ingest.
* ``event_trigram_mining`` — sequential pattern mining: per-user
  event-type trigrams via two leads over (user, ts, event_id) — the
  window partition is the USER grain (bounded by per-user activity,
  the sessionization class, not a low-cardinality serialization) —
  counted globally, top-10 with (count desc, trigram asc) tie-break,
  plus each trigram's share of all trigram windows. The
  next-action-model / funnel-discovery primitive.
* ``trimmed_mean_by_segment`` — 10% two-sided trimmed mean of order
  value per market segment, EXACTLY, without sorting the fact table:
  cents-exact sums, k = floor(0.1·n) trimmed per side located by the
  bucket-histogram + refine pattern ($100 value buckets, cumulative
  bucket window per segment finds each side's boundary bucket, only
  the two boundary buckets' rows are ranked); trimmed mean =
  (S_total − S_low_k − S_high_k)/(n − 2k). With ties, any k rows
  realizing the k smallest values give the same sum, so the
  (x, o_orderkey) rank tie-break cannot change the result — the
  robust-location sibling of ``median_ci_order_stats``. Segments with
  n < 10 get k = 0: the cut/part frames are left-joined and coalesced
  to 0, so such a segment keeps its plain (untrimmed) mean on both
  engines instead of being dropped.

Reference parity: no outlier/sequence/robust-agg surface in the
reference (SURVEY.md §2.A); declared north-star §2.B additions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .core import QuerySpec, bounded_collect, rnd, t

_TOPK = 5


def _embedding_mahalanobis_outliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = (
        t(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            "label",
            F.posexplode("embedding").alias("dim", "v"),
        )
        .withColumn("v", F.col("v").cast("double"))
    )
    st = e.groupBy("label", "dim").agg(
        F.avg("v").alias("m"), F.var_samp("v").alias("s2")
    )
    term = F.when(
        F.col("s2") > 0,
        (F.col("v") - F.col("m")) * (F.col("v") - F.col("m")) / F.col("s2"),
    ).otherwise(F.lit(0.0))
    z = (
        e.join(st, ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(F.sum(term).alias("z2_raw"))
        .select("vec_id", "label", rnd("z2_raw", 6).alias("z2"))
    )
    zb = z.withColumn("b", F.floor("z2").cast("long"))
    bcnt = zb.groupBy("label", "b").agg(F.count(F.lit(1)).alias("cnt"))
    wb = W.partitionBy("label").orderBy(F.col("b").desc()).rowsBetween(
        W.unboundedPreceding, -1
    )
    cut = (
        bcnt.withColumn(
            "cum_before", F.coalesce(F.sum("cnt").over(wb), F.lit(0))
        )
        .filter(F.col("cum_before") < _TOPK)
        .groupBy("label")
        .agg(F.min("b").alias("cutoff"))
    )
    cand = zb.join(F.broadcast(cut), "label").filter(
        F.col("b") >= F.col("cutoff")
    )
    ranked = cand.withColumn(
        "outlier_rank",
        F.row_number().over(
            W.partitionBy("label").orderBy(
                F.col("z2").desc(), F.col("vec_id")
            )
        ),
    ).filter(F.col("outlier_rank") <= _TOPK)
    return ranked.select(
        "label",
        F.col("outlier_rank").cast("int").alias("outlier_rank"),
        "vec_id",
        "z2",
    ).orderBy("label", "outlier_rank")


_MAHAL_SQL = f"""
WITH e AS (
  SELECT vec_id, label,
         generate_subscripts(embedding, 1) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
), st AS (
  SELECT label, dim, avg(v) AS m, var_samp(v) AS s2
  FROM e GROUP BY 1, 2
), z AS (
  SELECT e.vec_id, e.label,
         floor(sum(CASE WHEN st.s2 > 0
                        THEN (e.v - st.m) * (e.v - st.m) / st.s2
                        ELSE 0.0 END) * 1000000 + 0.5) / 1000000 AS z2
  FROM e JOIN st ON e.label = st.label AND e.dim = st.dim
  GROUP BY 1, 2
)
SELECT label, CAST(rk AS INT) AS outlier_rank, vec_id, z2
FROM (
  SELECT label, vec_id, z2,
         row_number() OVER (PARTITION BY label
                            ORDER BY z2 DESC, vec_id) AS rk
  FROM z
) WHERE rk <= {_TOPK}
ORDER BY label, outlier_rank
"""


def _event_trigram_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL event_type is excluded up front on BOTH engines: Spark's
    # concat_ws skips NULL parts (2-part trigram) while the oracle's
    # '||' propagates NULL — filtering first keeps them in agreement
    # (ADVICE r8).
    ev = (
        t(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .filter(F.col("event_type").isNotNull())
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    tri = (
        ev.withColumn("e2", F.lead("event_type", 1).over(w))
        .withColumn("e3", F.lead("event_type", 2).over(w))
        .filter(F.col("e3").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "e2", "e3").alias("trigram")
        )
    )
    counted = tri.groupBy("trigram").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    # window-free top-10 (round-11 allowlist burn-down; was a global
    # row_number over the trigram grain): TakeOrderedAndProject picks
    # the 10 rows distributed — no single-partition sort — and the
    # rank is assigned driver-side over the collected 10-row frame
    # (the same deterministic (n desc, trigram) order the window used)
    total = counted.agg(F.sum("n").cast("double").alias("tot"))
    top = bounded_collect(
        counted.crossJoin(F.broadcast(total))
        .orderBy(F.col("n").desc(), F.col("trigram"))
        .limit(10),
        10,
        "top-10 trigrams",
    )
    import math

    rows = [
        (
            i + 1,
            r["trigram"],
            int(r["n"]),
            math.floor(r["n"] / r["tot"] * 1e6 + 0.5) / 1e6,
        )
        for i, r in enumerate(top)
    ]
    return spark.createDataFrame(
        rows, "rank INT, trigram STRING, n BIGINT, share DOUBLE"
    ).orderBy("rank")


_TRIGRAM_SQL = """
WITH tri AS (
  SELECT event_type || '>' || e2 || '>' || e3 AS trigram
  FROM (
    SELECT event_type,
           lead(event_type, 1) OVER w AS e2,
           lead(event_type, 2) OVER w AS e3
    FROM events
    WHERE event_type IS NOT NULL
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
  ) WHERE e3 IS NOT NULL
), counted AS (
  SELECT trigram, CAST(count(*) AS BIGINT) AS n FROM tri GROUP BY 1
), tot AS (
  SELECT CAST(sum(n) AS DOUBLE) AS tot FROM counted
)
SELECT CAST(rk AS INT) AS rank, trigram, n,
       floor(n / tot * 1000000 + 0.5) / 1000000 AS share
FROM (
  SELECT trigram, n, row_number() OVER (ORDER BY n DESC, trigram) AS rk
  FROM counted
), tot
WHERE rk <= 10
ORDER BY rank
"""


_TRIM = 0.1


def _trimmed_mean_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = t(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", "o_orderkey"
    )
    u = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).alias("cents"),
        "o_orderkey",
    )
    stats = u.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s_tot"),
    ).withColumn("k", F.floor(F.col("n") * _TRIM).cast("long"))
    bucketed = u.withColumn(
        "b", F.floor(F.col("cents") / 10000).cast("long")
    )
    bagg = bucketed.groupBy("seg", "b").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("cents").alias("s")
    )
    lo_w = W.partitionBy("seg").orderBy("b").rowsBetween(
        W.unboundedPreceding, -1
    )
    hi_w = W.partitionBy("seg").orderBy(F.col("b").desc()).rowsBetween(
        W.unboundedPreceding, -1
    )
    cum = (
        bagg.withColumn(
            "cum_lo", F.coalesce(F.sum("cnt").over(lo_w), F.lit(0))
        )
        .withColumn(
            "sum_lo", F.coalesce(F.sum("s").over(lo_w), F.lit(0))
        )
        .withColumn(
            "cum_hi", F.coalesce(F.sum("cnt").over(hi_w), F.lit(0))
        )
        .withColumn(
            "sum_hi", F.coalesce(F.sum("s").over(hi_w), F.lit(0))
        )
    )
    js = cum.join(F.broadcast(stats.select("seg", "k")), "seg")
    # boundary bucket per side: full buckets strictly before it are
    # wholly trimmed; the remainder comes from ranking ITS rows only
    lo_cut = js.filter(
        (F.col("cum_lo") < F.col("k"))
        & (F.col("k") <= F.col("cum_lo") + F.col("cnt"))
    ).select(
        "seg",
        F.col("b").alias("b_lo"),
        F.col("sum_lo").alias("full_lo"),
        (F.col("k") - F.col("cum_lo")).alias("take_lo"),
    )
    hi_cut = js.filter(
        (F.col("cum_hi") < F.col("k"))
        & (F.col("k") <= F.col("cum_hi") + F.col("cnt"))
    ).select(
        "seg",
        F.col("b").alias("b_hi"),
        F.col("sum_hi").alias("full_hi"),
        (F.col("k") - F.col("cum_hi")).alias("take_hi"),
    )
    lo_part = (
        bucketed.join(F.broadcast(lo_cut), "seg")
        .filter(F.col("b") == F.col("b_lo"))
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("seg").orderBy("cents", "o_orderkey")
            ),
        )
        .filter(F.col("rk") <= F.col("take_lo"))
        .groupBy("seg")
        .agg(F.sum("cents").alias("part_lo"))
    )
    hi_part = (
        bucketed.join(F.broadcast(hi_cut), "seg")
        .filter(F.col("b") == F.col("b_hi"))
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("seg").orderBy(
                    F.col("cents").desc(), F.col("o_orderkey").desc()
                )
            ),
        )
        .filter(F.col("rk") <= F.col("take_hi"))
        .groupBy("seg")
        .agg(F.sum("cents").alias("part_hi"))
    )
    # left joins + coalesce: with k = 0 (segment n < 10) the cut/part
    # frames match nothing — the trimmed sums collapse to 0 and the
    # result is the plain mean, exactly what the oracle's CASE computes
    # (ADVICE r8: inner joins silently dropped such segments).
    return (
        stats.join(lo_cut.select("seg", "full_lo"), "seg", "left")
        .join(hi_cut.select("seg", "full_hi"), "seg", "left")
        .join(lo_part, "seg", "left")
        .join(hi_part, "seg", "left")
        .select(
            "seg",
            F.col("n").cast("long").alias("n"),
            F.col("k").cast("long").alias("k_trimmed_each_side"),
            rnd(
                (
                    F.col("s_tot")
                    - F.coalesce(F.col("full_lo"), F.lit(0))
                    - F.coalesce(F.col("part_lo"), F.lit(0))
                    - F.coalesce(F.col("full_hi"), F.lit(0))
                    - F.coalesce(F.col("part_hi"), F.lit(0))
                ).cast("double")
                / 100.0
                / (F.col("n") - 2 * F.col("k")),
                6,
            ).alias("trimmed_mean"),
        )
        .orderBy("seg")
    )


_TRIMMED_SQL = f"""
WITH u AS (
  SELECT c.c_mktsegment AS seg,
         CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         o.o_orderkey
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), ranked AS (
  SELECT seg, cents,
         row_number() OVER (PARTITION BY seg
                            ORDER BY cents, o_orderkey) AS r,
         count(*) OVER (PARTITION BY seg) AS n
  FROM u
)
SELECT seg,
       CAST(max(n) AS BIGINT) AS n,
       CAST(floor(max(n) * {_TRIM}) AS BIGINT) AS k_trimmed_each_side,
       floor(sum(CASE WHEN r > floor(n * {_TRIM})
                       AND r <= n - floor(n * {_TRIM})
                      THEN CAST(cents AS DOUBLE) ELSE 0 END)
             / 100.0 / (max(n) - 2 * floor(max(n) * {_TRIM}))
             * 1000000 + 0.5) / 1000000 AS trimmed_mean
FROM ranked
GROUP BY seg
ORDER BY seg
"""


QUERIES: dict[str, QuerySpec] = {
    "embedding_mahalanobis_outliers": QuerySpec(
        _embedding_mahalanobis_outliers,
        _MAHAL_SQL,
        "Top-5 per-label embedding outliers by diagonal Mahalanobis "
        "z² located via bucket-histogram + refine (no per-label window "
        "over fact rows); ranks on rounded z² with vec_id tie-break",
    ),
    "event_trigram_mining": QuerySpec(
        _event_trigram_mining,
        _TRIGRAM_SQL,
        "Top-10 per-user event-type trigrams (two leads on the user "
        "grain) with global counts and share",
    ),
    "trimmed_mean_by_segment": QuerySpec(
        _trimmed_mean_by_segment,
        _TRIMMED_SQL,
        "Exact 10% two-sided trimmed mean of order value per segment "
        "via cents-exact sums and bucket-histogram + refine boundary "
        "location — no fact-table sort",
    ),
}
