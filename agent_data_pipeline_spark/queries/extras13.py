"""Round-4 surface additions, part 8: warehouse conformance patterns and
seasonality/integrity audits.

`rank_ties_topk` is the tie-inclusive top-k (dense_rank) that LIMIT
cannot express; `late_dim_fallback` is the late-arriving-dimension
pattern (left join + UNKNOWN member) every conformed-dimension load
needs; `rolling_zscore` is the trailing-window anomaly score;
`checksum_partition_audit` is a per-partition content-fixity checksum
(the cheap "did this partition change?" signal incremental pipelines
compare run-over-run); `dow_seasonality` is the weekday-by-hour
activity heatmap.

Determinism: ranks/counts/checksums are integers; the z-score rounds
off-grid float noise at 6 decimals after identical per-engine window
arithmetic on identical inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import QuerySpec, rnd, t


# --------------------------------------------------------------------------
# rank_ties_topk — tie-inclusive top-k via dense_rank
# --------------------------------------------------------------------------


def _rank_ties_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 part SIZES per brand, ties included: dense_rank over the
    distinct (brand, size) aggregate — the semantics LIMIT/row_number
    cannot give (every part at a winning size is kept). Integer keys
    and counts throughout; window partitions on the brand."""
    p = t(spark, sf_dir, "part")
    per = p.groupBy("p_brand", "p_size").agg(F.count(F.lit(1)).alias("n_parts"))
    w = Window.partitionBy("p_brand").orderBy(F.col("p_size").desc())
    return (
        per.withColumn("size_rank", F.dense_rank().over(w).cast("long"))
        .filter(F.col("size_rank") <= 2)
        .orderBy("p_brand", "size_rank", "p_size")
    )


_RANK_TIES_SQL = """
WITH per AS (
  SELECT p_brand, p_size, CAST(count(*) AS BIGINT) AS n_parts
  FROM part GROUP BY p_brand, p_size
)
SELECT p_brand, p_size, n_parts,
       CAST(dense_rank() OVER (PARTITION BY p_brand ORDER BY p_size DESC)
            AS BIGINT) AS size_rank
FROM per
QUALIFY size_rank <= 2
ORDER BY p_brand, size_rank, p_size
"""


# --------------------------------------------------------------------------
# late_dim_fallback — late-arriving dimension with UNKNOWN member
# --------------------------------------------------------------------------


def _late_dim_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-arriving-dimension conformance: facts whose dimension row
    has not landed yet (simulated: every 10th part key withheld) roll
    up under the UNKNOWN member instead of being dropped or failing the
    load — left join + coalesce, the standard warehouse contract. The
    dim side stays broadcast-able; per-brand match/fallback counts
    prove no fact was lost."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_partkey") % 10 != 0)
    joined = li.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        li.l_partkey == part.p_partkey,
        "left",
    )
    return (
        joined.groupBy(
            F.coalesce(F.col("p_brand"), F.lit("UNKNOWN")).alias("brand")
        )
        .agg(
            F.count(F.lit(1)).alias("n_facts"),
            F.count("p_partkey").alias("n_matched"),
            rnd(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
        .orderBy("brand")
    )


_LATE_DIM_SQL = """
SELECT coalesce(p.p_brand, 'UNKNOWN') AS brand,
       CAST(count(*) AS BIGINT) AS n_facts,
       CAST(count(p.p_partkey) AS BIGINT) AS n_matched,
       floor(sum(l.l_extendedprice) * 100 + 0.5) / 100 AS sum_price
FROM lineitem l
LEFT JOIN (SELECT p_partkey, p_brand FROM part WHERE p_partkey % 10 != 0) p
  ON l.l_partkey = p.p_partkey
GROUP BY 1 ORDER BY brand
"""


# --------------------------------------------------------------------------
# rolling_zscore — trailing-window anomaly score
# --------------------------------------------------------------------------


def _rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing anomaly score per event type: daily event counts, then
    each day's z-score against its OWN trailing 7-day window (ROWS 6
    PRECEDING). Counts are exact integers, so the rolling mean is a
    single division and stddev_samp sees identical inputs in identical
    order on both engines; the score rounds libm/accumulation ulp at 6
    decimals. Flags |z| > 2. One shuffle on the type key; the window
    frame is O(7) per row."""
    e = t(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            "event_type",
            F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, 0)
    )
    mean = F.avg("n").over(w)
    sd = F.stddev_samp("n").over(w)
    z = F.when(sd > 0, (F.col("n") - mean) / sd)
    return daily.select(
        "event_type",
        "day",
        "n",
        rnd(z, 6).alias("z"),
        F.when(F.abs(z) > 2, F.lit(1)).otherwise(F.lit(0)).cast("long").alias(
            "is_anomaly"
        ),
    ).orderBy("event_type", "day")


_ROLLING_ZSCORE_SQL = """
WITH daily AS (
  SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), win AS (
  SELECT event_type, day, n,
         avg(n) OVER w AS mean,
         stddev_samp(n) OVER w AS sd
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT event_type, day, n,
       CASE WHEN sd > 0
            THEN floor((n - mean) / sd * 1000000 + 0.5) / 1000000 END AS z,
       CAST(CASE WHEN sd > 0 AND abs((n - mean) / sd) > 2
                 THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
FROM win
ORDER BY event_type, day
"""


# --------------------------------------------------------------------------
# checksum_partition_audit — per-partition content fixity
# --------------------------------------------------------------------------


def _checksum_partition_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition content checksum (fixity audit): md5 each order's
    canonical serialization, take the first 8 hex digits as a BIGINT,
    and sum per order-year partition — the run-over-run comparison that
    tells an incremental pipeline which partitions actually changed
    without re-reading last run's data. Order-insensitive by
    construction (sum of per-row digests), all integer."""
    o = t(spark, sf_dir, "orders")
    serial = F.concat_ws(
        "|",
        F.col("o_orderkey"),
        F.col("o_custkey"),
        F.col("o_orderstatus"),
        F.col("o_totalprice"),
    )
    digest = F.conv(F.substring(F.md5(serial), 1, 8), 16, 10).cast("long")
    return (
        o.select(
            F.year("o_orderdate").cast("long").alias("y"),
            digest.alias("d8"),
        )
        .groupBy("y")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("d8").alias("checksum"),
        )
        .orderBy("y")
    )


_CHECKSUM_SQL = """
SELECT year(o_orderdate) AS y,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(('0x' || substring(
              md5(concat_ws('|', o_orderkey, o_custkey, o_orderstatus,
                            o_totalprice)), 1, 8)) AS BIGINT)) AS BIGINT)
         AS checksum
FROM orders
GROUP BY 1 ORDER BY y
"""


# --------------------------------------------------------------------------
# dow_seasonality — weekday × hour activity heatmap
# --------------------------------------------------------------------------


def _dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday-by-hour activity heatmap over events: counts per
    (day-name, hour) cell plus each cell's share of its weekday —
    the seasonality profile load-shedding and anomaly baselines start
    from. Day names via the locale-stable short format ('Mon'),
    identical in both engines; shares are single divisions of exact
    counts."""
    e = t(spark, sf_dir, "events")
    cells = (
        e.groupBy(
            F.date_format("ts", "EEE").alias("dow"),
            F.hour("ts").cast("long").alias("hod"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("dow")
    return (
        cells.withColumn("dow_share", rnd(F.col("n") / F.sum("n").over(w), 6))
        .orderBy("dow", "hod")
    )


_DOW_SEASONALITY_SQL = """
WITH cells AS (
  SELECT strftime(ts, '%a') AS dow,
         CAST(hour(ts) AS BIGINT) AS hod,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT dow, hod, n,
       floor(n / sum(n) OVER (PARTITION BY dow) * 1000000 + 0.5) / 1000000
         AS dow_share
FROM cells
ORDER BY dow, hod
"""


QUERIES: dict[str, QuerySpec] = {
    "rank_ties_topk": QuerySpec(
        _rank_ties_topk,
        _RANK_TIES_SQL,
        "tie-inclusive top-k via dense_rank (beyond LIMIT semantics)",
    ),
    "late_dim_fallback": QuerySpec(
        _late_dim_fallback,
        _LATE_DIM_SQL,
        "late-arriving dimension: left join + UNKNOWN member rollup",
    ),
    "rolling_zscore": QuerySpec(
        _rolling_zscore,
        _ROLLING_ZSCORE_SQL,
        "trailing 7-day window z-score anomaly flags per event type",
    ),
    "checksum_partition_audit": QuerySpec(
        _checksum_partition_audit,
        _CHECKSUM_SQL,
        "per-partition md5-prefix fixity checksum (change detection)",
    ),
    "dow_seasonality": QuerySpec(
        _dow_seasonality,
        _DOW_SEASONALITY_SQL,
        "weekday-by-hour activity heatmap with per-weekday shares",
    ),
}
