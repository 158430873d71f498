"""Round-4 surface additions, part 18: time-series decomposition,
changepoint detection, and cross-table consistency audit.

`seasonal_decomposition` is the additive STL-lite split every metrics
pipeline runs: daily series → centered 7-day trend → day-of-week
seasonal component → residual. `cusum_changepoint` detects the level
shift in a series as the argmax of |cumulative deviation from the
mean| (classic CUSUM). `order_consistency_audit` checks that a parent
order's lineitem statuses agree with the order status (the
denormalization-drift audit run after every backfill).

Determinism: daily counts are exact integers; trend frames sum ≤7
exact ints (division deterministic); the CUSUM running sum adds
identical doubles in identical window order on both engines; the
changepoint argmax ranks by (rounded |cusum| desc, day) — total order.

Scale notes (100 TB): everything aggregates to (type, day) or
(order, status-set) grain before any window; frames are O(7); CUSUM is
one ordered pass per series key. The consistency audit is one
fact-side aggregate joined to the order dim on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import QuerySpec, rnd, t


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    return e.groupBy(
        "event_type",
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
    ).agg(F.count(F.lit(1)).alias("n"))


# --------------------------------------------------------------------------
# seasonal_decomposition — additive trend / seasonal / residual split
# --------------------------------------------------------------------------


def _seasonal_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive decomposition of daily event counts per type: trend =
    centered 7-day average (partial frames at the edges, same on both
    engines), seasonal = per-(type, weekday) mean detrended residual,
    residual = n − trend − seasonal. Emits the last 28 days per type
    (bounded output), all components rounded at 6."""
    daily = _daily(spark, sf_dir)
    wt = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    trended = daily.withColumn("trend", F.avg("n").over(wt)).withColumn(
        "dow", F.date_format(F.to_date("day"), "E")
    )
    seasonal = trended.groupBy("event_type", "dow").agg(
        F.avg(F.col("n") - F.col("trend")).alias("seas_raw")
    )
    joined = trended.join(F.broadcast(seasonal), ["event_type", "dow"])
    wr = Window.partitionBy("event_type").orderBy(F.col("day").desc())
    return (
        joined.withColumn("_rk", F.row_number().over(wr))
        .filter(F.col("_rk") <= 28)
        .select(
            "event_type",
            "day",
            "n",
            rnd(F.col("trend"), 6).alias("trend"),
            rnd(F.col("seas_raw"), 6).alias("seasonal"),
            rnd(
                F.col("n") - F.col("trend") - F.col("seas_raw"), 6
            ).alias("residual"),
        )
        .orderBy("event_type", "day")
    )


_SEASONAL_SQL = """
WITH daily AS (
  SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), trended AS (
  SELECT event_type, day, n,
         avg(n) OVER (PARTITION BY event_type ORDER BY day
                      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS trend,
         strftime(CAST(day AS DATE), '%a') AS dow
  FROM daily
), seasonal AS (
  SELECT event_type, dow, avg(n - trend) AS seas_raw
  FROM trended GROUP BY 1, 2
), joined AS (
  SELECT t.*, s.seas_raw,
         row_number() OVER (PARTITION BY t.event_type ORDER BY t.day DESC)
           AS rk
  FROM trended t JOIN seasonal s USING (event_type, dow)
)
SELECT event_type, day, n,
       floor(trend * 1000000 + 0.5) / 1000000 AS trend,
       floor(seas_raw * 1000000 + 0.5) / 1000000 AS seasonal,
       floor((n - trend - seas_raw) * 1000000 + 0.5) / 1000000 AS residual
FROM joined
WHERE rk <= 28
ORDER BY event_type, day
"""


# --------------------------------------------------------------------------
# cusum_changepoint — level-shift detection via cumulative deviation
# --------------------------------------------------------------------------


def _cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint per event type: the day where |Σ (n_i − mean)|
    peaks is the most likely level shift. The running sum adds the same
    doubles in the same day order on both engines; the argmax ranks by
    (|cusum| rounded at 6 desc, day asc)."""
    daily = _daily(spark, sf_dir)
    stats = daily.groupBy("event_type").agg(
        F.sum("n").alias("tot"), F.count(F.lit(1)).alias("n_days")
    )
    j = daily.join(F.broadcast(stats), "event_type").withColumn(
        "dev", F.col("n") - F.col("tot") / F.col("n_days")
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cus = j.withColumn(
        "abs_cusum", rnd(F.abs(F.sum("dev").over(wc)), 6)
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.col("abs_cusum").desc(), F.col("day")
    )
    return (
        cus.withColumn("_rk", F.row_number().over(wr))
        .filter(F.col("_rk") == 1)
        .select(
            "event_type",
            F.col("day").alias("changepoint_day"),
            "abs_cusum",
            "n_days",
        )
        .orderBy("event_type")
    )


_CUSUM_SQL = """
WITH daily AS (
  SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), stats AS (
  SELECT event_type, CAST(sum(n) AS BIGINT) AS tot,
         CAST(count(*) AS BIGINT) AS n_days
  FROM daily GROUP BY 1
), cus AS (
  SELECT d.event_type, d.day, s.n_days,
         floor(abs(sum(d.n - s.tot / CAST(s.n_days AS DOUBLE))
               OVER (PARTITION BY d.event_type ORDER BY d.day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
               * 1000000 + 0.5) / 1000000 AS abs_cusum
  FROM daily d JOIN stats s USING (event_type)
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
              ORDER BY abs_cusum DESC, day) AS rk
  FROM cus
)
SELECT event_type, day AS changepoint_day, abs_cusum, n_days
FROM ranked WHERE rk = 1
ORDER BY event_type
"""


# --------------------------------------------------------------------------
# order_consistency_audit — parent/child status drift
# --------------------------------------------------------------------------


def _order_consistency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Denormalization-drift audit: per order status, how many orders
    have lineitems whose statuses are uniform vs mixed, and how many
    have at least one returned item. One fact aggregate on the order
    key, then a key join to the order dim."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_linestatus").alias("n_status"),
        F.max(
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
        ).alias("has_return"),
    )
    j = o.join(
        per_order, o.o_orderkey == per_order.l_orderkey, "left"
    )
    return (
        j.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count_if(F.col("n_status") == 1).alias("n_uniform"),
            F.count_if(F.col("n_status") > 1).alias("n_mixed"),
            F.count_if(F.col("has_return") == 1).alias("n_with_returns"),
            F.count_if(F.col("n_status").isNull()).alias("n_childless"),
        )
        .orderBy("o_orderstatus")
    )


_ORDER_AUDIT_SQL = """
WITH per_order AS (
  SELECT l_orderkey,
         CAST(count(DISTINCT l_linestatus) AS BIGINT) AS n_status,
         max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_return
  FROM lineitem GROUP BY 1
)
SELECT o.o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(count(*) FILTER (WHERE p.n_status = 1) AS BIGINT) AS n_uniform,
       CAST(count(*) FILTER (WHERE p.n_status > 1) AS BIGINT) AS n_mixed,
       CAST(count(*) FILTER (WHERE p.has_return = 1) AS BIGINT)
         AS n_with_returns,
       CAST(count(*) FILTER (WHERE p.n_status IS NULL) AS BIGINT)
         AS n_childless
FROM orders o
LEFT JOIN per_order p ON o.o_orderkey = p.l_orderkey
GROUP BY 1 ORDER BY o.o_orderstatus
"""


QUERIES: dict[str, QuerySpec] = {
    "seasonal_decomposition": QuerySpec(
        _seasonal_decomposition,
        _SEASONAL_SQL,
        "additive STL-lite: 7-day trend, weekday seasonal, residual",
    ),
    "cusum_changepoint": QuerySpec(
        _cusum_changepoint,
        _CUSUM_SQL,
        "CUSUM level-shift detection per series key",
    ),
    "order_consistency_audit": QuerySpec(
        _order_consistency_audit,
        _ORDER_AUDIT_SQL,
        "parent/child status drift audit (uniform vs mixed lineitems)",
    ),
}
