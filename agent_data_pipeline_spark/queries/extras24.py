"""Round-4 surface additions, part 19: growth rates and fulfillment
latency.

`mom_yoy_growth` is the BI staple: monthly revenue with
month-over-month and year-over-year growth per nation (lag 1 and lag
12 over the month series). `ship_latency_percentiles` measures
order-to-ship latency (days between order date and line ship date)
with exact percentile_cont p50/p90 per order priority.

Determinism: revenue is exact cents; growth rates are single divisions
rounded at 6; latencies are integer days, and percentile_cont over
integers interpolates with one multiply+add both engines execute
identically (midpoint halves are exact in binary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import QuerySpec, rnd, t


def _mom_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue per nation with MoM and YoY growth: lag(1) and
    lag(12) over the contiguous month index (missing months would
    misalign a pure row lag — the fixture's months are dense, and the
    month-index key makes the contract explicit). Growth = cur/prev − 1,
    null when no prior month. Windows run at (nation, month) grain."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    monthly = (
        o.join(F.broadcast(c.select("c_custkey", "c_nationkey")),
               o.o_custkey == c.c_custkey)
        .join(F.broadcast(n.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "n_name",
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        )
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            ).alias("cents")
        )
    )
    w = Window.partitionBy("n_name").orderBy("month")
    prev_m = F.lag("cents", 1).over(w)
    prev_y = F.lag("cents", 12).over(w)
    return monthly.select(
        "n_name",
        "month",
        "cents",
        rnd(F.col("cents") / prev_m - 1.0, 6).alias("mom_growth"),
        rnd(F.col("cents") / prev_y - 1.0, 6).alias("yoy_growth"),
    ).orderBy("n_name", "month")


_MOM_YOY_SQL = """
WITH monthly AS (
  SELECT n.n_name, strftime(o.o_orderdate, '%Y-%m') AS month,
         CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
)
SELECT n_name, month, cents,
       floor((cents / CAST(lag(cents, 1) OVER w AS DOUBLE) - 1.0)
             * 1000000 + 0.5) / 1000000 AS mom_growth,
       floor((cents / CAST(lag(cents, 12) OVER w AS DOUBLE) - 1.0)
             * 1000000 + 0.5) / 1000000 AS yoy_growth
FROM monthly
WINDOW w AS (PARTITION BY n_name ORDER BY month)
ORDER BY n_name, month
"""


def _ship_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency (integer days) per order priority: count,
    mean, exact percentile_cont p50/p90.

    Counting-sort percentiles, NOT Spark's `percentile()` aggregate:
    exact percentile buffers every value in per-group state, and with
    only 5 priority groups that serializes the fact table into 5 giant
    buffers (measured 4.7× at 10× — the low-cardinality trap again).
    Integer day latencies live in a tiny domain, so the exact same
    number comes from the (priority, days) histogram: cumulative counts
    locate the floor/ceil order statistics at rank q·(n−1) and one
    interpolation blends them. The histogram is a few hundred rows —
    windows over it are free at any corpus size."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    lat = li.join(
        o.select("o_orderkey", "o_orderdate", "o_orderpriority"),
        li.l_orderkey == F.col("o_orderkey"),
    ).select(
        "o_orderpriority",
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
        .cast("long")
        .alias("days"),
    )
    hist = lat.groupBy("o_orderpriority", "days").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wp = Window.partitionBy("o_orderpriority")
    wc = wp.orderBy("days").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        hist.withColumn("cum", F.sum("cnt").over(wc))
        .withColumn("n", F.sum("cnt").over(wp))
        .withColumn("s", F.sum(F.col("days") * F.col("cnt")).over(wp))
    )

    def pct(q: float, name: str):
        tgt = F.lit(q) * (F.col("n") - 1)
        lo = F.min(
            F.when(F.col("cum") >= F.floor(tgt) + 1, F.col("days"))
        )
        hi = F.min(
            F.when(F.col("cum") >= F.ceil(tgt) + 1, F.col("days"))
        )
        frac = F.first(tgt - F.floor(tgt))
        return rnd(lo + frac * (hi - lo), 4).alias(name)

    return (
        cum.groupBy("o_orderpriority")
        .agg(
            F.min("n").alias("n_lines"),
            rnd(F.min("s") / F.min("n"), 4).alias("avg_days"),
            pct(0.5, "p50_days"),
            pct(0.9, "p90_days"),
        )
        .orderBy("o_orderpriority")
    )


_SHIP_LATENCY_SQL = """
WITH lat AS (
  SELECT o.o_orderpriority,
         CAST(datediff('day', CAST(o.o_orderdate AS DATE),
                       CAST(l.l_shipdate AS DATE)) AS BIGINT) AS days
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_lines,
       floor(avg(days) * 10000 + 0.5) / 10000 AS avg_days,
       floor(CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY days) AS DOUBLE)
             * 10000 + 0.5) / 10000 AS p50_days,
       floor(CAST(percentile_cont(0.9) WITHIN GROUP (ORDER BY days) AS DOUBLE)
             * 10000 + 0.5) / 10000 AS p90_days
FROM lat
GROUP BY 1 ORDER BY o_orderpriority
"""


QUERIES: dict[str, QuerySpec] = {
    "mom_yoy_growth": QuerySpec(
        _mom_yoy_growth,
        _MOM_YOY_SQL,
        "monthly revenue with MoM and YoY growth per nation",
    ),
    "ship_latency_percentiles": QuerySpec(
        _ship_latency_percentiles,
        _SHIP_LATENCY_SQL,
        "order-to-ship latency: exact p50/p90 per priority",
    ),
}
