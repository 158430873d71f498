"""Round-7 twenty-third wave: bitwise aggregate surface and
business-day arithmetic.

* ``bitwise_kit`` — the bitwise aggregate family (BIT_AND / BIT_OR /
  BIT_XOR + BIT_COUNT + shifts) exercised end-to-end over derived
  8-bit event codes grouped into 16 hash buckets: the permission-
  mask / feature-flag rollup surface every warehouse eventually
  needs. Pure JVM expressions; two-phase hash aggregate (bitwise
  aggs combine associatively, so the map side pre-folds).
* ``business_days_kit`` — business-day arithmetic WITHOUT engine
  dow() conventions (Spark's dayofweek is 1=Sunday, DuckDB's is
  0=Sunday — the classic cross-engine trap): day indices from the
  epoch anchor 1995-01-01 (a Sunday), weekday = idx % 7, and the
  closed-form prefix count B(d) = 5·(d div 7) + clamp(d mod 7 − 1,
  0, 5) of business days before day d — all integer arithmetic that
  is identical in any engine and any session timezone. Reports the
  order→ship business-day latency distribution per priority.

Reference parity: no bitwise/business-calendar surface in the
reference (SURVEY.md §2.A); declared §2.B scalar-surface widening.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core import QuerySpec, rnd, t


def _bitwise_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        (F.col("user_id") % 16).cast("long").alias("g"),
        (F.col("event_id") % 256).cast("long").alias("v"),
    )
    return (
        ev.groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.expr("bit_and(v)").alias("band"),
            F.expr("bit_or(v)").alias("bor"),
            F.expr("bit_xor(v)").alias("bxor"),
            F.sum(F.bit_count(F.col("v"))).cast("long").alias("total_bits"),
            F.max(F.shiftleft(F.col("v"), 2) % 1024).alias("max_shl2"),
        )
        .orderBy("g")
    )


_BITWISE_SQL = """
WITH ev AS (
  SELECT user_id % 16 AS g, event_id % 256 AS v FROM events
)
SELECT g, CAST(count(*) AS BIGINT) AS n,
       CAST(bit_and(v) AS BIGINT) AS band,
       CAST(bit_or(v) AS BIGINT) AS bor,
       CAST(bit_xor(v) AS BIGINT) AS bxor,
       CAST(sum(bit_count(v)) AS BIGINT) AS total_bits,
       CAST(max((v << 2) % 1024) AS BIGINT) AS max_shl2
FROM ev
GROUP BY g
ORDER BY g
"""


# --------------------------------------------------------------------------
# business_days_kit
# --------------------------------------------------------------------------

def _bdays_before(idx):
    """Closed-form count of business days in [epoch, idx) where the
    epoch anchor (1995-01-01) is a Sunday: full weeks contribute 5,
    the partial week's r = idx % 7 days {Sun, Mon, ...} contribute
    clamp(r - 1, 0, 5)."""
    return 5 * F.floor(idx / 7) + F.least(
        F.greatest(idx % 7 - 1, F.lit(0)), F.lit(5)
    )


def _business_days_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", F.to_date("o_orderdate").alias("od")
    )
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("sd")
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_orderpriority",
        F.datediff(F.col("od"), F.lit("1995-01-01")).alias("oi"),
        F.datediff(F.col("sd"), F.lit("1995-01-01")).alias("si"),
    )
    bdays = _bdays_before(F.col("si")) - _bdays_before(F.col("oi"))
    g = j.select("o_orderpriority", bdays.alias("bd")).groupBy(
        "o_orderpriority"
    )
    return (
        g.agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            rnd(F.avg("bd"), 4).alias("avg_business_days"),
            F.min("bd").cast("long").alias("min_bd"),
            F.max("bd").cast("long").alias("max_bd"),
            F.sum((F.col("bd") <= 5).cast("long")).alias("n_within_5bd"),
        )
        .orderBy("o_orderpriority")
    )


_BDAYS_SQL = """
WITH j AS (
  SELECT o.o_orderpriority,
         datediff('day', DATE '1995-01-01', CAST(o.o_orderdate AS DATE))
           AS oi,
         datediff('day', DATE '1995-01-01', CAST(l.l_shipdate AS DATE))
           AS si
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), b AS (
  SELECT o_orderpriority,
         (5 * (si // 7) + least(greatest(si % 7 - 1, 0), 5))
         - (5 * (oi // 7) + least(greatest(oi % 7 - 1, 0), 5)) AS bd
  FROM j
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_lines,
       floor(avg(bd) * 10000 + 0.5) / 10000 AS avg_business_days,
       CAST(min(bd) AS BIGINT) AS min_bd,
       CAST(max(bd) AS BIGINT) AS max_bd,
       CAST(sum(CASE WHEN bd <= 5 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_within_5bd
FROM b
GROUP BY 1
ORDER BY 1
"""


QUERIES: dict[str, QuerySpec] = {
    "bitwise_kit": QuerySpec(
        _bitwise_kit,
        _BITWISE_SQL,
        "BIT_AND/OR/XOR aggregates + bit_count + shifts over 8-bit "
        "event codes in 16 hash buckets (mask-rollup surface)",
    ),
    "business_days_kit": QuerySpec(
        _business_days_kit,
        _BDAYS_SQL,
        "Order->ship business-day latency per priority via the "
        "engine-neutral closed-form weekday prefix count",
    ),
}
