"""Round-2 surface extensions, part 4: CSV/text format round trips,
dynamic-gap session windows, skew-salted joins, z-order interleaving,
and error-tolerant aggregates.

The salted join and z-order queries are scale mechanics made visible as
oracle-checked operators: salting proves the rewrite is semantics-
preserving (same hash as the plain join), and the z-value ordering is
the layout transform that makes multi-dimensional data skipping work on
row-group statistics.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .core import QuerySpec, rnd, t

_IO_TMP = "/tmp/adps_io"


def _sf_tag(sf_dir: str) -> str:
    return os.path.basename(sf_dir.rstrip("/")).replace(".", "_")


# --- CSV round trip ---------------------------------------------------------

_CSV_ROUNDTRIP_SQL = """
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_cust,
       floor(sum(c_acctbal) * 100 + 0.5) / 100 AS sum_bal,
       CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations
FROM customer GROUP BY c_mktsegment
"""


def _csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + source round trip (header on, explicit read schema —
    reference S1 reads CSV with header at agent-schema/app.py:181).
    Doubles survive the decimal text round trip because Spark prints
    shortest-round-trip representations; the oracle aggregates the
    original parquet, so the hash check proves losslessness."""
    path = os.path.join(_IO_TMP, _sf_tag(sf_dir), "customer_csv")
    c = t(spark, sf_dir, "customer")
    c.write.mode("overwrite").option("header", True).csv(path)
    back = spark.read.option("header", True).schema(
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string"
    ).csv(path)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_cust"),
        rnd(F.sum("c_acctbal"), 2).alias("sum_bal"),
        F.count_distinct(F.col("c_nationkey")).cast("long").alias("n_nations"),
    )


# --- text round trip --------------------------------------------------------

_TEXT_ROUNDTRIP_SQL = """
SELECT CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(length(text)) AS BIGINT) AS total_chars,
       CAST(max(length(text)) AS BIGINT) AS max_line
FROM documents
"""


def _text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-oriented text sink + source: one document per line (the
    rawest LLM-corpus interchange format). The fixture text contains no
    newlines, so line == document and the oracle on the original
    parquet checks the round trip exactly."""
    path = os.path.join(_IO_TMP, _sf_tag(sf_dir), "docs_text")
    d = t(spark, sf_dir, "documents")
    d.select("text").write.mode("overwrite").text(path)
    back = spark.read.text(path)  # column: value
    return back.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.length("value")).cast("long").alias("total_chars"),
        F.max(F.length("value")).cast("long").alias("max_line"),
    )


# --- Dynamic-gap session windows -------------------------------------------

_GAPS = {"click": 300, "view": 600, "purchase": 900, "signup": 1200, "error": 600}

_DYNAMIC_SESSIONS_SQL = f"""
WITH g AS (
  SELECT user_id, ts, value,
         CASE event_type {' '.join(f"WHEN '{k}' THEN {v}" for k, v in _GAPS.items())}
              ELSE 600 END AS gap_s
  FROM events
),
m AS (
  SELECT *,
         max(epoch(ts) + gap_s) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS run_end
  FROM g
),
flagged AS (
  SELECT *, CASE WHEN run_end IS NULL OR epoch(ts) >= run_end THEN 1 ELSE 0 END AS is_new
  FROM m
),
sessions AS (
  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id, min(ts) AS session_start,
       CAST(count(*) AS BIGINT) AS n_events,
       floor(sum(value) * 100 + 0.5) / 100 AS sum_value
FROM sessions GROUP BY user_id, sid
"""


def _dynamic_gap_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows whose inactivity gap depends on the event type
    (F.session_window with a Column gap — short sessions for clicks,
    long for signups). The oracle is the islands formulation: a running
    max of per-event window ends, a new session whenever an event
    starts at-or-after it — exactly Spark's merge rule for dynamic
    session windows. One shuffle on user_id either way."""
    ev = t(spark, sf_dir, "events").withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    gap_ladder: Column = F.lit(600)
    for k, v in reversed(_GAPS.items()):
        gap_ladder = F.when(F.col("event_type") == k, v).otherwise(gap_ladder)
    gap = F.concat(gap_ladder.cast("string"), F.lit(" seconds"))
    return (
        ev.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            rnd(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


# --- Skew-salted join == plain join ----------------------------------------

_SALTED_JOIN_SQL = """
SELECT c_nationkey,
       CAST(count(*) AS BIGINT) AS n_orders,
       floor(sum(o_totalprice) * 100 + 0.5) / 100 AS sum_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_nationkey
"""


def _salted_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew mitigation for joins: big side salted into 8 sub-keys, small
    side replicated 8x, so one pathological customer key spreads over 8
    tasks instead of hot-spotting one (ops/skew.py salted_join). The
    oracle is the PLAIN join — hash equality proves the rewrite is
    invisible to semantics. (AQE skew-split is the first resort; manual
    salting is the deterministic fallback when skew is known ahead of
    time.)"""
    from ..ops.skew import salted_join

    o = t(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "custkey")
    c = t(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "custkey")
    joined = salted_join(o, c, "custkey", buckets=8)
    return joined.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        rnd(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


# --- Z-order bit interleaving ----------------------------------------------

_ZBITS = 10


def _z_sql_expr(a: str, b: str, bits: int = _ZBITS) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"(((({a}) // {1 << i}) % 2) * {1 << (2 * i)})")
        terms.append(f"(((({b}) // {1 << i}) % 2) * {1 << (2 * i + 1)})")
    return " + ".join(terms)


_ZORDER_SQL = f"""
SELECT l_orderkey, l_linenumber, cell_p, cell_s,
       CAST({_z_sql_expr('cell_p', 'cell_s')} AS BIGINT) AS zval
FROM (SELECT l_orderkey, l_linenumber,
             l_partkey % 1024 AS cell_p, l_suppkey % 1024 AS cell_s
      FROM lineitem)
ORDER BY zval, l_orderkey, l_linenumber
LIMIT 100
"""


def _zorder_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) bit interleaving of two join/filter dimensions —
    the layout key that makes parquet row-group min/max statistics
    selective for BOTH columns at once. Sorting a 100 TB table by zval
    at write time is how you get 2-D data skipping without a second
    copy. Pure integer expressions, identical in both engines."""
    li = t(spark, sf_dir, "lineitem")
    cell_p = (F.col("l_partkey") % 1024).alias("cell_p")
    cell_s = (F.col("l_suppkey") % 1024).alias("cell_s")
    binned = li.select("l_orderkey", "l_linenumber", cell_p, cell_s)
    z = F.lit(0)
    for i in range(_ZBITS):
        z = (
            z
            + ((F.col("cell_p").bitwiseAND(1 << i)) * (1 << i))  # (x>>i &1)<<2i == (x & 1<<i) << i
            + ((F.col("cell_s").bitwiseAND(1 << i)) * (1 << (i + 1)))
        )
    return (
        binned.withColumn("zval", z.cast("long"))
        .orderBy("zval", "l_orderkey", "l_linenumber")
        .limit(100)
    )


# --- Error-tolerant aggregates ---------------------------------------------

_TRY_AGG_SQL = """
SELECT l_returnflag,
       floor(sum(l_quantity) * 100 + 0.5) / 100                 AS qty_sum,
       floor(avg(l_extendedprice) * 10000 + 0.5) / 10000        AS price_avg,
       CAST(count(*) AS BIGINT)                                 AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""


def _try_agg_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_sum / try_avg: overflow-tolerant aggregates (NULL instead of
    ANSI error on overflow). On in-range data they equal the plain
    aggregates — which is exactly what the oracle asserts."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        rnd(F.try_sum("l_quantity"), 2).alias("qty_sum"),
        rnd(F.try_avg("l_extendedprice"), 4).alias("price_avg"),
        F.count(F.lit(1)).alias("n_rows"),
    )


QUERIES: dict[str, QuerySpec] = {
    "csv_roundtrip": QuerySpec(_csv_roundtrip, _CSV_ROUNDTRIP_SQL, "CSV sink+source round trip"),
    "text_roundtrip": QuerySpec(
        _text_roundtrip, _TEXT_ROUNDTRIP_SQL, "line-text sink+source round trip"
    ),
    "dynamic_gap_sessions": QuerySpec(
        _dynamic_gap_sessions, _DYNAMIC_SESSIONS_SQL, "per-type dynamic-gap session windows"
    ),
    "salted_join_counts": QuerySpec(
        _salted_join_counts, _SALTED_JOIN_SQL, "salted join == plain join"
    ),
    "zorder_interleave": QuerySpec(
        _zorder_interleave, _ZORDER_SQL, "Morton z-value layout key"
    ),
    "try_agg_kit": QuerySpec(_try_agg_kit, _TRY_AGG_SQL, "try_sum/try_avg tolerant aggregates"),
}
