"""Gap-based sessionization as a batch operator.

Classic lag + cumulative-sum-of-boundaries construction: one shuffle on
the entity key, two window passes, no Python. Semantics match Spark's
streaming ``session_window`` (gap is exclusive: an event exactly ``gap``
after the previous one starts a new session).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..fns import rnd


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_seconds: int,
) -> DataFrame:
    """Assign ``session_id`` (per-key ordinal) to each row."""
    w = W.partitionBy(key).orderBy(ts_col)
    # cast("double") keeps sub-second precision (unix_timestamp truncates
    # to whole seconds, which would merge sessions at the gap boundary).
    # TIMESTAMP_NTZ has no direct double cast: route it through TIMESTAMP
    # (session-TZ interpretation — a constant offset, so differences are
    # unchanged).
    ts = F.col(ts_col)
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        ts = ts.cast("timestamp")
    prev = F.lag(ts).over(w)
    new_sess = (
        prev.isNull() | (ts.cast("double") - prev.cast("double") >= gap_seconds)
    ).cast("long")
    wrun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return df.withColumn("session_id", F.sum(new_sess).over(wrun))


def session_summary(
    df: DataFrame, key: str, ts_col: str, gap_seconds: int, value_col: str | None = None
) -> DataFrame:
    """Collapse to one row per session: start, end (last event + gap),
    event count, optional value sum. Matches streaming
    ``session_window(ts, gap)`` output bounds."""
    s = sessionize(df, key, ts_col, gap_seconds)
    aggs = [
        F.min(ts_col).alias("session_start"),
        (F.max(ts_col) + F.expr(f"INTERVAL {gap_seconds} SECONDS")).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(rnd(F.sum(value_col), 2).alias("sum_value"))
    return s.groupBy(key, "session_id").agg(*aggs)
