"""Gap-based sessionization as a batch operator.

Classic lag + cumulative-sum-of-boundaries construction: one shuffle on
the entity key, two window passes, no Python. Semantics match Spark's
streaming ``session_window`` exactly: per-event windows ``[ts, ts+gap)``
merge when they overlap OR touch, so an event exactly ``gap`` after the
previous one CONTINUES the session; only a strictly-greater gap starts a
new one (verified against native ``session_window`` in
tests/test_timeseries.py).
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
    # Gap test via interval arithmetic: ``ts - prev`` on TIMESTAMP /
    # TIMESTAMP_NTZ is a DayTimeInterval with microsecond precision, so
    # sub-second gaps resolve exactly (unix_timestamp truncates to whole
    # seconds) and TIMESTAMP_NTZ never consults the session timezone —
    # casting NTZ through TIMESTAMP is NOT a constant offset under DST
    # session TZs (events straddling a transition would merge/split
    # wrongly vs Spark's own session_window). Column-type lookup is
    # case-insensitive, matching Spark's resolver.
    ts = F.col(ts_col)
    field = next((f for f in df.schema.fields if f.name.lower() == ts_col.lower()), None)
    ts_types = ("timestamp", "timestamp_ntz")
    if field is not None and field.dataType.simpleString() in ts_types:
        gap = (ts - F.lag(ts).over(w)) > F.expr(f"INTERVAL {gap_seconds} SECONDS")
    else:  # numeric event time (epoch seconds)
        gap = ts.cast("double") - F.lag(ts).over(w).cast("double") > gap_seconds
    prev = F.lag(ts).over(w)
    new_sess = (prev.isNull() | gap).cast("long")
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
