"""As-of (time-travel) join — an operator Spark lacks natively.

Implemented as a composition of built-in ops (union + running last_value
window), per the preference order in SURVEY.md §2.B: no Python, no
``pd.merge_asof`` per group, no cross join.

Shape: tag right rows 0 and left rows 1, union on (key, ts, tag),
then ``last(value, ignorenulls)`` over a running window partitioned by
key — each left row sees the most recent right row at-or-before its
timestamp. One shuffle on the key (the union is shuffle-free), window
state is O(1) per row. At 100 TB this beats per-group pandas by avoiding
Python entirely and beats a range join by avoiding the band blowup.

Full pandas ``merge_asof`` parity: ``direction`` backward / forward /
nearest and a ``tolerance`` window, all inside the same union+window
plan (nearest runs BOTH directional windows over the one union and picks
the smaller delta — still a single shuffle on the key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _epoch_like(df: DataFrame, col_name: str, expr: Column) -> Column:
    """A monotone numeric image of the event-time column for delta /
    tolerance arithmetic: microsecond epoch for timestamp flavors
    (session-TZ-immune via fns.epoch_micros), the raw value for
    numerics."""
    from ..fns import epoch_micros

    field = next(
        (f for f in df.schema.fields if f.name.lower() == col_name.lower()),
        None,
    )
    kind = field.dataType.simpleString() if field is not None else "double"
    if kind == "timestamp":
        return epoch_micros(expr, ntz=False)
    if kind == "timestamp_ntz":
        return epoch_micros(expr, ntz=True)
    return (expr.cast("double") * 1_000_000).cast("long")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the matching right row for the same key:

    * ``backward`` (default): latest right with ``right.ts <= left.ts``;
    * ``forward``: earliest right with ``right.ts >= left.ts``;
    * ``nearest``: whichever of the two is closer in time (tie ->
      backward, pandas merge_asof semantics).

    ``tolerance`` (seconds, optional) voids matches farther than the
    window — the left row survives with NULL values, auditable rather
    than dropped.

    Right rows must be unique per (key, ts) — pre-aggregate if not, or
    which row wins is undefined (same as any asof engine).
    Returns left columns + ``value_cols`` (null when no match).

    Plan shape: ONE shuffle on the key for every direction; nearest
    evaluates two running windows (asc + desc) over the same union —
    no second exchange, because both windows partition and sort on the
    same key/ts (Catalyst reuses the sort for the reversed frame with a
    single extra local sort).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    rv = F.struct(
        _epoch_like(right, right_ts, F.col(right_ts)).alias("_rts_us"),
        *[F.col(c) for c in value_cols],
    ).alias("_rv")
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        rv,
    )
    rv_type = r.schema["_rv"].dataType.simpleString()
    l = left.select(
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(rv_type).alias("_rv"),
    )
    r = r.select(
        F.lit(None).cast(l.schema["_lrow"].dataType.simpleString()).alias("_lrow"),
        "*",
    )
    u = l.select("_lrow", "_k", "_ts", "_side", "_rv").unionByName(r)
    u = u.withColumn("_lts_us", _epoch_like(left, left_ts, F.col("_ts")))

    # backward: right rows at the same ts sort BEFORE left (side 0 < 1),
    # so a simultaneous right row is visible to the left row's frame.
    w_back = (
        W.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # forward: left rows at the same ts sort BEFORE right (side desc),
    # so the frame from the left row forward includes a simultaneous
    # right row.
    w_fwd = (
        W.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").desc())
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )

    matched = u
    if direction in ("backward", "nearest"):
        matched = matched.withColumn(
            "_mb", F.last("_rv", ignorenulls=True).over(w_back)
        )
    if direction in ("forward", "nearest"):
        matched = matched.withColumn(
            "_mf", F.first("_rv", ignorenulls=True).over(w_fwd)
        )
    matched = matched.filter(F.col("_side") == 1)

    tol_us = None if tolerance is None else int(round(tolerance * 1_000_000))

    def _gate(m: Column, delta: Column) -> Column:
        ok = m.isNotNull()
        if tol_us is not None:
            ok = ok & (delta <= F.lit(tol_us))
        return F.when(ok, m)

    d_back = F.col("_lts_us") - F.col("_mb._rts_us")
    d_fwd = F.col("_mf._rts_us") - F.col("_lts_us")
    if direction == "backward":
        pick = _gate(F.col("_mb"), d_back)
    elif direction == "forward":
        pick = _gate(F.col("_mf"), d_fwd)
    else:
        gb = _gate(F.col("_mb"), d_back)
        gf = _gate(F.col("_mf"), d_fwd)
        pick = (
            F.when(gb.isNotNull() & gf.isNull(), gb)
            .when(gf.isNotNull() & gb.isNull(), gf)
            .when(
                gb.isNotNull() & gf.isNotNull(),
                F.when(d_fwd < d_back, gf).otherwise(gb),  # tie -> backward
            )
        )
    matched = matched.withColumn("_match", pick)
    out_cols = [F.col(f"_lrow.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"_match.{c}").alias(c) for c in value_cols]
    return matched.select(*out_cols)
