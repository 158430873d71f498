"""Time-series operators (ops/timeseries.py): rollup nesting, gap-fill
grids, LOCF, and linear interpolation semantics on crafted series."""

from __future__ import annotations

from pyspark.sql import functions as F

from agent_data_pipeline_spark.ops.timeseries import (
    bucket_agg,
    gap_fill,
    hypertable_rollup,
    interpolate_linear,
    locf,
)


def _series(spark):
    rows = [
        ("a", "2024-03-01 00:03:00", 1.0),
        ("a", "2024-03-01 00:22:00", 3.0),
        ("a", "2024-03-01 01:40:00", 5.0),  # 15-min gaps in between
        ("b", "2024-03-01 00:10:00", 10.0),
    ]
    return spark.createDataFrame(rows, "k string, ts string, v double").withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    )


def test_rollup_levels_nest_exactly(spark):
    """Coarse levels computed from the finer level must equal the same
    aggregation computed directly from raw rows (compositionality is the
    whole point: at 100 TB only level 0 touches the raw table)."""
    df = _series(spark)
    r = hypertable_rollup(df, "ts", ["15 minutes", "1 hour"], ["k"], "v")
    hourly = {
        (row["k"], str(row["bucket"])): (row["n_events"], row["sum_value"])
        for row in r.filter(F.col("bucket_width") == "1 hour").collect()
    }
    direct = {
        (row["k"], str(row["bucket"])): (row["n_events"], row["sum_value"])
        for row in bucket_agg(df, "ts", "1 hour", ["k"], "v").collect()
    }
    assert hourly == direct
    assert hourly[("a", "2024-03-01 00:00:00")] == (2, 4.0)


def test_gap_fill_builds_uniform_grid(spark):
    b = bucket_agg(_series(spark), "ts", "15 minutes", ["k"], "v")
    g = gap_fill(b, "bucket", "15 minutes", ["k"])
    a_rows = sorted(
        (str(r["bucket"]), r["is_gap"]) for r in g.filter(F.col("k") == "a").collect()
    )
    # span 00:00 .. 01:30 inclusive = 7 buckets, observations in 3
    assert len(a_rows) == 7
    assert [x[1] for x in a_rows] == [0, 0, 1, 1, 1, 1, 0]
    # single-bucket key: grid collapses to that bucket, no gaps
    assert [r["is_gap"] for r in g.filter(F.col("k") == "b").collect()] == [0]


def test_locf_and_linear_interpolation(spark):
    b = bucket_agg(_series(spark), "ts", "15 minutes", ["k"], "v").select(
        "bucket", "k", F.col("sum_value").alias("x")
    )
    g = interpolate_linear(
        locf(gap_fill(b, "bucket", "15 minutes", ["k"]), "bucket", ["k"], "x"),
        "bucket",
        ["k"],
        "x",
    )
    a = {
        str(r["bucket"]): (r["x"], r["locf_x"], r["interp_x"])
        for r in g.filter(F.col("k") == "a").collect()
    }
    assert a["2024-03-01 00:15:00"] == (3.0, 3.0, 3.0)
    # four gap buckets 00:30..01:15 between x=3.0 (idx 2) and x=5.0 (idx 7)
    assert a["2024-03-01 00:30:00"][1] == 3.0  # LOCF holds last obs
    assert abs(a["2024-03-01 00:30:00"][2] - (3.0 + 2.0 * 1 / 5)) < 1e-12
    assert abs(a["2024-03-01 01:15:00"][2] - (3.0 + 2.0 * 4 / 5)) < 1e-12


def test_interpolation_edges_stay_null(spark):
    rows = [("k", "2024-01-01 00:15:00", None), ("k", "2024-01-01 00:30:00", 2.0),
            ("k", "2024-01-01 00:45:00", None)]
    df = spark.createDataFrame(rows, "k string, bucket string, x double").withColumn(
        "bucket", F.col("bucket").cast("timestamp_ntz")
    )
    out = {str(r["bucket"]): r["interp_x"]
           for r in interpolate_linear(df, "bucket", ["k"], "x").collect()}
    assert out["2024-01-01 00:15:00"] is None  # before first observation
    assert out["2024-01-01 00:30:00"] == 2.0
    assert out["2024-01-01 00:45:00"] is None  # after last observation
