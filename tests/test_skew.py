"""Salting operators must be semantically transparent: salted plans
produce exactly the unsalted results, with the hot key spread over many
reducers (asserted on the phase-1 group count)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from agent_data_pipeline_spark.ops import skew


@pytest.fixture(scope="module")
def skewed(spark):
    """90% of rows share one hot key — the shape AQE alone can't always
    save (a single group is indivisible for aggregation)."""
    hot = spark.range(9000).select(
        F.lit(7).alias("k"), (F.col("id") % 100).cast("double").alias("v")
    )
    rest = spark.range(1000).select(
        (F.col("id") % 50).alias("k"), F.col("id").cast("double").alias("v")
    )
    return hot.unionAll(rest)


def _rows(df):
    return sorted(tuple(str(x) for x in r) for r in df.collect())


def test_salted_agg_equals_plain(spark, skewed):
    plain = skewed.groupBy("k").agg(
        F.sum("v").alias("s"),
        F.count(F.lit(1)).alias("n"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    )
    salted = skew.salted_agg(
        skewed,
        ["k"],
        [("sum", "v", "s"), ("count", "v", "n"), ("min", "v", "lo"), ("max", "v", "hi")],
        buckets=16,
    )
    assert _rows(salted) == _rows(plain)


def test_salted_agg_spreads_hot_key(spark, skewed):
    salted = skewed.withColumn("_salt", skew._salt_col(skewed, 16))
    spread = (
        salted.filter(F.col("k") == 7).select("_salt").distinct().count()
    )
    assert spread >= 12  # hot key fans out over most of the 16 buckets


def test_salted_agg_rejects_non_algebraic(spark, skewed):
    with pytest.raises(ValueError, match="non-algebraic"):
        skew.salted_agg(skewed, ["k"], [("avg", "v", "a")])


def test_salted_join_equals_plain(spark, skewed):
    dim = spark.range(50).select(
        F.col("id").alias("k"), F.concat(F.lit("name_"), F.col("id")).alias("label")
    )
    plain = skewed.join(dim, "k").select("k", "v", "label")
    salted = skew.salted_join(skewed, dim, "k", buckets=8).select("k", "v", "label")
    assert _rows(salted) == _rows(plain)


def test_salted_left_join_preserves_unmatched(spark, skewed):
    dim = spark.range(5).select(F.col("id").alias("k"), F.lit("x").alias("label"))
    plain = skewed.join(dim, "k", "left").select("k", "v", "label")
    salted = skew.salted_join(skewed, dim, "k", buckets=4, how="left").select(
        "k", "v", "label"
    )
    assert _rows(salted) == _rows(plain)


def test_skew_report_distribution_and_hottest_key(spark):
    """sizes {a:4, b:2, c:2}: max 4, min 2, p50 = 2, hottest 'a';
    ties on size break to the smallest key string."""
    from agent_data_pipeline_spark.ops.skew import skew_report

    rows = [("a",)] * 4 + [("b",)] * 2 + [("c",)] * 2
    df = spark.createDataFrame(rows, "k string")
    r = skew_report(df, ["k"]).collect()[0]
    assert r["n_groups"] == 3
    assert r["max_size"] == 4 and r["min_size"] == 2
    assert r["p50_size"] == 2.0
    assert r["hottest_key"] == "a"

    tie = spark.createDataFrame([("z",), ("z",), ("y",), ("y",)], "k string")
    assert skew_report(tie, ["k"]).collect()[0]["hottest_key"] == "y"
