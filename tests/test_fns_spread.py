"""The spread() fast partition probe must agree with the exact df.rdd probe.

_narrow_scan_splits replays Spark's FilePartition packing formula in Python
for narrow-over-scan plans (the optimization that removes a redundant full
planning pass per spread() call). These tests pin the contract:

* on every fixture table, plain and behind narrow ops (filter / project /
  explode), the fast estimate EQUALS df.rdd.getNumPartitions();
* on any non-narrow plan (join, aggregate, window, repartition, checkpoint)
  it returns None — falling back to the exact probe.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from agent_data_pipeline_spark.fns import _narrow_scan_splits, spread
from agent_data_pipeline_spark.queries.core import t

SF = "/root/testdata/sf0.01"
TABLES = ["lineitem", "orders", "customer", "documents", "embeddings", "nation"]


def test_fast_probe_matches_exact_on_scans(spark):
    # a cached base relation (other tests' fixtures) makes inputFiles()
    # return [] and the fast probe correctly DECLINE to the exact path;
    # this test pins the fast path, so start from an uncached catalog
    spark.catalog.clearCache()
    for name in TABLES:
        df = t(spark, SF, name)
        est = _narrow_scan_splits(df)
        assert est is not None, name
        assert est == df.rdd.getNumPartitions(), name


def test_fast_probe_matches_exact_on_narrow_ops(spark):
    docs = t(spark, SF, "documents")
    variants = {
        "filter": docs.filter(F.col("doc_id") % 7 == 0),
        "project": docs.select("doc_id", F.lower("text").alias("t")),
        "withcol": docs.withColumn("_toks", F.split(F.lower("text"), r"\s+")),
        "explode": docs.select(
            "doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
        ),
    }
    for name, df in variants.items():
        est = _narrow_scan_splits(df)
        assert est is not None, name
        assert est == df.rdd.getNumPartitions(), name


def test_fast_probe_declines_non_narrow_plans(spark):
    docs = t(spark, SF, "documents")
    orders = t(spark, SF, "orders")
    non_narrow = {
        "join": orders.join(docs, orders["o_orderkey"] == docs["doc_id"]),
        "agg": docs.groupBy("lang").count(),
        "window": docs.withColumn(
            "rn", F.row_number().over(W.partitionBy("lang").orderBy("doc_id"))
        ),
        "repartition": docs.repartition(4),
        "union": docs.select("doc_id").union(orders.select("o_orderkey")),
        "checkpoint": docs.localCheckpoint(),
        "distinct": docs.select("lang").distinct(),
        "sort": docs.orderBy("doc_id"),
    }
    for name, df in non_narrow.items():
        assert _narrow_scan_splits(df) is None, name


def test_spread_still_spreads_and_never_shrinks(spark):
    docs = t(spark, SF, "documents")
    target = spark.sparkContext.defaultParallelism
    out = spread(docs)
    assert out.rdd.getNumPartitions() >= min(
        target, docs.rdd.getNumPartitions() or 1
    )
    # a frame already wider than the target must come back untouched
    wide = docs.repartition(target + 7)
    assert spread(wide) is wide
