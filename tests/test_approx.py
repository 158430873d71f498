"""Tolerance checks for the approx-only aggregates (SURVEY §2.B: these
are declared approximate, so the driver gives them rows-only checks —
the error bounds are asserted here against exact values)."""

from __future__ import annotations

import duckdb

from agent_data_pipeline_spark.queries import REGISTRY


def test_approx_stats_within_tolerance(spark, sf_oracle):
    got = {
        r["l_returnflag"]: r
        for r in REGISTRY["approx_stats"].spark(spark, sf_oracle).collect()
    }
    exact = {
        r[0]: r
        for r in duckdb.sql(
            f"""
            SELECT l_returnflag,
                   count(DISTINCT l_orderkey) AS n,
                   quantile_cont(l_extendedprice, 0.5)  AS p50,
                   quantile_cont(l_extendedprice, 0.95) AS p95
            FROM read_parquet('{sf_oracle}/lineitem.parquet')
            GROUP BY 1
            """
        ).fetchall()
    }
    assert set(got) == set(exact)
    for flag, e in exact.items():
        g = got[flag]
        assert abs(g["approx_orders"] - e[1]) / e[1] < 0.05, (flag, "distinct")
        assert abs(g["p50_price"] - e[2]) / e[2] < 0.02, (flag, "p50")
        assert abs(g["p95_price"] - e[3]) / e[3] < 0.02, (flag, "p95")


def test_hll_sketch_rollup_within_tolerance(spark, sf_oracle):
    """Per-group HLL estimates AND the sketch-union 'ALL' row must land
    within 5% of the exact distinct counts — the union row is the one
    that proves mergeability (it is computed from the per-group binary
    sketches, not from the raw rows)."""
    got = {
        r["event_type"]: r["approx_users"]
        for r in REGISTRY["hll_sketch_users"].spark(spark, sf_oracle).collect()
    }
    exact = {
        r[0]: r[1]
        for r in duckdb.sql(
            f"""
            SELECT event_type, count(DISTINCT user_id)
            FROM read_parquet('{sf_oracle}/events.parquet') GROUP BY 1
            UNION ALL
            SELECT 'ALL', count(DISTINCT user_id)
            FROM read_parquet('{sf_oracle}/events.parquet')
            """
        ).fetchall()
    }
    assert set(got) == set(exact)
    for k, e in exact.items():
        assert abs(got[k] - e) / e < 0.05, (k, got[k], e)


def test_freq_items_superset_guarantee(spark, sf_oracle):
    """freqItems' contract: every value above the support threshold is
    returned (false positives allowed). langs run 12-44% against the 10%
    support, so ALL of them must surface."""
    got = REGISTRY["freq_items_hh"].spark(spark, sf_oracle).collect()
    got_langs = {r["item"] for r in got if r["col"] == "lang"}
    exact = duckdb.sql(
        f"""
        SELECT lang FROM read_parquet('{sf_oracle}/documents.parquet')
        GROUP BY lang HAVING count(*) > 0.1 * (
            SELECT count(*) FROM read_parquet('{sf_oracle}/documents.parquet'))
        """
    ).fetchall()
    assert {r[0] for r in exact} <= got_langs


def test_approx_quantile_kit_rank_error_bound(spark):
    """approx_percentile at accuracy 10000 must sit within a tight
    value band of the exact interpolated percentile (the sketch bounds
    RANK error at n/accuracy; translate to value space by comparing
    against the exact values one rank either side)."""
    from pyspark.sql import functions as F

    from agent_data_pipeline_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.01"
    approx = {
        r["l_returnflag"]: r
        for r in REGISTRY["approx_quantile_kit"].spark(spark, sf).collect()
    }
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
            F.expr("percentile(l_extendedprice, 0.9)").alias("p90"),
            F.expr("percentile(l_extendedprice, 0.99)").alias("p99"),
        )
        .collect()
    }
    for flag, a in approx.items():
        e = exact[flag]
        for q in ("p50", "p90", "p99"):
            # generous value tolerance: 2% relative — the sketch's rank
            # guarantee is far tighter at this accuracy/n, so a breach
            # means the operator regressed, not the sketch's math
            assert abs(a[q] - e[q]) <= 0.02 * abs(e[q]), (flag, q, a[q], e[q])
