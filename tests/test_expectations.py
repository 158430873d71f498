"""Data-quality expectation suite (ops/expectations.py): one-pass audit
semantics — NULL rule results count as violations, report is long-form,
duplicate/empty rule lists rejected."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from agent_data_pipeline_spark.ops.expectations import run_expectations


def test_report_rows_and_null_counts_as_violation(spark):
    df = spark.createDataFrame(
        [(1, "a"), (5, "b"), (None, "c")], "x int, s string"
    )
    report = run_expectations(
        df,
        [
            ("x_positive", F.col("x") > 0),       # NULL x -> violation
            ("x_small", F.col("x") < 3),          # 5 and NULL violate
            ("s_nonempty", F.length("s") > 0),    # passes
        ],
    )
    got = {
        (r["expectation"], r["violations"], r["total"], r["passed"])
        for r in report.collect()
    }
    assert got == {
        ("x_positive", 1, 3, 0),
        ("x_small", 2, 3, 0),
        ("s_nonempty", 0, 3, 1),
    }


def test_single_aggregate_pass_plan(spark):
    """All rules fold into ONE Aggregate over the scan — rule count must
    not multiply scans (the audit is a single job at 100 TB)."""
    df = spark.range(100).select(F.col("id").cast("int").alias("x"))
    report = run_expectations(
        df, [(f"r{i}", F.col("x") >= i) for i in range(10)]
    )
    plan = report._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Aggregate") == 1
    assert plan.count("Range") == 1


def test_rejects_empty_and_duplicate_names(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        run_expectations(df, [])
    with pytest.raises(ValueError):
        run_expectations(
            df, [("a", F.lit(True)), ("a", F.lit(False))]
        )


def test_profile_table_counts_and_single_pass(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "b")], "x int, s string"
    )
    from agent_data_pipeline_spark.ops.expectations import profile_table

    rows = {r["column_name"]: r for r in profile_table(df).collect()}
    assert rows["x"]["n_nulls"] == 1 and rows["x"]["n_distinct"] == 2
    assert rows["s"]["n_nulls"] == 1 and rows["s"]["n_distinct"] == 2
    assert rows["x"]["n_rows"] == 4 and rows["x"]["null_fraction"] == 0.25
    # single scan: the profile is one aggregation over one relation
    plan = profile_table(df)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") == 1
