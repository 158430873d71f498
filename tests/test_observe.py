"""Observation-based in-flight metrics (ops/observe.py): the write
action itself reports validation statistics — no second scan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from agent_data_pipeline_spark.ops.observe import (
    observed,
    write_parquet_validated,
)


def test_observed_metrics_match_separate_aggregation(spark):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    )
    obs_df, obs = observed(
        df,
        {
            "n_rows": F.count(F.lit(1)),
            "n_zero": F.count_if(F.col("v") == 0),
            "sum_v": F.sum("v"),
        },
    )
    obs_df.collect()
    got = dict(obs.get)
    assert got["n_rows"] == 100
    assert got["n_zero"] == 15  # 0,7,...,98
    assert got["sum_v"] == sum(i % 7 for i in range(100))


def test_write_parquet_validated_gates_without_second_scan(spark, tmp_path):
    df = spark.range(50).select(
        F.col("id"), (F.col("id") * 2).alias("doubled")
    )
    out = str(tmp_path / "observed_out")
    stats = write_parquet_validated(
        df,
        out,
        {
            "n_rows": F.count(F.lit(1)),
            "n_bad": F.count_if(F.col("doubled") % 2 != 0),
        },
    )
    # the gate decision comes from the write's own stats...
    assert stats["n_rows"] == 50 and stats["n_bad"] == 0
    # ...and the data actually landed
    assert spark.read.parquet(out).count() == 50


def test_observed_rejects_empty_metrics(spark):
    with pytest.raises(ValueError):
        observed(spark.range(1), {})
