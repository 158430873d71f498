"""Differential tests: every registry query vs the DuckDB oracle at the
driver's correctness scale factor (sf0.01). This mirrors the t2 gate."""

from __future__ import annotations

import pytest

from agent_data_pipeline_spark.queries import REGISTRY

from .oracle import run_check


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, sf_oracle, name):
    run_check(spark, name, REGISTRY[name], sf_oracle)
