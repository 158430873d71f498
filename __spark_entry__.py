"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 as a
``(spark, sf_dir) -> DataFrame`` callable; ``oracle_sql()`` provides the
DuckDB-equivalent SQL for each (omitted only for hash-seeded approximate
ops, which get the driver's rows-only check).

The implementations live in ``agent_data_pipeline_spark/queries/``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from agent_data_pipeline_spark import ensure_shipped
from agent_data_pipeline_spark.queries import REGISTRY


def _shipped(fn: Callable[[SparkSession, str], DataFrame]):
    """Wrap a query callable so the package is shipped to Python workers
    before any Pandas-UDF plan executes (harness may run from anywhere)."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_shipped(spark)
        return fn(spark, sf_dir)

    return wrapped


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    ensure_shipped(spark)
    return REGISTRY["pricing_summary"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _shipped(spec.spark) for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (rows-only ops omitted)."""
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
