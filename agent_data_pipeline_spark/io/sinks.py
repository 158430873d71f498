"""Sink connectors.

Reference parity (SURVEY.md §2.A):
  S3/S4  JDBC sinks (Postgres/MySQL dialects handled by Spark's JDBC
         datasource; reference ships vendored jdbc jars instead).
  S5     Full-refresh overwrite: the reference's TRUNCATE + INSERT
         (dags/taxi_transform_dag.py:41) == ``mode("overwrite")`` —
         with ``truncate=true`` on JDBC so the table is truncated, not
         dropped, preserving DDL exactly like the reference.

Parquet is the engine's native table format. Writers accept
``partition_by`` because at 100 TB an unpartitioned table is unprunable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    properties: dict[str, str] | None = None,
    truncate_on_overwrite: bool = True,
    batchsize: int = 10_000,
) -> None:
    """JDBC sink. ``mode="overwrite"`` + ``truncate_on_overwrite`` gives the
    reference's TRUNCATE-then-INSERT full-refresh semantics (S5)."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode(mode)
    )
    if mode == "overwrite" and truncate_on_overwrite:
        writer = writer.option("truncate", "true")
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()
