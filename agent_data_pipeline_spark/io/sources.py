"""Source connectors.

Reference parity (SURVEY.md §2.A):
  S1  CSV scan with sampled inference  (reference: agent-schema/app.py:181
      reads only the first 100 rows with pandas) -> ``sample_csv_head``.
  S2  CSV bulk ingest (reference: NiFi flow draining a mounted directory)
      -> plain ``spark.read.csv`` over a directory; the whole NiFi box
      collapses into a distributed Spark scan.

All readers return lazy DataFrames; Catalyst pushes filters/projections
into the scan (Parquet: predicate pushdown + column pruning; CSV/JSON:
column pruning). At 100 TB the parquet reader is the only sane default —
CSV/JSON exist for ingest parity, after which data lands as Parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Columnar scan: vectorized reader, pushdown, partition pruning."""
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
    infer: bool = False,
) -> DataFrame:
    """CSV source. Prefer an explicit schema at scale: ``inferSchema`` costs
    an extra full pass over the data. ``sample_csv_head`` + ``schema.infer``
    reproduces the reference's cheap 100-row inference instead."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    elif infer:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None
) -> DataFrame:
    """JSON Lines source."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """JDBC source (reference's warehouse read path, taxi_transform_dag.py:75).

    At scale, always pass ``partition_column`` + bounds so the read fans out
    across executors instead of a single serial connection.
    """
    reader = (
        spark.read.format("jdbc").option("url", url).option("dbtable", table)
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    return reader.load()


def sample_csv_head(spark: SparkSession, path: str, n: int = 100) -> DataFrame:
    """S1: read only the first ``n`` rows of a CSV with types inferred.

    Reference contract: ``pd.read_csv(file_path, nrows=100)``
    (agent-schema/app.py:181). Spark reads lazily; the ``limit`` is pushed
    into the scan (LocalLimit over the file source) so this stays a
    driver-cheap metadata-scale operation even on a huge file.
    """
    return (
        spark.read.option("header", "true")
        .option("inferSchema", "true")
        .option("samplingRatio", "1.0")
        .csv(path)
        .limit(n)
    )
