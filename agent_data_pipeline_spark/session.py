"""SparkSession factory.

One tuned builder for both local development (local[32], single JVM) and —
via the same config surface — a real multi-executor cluster. The settings
below are the scale-relevant ones (SURVEY.md §4, §7 stage 6):

* AQE on: runtime partition coalescing + skew-join splitting, which is the
  first line of defense against skewed keys at 100 TB.
* shuffle.partitions sized to cores locally; on a cluster AQE's coalesce
  makes the static number mostly irrelevant (set initialPartitionNum high).
* Arrow enabled so any Pandas-UDF path is vectorized batch transfer.
* Session timezone pinned UTC so timestamp semantics match the DuckDB
  oracle and are cluster-reproducible.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "agent_data_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Defaults target the dev box: ``local[$SPARK_GRAFT_CPUS]`` (32 threads).
    On a cluster, pass ``master=None`` with spark-submit providing the
    master; every other setting still applies.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
