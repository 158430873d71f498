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
        # Keep AQE's parallelismFirst coalescing from collapsing small
        # post-shuffle frames below core count: with the default 1 MB
        # floor, a ~5 MB intermediate coalesces to ~5 partitions and any
        # CPU-heavy per-row work downstream (HOF tokenization, Arrow
        # featurization) serializes on them. 64 KB keeps >= parallelism
        # partitions for anything above ~cores x 64 KB while remaining
        # pure floor semantics at scale (target size is still
        # max(total/parallelism, floor) — on TB shuffles the ratio term
        # dominates and this floor is inert). Parameterised for cluster
        # tuning; see OPTIMIZATION_r13.md.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_MIN_COALESCED_PARTITION", "64k"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Every Generate in this engine explodes a COMPUTED array (HOF
        # shingles, band keys, normalized vectors) — never a cheap stored
        # column. InferFiltersFromGenerate therefore only ever duplicates
        # the full array computation into an inferred `size(e) > 0`
        # Filter that pushdown then drags below the spread exchange
        # (measured 103 -> 5 s on the round-13 band-key operators; the
        # plan_audit `hof_filter_recompute` detector polices code-level
        # regressions). Excluding the rule removes the same class for
        # non-lambda computed arrays (split/array_distinct) the detector
        # cannot see. Plan-only: results are unchanged in any session.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
