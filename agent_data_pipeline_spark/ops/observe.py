"""In-flight pipeline metrics via ``Observation`` — validation without a
second scan.

The reference's A1 gate (`dags/taxi_transform_dag.py:52`) re-queries the
table it just wrote to check non-emptiness; run_expectations (this
package) is one extra aggregation job. At 100 TB even that extra scan is
real money — Spark's ``df.observe`` attaches named aggregate metrics to
the plan itself, so the SAME action that writes the data also reports
row counts / violation counts / sums, for free, exactly once per action.

This is the "audit column" pattern of lakehouse writers (Delta's metrics,
Iceberg's snapshot summaries) expressed with the engine primitive.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def observed(
    df: DataFrame, metrics: dict[str, Column]
) -> tuple[DataFrame, Observation]:
    """Attach named aggregate ``metrics`` to ``df``'s plan. Returns the
    (still lazy) observed frame and the ``Observation`` handle; after
    ANY action on the returned frame, ``observation.get`` yields the
    metric values computed during that action — zero extra scans.

    Metric expressions must be aggregates Spark can compute streamingly
    per task (count/count_if/sum/min/max — no distinct, no sort-based
    aggs): the same restriction observe itself enforces.
    """
    if not metrics:
        raise ValueError("observed: metrics dict must be non-empty")
    obs = Observation()
    names_cols: list[Column] = []
    for name, col in metrics.items():
        names_cols.append(col.alias(name))
    return df.observe(obs, *names_cols), obs


def write_parquet_validated(
    df: DataFrame,
    path: str,
    metrics: dict[str, Column],
    mode: str = "overwrite",
) -> dict:
    """Write ``df`` to parquet while collecting ``metrics`` in the same
    job; returns the observed metric values. The A1 non-empty gate (and
    any expectations-style rule) becomes a dictionary lookup on the
    write's own statistics instead of a second read of what was just
    written."""
    obs_df, obs = observed(df, metrics)
    obs_df.write.mode(mode).parquet(path)
    return dict(obs.get)
