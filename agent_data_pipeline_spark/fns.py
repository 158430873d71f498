"""Engine-wide expression helpers."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def rnd(col: Column | str, n: int = 2) -> Column:
    """Engine-portable rounding: ``floor(x * 10^n + 0.5) / 10^n``.

    Spark's ``round`` re-parses the double through its shortest decimal
    string (BigDecimal HALF_UP) while DuckDB rounds the binary value, so
    inputs sitting exactly on a half grain (common for products of
    2-decimal money values) round differently between engines. This
    formulation uses only IEEE ops both engines execute identically, so a
    Spark query and its DuckDB oracle produce bit-identical doubles.
    Oracle SQL must spell out the same formula.
    """
    if isinstance(col, str):
        col = F.col(col)
    p = 10**n
    return F.floor(col * p + F.lit(0.5)) / F.lit(p)


def spread(df, min_partitions: int | None = None, force: bool = False):
    """Ensure CPU-heavy downstream per-row work sees enough partitions.

    A small table read from one parquet file arrives as a single split,
    which would serialize heavy derivations (MinHash signatures, SimHash
    votes, text featurization) on one core. At real scale the file splits
    already provide parallelism and this is a no-op — the repartition only
    fires when the input has fewer partitions than the session's
    parallelism, so it never adds a shuffle to a properly-split 100 TB
    scan.

    ``force=True`` always inserts the exchange — used where the exchange
    is ALSO a CollapseProject barrier protecting a materialized column
    from being inlined into a higher-order-function lambda (see
    dedup.shingles).
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if force or df.rdd.getNumPartitions() < target:
        return df.repartition(max(target, df.rdd.getNumPartitions()))
    return df
