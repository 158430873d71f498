"""Skew-mitigation operators (SURVEY §4 "physical layout policy",
§7 stage 6): salting for hot keys that AQE's skew-join splitting can't
reach (e.g. a single key holding 30% of a 100 TB fact table, or a
skewed aggregation where one group floods a reducer).

AQE handles *moderate* skew transparently (splitting oversized shuffle
partitions); salting is the explicit tool for *pathological* keys:

* ``salted_agg`` — two-phase aggregation: shuffle on (key, salt) first
  so the hot key's rows fan out over ``buckets`` reducers, then merge
  the per-salt partials with a second (tiny) shuffle on the key alone.
  Works for algebraic aggregates (sum/count/min/max) — exactly the ones
  whose partials merge losslessly.
* ``salted_join`` — replicate the small side ``buckets`` times and salt
  the big side deterministically, so one hot join key spreads over
  ``buckets`` tasks. For when the small side is too big to broadcast
  but the big side's key distribution is pathological.

Both are semantically transparent: results equal the unsalted plan
(tests/test_skew.py asserts equality).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (merge_fn, partial_alias) per supported algebraic aggregate.
_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing partial counts
    "min": F.min,
    "max": F.max,
}


def _salt_col(df: DataFrame, buckets: int) -> Column:
    """Deterministic per-row salt: hash of the whole row tuple. Spreads a
    hot key's rows uniformly without RNG (re-runs give identical plans,
    and two scans of the same data salt identically)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(buckets))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    buckets: int = 32,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` is a list of (function, column, alias) with function in
    {sum, count, min, max}. Phase 1 aggregates by (keys + salt) —
    spreading any hot key over ``buckets`` reducers; phase 2 merges the
    partials by the true keys. The phase-2 shuffle carries at most
    ``buckets`` rows per key, so it cannot skew.
    """
    unsupported = [fn for fn, _, _ in aggs if fn not in _MERGE]
    if unsupported:
        raise ValueError(f"non-algebraic aggregates not salt-mergeable: {unsupported}")

    salted = df.withColumn("_salt", _salt_col(df, buckets))
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[
            (F.count(F.lit(1)) if fn == "count" else getattr(F, fn)(col)).alias(alias)
            for fn, col, alias in aggs
        ]
    )
    return phase1.groupBy(*keys).agg(
        *[_MERGE[fn](alias).alias(alias) for fn, _, alias in aggs]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated
    ``buckets`` times, so a pathological key occupies ``buckets`` tasks
    instead of one. Use when ``small`` exceeds the broadcast threshold
    but ``big``'s key histogram has hot entries; cost is a ``buckets``-x
    blowup of the small side's shuffle volume.
    """
    big_s = big.withColumn("_salt", _salt_col(big, buckets))
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    out = big_s.join(small_s, [key, "_salt"], how)
    return out.drop("_salt")


def skew_report(df: DataFrame, keys: list[str]) -> DataFrame:
    """Key-distribution diagnostics for a prospective join/agg key: ONE
    row with group count, max/avg group size, p50/p99 group sizes, and
    the hottest key (min key among ties, rendered as a string). This is
    the measurement step before choosing a skew mitigation — a key whose
    p99 is close to its max doesn't need salting; a key whose max is
    1000x its p99 does (salted_agg / salted_join above, or AQE skew
    join for the shuffle itself).

    Two aggregations: per-key sizes (map-side partial), then a global
    single-row reduce over one long per group — the report costs one
    shuffle on the key plus a scalar collect-free reduce, so it is
    runnable casually against 100 TB before a backfill.
    """
    sizes = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("_n"))
    key_str = F.concat_ws("|", *[F.col(k).cast("string") for k in keys])
    return sizes.select(F.col("_n"), key_str.alias("_k")).agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.max("_n").alias("max_size"),
        F.min("_n").alias("min_size"),
        F.expr("percentile(_n, 0.5)").alias("p50_size"),
        F.expr("percentile(_n, 0.99)").alias("p99_size"),
        F.min_by("_k", F.struct((-F.col("_n")).alias("a"), F.col("_k").alias("b"))).alias("hottest_key"),
    )
