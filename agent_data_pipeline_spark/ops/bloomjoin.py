"""Explicit Bloom-filter semi-join pruning, built from public DataFrame
ops — the library-level counterpart of Spark's runtime bloom-filter
injection (`spark.sql.optimizer.runtime.bloomFilter.enabled`, which is
size-threshold-gated and so never fires at fixture scale; see
SCALING.md "Runtime bloom-filter semi-join reduction").

The filter is a MERGEABLE SKETCH expressed relationally: the build side
is reduced to its set of hash POSITIONS — at most ``m`` rows per seed
regardless of build-side size, computed with one distinct over a
map-side projection — and the probe side keeps only rows whose k
positions ALL appear in the corresponding position sets (k broadcast
LEFT SEMI joins on an integer column). Exactly a Bloom filter: false
positives possible (a row's positions may all collide with set bits),
false negatives impossible — which is why composing it BEFORE a real
equi-join is correctness-neutral: the join re-checks the actual key, so
the sketch only reduces shuffle/probe input, never changes the answer.
An oracle can therefore check the composed query by running the plain
join.

At 100 TB: the position sets are bounded state (m·k integers — the
same reason Spark's own BloomFilterAggregate can broadcast), the probe
filters are map-side against broadcast hash sets, and the pruned fact
is what reaches the expensive join. Size ``m`` to the build-side key
cardinality (~10 bits/key for ~1% false-positive at k=2).

Reference parity note: the reference pipeline has no join machinery at
all (SURVEY.md §2.A — its transforms are single-table SQL in Postgres);
this operator belongs to the declared north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bloom_positions(
    keys: DataFrame, key_col: str, m: int = 8192, seeds: tuple[int, ...] = (0, 1)
) -> DataFrame:
    """Build-side sketch: DISTINCT (seed, pos) pairs, ``pos =
    xxhash64(key, seed) mod m``. At most ``m * len(seeds)`` rows no
    matter how large ``keys`` is — always broadcastable."""
    if m < 2:
        raise ValueError("m must be >= 2")
    if not seeds:
        raise ValueError("at least one seed required")
    parts = [
        keys.select(
            F.lit(i).alias("seed"),
            F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(m)).alias("pos"),
        )
        for i in seeds
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()


def bloom_prune(
    fact: DataFrame,
    fact_key: str,
    keys: DataFrame,
    key_col: str,
    m: int = 8192,
    seeds: tuple[int, ...] = (0, 1),
) -> DataFrame:
    """Drop fact rows that CANNOT join ``keys`` on the given key: keep a
    row only if, for every seed, its position is present in the build
    side's position set. Each membership test is a broadcast LEFT SEMI
    join on one integer — no shuffle of the fact, no UDF. Survivors are
    a superset of the true matches (Bloom false positives); follow with
    the real join."""
    pos = bloom_positions(keys, key_col, m=m, seeds=seeds)
    out = fact
    for i in seeds:
        # Alias the sketch column and bind the join condition through
        # the right-side DataFrame object: a bare F.col("pos") would be
        # ambiguous (or silently resolve to the fact side) whenever the
        # caller's fact already carries a `pos` column.
        pos_i = pos.filter(F.col("seed") == i).select(
            F.col("pos").alias("__bloom_pos")
        )
        out = out.join(
            F.broadcast(pos_i),
            F.pmod(F.xxhash64(out[fact_key], F.lit(i)), F.lit(m))
            == pos_i["__bloom_pos"],
            "left_semi",
        )
    return out
