"""Unit tests for the round-10 allowlist burn-down reworks.

The sf fixtures cannot exercise the interesting boundaries (the
orders keyspace at sf0.01 fits in ONE super-bucket, so the level-2 and
level-3 stitches of ``gap_ranges`` never fire there; the part size
domain never approaches the skyline guard) — planted inputs with tiny
widths force every code path, the same philosophy as
tests/test_extras61_edges.py.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from agent_data_pipeline_spark.queries.extras15 import gap_ranges


def _gaps_bruteforce(keys: list[int]) -> set[tuple[int, int, int]]:
    ks = sorted(set(keys))
    out = set()
    for a, b in zip(ks, ks[1:]):
        if b - a > 1:
            out.add((a + 1, b - 1, b - a - 1))
    return out


def _run(spark, keys, bw, sw):
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        (r["gap_start"], r["gap_end"], r["gap_len"])
        for r in gap_ranges(df, "k", bucket_width=bw, super_width=sw).collect()
    }
    assert got == _gaps_bruteforce(keys)


def test_gap_ranges_three_levels(spark):
    """bucket_width=8, super_width=4 ⇒ super-buckets span 32 keys.
    Planted gaps: inside a bucket, across buckets within one super,
    across supers, a WHOLE missing bucket, and a whole missing
    super-bucket — every level of the stitch must fire."""
    keys = [
        0, 1, 3,            # in-bucket gap (2)
        8, 9,               # bucket 1 (gap 4..7 across buckets 0→1)
        # bucket 2 (16..23) entirely missing → gap 10..24 via level-2
        24, 30,             # bucket 3, in-bucket gap 25..29
        # supers 1 and 2 (keys 32..95) entirely missing
        96, 97,             # super 3 — gap 31..95 via level-3 stitch
        130,                # super 4 — another cross-super gap
    ]
    _run(spark, keys, 8, 4)


def test_gap_ranges_duplicates_and_contiguous(spark):
    """Duplicate keys collapse; a contiguous sequence yields no gaps."""
    _run(spark, [5, 5, 6, 6, 7, 8], 4, 2)


def test_gap_ranges_single_key_and_empty(spark):
    _run(spark, [42], 8, 4)
    df = spark.createDataFrame([], "k long")
    assert gap_ranges(df, "k", bucket_width=8, super_width=4).count() == 0


def test_gap_ranges_adjacent_super_boundary(spark):
    """Keys straddling a super-bucket boundary with NO gap must not
    fabricate one (the level-3 stitch sees smax=31, smin=32)."""
    _run(spark, list(range(28, 36)), 8, 4)


def test_skyline_size_domain_guard(spark, tmp_path):
    """The explode-sequence suffix-min documents an integer size-domain
    bound; a pathological domain must raise loudly, not explode."""
    from agent_data_pipeline_spark.queries import REGISTRY

    sf = tmp_path / "sfguard"
    sf.mkdir()
    spark.createDataFrame(
        [(1.0, 200_000), (2.0, 3)], "p_retailprice double, p_size long"
    ).write.parquet(str(sf / "part.parquet"))
    with pytest.raises(ValueError, match="size domain"):
        REGISTRY["skyline_parts"].spark(spark, str(sf)).collect()


def test_survival_curve_empty_orders(spark, tmp_path):
    """The driver fold must survive an empty orders table (probe row
    comes back NULL) with an empty, correctly-typed result."""
    from agent_data_pipeline_spark.queries import REGISTRY

    sf = tmp_path / "sfempty"
    sf.mkdir()
    spark.createDataFrame(
        [], "o_custkey long, o_orderdate date"
    ).write.parquet(str(sf / "orders.parquet"))
    out = REGISTRY["survival_curve"].spark(spark, str(sf))
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "lifetime", "at_risk", "d_events", "n_at_t", "survival",
    ]
