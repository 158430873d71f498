"""Edge-case regressions for the extras61 wave (round-8 ADVICE items).

The DuckDB oracle differential over the TPC-H fixtures cannot exercise
these: every fixture segment has n >> 10 (so k = floor(0.1*n) is never
0) and no fixture event_type is NULL. Tiny synthetic parquet fixtures
force both edges and check the ENGINE against the SAME oracle SQL over
the same files — the exact divergence the advice predicted.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from agent_data_pipeline_spark.queries import REGISTRY


@pytest.fixture()
def tiny_sf(tmp_path):
    """A minimal sf dir: one big segment (n=20, k=2) and one tiny
    segment (n=4, k=0) — the k=0 segment must survive with its plain
    mean, not be dropped (round-8 advice: inner joins dropped it)."""
    cust = pd.DataFrame(
        {
            "c_custkey": list(range(1, 25)),
            "c_name": [f"c{i}" for i in range(1, 25)],
            "c_nationkey": [0] * 24,
            "c_acctbal": [0.0] * 24,
            "c_mktsegment": ["BIG"] * 20 + ["TINY"] * 4,
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": list(range(1, 25)),
            "o_custkey": list(range(1, 25)),
            "o_orderstatus": ["O"] * 24,
            # BIG: 100..2000 step 100 (k=2 trims 100,200 / 1900,2000)
            # TINY: 10,20,30,40 (k=0 -> plain mean 25)
            "o_totalprice": [100.0 * i for i in range(1, 21)]
            + [10.0, 20.0, 30.0, 40.0],
            "o_orderdate": pd.to_datetime(["2024-01-01"] * 24),
            "o_orderpriority": ["1-URGENT"] * 24,
        }
    )
    cust.to_parquet(tmp_path / "customer.parquet")
    # Spark rejects parquet TIMESTAMP(NANOS) (pandas' default) for the
    # plain-read tables; the sf fixtures store micros here too.
    orders.to_parquet(
        tmp_path / "orders.parquet",
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )
    return str(tmp_path)


def test_trimmed_mean_keeps_k0_segment(spark, tiny_sf):
    spec = REGISTRY["trimmed_mean_by_segment"]
    got = {
        r["seg"]: r.asDict()
        for r in spec.spark(spark, tiny_sf).collect()
    }
    assert set(got) == {"BIG", "TINY"}, "k=0 segment was dropped"
    assert got["TINY"]["k_trimmed_each_side"] == 0
    assert got["TINY"]["trimmed_mean"] == pytest.approx(25.0)
    # BIG: trim {100,200} and {1900,2000} -> mean of 300..1800 = 1050
    assert got["BIG"]["k_trimmed_each_side"] == 2
    assert got["BIG"]["trimmed_mean"] == pytest.approx(1050.0)
    # and the oracle agrees on the same files (engine/oracle parity at
    # the edge the sf fixtures can't reach)
    con = duckdb.connect()
    for name in ("customer", "orders"):
        con.sql(
            f"CREATE VIEW {name} AS SELECT * "
            f"FROM read_parquet('{tiny_sf}/{name}.parquet')"
        )
    odf = con.sql(spec.oracle).fetchdf()
    omap = {r.seg: r for r in odf.itertuples()}
    for seg in ("BIG", "TINY"):
        assert got[seg]["trimmed_mean"] == pytest.approx(
            omap[seg].trimmed_mean
        )
        assert got[seg]["n"] == omap[seg].n


def test_trigram_mining_null_event_type(spark, tmp_path):
    """A NULL event_type must not fabricate 2-part trigrams: both the
    engine and the oracle exclude NULL rows up front, so u1's sequence
    a,NULL,b,c yields exactly one trigram a>b>c on both sides."""
    ev = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "user_id": [1, 1, 1, 1],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:01:00",
                 "2024-01-01 00:02:00", "2024-01-01 00:03:00"]
            ),
            "event_type": ["a", None, "b", "c"],
        }
    )
    ev.to_parquet(tmp_path / "events.parquet")
    spec = REGISTRY["event_trigram_mining"]
    rows = spec.spark(spark, str(tmp_path)).collect()
    assert [r["trigram"] for r in rows] == ["a>b>c"]
    assert rows[0]["n"] == 1
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * "
        f"FROM read_parquet('{tmp_path}/events.parquet')"
    )
    odf = con.sql(spec.oracle).fetchdf()
    assert list(odf["trigram"]) == ["a>b>c"]
