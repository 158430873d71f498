"""Unit tests for the round-12 allowlist burn-down reworks and ADVICE
guards.

The driver-side replays re-execute the same arithmetic the windows
computed, so the fixtures cover the value paths; what they CANNOT
exercise are (a) the new loud-failure branches (undersized inputs the
sf fixtures never produce — the stream_dsir_gate philosophy: an
IndexError/TypeError would misattribute a broken fixture contract) and
(b) the 2^-24 headroom contract (fixture sums sit far below the
ceiling by design). Planted tiny parquet dirs force every branch.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from agent_data_pipeline_spark.fns import assert_grid_headroom
from agent_data_pipeline_spark.queries import REGISTRY


def _plant(spark, tmpdir: str, table: str, rows, schema: str) -> str:
    """Write a tiny planted table under tmpdir/sf_dir layout."""
    df = (
        spark.createDataFrame(rows, schema)
        if rows
        else spark.createDataFrame([], schema)
    )
    df.write.mode("overwrite").parquet(f"{tmpdir}/{table}.parquet")
    return tmpdir


def test_grid_headroom_contract():
    # comfortably inside: 1e6 terms of |t| <= 1 -> total 1e6 << 2^29
    assert_grid_headroom(1e6, 1.0, "ok case")
    # over the ceiling: would silently de-exactify the 2^-24 grid
    with pytest.raises(ValueError, match="grid-exactness headroom"):
        assert_grid_headroom(2.0**29, 1.0, "too big")
    # the 2x partial-agg margin: exactly at ceiling/2 must also fail
    with pytest.raises(ValueError, match="grid-exactness headroom"):
        assert_grid_headroom(2.0**28, 1.0, "margin case")


def test_hill_guard_fires_on_undersized_orders(spark, tmp_path):
    sf = _plant(
        spark,
        str(tmp_path),
        "orders",
        [(1, 10.0), (2, 20.0), (3, 30.0)],
        "o_orderkey long, o_totalprice double",
    )
    with pytest.raises(ValueError, match="hill_tail_index needs"):
        REGISTRY["hill_tail_index"].spark(spark, sf)


def test_bootstrap_guard_fires_on_empty_orders(spark, tmp_path):
    sf = _plant(
        spark,
        str(tmp_path),
        "orders",
        [],
        "o_orderkey long, o_totalprice double",
    )
    with pytest.raises(ValueError, match="bootstrap CI needs"):
        REGISTRY["poisson_bootstrap_ci"].spark(spark, sf)


def test_pareto_guard_fires_on_empty_orders(spark, tmp_path):
    sf = _plant(
        spark,
        str(tmp_path),
        "orders",
        [],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    with pytest.raises(ValueError, match="non-empty orders"):
        REGISTRY["pareto_revenue"].spark(spark, sf)


def test_stump_guard_fires_on_single_value_corpus(spark, tmp_path):
    # every doc has the same n_chars -> no split candidate with nl < n
    sf = _plant(
        spark,
        str(tmp_path),
        "documents",
        [(i, "same len!!", "en" if i % 2 else "fr", "src0", 10)
         for i in range(20)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    with pytest.raises(ValueError, match="distinct n_chars"):
        REGISTRY["best_split_stump"].spark(spark, sf)


def test_mann_whitney_replay_matches_independent_reference(
    spark, tmp_path
):
    """Driver-side replay vs an independent per-row rank computation
    (not the cumulative-histogram formulation) on a planted two-group
    sample with heavy ties."""
    qty = [(1.0, "R"), (1.0, "N"), (2.0, "R"), (2.0, "R"),
           (2.0, "N"), (3.0, "N"), (3.0, "N"), (5.0, "R")]
    rows = [(i, q, f) for i, (q, f) in enumerate(qty)]
    sf = _plant(
        spark,
        str(tmp_path),
        "lineitem",
        rows,
        "l_orderkey long, l_quantity double, l_returnflag string",
    )
    got = REGISTRY["mann_whitney_u"].spark(spark, sf).collect()[0]
    # independent reference: tie-averaged per-row ranks
    vals = sorted(q for q, _f in qty)
    rank_of = {}
    i = 0
    while i < len(vals):
        j = i
        while j < len(vals) and vals[j] == vals[i]:
            j += 1
        rank_of[vals[i]] = (i + 1 + j) / 2.0  # avg of ranks i+1..j
        i = j
    r1 = sum(rank_of[q] for q, f in qty if f == "R")
    n1 = sum(1 for _q, f in qty if f == "R")
    n2 = len(qty) - n1
    u = r1 - n1 * (n1 + 1) / 2.0
    assert got["n1"] == n1 and got["n2"] == n2
    assert got["u_stat"] == pytest.approx(u, abs=1e-9)
    assert got["auc"] == pytest.approx(u / (n1 * n2), abs=1e-6)


def test_ks_replay_detects_planted_shift(spark, tmp_path):
    """Planted cohorts with disjoint quality-score supports must give
    KS D = 1-ish (every even doc short, every odd doc long)."""
    rows = []
    for i in range(200):
        text = ("a " * 5) if i % 2 == 0 else ("the of and is it " * 40)
        rows.append((i, text.strip(), "en", "src0", len(text)))
    sf = _plant(
        spark,
        str(tmp_path),
        "documents",
        rows,
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    got = REGISTRY["ks_drift_test"].spark(spark, sf).collect()[0]
    assert got["n_a"] == 100 and got["n_b"] == 100
    assert got["ks_d"] == pytest.approx(1.0, abs=1e-6)
    assert bool(got["drift_flag"]) is True


def test_gini_replay_on_uniform_revenue(spark, tmp_path):
    """Uniform revenue -> Gini exactly 0 on the binned curve.
    Exercises the driver-side Lorenz fold + trapezoid accumulation."""
    uniform = [(i, i, 1000.0) for i in range(100)]
    sf = _plant(
        spark,
        str(tmp_path),
        "orders",
        uniform,
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    got = REGISTRY["gini_lorenz_approx"].spark(spark, sf).collect()
    gini = got[0]["gini"]
    assert gini == pytest.approx(0.0, abs=1e-6)
    # cum_share must be monotone non-decreasing and end at 1
    shares = [r["cum_share"] for r in sorted(got, key=lambda r: r["decile"])]
    assert all(b >= a for a, b in zip(shares, shares[1:]))
    assert shares[-1] == pytest.approx(1.0, abs=1e-6)
