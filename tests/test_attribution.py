"""Markov removal-effect attribution (ops/attribution.py): the
absorbing-chain solver is checked against closed-form conversion
probabilities on hand-built chains — the check the rows-only driver
pass can't do — plus share-normalization invariants on the fixture
query."""

from __future__ import annotations

import pytest

from agent_data_pipeline_spark.ops.attribution import (
    _solve_p_conv,
    _without_channel,
    removal_effects,
)


def test_single_channel_chain_is_deterministic():
    counts = {("start", "A"): 1, ("A", "conv"): 1}
    res = removal_effects(counts)
    assert res["p_conv"] == 1.0
    assert res["removal"]["A"] == 1.0
    assert res["share"]["A"] == 1.0


def test_two_channel_split_closed_form():
    # start -> A (converts always), start -> B (never): p = 0.5.
    counts = {
        ("start", "A"): 1,
        ("start", "B"): 1,
        ("A", "conv"): 1,
        ("B", "null"): 1,
    }
    res = removal_effects(counts)
    assert res["p_conv"] == pytest.approx(0.5)
    # removing A kills all conversion; removing B changes nothing
    assert res["removal"]["A"] == 1.0
    assert res["removal"]["B"] == 0.0
    assert res["share"]["A"] == 1.0


def test_self_loop_geometric_closed_form():
    # A -> {A:1, conv:1, null:2}: v = v/4 + 1/4  =>  v = 1/3.
    counts = {
        ("start", "A"): 1,
        ("A", "A"): 1,
        ("A", "conv"): 1,
        ("A", "null"): 2,
    }
    assert _solve_p_conv(counts) == pytest.approx(1.0 / 3.0)


def test_two_hop_chain_closed_form():
    # start -> A -> B -> conv with leak at each hop: 0.5 * 0.5 = 0.25
    counts = {
        ("start", "A"): 2,
        ("A", "B"): 1,
        ("A", "null"): 1,
        ("B", "conv"): 1,
        ("B", "null"): 1,
    }
    assert _solve_p_conv(counts) == pytest.approx(0.25)
    # removal of B redirects A->B to null: p drops to 0
    assert _solve_p_conv(_without_channel(counts, "B")) == 0.0


def test_removal_redirects_incoming_edges_to_null():
    counts = {("start", "A"): 1, ("A", "conv"): 1}
    wo = _without_channel(counts, "A")
    assert wo == {("start", "null"): 1}


def test_fixture_query_invariants(spark):
    from agent_data_pipeline_spark.queries import REGISTRY

    rows = (
        REGISTRY["markov_attribution"]
        .spark(spark, "/root/testdata/sf0.001")
        .collect()
    )
    chans = {r["channel"] for r in rows}
    assert chans == {"click", "view", "signup", "error"}
    p = rows[0]["p_conv"]
    assert 0.0 < p <= 1.0
    assert all(r["p_conv"] == p for r in rows)
    assert all(0.0 <= r["removal_effect"] <= 1.0 for r in rows)
    share_sum = sum(r["attribution_share"] for r in rows)
    assert share_sum == pytest.approx(1.0, abs=1e-5)
    # on a ~67-event-per-user stream nearly every journey converts
    # before censoring, and every channel is touched: effects are real
    assert all(r["n_transitions_out"] > 0 for r in rows)
