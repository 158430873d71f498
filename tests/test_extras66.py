"""Planted-truth tests for the round-13 incremental-dedup store and
streaming near-dup gate (queries/extras66.py, llmdata/incremental.py):

* exact-status classification on a hand corpus where every label is
  known (dup_of_store / dup_in_batch / new_unique);
* store merge invariants + Parquet round trip (write -> read -> same
  rows);
* planted cross-batch NEAR-duplicates: every batch doc that is a
  1-2-token edit of a stored doc must collide with the store's band
  keys (recall), and vocabulary-disjoint novel docs must not
  (precision) — deterministic because the md5-portable hashes and the
  planted texts are fixed;
* fixture-level recall floor: at sf0.001, >= 90% of the gate's
  planted re-crawls whose original IS in the reference store get
  flagged;
* cross-scale oracle differential for both new queries at sf0.001
  (test_oracle_queries covers sf0.01 registry-wide).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from agent_data_pipeline_spark.llmdata import incremental as inc
from agent_data_pipeline_spark.queries import REGISTRY

from .oracle import run_check


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def prior_batch(spark):
    prior = _docs(
        spark,
        [
            (1, "alpha beta gamma delta"),
            (2, "epsilon zeta eta theta"),
            (3, "iota kappa lambda mu"),
        ],
    )
    batch = _docs(
        spark,
        [
            (10, "alpha beta gamma delta"),      # dup_of_store
            (11, "new fresh text one two"),      # new_unique
            (12, "new fresh text one two"),      # dup_in_batch (rn=2)
            (13, "totally different words here"),  # new_unique
            (14, "epsilon zeta eta theta"),      # dup_of_store
        ],
    )
    return prior, batch


def test_incremental_exact_status_planted(spark, prior_batch, tmp_path):
    prior, batch = prior_batch
    path = str(tmp_path / "store_v1")
    inc.write_store(inc.exact_fingerprint_store(prior), path)
    store = inc.read_store(spark, path)
    got = {
        r["doc_id"]: r["status"]
        for r in inc.incremental_exact_status(batch, store).collect()
    }
    assert got == {
        10: "dup_of_store",
        11: "new_unique",
        12: "dup_in_batch",
        13: "new_unique",
        14: "dup_of_store",
    }


def test_merge_store_invariants_and_roundtrip(spark, prior_batch, tmp_path):
    prior, batch = prior_batch
    store = inc.exact_fingerprint_store(prior)
    merged = inc.merge_store(store, batch)
    rows = {r["fingerprint"]: r for r in merged.collect()}
    # every doc absorbed exactly once
    assert sum(r["n_copies"] for r in rows.values()) == 3 + 5
    # distinct contents across both corpora (3 prior + 2 batch-new)
    assert len(rows) == 5
    # representative of a store digest stays the store's min id
    fp_alpha = [
        r for r in rows.values() if r["n_copies"] == 2 and r["rep_doc_id"] == 1
    ]
    assert len(fp_alpha) == 1
    # new digest opens with the batch's min id (11, not 12)
    fp_new = [r for r in rows.values() if r["rep_doc_id"] == 11]
    assert len(fp_new) == 1 and fp_new[0]["n_copies"] == 2
    # Parquet round trip preserves rows exactly
    path = str(tmp_path / "store_v2")
    inc.write_store(merged, path)
    back = inc.read_store(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, merged.collect())
    )


def _tokens(prefix: str, n: int) -> str:
    return " ".join(f"{prefix}tok{i}" for i in range(n))


def test_planted_neardup_band_collision(spark):
    """Deterministic planted near-dups: band keys of a 1-2-token edit
    of a stored 40-token doc must collide with the store (recall);
    vocabulary-disjoint docs must not (precision). Outcome is fixed by
    the md5 hash family + fixed texts — no randomness to flake."""
    stored = _docs(
        spark, [(i, _tokens(f"s{i}_", 40)) for i in range(12)]
    )
    near = _docs(
        spark,
        [(100 + i, _tokens(f"s{i}_", 40) + " edit42") for i in range(12)],
    )
    novel = _docs(
        spark, [(200 + i, _tokens(f"novel{i}_", 40)) for i in range(6)]
    )
    ref = inc.portable_band_keys(stored).select("band", "band_key").distinct()
    probe = inc.portable_band_keys(near.unionByName(novel))
    hits = {
        r["doc_id"]
        for r in probe.join(ref, ["band", "band_key"], "left_semi")
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert {100 + i for i in range(12)} <= hits, "planted near-dup missed"
    assert not ({200 + i for i in range(6)} & hits), "novel doc false hit"


def test_band_keys_empty_doc_handling(spark):
    """Docs under shingle_n tokens: dropped on the store side, kept as
    one NULL-band row on the gate side (pass un-flagged)."""
    d = _docs(spark, [(1, "one two"), (2, "one two three four")])
    assert inc.portable_band_keys(d).filter(F.col("doc_id") == 1).count() == 0
    kept = inc.portable_band_keys(d, keep_empty=True).filter(
        F.col("doc_id") == 1
    )
    rows = kept.collect()
    assert len(rows) == 1 and rows[0]["band_key"] is None


def test_gate_recall_floor_on_fixture(spark, sf_smoke):
    """At sf0.001: of the gate's planted re-crawls whose original IS
    in the reference store (doc_id % 5 == 1 and % 3 != 0), >= 90%
    must band-collide. Batch replay of the stream algebra."""
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    ref = docs.filter(F.col("doc_id") % 3 != 0).select("doc_id", "text")
    ref_keys = inc.portable_band_keys(ref).select("band", "band_key").distinct()
    planted = docs.filter(
        (F.col("doc_id") % 5 == 1) & (F.col("doc_id") % 3 != 0)
    ).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" rev2 edit")).alias("text"),
    )
    n_planted = planted.count()
    n_flagged = (
        inc.portable_band_keys(planted)
        .join(ref_keys, ["band", "band_key"], "left_semi")
        .select("doc_id")
        .distinct()
        .count()
    )
    assert n_planted > 0
    assert n_flagged / n_planted >= 0.9, (n_flagged, n_planted)


@pytest.mark.parametrize(
    "name",
    [
        "incremental_dedup_census",
        "stream_neardup_gate",
        "incremental_neardup_census",
    ],
)
def test_round13_queries_cross_scale_oracle(spark, sf_smoke, name):
    run_check(spark, name, REGISTRY[name], sf_smoke)
