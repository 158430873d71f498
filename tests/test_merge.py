"""MERGE/upsert semantics (ops/merge.py): delta wins on key collision,
untouched base rows pass through, new delta keys append, and null-keyed
base rows are never matched away (anti join null semantics — the
contract deliberately diverges from SQL NOT IN here)."""

from __future__ import annotations

from agent_data_pipeline_spark.ops.merge import upsert


def _rows(df):
    # key=repr: None is not orderable against ints
    return sorted(((r["k"], r["v"]) for r in df.collect()), key=repr)


def test_upsert_update_insert_passthrough(spark):
    base = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    delta = spark.createDataFrame([(2, "B"), (9, "Z")], "k int, v string")
    assert _rows(upsert(base, delta, ["k"])) == [(1, "a"), (2, "B"), (3, "c"), (9, "Z")]


def test_upsert_null_key_base_row_survives(spark):
    base = spark.createDataFrame([(None, "n"), (1, "a")], "k int, v string")
    delta = spark.createDataFrame([(1, "A")], "k int, v string")
    assert _rows(upsert(base, delta, ["k"])) == [(1, "A"), (None, "n")]


def test_upsert_empty_delta_is_identity(spark):
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    delta = spark.createDataFrame([], "k int, v string")
    assert _rows(upsert(base, delta, ["k"])) == [(1, "a"), (2, "b")]


def test_connected_components_chain_transitivity(spark):
    """a-b and b-c near-dup pairs (no a-c edge) must land in ONE
    component labeled by the min id — the transitive case greedy
    pairwise dedup mislabels. Plus: two disjoint pairs stay separate."""
    from agent_data_pipeline_spark.llmdata.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a bigint, id_b bigint"
    )
    got = {
        (r["node"], r["comp"]) for r in connected_components(pairs).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}
