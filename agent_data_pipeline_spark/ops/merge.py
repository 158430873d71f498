"""Batch MERGE / upsert (key-based incremental maintenance).

The reference's only refresh strategy is full TRUNCATE+INSERT
(`dags/taxi_transform_dag.py:41` — our S5 overwrite). A 100 TB table
cannot be rewritten per batch, so the engine adds the standard
incremental pattern: MERGE a (small) delta into a (large) base by key —
rows whose key appears in the delta are replaced, unseen base rows are
kept, brand-new delta keys are appended. This is the update path of a
lakehouse upsert (Delta/Iceberg MERGE INTO) expressed in pure
DataFrame algebra, so Catalyst plans it like any join:

* ``base ⟕anti delta`` on the key — at scale this shuffles on the merge
  key; with both sides bucketed by the key (io/tables.save_bucketed) it
  is shuffle-free. When the delta is small (the common incremental
  case) Catalyst/AQE broadcasts it and the base never moves.
* ``unionByName`` with the delta — no shuffle, column-order safe.

Semantics notes:
* Exactly SQL ``base WHERE key NOT IN (SELECT key FROM delta) UNION ALL
  delta`` for non-null keys (anti join and NOT IN agree when keys are
  non-null; null-keyed delta rows would make NOT IN reject everything —
  the engine treats null keys as never-matching, the saner contract).
* Delta must be key-unique (one winner per key); enforce upstream with
  dedup_first / dropDuplicates, as lakehouse MERGE does with its
  "multiple source rows matched" error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def upsert(base: DataFrame, delta: DataFrame, keys: list[str]) -> DataFrame:
    """MERGE ``delta`` into ``base`` by ``keys``: delta wins on key
    collision, surviving base rows pass through, new delta keys append.
    Columns are matched by name (schemas must agree)."""
    survivors = base.join(delta.select(*keys), keys, "left_anti")
    return survivors.unionByName(delta)
