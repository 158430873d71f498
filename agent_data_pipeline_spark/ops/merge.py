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

import functools

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(base: DataFrame, delta: DataFrame, keys: list[str]) -> DataFrame:
    """MERGE ``delta`` into ``base`` by ``keys``: delta wins on key
    collision, surviving base rows pass through, new delta keys append.
    Columns are matched by name (schemas must agree)."""
    survivors = base.join(delta.select(*keys), keys, "left_anti")
    return survivors.unionByName(delta)


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    batch_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    validate_unique: bool = True,
) -> DataFrame:
    """Slowly-changing-dimension type 2: apply an update batch to a
    versioned dimension, closing changed current rows at ``batch_ts``
    and inserting new versions valid from ``batch_ts`` (open-ended).

    ``dim`` carries (key, attrs..., valid_from, valid_to) with
    ``valid_to IS NULL`` marking current rows; ``updates`` carries
    (key, tracked attrs...). Semantics:

    * current row whose tracked attrs all equal the update -> untouched
      (idempotent re-apply);
    * current row with any tracked attr differing -> closed
      (``valid_to = batch_ts``) and a new open version inserted;
    * update key absent from the dimension -> new open row inserted;
    * historical (already closed) rows always pass through.

    The update batch must be key-unique (one version per key per batch —
    the same "multiple source rows matched" contract lakehouse MERGE
    enforces); duplicate keys would fan the current row out into several
    closed/new versions. Enforced here with a cheap distinct-vs-total
    count over the (small, broadcast-size by contract) batch; pass
    ``validate_unique=False`` to skip the extra job when uniqueness is
    guaranteed upstream.

    Plan shape: ONE left join of current rows to the update batch on the
    key (broadcast when the batch is small — the common incremental
    case), a change predicate, and a union for the inserted versions.
    Null-safe comparison (<=>) so NULL -> value and value -> NULL count
    as changes. History never rewrites: at 100 TB pair this with a
    valid_to-partitioned layout so the closed partition is append-only.
    """
    if not tracked:
        raise ValueError("scd2_apply: tracked attribute list must be non-empty")
    ts = F.lit(batch_ts).cast(dict(dim.dtypes)[valid_from])
    upd = updates.select(key, *tracked)
    if validate_unique:
        dup = upd.groupBy(key).count().filter(F.col("count") > 1).limit(1).collect()
        if dup:
            raise ValueError(
                f"scd2_apply: update batch has multiple rows for key "
                f"{key}={dup[0][0]!r} (one version per key per batch)"
            )
    u_cols = {c: f"_u_{c}" for c in (key, *tracked)}
    upd_renamed = upd.select(*[F.col(c).alias(a) for c, a in u_cols.items()])

    current = dim.filter(F.col(valid_to).isNull())
    history = dim.filter(F.col(valid_to).isNotNull())

    joined = current.join(
        upd_renamed, F.col(key) == F.col(u_cols[key]), "left"
    )
    # Column-op predicate, not an F.expr string: immune to column names
    # that need backticks, and structurally valid for any tracked list.
    same = functools.reduce(
        lambda a, b: a & b,
        [F.col(c).eqNullSafe(F.col(u_cols[c])) for c in tracked],
    )
    changed = F.col(u_cols[key]).isNotNull() & ~same
    kept_or_closed = joined.select(
        *dim.columns,
        changed.alias("_changed"),
    ).select(
        *[c for c in dim.columns if c != valid_to],
        F.when(F.col("_changed"), ts).otherwise(F.col(valid_to)).alias(valid_to),
        F.col("_changed"),
    )

    # new open versions: changed keys (tracked attrs from the update,
    # untracked attrs carried from the closed row) + brand-new keys
    changed_new = (
        joined.filter(changed)
        .select(
            *[
                F.col(u_cols[c]).alias(c) if c in (key, *tracked) else F.col(c)
                for c in dim.columns
                if c not in (valid_from, valid_to)
            ],
            ts.alias(valid_from),
            F.lit(None).cast(dict(dim.dtypes)[valid_to]).alias(valid_to),
        )
    )
    brand_new = (
        upd_renamed.join(current, F.col(u_cols[key]) == F.col(key), "left_anti")
        .select(
            *[
                (F.col(u_cols[c]) if c in (key, *tracked) else F.lit(None).cast(t)).alias(c)
                for c, t in dim.dtypes
                if c not in (valid_from, valid_to)
            ],
            ts.alias(valid_from),
            F.lit(None).cast(dict(dim.dtypes)[valid_to]).alias(valid_to),
        )
    )
    return (
        history.unionByName(kept_or_closed.drop("_changed"))
        .unionByName(changed_new)
        .unionByName(brand_new)
    )
