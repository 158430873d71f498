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


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare: list[str] | None = None,
) -> DataFrame:
    """Change-data-capture diff of two snapshots of the same keyed table.

    Returns one row per key whose state changed between snapshots:
    ``keys... | change_type ('insert'|'delete'|'update') | changed_cols``
    (comma-joined sorted list of differing compared columns; empty for
    insert/delete). Unchanged keys are dropped. NULL-safe comparison, so
    value->NULL and NULL->value count as changes; null keys never match
    (same contract as :func:`upsert`).

    Plan shape: ONE full outer join on the key. At 100 TB both snapshots
    shuffle on the key unless written bucketed by it (io/tables
    .save_bucketed => zero-Exchange diff); the per-column comparison is
    a pure projection. This is how a lakehouse computes a CDC feed from
    periodic full snapshots when the source cannot emit a changelog.
    """
    if compare is None:
        compare = [c for c in old.columns if c not in keys]
    if not compare:
        raise ValueError(
            "snapshot_diff: no columns to compare (table is keys-only — "
            "pass compare explicitly or diff presence with a semi/anti join)"
        )
    # presence flags are dedicated marker columns, not data columns that
    # may legitimately be all-NULL on a present row
    o = old.select(*keys, F.lit(1).alias("_in_o"), *[F.col(c).alias(f"_o_{c}") for c in compare])
    n = new.select(*keys, F.lit(1).alias("_in_n"), *[F.col(c).alias(f"_n_{c}") for c in compare])
    j = o.join(n, keys, "full_outer")
    in_old = F.col("_in_o").isNotNull()
    in_new = F.col("_in_n").isNotNull()
    any_diff = functools.reduce(
        lambda a, b: a | b,
        [~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")) for c in compare],
    )
    change_type = (
        F.when(in_old & ~in_new, F.lit("delete"))
        .when(~in_old & in_new, F.lit("insert"))
        .when(any_diff, F.lit("update"))
    )
    changed_cols = F.when(
        change_type == "update",
        F.concat_ws(
            ",",
            *[
                F.when(
                    ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")), F.lit(c)
                )
                for c in sorted(compare)
            ],
        ),
    ).otherwise(F.lit(""))
    return (
        j.select(
            *keys,
            change_type.alias("change_type"),
            changed_cols.alias("changed_cols"),
        )
        .filter(F.col("change_type").isNotNull())
    )


def point_in_time_join(
    facts: DataFrame,
    dim: DataFrame,
    fact_key: str,
    fact_ts: Column,
    dim_key: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Point-in-time-correct join of a fact stream to an SCD2-versioned
    dimension (:func:`scd2_apply` output): each fact row picks the
    dimension version whose validity interval ``[valid_from, valid_to)``
    contains the fact's own timestamp — the feature-store "as of event
    time" lookup that prevents training-serving leakage from future
    attribute values.

    ``fact_ts`` is a Column expression over ``facts`` whose type is
    comparable to the validity bounds (the SCD2 contract stores them as
    ISO strings, which compare correctly lexicographically). An open
    interval (``valid_to IS NULL``) matches everything at/after
    ``valid_from``. Facts with no matching version (timestamp before the
    key's first version, or unknown key) survive with NULL attributes —
    left join, auditable rather than silently dropped.

    Plan shape (why this scales): the join is an EQUI-join on the
    dimension key with the interval predicate as a residual filter —
    Catalyst plans hash/sort-merge on the key, never a range-only
    BroadcastNestedLoop. Versions-per-key is small (dimension churn),
    so the residual evaluates over a handful of candidate rows per fact.
    Dimensions are broadcast-size in the common case; at 100 TB of facts
    the fact side never moves when the dim broadcasts.

    SCD2 validity invariant (non-overlapping intervals per key, produced
    by construction in ``scd2_apply``) guarantees at most one match per
    fact — the join cannot fan out.
    """
    ts = fact_ts.alias("_fact_ts")
    f = facts.select("*", ts)
    d = dim.select(
        F.col(dim_key).alias("_dim_key"),
        *[F.col(c) for c in dim.columns if c != dim_key],
    )
    cond = (
        (F.col(fact_key) == F.col("_dim_key"))
        & (F.col("_fact_ts") >= F.col(valid_from))
        & (F.col(valid_to).isNull() | (F.col("_fact_ts") < F.col(valid_to)))
    )
    return f.join(d, cond, "left").drop("_dim_key", "_fact_ts")


def merge_partial_aggs(
    base: DataFrame,
    delta: DataFrame,
    keys: list[str],
    sums: list[str],
) -> DataFrame:
    """Algebraic incremental-aggregate maintenance: combine two partial
    aggregate states (same schema: keys + additive measure columns) into
    the aggregate of the union of their inputs — without touching the
    raw rows that produced ``base``.

    This is the MERGE step of a materialized rollup at 100 TB: the base
    aggregate is tiny (one row per group), each batch aggregates only
    its own delta, and the combine is a shuffle over group cardinality,
    not data volume. Valid for any commutative-monoid measure (sum,
    count, min/max with the right combine); averages must be carried as
    (sum, count) pairs and finalized downstream — the classic
    partial-aggregation decomposition Spark itself uses map-side.
    """
    return (
        base.select(*keys, *sums)
        .unionByName(delta.select(*keys, *sums))
        .groupBy(*keys)
        .agg(*[F.sum(c).alias(c) for c in sums])
    )


def apply_cdc(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC change batch (op ∈ {'I','U','D'}) to a snapshot.

    Semantics of one transactionally-consistent batch: every base row
    whose key appears in the batch (any op) is removed via ONE anti-join
    on the keys, then the I/U payload rows append — so updates replace,
    deletes vanish, inserts add, and a key can carry at most one change
    row (enforce upstream with dropDuplicates; duplicate change keys
    would fan out like any MERGE). Two shuffles total on the key
    columns, independent of op mix; the change side is usually the
    small side and broadcastable.
    """
    payload = changes.filter(F.col(op_col).isin("I", "U")).drop(op_col)
    survivors = base.join(changes.select(*keys), keys, "left_anti")
    return survivors.unionByName(payload)
