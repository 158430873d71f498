"""Declarative data-quality expectations (Deequ/Great-Expectations shape).

The reference's only quality gate is the binary non-empty validation
(`dags/taxi_transform_dag.py:52` — our A1 ``validate_nonempty``). A
production pipeline wants *named, per-rule* violation counts so a batch
can be quarantined with a reason, not just rejected. ``run_expectations``
evaluates an arbitrary list of boolean rules over a table in ONE
aggregation pass and returns the long-form audit report.

Plan shape (the 100 TB story): every rule becomes one conditional
aggregate (``count_if(NOT rule)``) inside a single global ``agg`` — one
scan, map-side partial aggregation, a single-row shuffle regardless of
table size or rule count. The single wide row is then unpivoted to
long form with ``stack`` (a per-row expression on ONE row — no second
scan, no driver loop). Adding a 50th rule adds a column to the
aggregate, not a job.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def run_expectations(
    df: DataFrame, checks: list[tuple[str, Column]]
) -> DataFrame:
    """Evaluate named boolean expectations over ``df`` in one pass.

    ``checks`` is a list of ``(name, rule)`` where ``rule`` is a boolean
    Column that should hold for every row; a NULL rule result (e.g. a
    comparison against NULL) counts as a violation — the conservative
    audit contract.

    Returns one row per expectation:
    ``expectation | violations | total | passed`` (passed = violations
    == 0, as BIGINT 0/1 for engine-neutral hashing).
    """
    if not checks:
        raise ValueError("run_expectations: checks list must be non-empty")
    names = [n for n, _ in checks]
    if len(set(names)) != len(names):
        raise ValueError(f"run_expectations: duplicate expectation names in {names}")
    wide = df.agg(
        F.count(F.lit(1)).alias("_total"),
        *[
            F.count_if(~F.coalesce(rule, F.lit(False))).alias(f"_v_{i}")
            for i, (_, rule) in enumerate(checks)
        ],
    )
    stack_args = ", ".join(
        f"'{name}', _v_{i}" for i, (name, _) in enumerate(checks)
    )
    return wide.select(
        F.expr(
            f"stack({len(checks)}, {stack_args}) AS (expectation, violations)"
        ),
        F.col("_total").alias("total"),
    ).select(
        "expectation",
        "violations",
        "total",
        (F.col("violations") == 0).cast("bigint").alias("passed"),
    )


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Column-profile audit: one row per column with null count, null
    fraction, and EXACT distinct count — the first thing a data engineer
    asks of an unfamiliar 100 TB table, and the input to join-key /
    partition-key choices (skew_report's column-level sibling).

    ONE pass over the data: all profiles fold into a single Aggregate.
    The multiple COUNT(DISTINCT) make Catalyst plan an Expand (k-way row
    multiplication before the shuffle) — the standard exact-distinct
    trade; swap to approx_count_distinct when a 2% error is acceptable
    and the Expand is not (documented, deliberate default to exact so
    the audit is hashable).
    """
    cols = cols or df.columns
    wide = df.agg(
        F.count(F.lit(1)).alias("_total"),
        *[
            F.count_if(F.col(c).isNull()).alias(f"_n_{i}")
            for i, c in enumerate(cols)
        ],
        *[
            F.count_distinct(F.col(c)).alias(f"_d_{i}")
            for i, c in enumerate(cols)
        ],
    )
    stack_args = ", ".join(
        f"'{c}', _n_{i}, _d_{i}" for i, c in enumerate(cols)
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column_name, n_nulls, n_distinct)"
        ),
        F.col("_total").alias("n_rows"),
    ).select(
        "column_name",
        "n_rows",
        "n_nulls",
        "n_distinct",
        (F.col("n_nulls") / F.col("n_rows")).alias("null_fraction"),
    )
