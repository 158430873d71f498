"""Engine-wide expression helpers."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def rnd(col: Column | str, n: int = 2) -> Column:
    """Engine-portable rounding: ``floor(x * 10^n + 0.5) / 10^n``.

    Spark's ``round`` re-parses the double through its shortest decimal
    string (BigDecimal HALF_UP) while DuckDB rounds the binary value, so
    inputs sitting exactly on a half grain (common for products of
    2-decimal money values) round differently between engines. This
    formulation uses only IEEE ops both engines execute identically, so a
    Spark query and its DuckDB oracle produce bit-identical doubles.
    Oracle SQL must spell out the same formula.
    """
    if isinstance(col, str):
        col = F.col(col)
    p = 10**n
    return F.floor(col * p + F.lit(0.5)) / F.lit(p)


def spread(df, min_partitions: int | None = None, force: bool = False):
    """Ensure CPU-heavy downstream per-row work sees enough partitions.

    A small table read from one parquet file arrives as a single split,
    which would serialize heavy derivations (MinHash signatures, SimHash
    votes, text featurization) on one core. At real scale the file splits
    already provide parallelism and this is a no-op — the repartition only
    fires when the input has fewer partitions than the session's
    parallelism, so it never adds a shuffle to a properly-split 100 TB
    scan.

    ``force=True`` always inserts the exchange — used where the exchange
    is ALSO a CollapseProject barrier protecting a materialized column
    from being inlined into a higher-order-function lambda (see
    dedup.shingles).
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if force or df.rdd.getNumPartitions() < target:
        # The df.rdd partition probe costs ~0.1-0.3 s of driver-side
        # planning on wide text plans, but the max() is load-bearing at
        # scale: a forced barrier must never SHRINK a widely-split scan
        # to driver-parallelism-sized partitions.
        return df.repartition(max(target, df.rdd.getNumPartitions()))
    return df


def epoch_micros(col: Column | str, ntz: bool = True) -> Column:
    """Microsecond-exact epoch seconds*1e6 for both timestamp flavors,
    session-TZ immune, matching DuckDB ``epoch_us`` over the same
    parquet values.

    * ``ntz=False`` (TIMESTAMP instant): ``unix_micros`` reads the
      internal UTC micros directly — no wall-clock conversion.
    * ``ntz=True`` (TIMESTAMP_NTZ, what the parquet fixtures surface):
      ``unix_micros`` rejects NTZ and any cast through TIMESTAMP applies
      the session zone, so the epoch is rebuilt from TZ-free wall-clock
      components (day diff + hour/minute/second + the 'SSSSSS'
      fractional field). Integer arithmetic only — bit-exact.

    Use this (never ``unix_timestamp``/``cast``) wherever a duration or
    weight needs sub-second resolution; interval subtraction remains the
    right tool for pure gap comparisons (ops/sessionize.py).
    """
    if isinstance(col, str):
        col = F.col(col)
    if not ntz:
        return F.unix_micros(col)
    return (
        F.datediff(col, F.lit("1970-01-01").cast("date")).cast("long") * 86400
        + F.hour(col) * 3600
        + F.minute(col) * 60
        + F.second(col)
    ) * 1000000 + F.date_format(col, "SSSSSS").cast("long")


def bounded_collect(df, max_rows: int, why: str) -> list:
    """Collect a DataFrame the engine has ADJUDICATED as driver-safe,
    mechanically enforcing the documented bound.

    The "bounded driver-side recursion" family (Holt-Winters, PACF,
    GMM EM, DTW, binseg, IPF/raking, PQ/IVF codebook fits, BPE merges,
    …) legitimately collects calendar-grain (≤ ~2,400 rows),
    value-grain (≤ ~550), or domain-bounded matrices. The discipline
    keeping those collects safe used to be prose + review only; this
    helper makes it mechanical: the length check turns a quietly
    unbounded collect into a loud error naming the violated bound.

    ``why`` states the bound's provenance (e.g. "daily grain ≤ 2400",
    "vocab cap max_types=2000") so the error message is the
    adjudication.

    Deliberately a plain ``collect()`` + length assert, NOT
    ``limit(max_rows + 1).collect()``: CollectLimit runs Spark's
    incremental job escalation (1 partition, then scaleUpFactor×…),
    which would turn pinned single-job aggregates into multi-job plans
    (tests/test_sampling.py pins the weighted-mix counts step to ONE
    job). The guard therefore fires after one driver materialization of
    the offending frame — loud and immediate, which is the contract;
    the bound itself is what keeps that materialization small.
    """
    rows = df.collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"bounded_collect: driver-side bound violated ({why}): "
            f"got > {max_rows} rows — refusing to collect a "
            f"fact-scale frame"
        )
    return rows


def assert_grid_headroom(
    n: float, max_abs_term: float, what: str, grid_bits: int = 24
) -> None:
    """Loudly enforce the 2^-grid_bits term-grid exactness precondition
    (ADVICE r11, the bounded_collect philosophy applied to arithmetic).

    The Platt/GMM/IPF family's cross-engine bit-exactness rests on:
    sums of exact multiples of 2^-24 are EXACT in IEEE double in ANY
    summation order while the running total stays under
    2^53 · 2^-24 = 2^29. The headroom was documented in SCALING.md but
    nothing mechanically enforced it — a larger corpus would silently
    turn exact-hash oracles flaky instead of failing loudly. This
    assert makes the precondition a runtime contract: ``n`` terms each
    bounded by ``max_abs_term`` keep every running sum under the safe
    ceiling (with a 2x margin for partial-aggregation double counting
    headroom across Spark's map-side combiners).
    """
    ceiling = float(2 ** (53 - grid_bits))
    if n * max_abs_term * 2.0 >= ceiling:
        raise ValueError(
            f"grid-exactness headroom violated ({what}): "
            f"n={n:.0f} terms x max|term|<={max_abs_term:.6g} exceeds "
            f"the 2^{53 - grid_bits} exact-sum ceiling — the 2^-"
            f"{grid_bits} term grid no longer guarantees order-free "
            f"sums at this scale; re-derive the grid before trusting "
            f"the exact-hash oracle"
        )


# --- tracked dim-grain persists (ADVICE r9: persist-leak hygiene) ----
#
# Several rank/rollup queries persist a small dim-grain aggregate so a
# bounded side job and the returned plan share ONE fact shuffle
# (the checkpoint-the-dim idiom — extras14 rfm, extras25 rrf,
# temporal gap-fill, ops.timeseries rollup levels). The frame cannot
# be unpersisted inside the query function: the returned plan still
# references it lazily, and an eager unpersist would re-shuffle the
# fact table at execution time, undoing the rework's one-shuffle
# guarantee. Instead every such persist registers here, and any
# harness that runs MANY registry queries in one session (the oracle
# differential, bench, stress, the external driver) calls
# ``release_persists()`` after materializing each query's result.
# A session that never calls it leaks only dim-grain frames
# (customer/bucket grain, ~O(10k rows) each) for the session
# lifetime, bounded and eventually reclaimed by Spark's
# ContextCleaner once the plans are garbage-collected.
_SESSION_PERSISTS: list = []


def persist_dim(df, grain: str):
    """Persist a dim-grain frame and track it for release_persists().

    ``grain`` documents why the frame is small enough to cache
    (mirrors bounded_collect's ``why``); it is carried for error
    messages and audit greps, not enforced — persist is storage, not a
    driver materialization.
    """
    out = df.persist()
    _SESSION_PERSISTS.append((out, grain))
    return out


def release_persists() -> int:
    """Unpersist every tracked dim-grain frame; returns the count.

    Safe to call at any time: the frames' lineage is intact, so a plan
    still holding one simply recomputes it (dim-grain, one shuffle).
    Harnesses call this AFTER materializing a query's result, where
    recomputation can no longer occur.
    """
    n = 0
    while _SESSION_PERSISTS:
        df, _grain = _SESSION_PERSISTS.pop()
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release
        n += 1
    return n
