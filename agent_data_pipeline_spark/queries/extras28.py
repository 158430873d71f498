"""Round-5 surface additions: approx-edge scale siblings for the two
most user-facing customer-dimension window queries (round-4 verdict ask
#3).

`rfm_segments` and `gini_lorenz` (extras14) are the documented
exact-small variants: they aggregate facts to the customer dimension
and then run ONE global ntile/row_number window over the dim — exact,
fine at fixture scale, but at 100 TB the customer dim is itself
hundreds of millions of rows through a single window task. These
siblings keep the same segmentation / Lorenz semantics with
`approx_percentile` EDGES instead of global ranks:

* one tiny edge aggregate (a handful of doubles) replaces the global
  sort — computed map-side with t-digest partials, merged in one
  reduce;
* each customer is scored by comparing its value to the broadcast
  edges — embarrassingly parallel, no window over the dim at all;
* the Gini coefficient is the trapezoidal Lorenz-curve integral over
  the decile bins (binned Gini), instead of the exact rank formula.

Differences vs the exact variants, by construction: ntile() force-splits
ties across buckets to equalize bucket sizes, while edge-scoring puts
every tied value in the same bucket (the statistically honest choice —
a customer's score shouldn't depend on an arbitrary tie-break); and the
binned Gini lower-bounds the exact Gini by the within-bin concentration
it cannot see (≤ a decile's share of the area). `tests/test_extras28.py`
pins both: totals identical, marginal score shares near 20%, and
|gini_approx − gini_exact| within the decile-bin error bound.

Rows-only (approx_percentile's t-digest is engine-specific — DuckDB's
approx_quantile picks different edges); correctness is the tolerance
tests against the exact siblings plus the driver rows-only row.

Scale notes (100 TB): both queries are scan → dim-grain groupBy →
broadcast-edge score → coarse groupBy. No window ever sees more than
10 rows (the decile frame). The edge aggregate shuffles t-digest
sketches, not rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import QuerySpec, rnd, t


def _cents(col: F.Column) -> F.Column:
    """Exact integer cents via the engine-portable floor-round."""
    return F.floor(col * 100 + F.lit(0.5)).cast("long")


def _edge_score(value: F.Column, edges: list[F.Column], best_high: bool) -> F.Column:
    """Score 1-5 by comparing a value to four broadcast quintile edges.

    ``best_high=True``: bigger value ⇒ bigger score (frequency, spend).
    ``best_high=False``: smaller value ⇒ bigger score (recency days).
    Ties land on the lower score consistently (value must EXCEED an
    edge to clear it) — deterministic, engine-independent given edges.
    """
    e20, e40, e60, e80 = edges
    if best_high:
        return (
            F.when(value > e80, F.lit(5))
            .when(value > e60, F.lit(4))
            .when(value > e40, F.lit(3))
            .when(value > e20, F.lit(2))
            .otherwise(F.lit(1))
            .cast("long")
        )
    return (
        F.when(value < e20, F.lit(5))
        .when(value < e40, F.lit(4))
        .when(value < e60, F.lit(3))
        .when(value < e80, F.lit(2))
        .otherwise(F.lit(1))
        .cast("long")
    )


# --------------------------------------------------------------------------
# rfm_segments_approx — RFM via broadcast approx-quintile edges
# --------------------------------------------------------------------------


def _rfm_segments_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation at scale: per-customer recency/frequency/
    monetary exactly as `rfm_segments`, but scored against ONE
    broadcast approx_percentile edge row instead of three global ntile
    windows. Same named-segment census output schema. The only window
    anywhere is none at all — the dim-grain frame is scored row-local."""
    o = t(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_dt"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(_cents(F.col("o_totalprice"))).alias("mon_cents"),
    )
    anchor = o.agg(F.max("o_orderdate").alias("anchor_dt"))
    per = per.crossJoin(F.broadcast(anchor)).withColumn(
        "recency_days", F.datediff("anchor_dt", "last_dt").cast("long")
    )
    qs = F.array(*(F.lit(q) for q in (0.2, 0.4, 0.6, 0.8)))
    edges = per.agg(
        F.percentile_approx("recency_days", qs, 10000).alias("r_e"),
        F.percentile_approx("freq", qs, 10000).alias("f_e"),
        F.percentile_approx("mon_cents", qs, 10000).alias("m_e"),
    )
    scored = per.crossJoin(F.broadcast(edges)).select(
        _edge_score(
            F.col("recency_days"), [F.col("r_e")[i] for i in range(4)], False
        ).alias("r"),
        _edge_score(
            F.col("freq"), [F.col("f_e")[i] for i in range(4)], True
        ).alias("f"),
        _edge_score(
            F.col("mon_cents"), [F.col("m_e")[i] for i in range(4)], True
        ).alias("m"),
        "mon_cents",
    )
    seg = (
        F.when((F.col("r") >= 4) & (F.col("f") >= 4), F.lit("champion"))
        .when((F.col("f") >= 4), F.lit("loyal"))
        .when((F.col("r") <= 2) & (F.col("m") >= 4), F.lit("at_risk"))
        .when((F.col("r") <= 2) & (F.col("f") <= 2), F.lit("hibernating"))
        .otherwise(F.lit("regular"))
    )
    return (
        scored.withColumn("segment", seg)
        .groupBy("r", "f", "m", "segment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("mon_cents").alias("sum_mon_cents"),
        )
        .orderBy("r", "f", "m")
    )


# --------------------------------------------------------------------------
# gini_lorenz_approx — binned Gini + Lorenz deciles via approx edges
# --------------------------------------------------------------------------


def _gini_lorenz_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration at scale: per-customer lifetime cents
    exactly as `gini_lorenz`, decile assignment by broadcast
    approx_percentile edges (no global row_number/ntile window), Gini
    as the trapezoidal integral of the binned Lorenz curve:
    G = 1 − Σ Δpop_i · (cum_share_{i−1} + cum_share_i). The only
    window runs over ≤ 10 decile rows. Output schema matches the exact
    sibling (decile, n_customers, decile_cents, cum_share, gini)."""
    o = t(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.sum(_cents(F.col("o_totalprice"))).alias("cents")
    )
    qs = F.array(*(F.lit(i / 10.0) for i in range(1, 10)))
    edges = per.agg(F.percentile_approx("cents", qs, 10000).alias("e"))
    # decile = 1 + number of edges strictly below the value (ties stay
    # together in the lower bin — engine-independent given the edges)
    assigned = per.crossJoin(F.broadcast(edges)).select(
        "cents",
        (
            F.lit(1)
            + F.aggregate(
                "e",
                F.lit(0),
                lambda acc, edge: acc + F.when(F.col("cents") > edge, 1).otherwise(0),
            )
        ).cast("long").alias("decile"),
    )
    deciles = assigned.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("cents").alias("decile_cents"),
    )
    # Window-free since round 12 (allowlist burn-down; was cumulative +
    # lag windows over the ≤10-row decile frame): the Lorenz curve and
    # trapezoidal Gini run driver-side over the collected decile table
    # — integer counts/cents, so the cumulative sums are exact and the
    # shares are single divisions, as the windows computed them.
    import math

    from ..fns import bounded_collect

    rows = sorted(
        (
            (int(r["decile"]), int(r["n_customers"]), int(r["decile_cents"]))
            for r in bounded_collect(deciles, 10, "10-row decile frame")
        )
    )
    n = sum(r[1] for r in rows)
    total_cents = sum(r[2] for r in rows)
    out = []
    cpop = csh = 0
    prev_pop = prev_share = 0.0
    trap_sum = 0.0
    curve = []
    for dec, nc, cents in rows:
        cpop += nc
        csh += cents
        cum_pop = cpop / n
        cum_share = csh / total_cents
        trap_sum += (cum_pop - prev_pop) * (cum_share + prev_share)
        prev_pop, prev_share = cum_pop, cum_share
        curve.append((dec, nc, cents, cum_share))
    gini = 1.0 - trap_sum

    def fl6(x: float) -> float:
        return math.floor(x * 1e6 + 0.5) / 1e6

    out = [
        (dec, nc, cents, fl6(cs), fl6(gini)) for dec, nc, cents, cs in curve
    ]
    return spark.createDataFrame(
        out,
        "decile BIGINT, n_customers BIGINT, decile_cents BIGINT, "
        "cum_share DOUBLE, gini DOUBLE",
    )


QUERIES: dict[str, QuerySpec] = {
    "rfm_segments_approx": QuerySpec(
        _rfm_segments_approx,
        None,
        "RFM census via broadcast approx-quintile edges (scale sibling "
        "of rfm_segments; no global window)",
    ),
    "gini_lorenz_approx": QuerySpec(
        _gini_lorenz_approx,
        None,
        "binned Lorenz/Gini via broadcast approx-decile edges (scale "
        "sibling of gini_lorenz; no global window)",
    ),
}
