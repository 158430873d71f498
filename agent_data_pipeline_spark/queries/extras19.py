"""Round-4 surface additions, part 14: skyline (Pareto-front) queries.

`skyline_parts` finds the non-dominated set over (retail price ↓,
size ↑): a part is on the skyline iff no other part is both cheaper
and larger. The classic formulation is a quadratic NOT-EXISTS
anti-join — that IS the oracle here, proving the engine's plan
computes the identical set — but the Spark plan is the O(n log n)
sort-scan: order by (price asc, size desc), keep rows whose size
strictly exceeds the running maximum size of everything cheaper.

Scale note (100 TB): the sort-scan runs on the part DIMENSION (never
facts), and the single global window is the documented exact-small
variant; for fact-scale skylines the same rule applies per grid cell
(partition by a coarse price bucket, keep cell-local skylines, then
one tiny merge pass — same shape as the bucket-then-refine quantile).

Determinism: price in exact cents, sizes integer; ties on (price) are
resolved by the strict-dominance rule itself (equal price + larger
size still wins), so no tie-break key is needed beyond the ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import QuerySpec, t


def _skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto front over (minimize price, maximize size), WINDOW-FREE
    (round-10 allowlist burn-down; was a global range window over the
    distinct (price, size) point set — dim-scale but still a
    single-partition sort).

    Key fact: the front has at most |size domain| points (sorted by
    price asc, front sizes strictly increase), and p_size is a small
    integer dimension (1..50 in TPC-H). So:

      1. ``q(s)`` = min price at each exact size — ONE fact-scale
         equi-aggregate (map-side combine), ≤ |sizes| rows out.
      2. ``m_gt(s)`` = min price over sizes strictly greater — a
         suffix-min over the ≤50-row frame, computed as an
         explode-sequence equi-aggregate (each (s', q') contributes to
         targets 1..s'-1; ≤ |sizes|·max_size rows, constant at any
         corpus scale) — the same bucket-decomposition trick as
         gini_lorenz, no window, no theta join (a theta self-join
         would be a non-cross BNLJ, trading one audit flag for
         another).
      3. (q(s), s) is on the front iff q(s) < m_gt(s): any dominator
         must have size > s and price ≤ q(s), which is exactly
         m_gt(s) ≤ q(s); sizes ≥ s never beat q(s) by construction.

    Grain assumption (documented, guarded): integer size domain — the
    explode emits ``size − 1`` rows per distinct size, so the plan is
    constant-size for any bounded size dimension; a guard raises if
    max size exceeds 100k rather than exploding quietly."""
    p = t(spark, sf_dir, "part").select(
        F.floor(F.col("p_retailprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("price_cents"),
        F.col("p_size").cast("long").alias("size"),
    )
    g = p.groupBy("size").agg(F.min("price_cents").alias("q"))
    from ..fns import bounded_collect

    # guard the explode bound (1-row probe; the size dim is tiny)
    max_size = bounded_collect(
        g.agg(F.max("size").alias("mx")), 1, "1-row max-size probe"
    )[0].mx
    if max_size is None:
        return g.select("price_cents", "size").limit(0)
    if max_size > 100_000:
        raise ValueError(
            f"skyline_parts: size domain {max_size} exceeds the documented "
            "integer-dimension bound (100k) — explode-sequence suffix-min "
            "would blow up; re-shape with size bucketing first"
        )
    contrib = g.select(
        F.explode(F.sequence(F.lit(1), F.col("size") - 1)).alias("size_t"),
        F.col("q").alias("q_gt"),
    )
    m_gt = contrib.groupBy("size_t").agg(F.min("q_gt").alias("m_gt"))
    return (
        g.join(F.broadcast(m_gt), g["size"] == m_gt["size_t"], "left")
        .filter(F.col("m_gt").isNull() | (F.col("q") < F.col("m_gt")))
        .select(F.col("q").alias("price_cents"), "size")
        .orderBy("price_cents")
    )


_SKYLINE_SQL = """
WITH pts AS (
  SELECT DISTINCT CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)
           AS price_cents,
         CAST(p_size AS BIGINT) AS size
  FROM part
)
SELECT price_cents, size
FROM pts a
WHERE NOT EXISTS (
  SELECT 1 FROM pts b
  WHERE b.price_cents <= a.price_cents AND b.size >= a.size
    AND (b.price_cents < a.price_cents OR b.size > a.size)
)
ORDER BY price_cents
"""


QUERIES: dict[str, QuerySpec] = {
    "skyline_parts": QuerySpec(
        _skyline_parts,
        _SKYLINE_SQL,
        "2-D Pareto front via sort-scan (oracle: quadratic NOT EXISTS)",
    ),
}
