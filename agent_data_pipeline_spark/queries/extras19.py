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
    """Pareto front over (minimize price, maximize size): sort by
    (price asc, size desc); a row survives iff its size is strictly
    greater than the max size over all strictly-cheaper rows (and it is
    the first at its (price, size) point — duplicates collapse, like
    the set-semantics oracle)."""
    p = t(spark, sf_dir, "part").select(
        F.floor(F.col("p_retailprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("price_cents"),
        F.col("p_size").cast("long").alias("size"),
    ).distinct()
    w = Window.orderBy("price_cents").rangeBetween(
        Window.unboundedPreceding, -1
    )
    sky = (
        p.withColumn("best_cheaper", F.max("size").over(w))
        .filter(
            F.col("best_cheaper").isNull()
            | (F.col("size") > F.col("best_cheaper"))
        )
        .select("price_cents", "size")
    )
    # Collapse same-price points: only the largest size at a given price
    # is non-dominated (cheaper-or-equal with strictly larger size
    # dominates under the (≤, ≥, ≠) rule used by the oracle).
    wp = Window.partitionBy("price_cents")
    return (
        sky.withColumn("mx", F.max("size").over(wp))
        .filter(F.col("size") == F.col("mx"))
        .select("price_cents", "size")
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
