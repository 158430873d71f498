"""Round-4 surface additions, part 20: graph degree census and rank
fusion.

`degree_distribution` is the first thing anyone computes on a graph:
the degree histogram of the co-purchase graph (parts linked when one
customer bought both), plus each degree's share — the input to
power-law eyeballing and skew planning (hot vertices are the join-skew
risk the LSH/salting machinery exists for). `rrf_rank_fusion` is
reciprocal-rank fusion (RRF, the standard zero-tuning rank combiner in
IR): customers ranked independently by revenue and by order count,
fused by Σ 1/(60 + rank).

Determinism: degrees/ranks are exact integers with key tie-breaks; the
RRF score is a sum of two exact-input divisions, rounded at 6;
the fused top-20 orders by (rounded score desc, key).

Scale notes (100 TB): the co-purchase edge list is the measured
`copurchase_pairs` shape (per-customer pair explode with a hot-customer
cap); degrees are one aggregate over edges. Rank windows run over the
customer dimension (exact-small variant, like RFM)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import QuerySpec, rnd, t


def _degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the co-purchase graph: edges = distinct part
    pairs bought by the same customer (orders joined to lineitems,
    capped to customers with ≤ 20 distinct parts — the same hot-vertex
    cap the copurchase op documents), degree = distinct neighbors per
    part, histogram = parts per degree with shares."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    cp = (
        li.join(o.select("o_orderkey", "o_custkey"),
                li.l_orderkey == F.col("o_orderkey"))
        .select("o_custkey", "l_partkey")
        .distinct()
    )
    sizes = cp.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("np"))
    small = cp.join(
        F.broadcast(sizes.filter(F.col("np") <= 20).select("o_custkey")),
        "o_custkey",
    )
    a = small.alias("a")
    b = small.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .distinct()
    )
    deg = (
        edges.select(F.col("u").alias("p"))
        .unionAll(edges.select(F.col("v").alias("p")))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    hist = deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_parts"))
    tot = Window.partitionBy()
    return (
        hist.withColumn(
            "share", rnd(F.col("n_parts") / F.sum("n_parts").over(tot), 6)
        )
        .orderBy("degree")
    )


_DEGREE_SQL = """
WITH cp AS (
  SELECT DISTINCT o.o_custkey, l.l_partkey
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), small AS (
  SELECT cp.* FROM cp
  JOIN (SELECT o_custkey FROM cp GROUP BY 1 HAVING count(*) <= 20) s
    USING (o_custkey)
), edges AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM small a JOIN small b
    ON a.o_custkey = b.o_custkey AND a.l_partkey < b.l_partkey
), deg AS (
  SELECT p, CAST(count(*) AS BIGINT) AS degree
  FROM (SELECT u AS p FROM edges UNION ALL SELECT v FROM edges)
  GROUP BY p
), hist AS (
  SELECT degree, CAST(count(*) AS BIGINT) AS n_parts FROM deg GROUP BY degree
)
SELECT degree, n_parts,
       floor(n_parts / CAST(sum(n_parts) OVER () AS DOUBLE) * 1000000 + 0.5)
         / 1000000 AS share
FROM hist
ORDER BY degree
"""


def _rrf_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of two independent customer rankings —
    by lifetime revenue (cents) and by order count — fused as
    Σ 1/(60 + rank); emits the fused top-20 with both source ranks.
    Rankings tie-break on the customer key; the fusion constant 60 is
    the published RRF default."""
    o = t(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        ).alias("cents"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w_rev = Window.orderBy(F.col("cents").desc(), F.col("o_custkey"))
    w_frq = Window.orderBy(F.col("n_orders").desc(), F.col("o_custkey"))
    ranked = per.select(
        "o_custkey",
        F.row_number().over(w_rev).cast("long").alias("rev_rank"),
        F.row_number().over(w_frq).cast("long").alias("freq_rank"),
    )
    fused = ranked.withColumn(
        "rrf_score",
        rnd(
            1.0 / (60 + F.col("rev_rank")) + 1.0 / (60 + F.col("freq_rank")),
            6,
        ),
    )
    return (
        fused.orderBy(F.col("rrf_score").desc(), F.col("o_custkey"))
        .limit(20)
        .orderBy(F.col("rrf_score").desc(), F.col("o_custkey"))
    )


_RRF_SQL = """
WITH per AS (
  SELECT o_custkey,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1
), ranked AS (
  SELECT o_custkey,
         CAST(row_number() OVER (ORDER BY cents DESC, o_custkey) AS BIGINT)
           AS rev_rank,
         CAST(row_number() OVER (ORDER BY n_orders DESC, o_custkey) AS BIGINT)
           AS freq_rank
  FROM per
)
SELECT o_custkey, rev_rank, freq_rank,
       floor((1.0 / (60 + rev_rank) + 1.0 / (60 + freq_rank))
             * 1000000 + 0.5) / 1000000 AS rrf_score
FROM ranked
ORDER BY rrf_score DESC, o_custkey
LIMIT 20
"""


QUERIES: dict[str, QuerySpec] = {
    "degree_distribution": QuerySpec(
        _degree_distribution,
        _DEGREE_SQL,
        "co-purchase graph degree histogram with shares",
    ),
    "rrf_rank_fusion": QuerySpec(
        _rrf_rank_fusion,
        _RRF_SQL,
        "reciprocal-rank fusion of revenue and frequency rankings",
    ),
}
