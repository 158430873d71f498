"""Round-4 surface additions, part 7: record mastering and
distribution-shape audits.

`golden_record` is the survivorship merge every customer-data platform
runs (last non-null value per attribute per entity); `pareto_revenue`
is the concentration census (how many top customers carry 80% of
revenue) computed in integer cents so the cumulative comparison has no
float boundary at all; `benford_digits` is the classic first-digit
fraud/quality audit; `path_3grams` extends the transition matrix
(extras11.event_transitions) to three-step path mining.

All aggregation keys and counts are integers; the only floats are
single IEEE divisions of exact integers (bit-identical across engines)
and log10 expectation constants rounded off-grid at 6 decimals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import QuerySpec, rnd, t


# --------------------------------------------------------------------------
# golden_record — survivorship merge (last non-null per attribute)
# --------------------------------------------------------------------------


def _golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden-record mastering: per customer, the LAST NON-NULL value of
    each tracked attribute across their order history — the
    survivorship rule record-linkage systems apply after matching.
    Sparse attributes are simulated by nulling fields on a deterministic
    predicate. One aggregation, one shuffle on the entity key:
    ``max_by(attr, CASE WHEN attr IS NOT NULL THEN ord END)`` skips
    null-valued updates because both engines ignore rows whose ordering
    key is NULL (verified semantics, not an accident of one engine).
    The ordering key packs (epoch day, orderkey) into one BIGINT so
    ties are impossible."""
    o = t(spark, sf_dir, "orders")
    ordk = (
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01")).cast("long")
        * 10_000_000_000
        + F.col("o_orderkey")
    )
    prio = F.when(F.col("o_orderstatus") == "F", F.col("o_orderpriority"))
    big = F.when(F.col("o_totalprice") > 200000.0, F.col("o_totalprice"))
    u = o.select(
        F.col("o_custkey").alias("cust"),
        ordk.alias("ordk"),
        prio.alias("prio"),
        big.alias("big"),
    )
    return (
        u.groupBy("cust")
        .agg(
            F.count(F.lit(1)).alias("n_updates"),
            F.expr(
                "max_by(prio, CASE WHEN prio IS NOT NULL THEN ordk END)"
            ).alias("last_priority"),
            F.expr(
                "max_by(big, CASE WHEN big IS NOT NULL THEN ordk END)"
            ).alias("last_big_total"),
            F.max("ordk").alias("last_ordk"),
        )
        .orderBy("cust")
    )


_GOLDEN_RECORD_SQL = """
WITH u AS (
  SELECT o_custkey AS cust,
         CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
              AS BIGINT) * 10000000000 + o_orderkey AS ordk,
         CASE WHEN o_orderstatus = 'F' THEN o_orderpriority END AS prio,
         CASE WHEN o_totalprice > 200000.0 THEN o_totalprice END AS big
  FROM orders
)
SELECT cust,
       CAST(count(*) AS BIGINT) AS n_updates,
       arg_max(prio, CASE WHEN prio IS NOT NULL THEN ordk END)
         AS last_priority,
       arg_max(big, CASE WHEN big IS NOT NULL THEN ordk END)
         AS last_big_total,
       max(ordk) AS last_ordk
FROM u GROUP BY cust ORDER BY cust
"""


# --------------------------------------------------------------------------
# pareto_revenue — concentration census in integer cents
# --------------------------------------------------------------------------


def _pareto_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/20 concentration: the smallest number of top customers whose
    cumulative revenue reaches 80% of the total. Per-customer revenue
    is converted to INTEGER CENTS before the ranked cumulative sum, so
    the >= threshold comparison (cum*10 >= total*8, all BIGINT) has no
    float boundary an engine ulp could flip. One shuffle for the
    per-customer agg; the ranked cumsum runs over customer-count rows
    (dimension scale), not order rows."""
    o = t(spark, sf_dir, "orders")
    rev = (
        o.groupBy(F.col("o_custkey").alias("cust"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            ).alias("cents")
        )
    )
    # Round-8 rework: the ranked cumulative sum over the CUSTOMER grain
    # (a dimension that grows with data — 10x ratios ~3 in the stress
    # record) is replaced by the bucket-histogram + refine pattern: the
    # 80% crossing point lands in exactly one $1000 revenue bucket
    # (buckets order-partition the (cents desc, cust) total order, so a
    # bucket-grain top-down cumulative locates it), and only THAT
    # bucket's rows get a ranked running sum. All comparisons stay on
    # the exact integer grid (cum*10 vs total*8) — semantics identical
    # to the full windowed cumsum; the oracle is unchanged.
    tot = rev.agg(
        F.sum("cents").alias("total"),
        F.count(F.lit(1)).alias("n_customers"),
        F.max("cents").alias("top_cents"),
    )
    bucketed = rev.withColumn(
        "b", F.floor(F.col("cents") / 100000).cast("long")
    )
    bagg = bucketed.groupBy("b").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("cents").alias("s")
    )
    # Window-free since round 12 (allowlist burn-down; was a global
    # bucket-desc cumulative): the bucket histogram is value-domain
    # bounded (≤ max customer revenue / $1000 rows at any fact scale),
    # so the top-down cumulative and the 80% crossing search run
    # driver-side over the collected histogram — the same exact
    # integer cum*10 vs total*8 comparisons, zero float boundaries.
    from ..fns import bounded_collect

    tot_row = tot.collect()[0]
    if tot_row["total"] is None:
        raise ValueError(
            "pareto_revenue needs a non-empty orders table"
        )
    total_i = int(tot_row["total"])
    brows = sorted(
        (
            (int(r["b"]), int(r["cnt"]), int(r["s"]))
            for r in bounded_collect(
                bagg, 200_000, "revenue-bucket value grain ($1000 wide)"
            )
        ),
        key=lambda x: -x[0],
    )
    cum_cnt = cum_s = 0
    b_star = None
    for b, cnt, s_ in brows:
        if cum_s * 10 < total_i * 8 <= (cum_s + s_) * 10:
            b_star = (b, cum_cnt, cum_s)
            break
        cum_cnt += cnt
        cum_s += s_
    if b_star is None:
        raise ValueError(
            "pareto crossing bucket not found — empty revenue table?"
        )
    crossing = spark.createDataFrame(
        [b_star],
        "b_star LONG, cum_cnt_before LONG, cum_s_before LONG",
    )
    w_in = Window.partitionBy("b").orderBy(
        F.col("cents").desc(), F.col("cust")
    ).rowsBetween(Window.unboundedPreceding, 0)
    in_bucket = (
        bucketed.join(
            F.broadcast(crossing), bucketed["b"] == crossing["b_star"]
        )
        .withColumn("cum_in", F.sum("cents").over(w_in))
        .crossJoin(F.broadcast(tot.select("total")))
        .agg(
            F.sum(
                F.when(
                    (F.col("cum_s_before") + F.col("cum_in")) * 10
                    < F.col("total") * 8,
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).alias("c_in"),
            F.max("cum_cnt_before").alias("cum_cnt_before"),
        )
    )
    return (
        tot.crossJoin(F.broadcast(in_bucket))
        .select(
            F.col("total").cast("long").alias("total_cents"),
            F.col("n_customers").cast("long").alias("n_customers"),
            (F.col("cum_cnt_before") + F.col("c_in") + 1)
            .cast("long")
            .alias("n_top80"),
            F.col("top_cents").cast("long").alias("top_customer_cents"),
        )
    )


_PARETO_SQL = """
WITH rev AS (
  SELECT o_custkey AS cust,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
), ranked AS (
  SELECT cust, cents,
         sum(cents) OVER (ORDER BY cents DESC, cust
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         sum(cents) OVER () AS total
  FROM rev
)
SELECT CAST(max(total) AS BIGINT) AS total_cents,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(CASE WHEN cum * 10 < total * 8 THEN 1 ELSE 0 END) + 1
            AS BIGINT) AS n_top80,
       CAST(max(cents) AS BIGINT) AS top_customer_cents
FROM ranked
"""


# --------------------------------------------------------------------------
# benford_digits — first-significant-digit distribution audit
# --------------------------------------------------------------------------


def _benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit over order totals: observed digit
    frequencies vs the Benford expectation log10(1 + 1/d), with the
    per-digit chi-square component. Frequencies are single divisions of
    exact integer counts (bit-identical); the expectation and chi
    component round at 6 decimals (off-grid transcendental — see
    core.py determinism rules). Single aggregation over the scan."""
    o = t(spark, sf_dir, "orders")
    d1 = F.substring(F.col("o_totalprice").cast("string"), 1, 1).cast("long")
    counts = (
        o.select(d1.alias("digit"))
        .filter(F.col("digit").between(1, 9))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = Window.partitionBy()
    obs = F.col("n") / F.sum("n").over(tot)
    exp = F.log10(1 + 1 / F.col("digit"))
    chi = (obs - exp) * (obs - exp) / exp
    return (
        counts.select(
            "digit",
            "n",
            rnd(obs, 6).alias("observed"),
            rnd(exp, 6).alias("expected"),
            rnd(chi * F.sum("n").over(tot), 6).alias("chi_component"),
        )
        .orderBy("digit")
    )


_BENFORD_SQL = """
WITH counts AS (
  SELECT CAST(substring(CAST(o_totalprice AS VARCHAR), 1, 1) AS BIGINT)
           AS digit,
         CAST(count(*) AS BIGINT) AS n
  FROM orders
  WHERE CAST(substring(CAST(o_totalprice AS VARCHAR), 1, 1) AS BIGINT)
          BETWEEN 1 AND 9
  GROUP BY 1
)
SELECT digit, n,
       floor(n / sum(n) OVER () * 1000000 + 0.5) / 1000000 AS observed,
       floor(log10(1 + 1 / digit) * 1000000 + 0.5) / 1000000 AS expected,
       floor((n / sum(n) OVER () - log10(1 + 1 / digit))
             * (n / sum(n) OVER () - log10(1 + 1 / digit))
             / log10(1 + 1 / digit) * sum(n) OVER ()
             * 1000000 + 0.5) / 1000000 AS chi_component
FROM counts
ORDER BY digit
"""


# --------------------------------------------------------------------------
# path_3grams — three-step path mining over per-user sequences
# --------------------------------------------------------------------------


def _path_3grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 three-step event-type paths (the path-mining sibling of
    extras11.event_transitions): two lead windows over the same
    (user_id; ts, event_id) ordering — one Exchange serves both — then
    a count and a total-ordered top-k."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("s1"),
        F.lead("event_type", 1).over(w).alias("s2"),
        F.lead("event_type", 2).over(w).alias("s3"),
    ).filter(F.col("s3").isNotNull())
    return (
        seq.groupBy("s1", "s2", "s3")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "s1", "s2", "s3")
        .limit(20)
    )


_PATH_3GRAMS_SQL = """
WITH seq AS (
  SELECT event_type AS s1,
         lead(event_type, 1) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS s2,
         lead(event_type, 2) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS s3
  FROM events
)
SELECT s1, s2, s3, CAST(count(*) AS BIGINT) AS n
FROM seq WHERE s3 IS NOT NULL
GROUP BY s1, s2, s3
ORDER BY n DESC, s1, s2, s3
LIMIT 20
"""


QUERIES: dict[str, QuerySpec] = {
    "golden_record": QuerySpec(
        _golden_record,
        _GOLDEN_RECORD_SQL,
        "survivorship merge: last non-null attribute per entity",
    ),
    "pareto_revenue": QuerySpec(
        _pareto_revenue,
        _PARETO_SQL,
        "80/20 revenue concentration census in integer cents",
    ),
    "benford_digits": QuerySpec(
        _benford_digits,
        _BENFORD_SQL,
        "Benford first-digit distribution audit with chi components",
    ),
    "path_3grams": QuerySpec(
        _path_3grams,
        _PATH_3GRAMS_SQL,
        "top-20 three-step event paths (sequence mining)",
    ),
}
