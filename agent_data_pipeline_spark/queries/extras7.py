"""Round-4 surface additions, part 2: pipeline-operations operators.

The reference's operational story is batch TRUNCATE+INSERT with a
binary non-empty gate (`dags/taxi_transform_dag.py:41,52`); a lakehouse
running the same workloads incrementally needs the five ops here —
named data-quality expectations, CDC snapshot diffing, point-in-time
SCD2 lookup, algebraic rollup maintenance — plus two corpus-curation
ops (per-source caps, PMI collocations) the LLM-data north star adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fns import rnd, spread
from ..llmdata import hygiene, sampling
from ..ops import expectations, merge
from .core import QuerySpec, t


# --------------------------------------------------------------------------
# expectations_audit
# --------------------------------------------------------------------------


def _expectations_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named data-quality expectation suite over lineitem, evaluated in
    ONE aggregation pass (ops/expectations.run_expectations): five
    rules chosen so the fixture produces a mix of passing and failing
    audits. Oracle states each rule as a count_if aggregate."""
    li = t(spark, sf_dir, "lineitem")
    report = expectations.run_expectations(
        li,
        [
            ("quantity_in_1_50", F.col("l_quantity").between(1, 50)),
            ("discount_le_008", F.col("l_discount") <= 0.08),
            ("price_min_1000", F.col("l_extendedprice") >= 1000),
            ("shipdate_before_2001", F.col("l_shipdate") < F.lit("2001-01-01").cast("timestamp")),
            ("returnflag_domain", F.col("l_returnflag").isin("A", "N", "R")),
        ],
    )
    return report.orderBy("expectation")


_EXPECTATIONS_AUDIT_SQL = """
WITH agg AS (
  SELECT count(*) AS total,
         count(*) FILTER (NOT coalesce(l_quantity BETWEEN 1 AND 50, FALSE)) AS v1,
         count(*) FILTER (NOT coalesce(l_discount <= 0.08, FALSE)) AS v2,
         count(*) FILTER (NOT coalesce(l_extendedprice >= 1000, FALSE)) AS v3,
         count(*) FILTER (NOT coalesce(l_shipdate < TIMESTAMP '2001-01-01', FALSE)) AS v4,
         count(*) FILTER (NOT coalesce(l_returnflag IN ('A','N','R'), FALSE)) AS v5
  FROM lineitem
)
, longform AS (
  SELECT 'quantity_in_1_50' AS expectation, v1 AS violations, total FROM agg
  UNION ALL SELECT 'discount_le_008', v2, total FROM agg
  UNION ALL SELECT 'price_min_1000', v3, total FROM agg
  UNION ALL SELECT 'shipdate_before_2001', v4, total FROM agg
  UNION ALL SELECT 'returnflag_domain', v5, total FROM agg
)
SELECT expectation,
       CAST(violations AS BIGINT) AS violations,
       CAST(total AS BIGINT) AS total,
       CAST(CASE WHEN violations = 0 THEN 1 ELSE 0 END AS BIGINT) AS passed
FROM longform
ORDER BY expectation
"""


# --------------------------------------------------------------------------
# snapshot_diff_summary
# --------------------------------------------------------------------------


def _snapshot_diff_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC diff of two synthetic snapshots of orders (ops/merge
    .snapshot_diff): the 'old' snapshot is missing every key ≡ 3 mod 11
    (later inserts), the 'new' one drops every key ≡ 5 mod 13 (deletes)
    and reprices/reprioritizes keys ≡ 0 mod 7 / 0 mod 19 (updates, with
    per-column change attribution). One full-outer join on the key;
    the oracle states the same join algebra."""
    o = t(spark, sf_dir, "orders")
    old = o.filter(F.col("o_orderkey") % 11 != 3)
    new = o.filter(F.col("o_orderkey") % 13 != 5).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 10.0)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        F.when(F.col("o_orderkey") % 19 == 0, F.lit("9-RECLASSIFIED"))
        .otherwise(F.col("o_orderpriority"))
        .alias("o_orderpriority"),
        "o_orderstatus",
    )
    return merge.snapshot_diff(
        old.select("o_orderkey", "o_totalprice", "o_orderpriority", "o_orderstatus"),
        new,
        keys=["o_orderkey"],
        compare=["o_totalprice", "o_orderpriority", "o_orderstatus"],
    ).orderBy("o_orderkey")


_SNAPSHOT_DIFF_SQL = """
WITH old AS (
  SELECT o_orderkey, o_totalprice, o_orderpriority, o_orderstatus
  FROM orders WHERE o_orderkey % 11 <> 3
), new AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 10.0
              ELSE o_totalprice END AS o_totalprice,
         CASE WHEN o_orderkey % 19 = 0 THEN '9-RECLASSIFIED'
              ELSE o_orderpriority END AS o_orderpriority,
         o_orderstatus
  FROM orders WHERE o_orderkey % 13 <> 5
), j AS (
  SELECT coalesce(old.o_orderkey, new.o_orderkey) AS o_orderkey,
         old.o_orderkey IS NOT NULL AS in_old,
         new.o_orderkey IS NOT NULL AS in_new,
         old.o_totalprice IS DISTINCT FROM new.o_totalprice AS d_price,
         old.o_orderpriority IS DISTINCT FROM new.o_orderpriority AS d_prio,
         old.o_orderstatus IS DISTINCT FROM new.o_orderstatus AS d_status
  FROM old FULL OUTER JOIN new USING (o_orderkey)
)
SELECT o_orderkey,
       CASE WHEN in_old AND NOT in_new THEN 'delete'
            WHEN in_new AND NOT in_old THEN 'insert'
            ELSE 'update' END AS change_type,
       CASE WHEN in_old AND in_new THEN concat_ws(',',
              CASE WHEN d_prio THEN 'o_orderpriority' END,
              CASE WHEN d_status THEN 'o_orderstatus' END,
              CASE WHEN d_price THEN 'o_totalprice' END)
            ELSE '' END AS changed_cols
FROM j
WHERE (NOT in_old) OR (NOT in_new) OR d_price OR d_prio OR d_status
ORDER BY o_orderkey
"""


# --------------------------------------------------------------------------
# scd2_pointintime_join
# --------------------------------------------------------------------------


def _scd2_pointintime_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct fact lookup against the SCD2 dimension the
    scd2_customers query maintains (ops/merge.point_in_time_join):
    every order picks the balance version valid AT ITS ORDER DATE —
    orders before the 1998-06-01 batch see the original balance,
    later orders on changed keys (≡ 0 mod 7) see bal+100. The
    feature-store lookup that prevents time-travel leakage. The join is
    an equi-join on the customer key with the interval predicate as a
    residual; the SCD2 non-overlap invariant means no fan-out."""
    c = t(spark, sf_dir, "customer")
    dim = c.select(
        F.col("c_custkey").alias("id"),
        F.col("c_acctbal").alias("bal"),
        F.lit("1995-01-01").alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
    )
    upd = c.filter(F.col("c_custkey") % 7 == 0).select(
        F.col("c_custkey").alias("id"),
        (F.col("c_acctbal") + 100).alias("bal"),
    )
    versions = merge.scd2_apply(dim, upd, "id", ["bal"], "1998-06-01")
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.col("o_orderdate").cast("date").alias("od")
    )
    out = merge.point_in_time_join(
        o,
        versions,
        fact_key="o_custkey",
        fact_ts=F.date_format(F.col("od"), "yyyy-MM-dd"),
        dim_key="id",
    )
    return out.select(
        "o_orderkey",
        "o_custkey",
        F.date_format(F.col("od"), "yyyy-MM-dd").alias("order_date"),
        "bal",
        "valid_from",
    ).orderBy("o_orderkey")


_SCD2_PIT_SQL = """
WITH dim AS (
  SELECT c_custkey AS id, c_acctbal AS bal, '1995-01-01' AS valid_from,
         CASE WHEN c_custkey % 7 = 0 THEN '1998-06-01' END AS valid_to
  FROM customer
  UNION ALL
  SELECT c_custkey, c_acctbal + 100, '1998-06-01', NULL
  FROM customer WHERE c_custkey % 7 = 0
)
SELECT o_orderkey, o_custkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       dim.bal, dim.valid_from
FROM orders
LEFT JOIN dim ON o_custkey = dim.id
  AND strftime(o_orderdate, '%Y-%m-%d') >= dim.valid_from
  AND (dim.valid_to IS NULL OR strftime(o_orderdate, '%Y-%m-%d') < dim.valid_to)
ORDER BY o_orderkey
"""


# --------------------------------------------------------------------------
# source_cap_sample
# --------------------------------------------------------------------------


def _source_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus cap (llmdata/sampling.cap_per_group): keep the
    first 10 documents per source by doc_id — the domain-balancing step
    that stops one crawl source from dominating a training mix. Output
    audits WHICH rows were kept (max kept id), not just counts, so the
    ordering contract is hash-checked too."""
    d = t(spark, sf_dir, "documents")
    kept = sampling.cap_per_group(d, ["source"], ["doc_id"], cap=10)
    totals = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_total"))
    kept_agg = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("doc_id").alias("max_kept_doc_id"),
        F.sum("n_chars").alias("kept_chars"),
    )
    return (
        totals.join(kept_agg, "source")
        .select("source", "n_total", "n_kept", "max_kept_doc_id", "kept_chars")
        .orderBy("source")
    )


_SOURCE_CAP_SQL = """
WITH ranked AS (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(count(*) FILTER (rn <= 10) AS BIGINT) AS n_kept,
       max(doc_id) FILTER (rn <= 10) AS max_kept_doc_id,
       CAST(sum(n_chars) FILTER (rn <= 10) AS BIGINT) AS kept_chars
FROM ranked
GROUP BY source
ORDER BY source
"""


# --------------------------------------------------------------------------
# pmi_top_bigrams
# --------------------------------------------------------------------------


def _pmi_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top-20 bigrams by pointwise mutual
    information, ``ln(p(xy) / (p(x)p(y)))``, with a min-count floor of
    10 — the corpus-analytics step behind phrase vocabularies and
    tokenizer merges. Unigram and bigram counts come from the same
    tokenization as bigram_top_terms; the unigram vocabulary join is
    vocabulary-bounded (broadcast at any corpus size). PMI is rounded
    (engine-portable 6dp) BEFORE the ordering on both sides, so the
    top-k selection and the hash agree."""
    d = t(spark, sf_dir, "documents")
    toks = spread(
        d.select(F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("_toks")),
        force=True,
    ).cache()
    uni = (
        toks.select(F.explode("_toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cw"))
    )
    big = (
        toks.select(F.explode(hygiene.ngrams_from_tokens(F.col("_toks"), 2)).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("cxy"))
        .withColumn("w1", F.split(F.col("gram"), " ")[0])
        .withColumn("w2", F.split(F.col("gram"), " ")[1])
    )
    totals = uni.agg(
        F.sum("cw").alias("t1")
    ).crossJoin(big.agg(F.sum("cxy").alias("t2")))
    u1 = uni.select(F.col("w").alias("w1"), F.col("cw").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("cw").alias("c2"))
    out = (
        big.filter(F.col("cxy") >= 10)
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "gram",
            "cxy",
            rnd(
                F.log(
                    F.col("cxy")
                    * F.col("t1")
                    * F.col("t1")
                    / (F.col("t2") * F.col("c1") * F.col("c2"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return out.orderBy(F.col("pmi").desc(), "gram").limit(20)


_PMI_SQL = r"""
WITH toks AS (
  SELECT string_split_regex(lower(trim(text)), '\s+') AS t FROM documents
), uc AS (
  SELECT w, CAST(count(*) AS BIGINT) AS cw
  FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
), gc AS (
  SELECT gram, CAST(count(*) AS BIGINT) AS cxy,
         min(w1) AS w1, min(w2) AS w2
  FROM (
    SELECT t[i] AS w1, t[i + 1] AS w2, t[i] || ' ' || t[i + 1] AS gram
    FROM toks, unnest(generate_series(1, len(t) - 1)) AS g(i)
    WHERE len(t) >= 2
  ) GROUP BY gram
), tot AS (
  SELECT (SELECT sum(cw) FROM uc) AS t1, (SELECT sum(cxy) FROM gc) AS t2
)
SELECT gram, cxy,
       floor(ln(cxy * t1 * t1 / (t2 * c1.cw * c2.cw)) * 1000000 + 0.5)
         / 1000000 AS pmi
FROM gc
JOIN uc c1 ON gc.w1 = c1.w
JOIN uc c2 ON gc.w2 = c2.w
CROSS JOIN tot
WHERE cxy >= 10
ORDER BY pmi DESC, gram
LIMIT 20
"""


# --------------------------------------------------------------------------
# incremental_rollup
# --------------------------------------------------------------------------


def _incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Algebraic incremental-aggregate maintenance (ops/merge
    .merge_partial_aggs): the orders rollup per priority is maintained
    as (count, sum) partial states — the pre-1998 base state combines
    with the 1998+ delta batch WITHOUT rescanning the base rows, and
    the merged state finalizes to the same rollup a full recompute
    yields, which is exactly what the oracle computes. Averages
    finalize from the merged (sum, count) pair; sums round 2dp
    (engine-portable) before the avg division so both engines divide
    identical doubles."""
    o = t(spark, sf_dir, "orders")
    cut = F.lit("1998-01-01").cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_totalprice").alias("sum_price"),
        )

    base = partial(o.filter(F.col("o_orderdate") < cut))
    delta = partial(o.filter(F.col("o_orderdate") >= cut))
    merged = merge.merge_partial_aggs(
        base, delta, keys=["o_orderpriority"], sums=["n", "sum_price"]
    )
    return merged.select(
        "o_orderpriority",
        "n",
        rnd("sum_price", 2).alias("sum_price"),
        rnd(rnd("sum_price", 2) / F.col("n"), 6).alias("avg_price"),
    ).orderBy("o_orderpriority")


_INCREMENTAL_ROLLUP_SQL = """
WITH agg AS (
  SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
         floor(sum(o_totalprice) * 100 + 0.5) / 100 AS sum_price
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority, n, sum_price,
       floor(sum_price / n * 1000000 + 0.5) / 1000000 AS avg_price
FROM agg ORDER BY o_orderpriority
"""


QUERIES: dict[str, QuerySpec] = {
    "expectations_audit": QuerySpec(
        _expectations_audit,
        _EXPECTATIONS_AUDIT_SQL,
        "named data-quality expectations, one-pass audit report",
    ),
    "snapshot_diff_summary": QuerySpec(
        _snapshot_diff_summary,
        _SNAPSHOT_DIFF_SQL,
        "CDC snapshot diff with per-column change attribution",
    ),
    "scd2_pointintime_join": QuerySpec(
        _scd2_pointintime_join,
        _SCD2_PIT_SQL,
        "point-in-time-correct fact lookup against SCD2 versions",
    ),
    "source_cap_sample": QuerySpec(
        _source_cap_sample,
        _SOURCE_CAP_SQL,
        "per-source corpus cap (domain balancing), ordering-audited",
    ),
    "pmi_top_bigrams": QuerySpec(
        _pmi_top_bigrams,
        _PMI_SQL,
        "PMI collocation mining over the corpus bigram/unigram counts",
    ),
    "incremental_rollup": QuerySpec(
        _incremental_rollup,
        _INCREMENTAL_ROLLUP_SQL,
        "incremental aggregate maintenance == full recompute",
    ),
}
