"""Round-7 fifteenth wave: embedding-space alignment, functional
dependency profiling, and pairwise contrasts.

* ``embedding_procrustes_align`` — orthogonal Procrustes alignment
  (Schönemann 1966) between two embedding snapshots: snapshot B is
  the fixture embeddings rotated by a PLANTED block-Givens rotation
  (fixed angles θ_i = 0.1 + 0.02·i on dimension pairs (2i, 2i+1)),
  so ground truth is known exactly. The cross-covariance M = AᵀB is
  accumulated per-partition with numpy (mapInPandas partials — the
  d²-bounded shuffle of the PCA-moments pattern: 64×64 floats per
  partition, never per row), summed distributed, then the ≤64×64 SVD
  and R̂ = UVᵀ run driver-side (the bounded-fit envelope). Output:
  Frobenius residuals before/after alignment and the recovered-vs-
  planted rotation error — a correct implementation drives both the
  after-residual and the rotation error to ~0 on the noise-free
  plant. Iterative linear algebra ⇒ rows-only; asserted in
  tests/test_similarity.py.
* ``fd_discovery_audit`` — functional-dependency profiling (the
  Metanome-style data-quality audit): for a candidate list of
  (table, LHS → RHS) dependencies, the violation census — groups,
  violating groups (>1 distinct RHS per LHS value), max RHS
  multiplicity, and a holds flag. Each candidate is one two-level
  hash aggregate; keys that are true FDs (nation → region) and
  plausible-but-false ones (nationkey → mktsegment) are both
  listed, so the output is non-degenerate in both directions.
* ``pairwise_mean_contrasts`` — all 10 pairwise mean order-value
  differences between market segments with normal-theory SE and 95%
  CI (the post-hoc follow-up to ``anova_oneway``; plain z CIs, not
  studentized-range, and named accordingly): one per-segment moment
  aggregate, then a broadcast 5×5 self-join on the tiny stats table.

Reference parity: no alignment/profiling surface in the reference
(SURVEY.md §2.A); declared north-star §2.B additions.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core import QuerySpec, bounded_collect, rnd, t

_DIM = 64


def _planted_rotation():
    import numpy as np

    r = np.eye(_DIM)
    for i in range(_DIM // 2):
        th = 0.1 + 0.02 * i
        c, s = math.cos(th), math.sin(th)
        g = np.eye(_DIM)
        g[2 * i, 2 * i] = c
        g[2 * i, 2 * i + 1] = -s
        g[2 * i + 1, 2 * i] = s
        g[2 * i + 1, 2 * i + 1] = c
        r = r @ g
    return r


def _embedding_procrustes_align(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import numpy as np

    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def partials(batches):
        import numpy as np
        import pandas as pd

        r0 = _planted_rotation()
        m = np.zeros((_DIM, _DIM))
        saa = 0.0
        sbb = 0.0
        sab = 0.0
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            a = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            b = a @ r0
            m += a.T @ b
            saa += float((a * a).sum())
            sbb += float((b * b).sum())
            sab += float((a * b).sum())
            n += len(a)
        out = {
            "i": [], "j": [], "v": [],
        }
        for i in range(_DIM):
            for j in range(_DIM):
                out["i"].append(i)
                out["j"].append(j)
                out["v"].append(m[i, j])
        out["i"].append(-1)
        out["j"].append(0)
        out["v"].append(saa)
        out["i"].append(-1)
        out["j"].append(1)
        out["v"].append(sbb)
        out["i"].append(-1)
        out["j"].append(2)
        out["v"].append(sab)
        out["i"].append(-1)
        out["j"].append(3)
        out["v"].append(float(n))
        yield pd.DataFrame(out)

    agg = bounded_collect(
        emb.mapInPandas(partials, schema="i INT, j INT, v DOUBLE")
        .groupBy("i", "j")
        .agg(F.sum("v").alias("v")),
        _DIM * _DIM + 4,
        "cross-covariance moment grain d² + 4 scalars (saa/sbb/sab/n)",
    )
    m = [[0.0] * _DIM for _ in range(_DIM)]
    saa = sbb = sab = nn = 0.0
    for r in agg:
        if r["i"] == -1:
            if r["j"] == 0:
                saa = r["v"]
            elif r["j"] == 1:
                sbb = r["v"]
            elif r["j"] == 2:
                sab = r["v"]
            else:
                nn = r["v"]
        else:
            m[r["i"]][r["j"]] = r["v"]
    mm = np.asarray(m)
    u, _s, vt = np.linalg.svd(mm)
    rhat = u @ vt
    r0 = _planted_rotation()
    # ||A R - B||_F^2 = saa + sbb - 2 tr(R^T M); before uses R = I.
    before = (saa + sbb - 2.0 * sab) / max(nn, 1.0)
    after = (saa + sbb - 2.0 * float(np.trace(rhat.T @ mm))) / max(nn, 1.0)
    rot_err = float(np.abs(rhat - r0).max())
    orth_err = float(np.abs(rhat @ rhat.T - np.eye(_DIM)).max())

    def r6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    return spark.createDataFrame(
        [
            (
                int(nn),
                _DIM,
                r6(before),
                r6(after),
                r6(rot_err),
                r6(orth_err),
            )
        ],
        "n_vecs BIGINT, dim INT, frob_before DOUBLE, frob_after DOUBLE, "
        "rotation_max_err DOUBLE, orthogonality_err DOUBLE",
    )


# --------------------------------------------------------------------------
# fd_discovery_audit
# --------------------------------------------------------------------------

def _fd_audit_one(df: DataFrame, tbl: str, lhs: str, rhs: str) -> DataFrame:
    g = df.groupBy(F.col(lhs).alias("k")).agg(
        F.count_distinct(F.col(rhs)).alias("d")
    )
    return g.agg(
        F.lit(tbl).alias("tbl"),
        F.lit(lhs).alias("lhs"),
        F.lit(rhs).alias("rhs"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum((F.col("d") > 1).cast("long")).alias("n_violating"),
        F.max("d").cast("long").alias("max_rhs_distinct"),
        (F.max("d") <= 1).alias("holds"),
    )


def _fd_discovery_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    nat = t(spark, sf_dir, "nation")
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    parts = [
        _fd_audit_one(nat, "nation", "n_nationkey", "n_regionkey"),
        _fd_audit_one(cust, "customer", "c_custkey", "c_mktsegment"),
        _fd_audit_one(cust, "customer", "c_nationkey", "c_mktsegment"),
        _fd_audit_one(orders, "orders", "o_orderkey", "o_orderpriority"),
        _fd_audit_one(orders, "orders", "o_custkey", "o_orderstatus"),
        _fd_audit_one(li, "lineitem", "l_orderkey", "l_returnflag"),
        _fd_audit_one(li, "lineitem", "l_partkey", "l_suppkey"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("tbl", "lhs", "rhs")


_FD_SQL = """
WITH c AS (
  SELECT 'nation' AS tbl, 'n_nationkey' AS lhs, 'n_regionkey' AS rhs,
         n_nationkey AS k, CAST(n_regionkey AS VARCHAR) AS v FROM nation
  UNION ALL
  SELECT 'customer', 'c_custkey', 'c_mktsegment',
         c_custkey, c_mktsegment FROM customer
  UNION ALL
  SELECT 'customer', 'c_nationkey', 'c_mktsegment',
         c_nationkey, c_mktsegment FROM customer
  UNION ALL
  SELECT 'orders', 'o_orderkey', 'o_orderpriority',
         o_orderkey, o_orderpriority FROM orders
  UNION ALL
  SELECT 'orders', 'o_custkey', 'o_orderstatus',
         o_custkey, o_orderstatus FROM orders
  UNION ALL
  SELECT 'lineitem', 'l_orderkey', 'l_returnflag',
         l_orderkey, l_returnflag FROM lineitem
  UNION ALL
  SELECT 'lineitem', 'l_partkey', 'l_suppkey',
         l_partkey, CAST(l_suppkey AS VARCHAR) FROM lineitem
), g AS (
  SELECT tbl, lhs, rhs, k, count(DISTINCT v) AS d
  FROM c GROUP BY 1, 2, 3, 4
)
SELECT tbl, lhs, rhs,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating,
       CAST(max(d) AS BIGINT) AS max_rhs_distinct,
       max(d) <= 1 AS holds
FROM g
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


# --------------------------------------------------------------------------
# pairwise_mean_contrasts
# --------------------------------------------------------------------------

_Z95 = 1.959964


def _pairwise_mean_contrasts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    u = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        F.col("o_totalprice").alias("x"),
    )
    g = u.groupBy("seg").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    ).select(
        "seg",
        "n",
        (F.col("sx") / F.col("n")).alias("m"),
        (
            (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("v"),
    )
    a = g.select(
        F.col("seg").alias("seg_a"),
        F.col("n").alias("na"),
        F.col("m").alias("ma"),
        F.col("v").alias("va"),
    )
    b = g.select(
        F.col("seg").alias("seg_b"),
        F.col("n").alias("nb"),
        F.col("m").alias("mb"),
        F.col("v").alias("vb"),
    )
    se = F.sqrt(F.col("va") / F.col("na") + F.col("vb") / F.col("nb"))
    diff = F.col("ma") - F.col("mb")
    return (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("seg_a") < F.col("seg_b"))
        .select(
            "seg_a",
            "seg_b",
            rnd(diff, 4).alias("mean_diff"),
            rnd(se, 4).alias("se"),
            rnd(diff - _Z95 * se, 4).alias("ci_lo"),
            rnd(diff + _Z95 * se, 4).alias("ci_hi"),
            (F.abs(diff / se) > _Z95).alias("significant"),
        )
        .orderBy("seg_a", "seg_b")
    )


_CONTRASTS_SQL = f"""
WITH u AS (
  SELECT c.c_mktsegment AS seg, o.o_totalprice AS x
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), g AS (
  SELECT seg, CAST(count(*) AS DOUBLE) AS n, sum(x) / count(*) AS m,
         (sum(x * x) - sum(x) * sum(x) / count(*)) / (count(*) - 1) AS v
  FROM u GROUP BY 1
)
SELECT a.seg AS seg_a, b.seg AS seg_b,
       floor((a.m - b.m) * 10000 + 0.5) / 10000 AS mean_diff,
       floor(sqrt(a.v / a.n + b.v / b.n) * 10000 + 0.5) / 10000 AS se,
       floor((a.m - b.m - {_Z95} * sqrt(a.v / a.n + b.v / b.n))
             * 10000 + 0.5) / 10000 AS ci_lo,
       floor((a.m - b.m + {_Z95} * sqrt(a.v / a.n + b.v / b.n))
             * 10000 + 0.5) / 10000 AS ci_hi,
       abs((a.m - b.m) / sqrt(a.v / a.n + b.v / b.n)) > {_Z95}
         AS significant
FROM g a CROSS JOIN g b
WHERE a.seg < b.seg
ORDER BY 1, 2
"""


QUERIES: dict[str, QuerySpec] = {
    "embedding_procrustes_align": QuerySpec(
        _embedding_procrustes_align,
        None,
        "Orthogonal Procrustes alignment vs a planted block-Givens "
        "rotation: d^2-bounded partial cross-covariance, driver SVD",
    ),
    "fd_discovery_audit": QuerySpec(
        _fd_discovery_audit,
        _FD_SQL,
        "Functional-dependency violation census over a candidate "
        "(table, LHS -> RHS) list: groups, violators, max multiplicity",
    ),
    "pairwise_mean_contrasts": QuerySpec(
        _pairwise_mean_contrasts,
        _CONTRASTS_SQL,
        "All pairwise segment mean-order-value contrasts with "
        "normal-theory SE and 95% CI (post-hoc to anova_oneway)",
    ),
}
