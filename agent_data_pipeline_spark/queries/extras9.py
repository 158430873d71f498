"""Round-4 surface additions, part 4: graph census, categorical
statistics, and mergeable quantile sketches.

Triangle counting is the second non-iterative graph workload (after
connected components / PageRank in dedup.py and ops/graph.py) — the
join-only shape Spark executes well; chi-square is the categorical
independence test every corpus-composition dashboard wants; the
approx-quantile kit is the sketch counterpart of percentile_by_group
(same mergeable-sketch story as the HLL rollup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fns import rnd
from ..ops import expectations as expectations_mod
from ..ops import graph
from .core import QuerySpec, t


# --------------------------------------------------------------------------
# triangle_census
# --------------------------------------------------------------------------


def _triangle_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census (ops/graph.triangle_count) of the supplier
    co-supply graph — suppliers connected when they ship the same part
    (the collaboration projection every supply-chain analysis starts
    from). The co-supply projection of TPC-H-shaped data is NEAR-
    COMPLETE (every supplier meets most others at sf≥0.1), so the
    census runs on a deterministic 1/16 EDGE SAMPLE — the DOULION
    estimator (Tsourakakis et al., KDD'09): exact counts on the sampled
    graph plus the 1/p³-scaled triangle estimate. Sampling is id-hash
    arithmetic (no RNG), so the oracle reproduces the same subgraph
    bit-for-bit. One row: sampled nodes/edges/triangles/wedges/
    transitivity + est_triangles."""
    li = t(spark, sf_dir, "lineitem")
    sp = li.select(
        F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
    ).distinct()
    a = sp.select("p", F.col("s").alias("src"))
    b = sp.select("p", F.col("s").alias("dst"))
    edges = (
        a.join(b, "p")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .filter(
            ((F.col("src") % 100003) * 31 + F.col("dst") % 100003) % 16 == 0
        )
    )
    return graph.triangle_count(edges).select(
        "*",
        (F.col("n_triangles") * 4096).alias("est_triangles"),
    )


_TRIANGLE_SQL = """
WITH sp AS (
  SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
), e AS (
  SELECT DISTINCT a.s AS lo, b.s AS hi
  FROM sp a JOIN sp b ON a.p = b.p AND a.s < b.s
   AND ((a.s % 100003) * 31 + b.s % 100003) % 16 = 0
), tri AS (
  SELECT CAST(count(*) AS BIGINT) AS n_triangles
  FROM e e1
  JOIN e e2 ON e1.hi = e2.lo
  JOIN e e3 ON e3.lo = e1.lo AND e3.hi = e2.hi
), deg AS (
  SELECT n, count(*) AS d
  FROM (SELECT lo AS n FROM e UNION ALL SELECT hi AS n FROM e)
  GROUP BY n
), st AS (
  SELECT CAST(count(*) AS BIGINT) AS n_nodes,
         CAST(coalesce(sum(d * (d - 1)) / 2, 0) AS BIGINT) AS wedges
  FROM deg
)
SELECT st.n_nodes,
       (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
       tri.n_triangles,
       st.wedges,
       CASE WHEN st.wedges > 0
            THEN 3.0 * tri.n_triangles / st.wedges END AS transitivity,
       CAST(tri.n_triangles * 4096 AS BIGINT) AS est_triangles
FROM st, tri
"""


# --------------------------------------------------------------------------
# chisq_lang_source
# --------------------------------------------------------------------------


def _chisq_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between document language
    and source, via the zero-cell-free identity
    ``chi2 = N·(Σ o²/(rowtot·coltot)) − N`` — empty contingency cells
    contribute only through the marginals, so the computation never
    cross-joins the category spaces. Three aggregations over one
    grouped count; all joins are on tiny marginal tables (broadcast)."""
    d = t(spark, sf_dir, "documents")
    obs = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    row_t = obs.groupBy("lang").agg(F.sum("o").alias("rt"))
    col_t = obs.groupBy("source").agg(F.sum("o").alias("ct"))
    n = d.count()
    cells = (
        obs.join(F.broadcast(row_t), "lang")
        .join(F.broadcast(col_t), "source")
        .agg(
            F.sum(
                F.col("o") * F.col("o") / (F.col("rt") * F.col("ct"))
            ).alias("s")
        )
    )
    return cells.crossJoin(
        row_t.agg(F.count(F.lit(1)).alias("n_langs"))
    ).crossJoin(
        col_t.agg(F.count(F.lit(1)).alias("n_sources"))
    ).select(
        F.lit(n).cast("bigint").alias("n_docs"),
        "n_langs",
        "n_sources",
        ((F.col("n_langs") - 1) * (F.col("n_sources") - 1))
        .cast("bigint")
        .alias("dof"),
        rnd(F.lit(n) * F.col("s") - F.lit(n), 4).alias("chi2"),
    )


_CHISQ_SQL = """
WITH obs AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS o
  FROM documents GROUP BY lang, source
), rt AS (
  SELECT lang, CAST(sum(o) AS BIGINT) AS rt FROM obs GROUP BY lang
), ct AS (
  SELECT source, CAST(sum(o) AS BIGINT) AS ct FROM obs GROUP BY source
), s AS (
  SELECT sum(o.o * o.o / (rt.rt * ct.ct)) AS s
  FROM obs o JOIN rt ON o.lang = rt.lang JOIN ct ON o.source = ct.source
), n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
SELECT n.n AS n_docs,
       (SELECT CAST(count(*) AS BIGINT) FROM rt) AS n_langs,
       (SELECT CAST(count(*) AS BIGINT) FROM ct) AS n_sources,
       (SELECT CAST((count(*) - 1) AS BIGINT) FROM rt)
         * (SELECT CAST((count(*) - 1) AS BIGINT) FROM ct) AS dof,
       floor((n.n * s.s - n.n) * 10000 + 0.5) / 10000 AS chi2
FROM n, s
"""


# --------------------------------------------------------------------------
# approx_quantile_kit (rows-only: sketch internals are engine-specific)
# --------------------------------------------------------------------------


def _approx_quantile_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable approximate quantiles per return flag
    (``approx_percentile``, the Greenwald-Khanna-family sketch Spark
    aggregates map-side and merges — the 100 TB path where exact
    ``percentile``'s sort-based agg is off the table). Declared approx:
    rows-only driver check; tests/test_approx.py bounds the rank error
    against the exact interpolated percentiles."""
    li = t(spark, sf_dir, "lineitem")
    pct = F.expr(
        "approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99), 10000)"
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            pct[0].alias("p50"),
            pct[1].alias("p90"),
            pct[2].alias("p99"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# dup_span_stats
# --------------------------------------------------------------------------


def _dup_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicate-span measurement (llmdata/dedup
    .duplicate_span_stats, Lee et al. 2022 shape): fraction of each
    document's 20-token sliding windows whose exact text recurs
    anywhere in the corpus. Oracle replays the same window/md5/count
    algebra in SQL."""
    from ..llmdata import dedup

    d = t(spark, sf_dir, "documents")
    out = dedup.duplicate_span_stats(d, "doc_id", "text", window=20)
    return out.select(
        "doc_id",
        "n_spans",
        "n_dup_spans",
        rnd(F.col("dup_span_fraction"), 6).alias("dup_span_fraction"),
    ).orderBy("doc_id")


_DUP_SPAN_SQL = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
  FROM documents
), w AS (
  SELECT doc_id, md5(array_to_string(t[i : i + 19], ' ')) AS dg
  FROM toks, unnest(generate_series(1, len(t) - 19)) AS g(i)
  WHERE len(t) >= 20
), c AS (
  SELECT dg, count(*) AS occ FROM w GROUP BY dg
), per AS (
  SELECT w.doc_id,
         CAST(count(*) AS BIGINT) AS n_spans,
         CAST(count(*) FILTER (c.occ > 1) AS BIGINT) AS n_dup_spans
  FROM w JOIN c USING (dg)
  GROUP BY w.doc_id
)
SELECT d.doc_id,
       coalesce(per.n_spans, 0) AS n_spans,
       coalesce(per.n_dup_spans, 0) AS n_dup_spans,
       CASE WHEN coalesce(per.n_spans, 0) > 0
            THEN floor(per.n_dup_spans / per.n_spans * 1000000 + 0.5)
                 / 1000000
            ELSE 0.0 END AS dup_span_fraction
FROM (SELECT doc_id FROM documents) d
LEFT JOIN per ON d.doc_id = per.doc_id
ORDER BY d.doc_id
"""


# --------------------------------------------------------------------------
# join_hints_kit
# --------------------------------------------------------------------------


def _join_hints_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-strategy hint surface: the same orders⋈customer aggregate
    computed twice — once forced through SHUFFLE_HASH, once through
    MERGE (sort-merge) — and unioned with a strategy label. The values
    must be identical (hints pick physical strategy, never semantics);
    tests/test_plans.py asserts each hint was actually honored. The
    oracle computes the aggregate once and replicates it per label."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")

    def agg_with(hint: str, label: str) -> DataFrame:
        return (
            o.join(c.hint(hint), o["o_custkey"] == c["c_custkey"])
            .groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                rnd(F.sum("o_totalprice"), 2).alias("revenue"),
            )
            .select(F.lit(label).alias("strategy"), "*")
        )

    return (
        agg_with("shuffle_hash", "shuffle_hash")
        .unionByName(agg_with("merge", "sort_merge"))
        .orderBy("strategy", "c_mktsegment")
    )


_JOIN_HINTS_SQL = """
WITH agg AS (
  SELECT c_mktsegment,
         CAST(count(*) AS BIGINT) AS n_orders,
         floor(sum(o_totalprice) * 100 + 0.5) / 100 AS revenue
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_mktsegment
)
SELECT s.strategy, a.c_mktsegment, a.n_orders, a.revenue
FROM agg a, (VALUES ('shuffle_hash'), ('sort_merge')) s(strategy)
ORDER BY s.strategy, a.c_mktsegment
"""


# --------------------------------------------------------------------------
# temperature_mix_summary
# --------------------------------------------------------------------------


def _temperature_mix_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """alpha=0.5 temperature rebalancing of the language mix (llmdata/
    sampling.temperature_mix — the mBERT/XLM-R up-sample-the-tail rule):
    per language, the original count, derived keep rate, and the rows
    actually kept by the deterministic id-hash sampler. English (the
    head) gets rate < 1, tail languages saturate at 1. Oracle replays
    the identical sqrt-share algebra and Knuth-hash bucketing."""
    from ..llmdata import sampling

    d = t(spark, sf_dir, "documents")
    kept = sampling.temperature_mix(d, "lang", "doc_id", alpha=0.5)
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.first("mix_rate").alias("mix_rate"),
        )
        .join(
            d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_total")),
            "lang",
        )
        .select("lang", "n_total", "mix_rate", "n_kept")
        .orderBy("lang")
    )


_TEMPERATURE_MIX_SQL = """
WITH sizes AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang
), tot AS (
  SELECT sum(n) AS nn, sum(sqrt(n)) AS z FROM sizes
), rates AS (
  SELECT lang, n,
         floor(least(1.0, sqrt(n) / z * nn / n) * 1000000 + 0.5) / 1000000
           AS mix_rate
  FROM sizes, tot
)
SELECT r.lang,
       r.n AS n_total,
       r.mix_rate,
       CAST(count(*) FILTER (
         (((d.doc_id % 2147483648) * 2654435761) % 1000 + 1000) % 1000
           < floor(r.mix_rate * 1000 + 0.5)
       ) AS BIGINT) AS n_kept
FROM documents d JOIN rates r ON d.lang = r.lang
GROUP BY r.lang, r.n, r.mix_rate
ORDER BY r.lang
"""


# --------------------------------------------------------------------------
# table_profile
# --------------------------------------------------------------------------


def _table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profile of orders (ops/expectations
    .profile_table): per column, exact null and distinct counts — the
    ops sibling of skew_report at column granularity. props-style JSON
    and timestamp columns profile like any other (counts only, no
    engine-specific value rendering)."""
    o = t(spark, sf_dir, "orders")
    out = expectations_mod.profile_table(o)
    return out.select(
        "column_name",
        "n_rows",
        "n_nulls",
        "n_distinct",
        rnd(F.col("null_fraction"), 6).alias("null_fraction"),
    ).orderBy("column_name")


_TABLE_PROFILE_SQL = """
WITH longform AS (
  SELECT 'o_orderkey' AS column_name, count(*) FILTER (o_orderkey IS NULL) AS n_nulls,
         count(DISTINCT o_orderkey) AS n_distinct, count(*) AS n_rows FROM orders
  UNION ALL SELECT 'o_custkey', count(*) FILTER (o_custkey IS NULL),
         count(DISTINCT o_custkey), count(*) FROM orders
  UNION ALL SELECT 'o_orderstatus', count(*) FILTER (o_orderstatus IS NULL),
         count(DISTINCT o_orderstatus), count(*) FROM orders
  UNION ALL SELECT 'o_totalprice', count(*) FILTER (o_totalprice IS NULL),
         count(DISTINCT o_totalprice), count(*) FROM orders
  UNION ALL SELECT 'o_orderdate', count(*) FILTER (o_orderdate IS NULL),
         count(DISTINCT o_orderdate), count(*) FROM orders
  UNION ALL SELECT 'o_orderpriority', count(*) FILTER (o_orderpriority IS NULL),
         count(DISTINCT o_orderpriority), count(*) FROM orders
)
SELECT column_name,
       CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_nulls AS BIGINT) AS n_nulls,
       CAST(n_distinct AS BIGINT) AS n_distinct,
       floor(n_nulls / n_rows * 1000000 + 0.5) / 1000000 AS null_fraction
FROM longform
ORDER BY column_name
"""


# --------------------------------------------------------------------------
# winsorized_stats
# --------------------------------------------------------------------------


def _winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized robust mean per order priority: clip at the exact
    p05/p95 percentiles, then average — the outlier-resistant location
    estimate dashboards prefer over the raw mean. Percentile bounds
    broadcast back onto the rows; clipping is a pure projection."""
    o = t(spark, sf_dir, "orders")
    bounds = o.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.05)").alias("lo"),
        F.expr("percentile(o_totalprice, 0.95)").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    clipped = o.join(F.broadcast(bounds), "o_orderpriority").select(
        "o_orderpriority",
        "n",
        "lo",
        "hi",
        F.greatest(F.col("lo"), F.least(F.col("hi"), F.col("o_totalprice"))).alias("w"),
    )
    return (
        clipped.groupBy("o_orderpriority")
        .agg(
            F.first("n").alias("n"),
            rnd(F.first("lo"), 2).alias("p05"),
            rnd(F.first("hi"), 2).alias("p95"),
            rnd(F.avg("w"), 4).alias("winsorized_mean"),
        )
        .orderBy("o_orderpriority")
    )


_WINSORIZED_SQL = """
WITH bounds AS (
  SELECT o_orderpriority,
         quantile_cont(o_totalprice, 0.05) AS lo,
         quantile_cont(o_totalprice, 0.95) AS hi,
         CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY o_orderpriority
)
SELECT o.o_orderpriority,
       min(b.n) AS n,
       floor(min(b.lo) * 100 + 0.5) / 100 AS p05,
       floor(min(b.hi) * 100 + 0.5) / 100 AS p95,
       floor(avg(greatest(b.lo, least(b.hi, o.o_totalprice))) * 10000 + 0.5)
         / 10000 AS winsorized_mean
FROM orders o JOIN bounds b ON o.o_orderpriority = b.o_orderpriority
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


# --------------------------------------------------------------------------
# wav_signal_features
# --------------------------------------------------------------------------


def _wav_signal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signal-level audio analysis over a REAL PCM16 decode (llmdata/
    multimodal.audio_signal_features): zero-crossing count and RMS of
    square-wave WAVs whose period/length/amplitude are pure functions
    of the id — so the oracle predicts, arithmetically, what a correct
    decoder + correct DSP must produce: zc = floor((N-1)/p), rms = A
    (IEEE sqrt of a perfect square is exact)."""
    from ..llmdata import multimodal

    d = t(spark, sf_dir, "documents")
    media = multimodal.synthesize_tonal_audio(d, "doc_id")
    feats = multimodal.audio_signal_features(media)
    return feats.select(
        F.col("media_id").alias("doc_id"),
        "n_samples",
        "zero_crossings",
        "rms",
    ).orderBy("doc_id")


_WAV_SIGNAL_SQL = """
SELECT doc_id,
       CAST(60 + doc_id % 40 AS BIGINT) AS n_samples,
       CAST((60 + doc_id % 40 - 1) // (2 + doc_id % 5) AS BIGINT)
         AS zero_crossings,
       CAST(1 + doc_id % 300 AS DOUBLE) AS rms
FROM documents
ORDER BY doc_id
"""


QUERIES: dict[str, QuerySpec] = {
    "wav_signal_features": QuerySpec(
        _wav_signal_features,
        _WAV_SIGNAL_SQL,
        "real PCM16 decode -> ZCR/RMS vs arithmetic oracle",
    ),
    "table_profile": QuerySpec(
        _table_profile,
        _TABLE_PROFILE_SQL,
        "one-pass per-column null/distinct profile",
    ),
    "winsorized_stats": QuerySpec(
        _winsorized_stats,
        _WINSORIZED_SQL,
        "p05/p95-winsorized robust mean per group",
    ),
    "temperature_mix_summary": QuerySpec(
        _temperature_mix_summary,
        _TEMPERATURE_MIX_SQL,
        "alpha=0.5 temperature language rebalancing, deterministic sampler",
    ),
    "dup_span_stats": QuerySpec(
        _dup_span_stats,
        _DUP_SPAN_SQL,
        "cross-document duplicate-span fractions (substring-dedup metric)",
    ),
    "join_hints_kit": QuerySpec(
        _join_hints_kit,
        _JOIN_HINTS_SQL,
        "SHUFFLE_HASH vs MERGE hint parity (strategy, not semantics)",
    ),
    "triangle_census": QuerySpec(
        _triangle_census,
        _TRIANGLE_SQL,
        "global triangle count + transitivity of the co-supply graph",
    ),
    "chisq_lang_source": QuerySpec(
        _chisq_lang_source,
        _CHISQ_SQL,
        "chi-square independence of lang x source (zero-cell-free form)",
    ),
    "approx_quantile_kit": QuerySpec(
        _approx_quantile_kit,
        None,
        "mergeable approx-percentile sketch per group (declared approx)",
    ),
}
