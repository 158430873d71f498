"""Round-7 first wave: evaluation & sketch statistics a corpus-curation
team runs weekly, each fully DuckDB-oracled.

* ``cms_heavy_hitters`` — Count-Min Sketch over the token stream,
  reported against exact counts for the top-20 tokens. The sketch is
  the RELATIONAL encoding of a mergeable summary: d hash rows × m
  counters, built with one vocabulary-bounded aggregate — at 100 TB
  the (row, position) table is d·m integers no matter the corpus, so
  it broadcasts anywhere (the same property bloomjoin exploits). The
  token hash is portable (md5 hex prefix → int), so the oracle runs
  the identical sketch and the estimates hash-match; the row also
  verifies the CMS contract (estimate ≥ exact, always).
* ``ks_drift_test`` — two-sample Kolmogorov–Smirnov drift test on the
  quality-score distribution between corpus cohorts, on a fixed
  1000-bin grid (binned ECDFs: deterministic, and the cumsum window
  runs over ≤1000 spine rows per cohort, never the fact table).
* ``ndcg_eval`` — retrieval-quality metrics (nDCG@10, MRR@10,
  relevant-found count) for label-match relevance over the embedding
  corpus: the standard eval step after any ANN index change. Exact
  brute-force ranking (the proven cosine path), per-query windows of
  exactly 10 rows. IDCG uses min(n_relevant_in_corpus, 10) ideal ones.
* ``adamic_adar_links`` — link prediction over the co-purchase graph:
  AA(a,b) = Σ_z 1/ln(deg z) over common neighbors. Edges require
  co-occurrence ≥ 2 (support pruning: 116k raw pairs → 3.4k edges at
  sf0.01) and hubs above the degree cap are excluded from the middle
  of two-hop paths — both standard AA practice and the reason the
  two-hop self-join is Σ deg(z)² over a SPARSE bounded graph, not the
  fact table.
* ``acf_lags`` — autocorrelation (pairwise-complete Pearson) of the
  daily-revenue series at lags 1..14: the seasonality fingerprint
  check before trusting any forecast. Day-grain series (~2.4k rows)
  × 14 lags; everything after the first aggregate is calendar-bounded.
* ``cohens_kappa`` — inter-annotator agreement per source between two
  deterministic labeling heuristics (length gate vs token-count gate):
  the label-quality gate before training on weak labels. One fact
  scan → 4-row aggregate.
* ``theil_sen_trend`` — robust (median-of-pairwise-slopes) revenue
  trend per nation over monthly totals: outlier-immune where OLS regr_
  slope is not. Month-grain series (~80 per nation) → ≤3.2k slope
  pairs per nation, ranked inside the bounded nation partition; the
  median is the explicit avg-of-middle-ranks so both engines pick
  identical values.

Reference parity: the reference has no sketch/eval/statistics surface
(SURVEY.md §2.A — its transforms are single-table SQL in Postgres,
dags/taxi_transform_dag.py:42-79); all seven belong to the declared
north-star §2.B surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .core import QuerySpec, bounded_collect, rnd, t

# three fixed odd 31-bit multipliers (Knuth-style); the token hash is
# the first 8 md5 hex digits as an unsigned 32-bit int — portable to
# any engine with md5 + hex parsing, unlike xxhash64.
_CMS_SEEDS = (1597334677, 1812433253, 741103597)
_CMS_M = 2048


def _tok_hash32(col) -> F.Column:
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def _cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = (
        t(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("exact_n"))
    )
    h = F.pmod(_tok_hash32(F.col("tok")), F.lit(2**31))
    with_pos = toks.select(
        "tok",
        "exact_n",
        *[
            F.pmod(F.pmod(h * F.lit(k), F.lit(2**31)), F.lit(_CMS_M)).alias(
                f"pos{i}"
            )
            for i, k in enumerate(_CMS_SEEDS)
        ],
    )
    # sketch rows: one (row, position) counter table, d*m-bounded
    counters = None
    for i in range(len(_CMS_SEEDS)):
        part = with_pos.groupBy(F.col(f"pos{i}").alias("pos")).agg(
            F.sum("exact_n").alias("cnt")
        ).select(F.lit(i).alias("row"), "pos", "cnt")
        counters = part if counters is None else counters.unionByName(part)
    top = with_pos.orderBy(F.col("exact_n").desc(), "tok").limit(20)
    est = None
    for i in range(len(_CMS_SEEDS)):
        ci = counters.filter(F.col("row") == i).select(
            F.col("pos").alias(f"pos{i}"), F.col("cnt").alias(f"cnt{i}")
        )
        top = top.join(F.broadcast(ci), f"pos{i}")
    est = F.least(*[F.col(f"cnt{i}") for i in range(len(_CMS_SEEDS))])
    return top.select(
        "tok",
        F.col("exact_n").cast("long").alias("exact_n"),
        est.cast("long").alias("cms_est"),
        (est - F.col("exact_n")).cast("long").alias("overest"),
    ).orderBy(F.col("exact_n").desc(), "tok")


_CMS_SQL = rf"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS tok FROM documents
), counts AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS exact_n
  FROM toks WHERE tok <> '' GROUP BY tok
), pos AS (
  SELECT tok, exact_n,
         (((CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) % 2147483648)
           * {_CMS_SEEDS[0]}) % 2147483648) % {_CMS_M} AS pos0,
         (((CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) % 2147483648)
           * {_CMS_SEEDS[1]}) % 2147483648) % {_CMS_M} AS pos1,
         (((CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) % 2147483648)
           * {_CMS_SEEDS[2]}) % 2147483648) % {_CMS_M} AS pos2
  FROM counts
), c0 AS (SELECT pos0 AS pos, sum(exact_n) AS cnt FROM pos GROUP BY pos0),
   c1 AS (SELECT pos1 AS pos, sum(exact_n) AS cnt FROM pos GROUP BY pos1),
   c2 AS (SELECT pos2 AS pos, sum(exact_n) AS cnt FROM pos GROUP BY pos2),
top AS (
  SELECT * FROM pos ORDER BY exact_n DESC, tok LIMIT 20
)
SELECT t.tok, t.exact_n,
       CAST(least(c0.cnt, c1.cnt, c2.cnt) AS BIGINT) AS cms_est,
       CAST(least(c0.cnt, c1.cnt, c2.cnt) - t.exact_n AS BIGINT) AS overest
FROM top t
JOIN c0 ON t.pos0 = c0.pos
JOIN c1 ON t.pos1 = c1.pos
JOIN c2 ON t.pos2 = c2.pos
ORDER BY t.exact_n DESC, t.tok
"""


def _ks_drift_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KS D = max over the 1000-bin grid of |ECDF_even − ECDF_odd| of
    the quality score; cohorts are doc_id parity (stand-in for
    before/after snapshots). Reject at α=0.05 via the asymptotic
    critical value 1.3581·sqrt((n_a+n_b)/(n_a·n_b))."""
    from ..llmdata import textstats

    q = textstats.with_text_stats(t(spark, sf_dir, "documents")).select(
        F.least(F.floor(F.col("quality_score") * 1000).cast("long"), F.lit(999)).alias(
            "bin"
        ),
        (F.col("doc_id") % 2 == 0).alias("is_a"),
    )
    hist = q.groupBy("bin").agg(
        F.sum(F.col("is_a").cast("long")).alias("na"),
        F.sum((~F.col("is_a")).cast("long")).alias("nb"),
    )
    # Window-free since round 12 (allowlist burn-down; was a global
    # ECDF cumsum over the 1000-bin histogram): the histogram is a
    # fixed-width bin spine (≤1000 rows at ANY corpus size), so the
    # cumulative scan, sup-norm and critical value run driver-side.
    # Exactness: cumulative counts are exact integers, each ECDF diff
    # is two exact-int divisions, and max over doubles is order-free.
    import math

    rows = bounded_collect(
        hist.orderBy("bin"), 1_000, "fixed 1000-bin score histogram"
    )
    n_a = sum(int(r["na"]) for r in rows)
    n_b = sum(int(r["nb"]) for r in rows)
    ca = cb = 0
    d_max = 0.0
    for r in rows:
        ca += int(r["na"])
        cb += int(r["nb"])
        diff = abs(ca / n_a - cb / n_b)
        if diff > d_max:
            d_max = diff

    def fl6(x: float) -> float:
        return math.floor(x * 1e6 + 0.5) / 1e6

    ks_d = fl6(d_max)
    crit = fl6(1.3581 * math.sqrt((n_a + n_b) / (n_a * n_b)))
    return spark.createDataFrame(
        [(n_a, n_b, ks_d, crit, ks_d > crit)],
        "n_a BIGINT, n_b BIGINT, ks_d DOUBLE, crit_05 DOUBLE, "
        "drift_flag BOOLEAN",
    )


_KS_SQL = r"""
WITH s AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars_calc,
         regexp_split_to_array(trim(text), '\s+') AS toks,
         regexp_split_to_array(lower(text), '\s+') AS ltoks
  FROM documents
), c AS (
  SELECT doc_id, n_chars_calc,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
         CAST(len(list_filter(ltoks, x -> list_contains(
             ['the','a','of','and','to','in','is','it'], x))) AS BIGINT) AS n_stop
  FROM s
), q AS (
  SELECT doc_id,
         least(CAST(floor(
           (floor((0.4 * least(n_chars_calc / 200.0, 1.0)
               + 0.3 * least(CASE WHEN n_tokens > 0
                                  THEN n_stop / CAST(n_tokens AS DOUBLE)
                                  ELSE 0.0 END * 4, 1.0)
               + 0.3 * CASE WHEN n_tokens > 0
                            THEN n_distinct_tokens / CAST(n_tokens AS DOUBLE)
                            ELSE 0.0 END) * 1000000 + 0.5) / 1000000) * 1000
         ) AS BIGINT), 999) AS bin,
         (doc_id % 2 = 0) AS is_a
  FROM c
), hist AS (
  SELECT bin,
         sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS na,
         sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS nb
  FROM q GROUP BY bin
), cum AS (
  SELECT bin,
         sum(na) OVER (ORDER BY bin) AS ca,
         sum(nb) OVER (ORDER BY bin) AS cb
  FROM hist
), tot AS (
  SELECT CAST(sum(na) AS BIGINT) AS n_a, CAST(sum(nb) AS BIGINT) AS n_b FROM hist
), d AS (
  SELECT t.n_a, t.n_b,
         floor(max(abs(c.ca / CAST(t.n_a AS DOUBLE)
                     - c.cb / CAST(t.n_b AS DOUBLE))) * 1000000 + 0.5) / 1000000
           AS ks_d
  FROM cum c CROSS JOIN tot t
  GROUP BY t.n_a, t.n_b
)
SELECT n_a, n_b, ks_d,
       floor(1.3581 * sqrt((n_a + n_b) / (CAST(n_a AS DOUBLE) * n_b))
             * 1000000 + 0.5) / 1000000 AS crit_05,
       ks_d > floor(1.3581 * sqrt((n_a + n_b) / (CAST(n_a AS DOUBLE) * n_b))
                    * 1000000 + 0.5) / 1000000 AS drift_flag
FROM d
"""


def _ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relevance = same label as the query (self excluded). Ranking =
    exact cosine top-10, (rounded sim desc, vec_id) total order — the
    proven brute-force path. IDCG@10 places min(n_relevant, 10) ones at
    the ideal positions. MRR counts only the top-10 window."""
    from ..llmdata import similarity

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    top = similarity.cosine_topk_bruteforce(emb, queries, k=10)
    labels = emb.select("vec_id", "label")
    scored = (
        top.join(
            F.broadcast(labels.select(F.col("vec_id").alias("query_id"),
                                      F.col("label").alias("q_label"))),
            "query_id",
        )
        .join(
            F.broadcast(labels.select(F.col("vec_id").alias("neighbor_id"),
                                      F.col("label").alias("n_label"))),
            "neighbor_id",
        )
        .select(
            "query_id",
            "sim_rank",
            (F.col("n_label") == F.col("q_label")).cast("int").alias("rel"),
        )
    )
    # corpus-wide relevant count per query (for IDCG)
    nrel = (
        queries.select(F.col("vec_id").alias("query_id"), F.col("label").alias("q_label"))
        .join(
            F.broadcast(labels.select("label").groupBy("label").agg(
                F.count(F.lit(1)).alias("n_lab"))),
            F.col("q_label") == F.col("label"),
        )
        .select("query_id", (F.col("n_lab") - 1).alias("n_relevant"))
    )
    per_q = scored.groupBy("query_id").agg(
        F.sum("rel").cast("long").alias("n_rel_top10"),
        F.sum(F.col("rel") / F.log2(F.col("sim_rank") + 1)).alias("dcg"),
        F.min(F.when(F.col("rel") == 1, F.col("sim_rank"))).alias("first_rel"),
    )
    # idcg = sum_{i=1..min(n_relevant,10)} 1/log2(i+1) — a ≤10-element
    # sequence folded JVM-side (no join, no UDF)
    idcg = nrel.select(
        "query_id",
        F.aggregate(
            F.sequence(F.lit(1), F.least(F.col("n_relevant"), F.lit(10))),
            F.lit(0.0),
            lambda acc, i: acc + 1.0 / F.log2(i + 1),
        ).alias("idcg"),
    )
    return (
        per_q.join(idcg, "query_id")
        .select(
            "query_id",
            "n_rel_top10",
            rnd(F.col("dcg") / F.col("idcg"), 6).alias("ndcg10"),
            rnd(
                F.coalesce(1.0 / F.col("first_rel"), F.lit(0.0)), 6
            ).alias("mrr10"),
        )
        .orderBy("query_id")
    )


_NDCG_SQL = """
WITH sims AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         q.label AS q_label, c.label AS n_label,
         floor((list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                       CAST(c.embedding AS DOUBLE[])))
               * 1000000 + 0.5) / 1000000 AS cosine_sim
  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < 10
), ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                    ORDER BY cosine_sim DESC, neighbor_id)
                 AS BIGINT) AS sim_rank
  FROM sims
), top AS (
  SELECT query_id, sim_rank,
         CASE WHEN n_label = q_label THEN 1 ELSE 0 END AS rel
  FROM ranked WHERE sim_rank <= 10
), per_q AS (
  SELECT query_id,
         CAST(sum(rel) AS BIGINT) AS n_rel_top10,
         sum(rel / log2(sim_rank + 1)) AS dcg,
         min(CASE WHEN rel = 1 THEN sim_rank END) AS first_rel
  FROM top GROUP BY query_id
), nrel AS (
  SELECT e.vec_id AS query_id, count(*) AS n_relevant
  FROM embeddings e JOIN embeddings o
    ON o.label = e.label AND o.vec_id <> e.vec_id
  WHERE e.vec_id < 10
  GROUP BY e.vec_id
), idcg AS (
  SELECT n.query_id, sum(1.0 / log2(i + 1)) AS idcg
  FROM nrel n JOIN (SELECT unnest(generate_series(1, 10)) AS i) s
    ON s.i <= least(n.n_relevant, 10)
  GROUP BY n.query_id
)
SELECT p.query_id, p.n_rel_top10,
       floor(p.dcg / g.idcg * 1000000 + 0.5) / 1000000 AS ndcg10,
       floor(COALESCE(1.0 / p.first_rel, 0.0) * 1000000 + 0.5) / 1000000 AS mrr10
FROM per_q p JOIN idcg g ON p.query_id = g.query_id
ORDER BY p.query_id
"""

_AA_MIN_SUPPORT = 2
_AA_DEG_CAP = 64


def _adamic_adar_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    pairs = (
        li.alias("a")
        .join(li.alias("b"), (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("pa"), F.col("b.p").alias("pb"))
        .agg(F.count(F.lit(1)).alias("supp"))
        .filter(F.col("supp") >= _AA_MIN_SUPPORT)
        .select("pa", "pb")
    )
    # symmetric adjacency (z, nbr) with hub cap on z's degree
    adj = pairs.select(F.col("pa").alias("z"), F.col("pb").alias("nbr")).unionByName(
        pairs.select(F.col("pb").alias("z"), F.col("pa").alias("nbr"))
    )
    deg = adj.groupBy("z").agg(F.count(F.lit(1)).alias("deg"))
    mid = adj.join(
        F.broadcast(deg.filter((F.col("deg") <= _AA_DEG_CAP) & (F.col("deg") >= 2))),
        "z",
    )
    two_hop = (
        mid.alias("x")
        .join(
            mid.alias("y"),
            (F.col("x.z") == F.col("y.z")) & (F.col("x.nbr") < F.col("y.nbr")),
        )
        .groupBy(
            F.col("x.nbr").alias("part_a"), F.col("y.nbr").alias("part_b")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_common"),
            rnd(F.sum(1.0 / F.log(F.col("x.deg"))), 6).alias("aa_score"),
        )
    )
    return two_hop.orderBy(
        F.col("aa_score").desc(), "part_a", "part_b"
    ).limit(20)


_AA_SQL = f"""
WITH e AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), pairs AS (
  SELECT a.p AS pa, b.p AS pb
  FROM e a JOIN e b ON a.o = b.o AND a.p < b.p
  GROUP BY a.p, b.p
  HAVING count(*) >= {_AA_MIN_SUPPORT}
), adj AS (
  SELECT pa AS z, pb AS nbr FROM pairs
  UNION ALL
  SELECT pb AS z, pa AS nbr FROM pairs
), deg AS (
  SELECT z, count(*) AS deg FROM adj GROUP BY z
), mid AS (
  SELECT a.z, a.nbr, d.deg
  FROM adj a JOIN deg d ON a.z = d.z
  WHERE d.deg <= {_AA_DEG_CAP} AND d.deg >= 2
), two_hop AS (
  SELECT x.nbr AS part_a, y.nbr AS part_b,
         CAST(count(*) AS BIGINT) AS n_common,
         floor(sum(1.0 / ln(x.deg)) * 1000000 + 0.5) / 1000000 AS aa_score
  FROM mid x JOIN mid y ON x.z = y.z AND x.nbr < y.nbr
  GROUP BY x.nbr, y.nbr
)
SELECT * FROM two_hop
ORDER BY aa_score DESC, part_a, part_b
LIMIT 20
"""


def _acf_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        t(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    lags = spark.range(1, 15).select(F.col("id").cast("int").alias("lag"))
    shifted = daily.select(F.col("d").alias("d2"), F.col("rev").alias("rev2"))
    joined = (
        daily.crossJoin(F.broadcast(lags))
        .join(
            shifted,
            F.col("d2") == F.date_add(F.col("d"), F.col("lag")),
        )
    )
    return (
        joined.groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            rnd(F.corr("rev", "rev2"), 6).alias("acf"),
        )
        .orderBy("lag")
    )


_ACF_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d, sum(o_totalprice) AS rev
  FROM orders GROUP BY 1
), lags AS (
  SELECT unnest(generate_series(1, 14)) AS lag
), j AS (
  SELECT l.lag, a.rev AS rev, b.rev AS rev2
  FROM daily a
  CROSS JOIN lags l
  JOIN daily b ON b.d = a.d + CAST(l.lag AS INTEGER)
)
SELECT CAST(lag AS INTEGER) AS lag,
       CAST(count(*) AS BIGINT) AS n_pairs,
       floor(corr(rev, rev2) * 1000000 + 0.5) / 1000000 AS acf
FROM j GROUP BY lag ORDER BY lag
"""


def _cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Annotator 1: length gate (n_chars >= 300, ~51% positive on the
    fixture). Annotator 2: token gate (ws tokens >= 55, ~51%). Correlated-but-different weak labelers —
    exactly the agreement question kappa answers."""
    d = t(spark, sf_dir, "documents").select(
        "source",
        (F.col("n_chars") >= 300).cast("int").alias("a1"),
        (F.size(F.split(F.trim(F.col("text")), r"\s+")) >= 55).cast("int").alias("a2"),
    )
    g = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg((F.col("a1") == F.col("a2")).cast("double")).alias("po"),
        F.avg("a1").alias("p1"),
        F.avg("a2").alias("p2"),
    )
    pe = F.col("p1") * F.col("p2") + (1 - F.col("p1")) * (1 - F.col("p2"))
    # kappa is undefined at pe=1 (both raters constant): NULL, not a
    # division by zero — a source where every doc passes both gates is
    # real at small SF.
    kappa = F.when(pe < 1, (F.col("po") - pe) / (1 - pe))
    return g.select(
        "source",
        "n",
        rnd("po", 6).alias("po"),
        rnd(pe, 6).alias("pe"),
        rnd(kappa, 6).alias("kappa"),
    ).orderBy("source")


_KAPPA_SQL = r"""
WITH d AS (
  SELECT source,
         CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS a1,
         CASE WHEN len(regexp_split_to_array(trim(text), '\s+')) >= 55
              THEN 1 ELSE 0 END AS a2
  FROM documents
), g AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
         avg(CASE WHEN a1 = a2 THEN 1.0 ELSE 0.0 END) AS po,
         avg(CAST(a1 AS DOUBLE)) AS p1,
         avg(CAST(a2 AS DOUBLE)) AS p2
  FROM d GROUP BY source
)
SELECT source, n,
       floor(po * 1000000 + 0.5) / 1000000 AS po,
       floor((p1 * p2 + (1 - p1) * (1 - p2)) * 1000000 + 0.5) / 1000000 AS pe,
       CASE WHEN (p1 * p2 + (1 - p1) * (1 - p2)) < 1 THEN
         floor((po - (p1 * p2 + (1 - p1) * (1 - p2)))
               / (1 - (p1 * p2 + (1 - p1) * (1 - p2))) * 1000000 + 0.5) / 1000000
       END AS kappa
FROM g ORDER BY source
"""


def _theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    monthly = (
        t(spark, sf_dir, "orders")
        .join(t(spark, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t(spark, sf_dir, "nation")), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).alias("m"),
        )
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    b = monthly.select(
        F.col("nation"), F.col("m").alias("m2"), F.col("rev").alias("rev2")
    )
    slopes = (
        monthly.join(b, "nation")
        .filter(F.col("m2") > F.col("m"))
        .select(
            "nation",
            rnd((F.col("rev2") - F.col("rev")) / (F.col("m2") - F.col("m")), 6).alias(
                "slope"
            ),
        )
    )
    w = W.partitionBy("nation").orderBy("slope")
    ranked = slopes.select(
        "nation",
        "slope",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(W.partitionBy("nation")).alias("cnt"),
    )
    med = (
        ranked.filter(
            (F.col("rk") == F.floor((F.col("cnt") + 1) / 2))
            | (F.col("rk") == F.floor(F.col("cnt") / 2) + 1)
        )
        .groupBy("nation")
        .agg(rnd(F.avg("slope"), 6).alias("ts_slope"))
    )
    n_months = monthly.groupBy("nation").agg(
        F.count(F.lit(1)).cast("long").alias("n_months")
    )
    return (
        n_months.join(med, "nation").select("nation", "n_months", "ts_slope").orderBy("nation")
    )


_THEIL_SEN_SQL = """
WITH monthly AS (
  SELECT n.n_name AS nation,
         year(o.o_orderdate) * 12 + month(o.o_orderdate) - 1 AS m,
         sum(o.o_totalprice) AS rev
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
), slopes AS (
  SELECT a.nation,
         floor((b.rev - a.rev) / (b.m - a.m) * 1000000 + 0.5) / 1000000 AS slope
  FROM monthly a JOIN monthly b ON a.nation = b.nation AND b.m > a.m
), ranked AS (
  SELECT nation, slope,
         row_number() OVER (PARTITION BY nation ORDER BY slope) AS rk,
         count(*) OVER (PARTITION BY nation) AS cnt
  FROM slopes
), med AS (
  SELECT nation,
         floor(avg(slope) * 1000000 + 0.5) / 1000000 AS ts_slope
  FROM ranked
  WHERE rk = (cnt + 1) // 2 OR rk = cnt // 2 + 1
  GROUP BY nation
), nm AS (
  SELECT nation, CAST(count(*) AS BIGINT) AS n_months FROM monthly GROUP BY nation
)
SELECT nm.nation, nm.n_months, med.ts_slope
FROM nm JOIN med ON nm.nation = med.nation
ORDER BY nm.nation
"""


QUERIES: dict[str, QuerySpec] = {
    "cms_heavy_hitters": QuerySpec(
        _cms_heavy_hitters,
        _CMS_SQL,
        "Count-Min Sketch token counts vs exact for the top-20 tokens",
    ),
    "ks_drift_test": QuerySpec(
        _ks_drift_test,
        _KS_SQL,
        "two-sample KS drift test on binned quality-score ECDFs",
    ),
    "ndcg_eval": QuerySpec(
        _ndcg_eval,
        _NDCG_SQL,
        "retrieval eval: nDCG@10 / MRR@10 with label-match relevance",
    ),
    "adamic_adar_links": QuerySpec(
        _adamic_adar_links,
        _AA_SQL,
        "Adamic-Adar link prediction over the supported co-purchase graph",
    ),
    "acf_lags": QuerySpec(
        _acf_lags,
        _ACF_SQL,
        "autocorrelation of daily revenue at lags 1..14",
    ),
    "cohens_kappa": QuerySpec(
        _cohens_kappa,
        _KAPPA_SQL,
        "Cohen's kappa agreement between two weak labelers, per source",
    ),
    "theil_sen_trend": QuerySpec(
        _theil_sen_trend,
        _THEIL_SEN_SQL,
        "Theil-Sen robust monthly revenue trend per nation",
    ),
}
