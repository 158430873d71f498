"""Round-7 tenth wave: keyphrase extraction, experiment sizing,
privacy diversity, spectral audio analysis, graph cores, and partial
autocorrelation.

* ``rake_keyphrases`` — RAKE keyword extraction (Rose et al. 2010)
  with STATISTICAL stopwords (the top-5 corpus tokens by frequency —
  the documented RAKE variant for corpora without a curated stopword
  list): token streams split into candidate phrases at stopword
  boundaries via gaps-and-islands (``idx − row_number`` per doc),
  phrases capped at 4 tokens, word score = degree/frequency over the
  phrase corpus, phrase score = Σ word scores. Scores are quantized
  to 9dp BEFORE the global top-15 rank so summation-order ulp noise
  cannot flip the selection. Every stage is a vocabulary- or
  doc-partitioned aggregate; the stopword list is a broadcast of 5
  rows.
* ``ab_power_mde`` — pre-experiment power analysis per market
  segment: the minimum detectable effect (absolute and relative) of
  a two-arm test at α=0.05 / power=0.80 given the segment's realized
  order-value variance and a 50/50 split of its current traffic,
  MDE = (z₀.₉₇₅+z₀.₈₀)·√(2s²/n_arm). One hash aggregate per segment.
* ``l_diversity_audit`` — l-diversity (Machanavajjhala et al. 2007)
  complement to ``k_anonymity_audit``: quasi-identifier cells
  (segment × nation × balance bucket) audited for the diversity of
  the sensitive attribute (the priority of each customer's
  top-spend order — deterministic argmax with an order-key
  tie-break): distinct-l, entropy effective-classes exp(H) via
  H = ln n − (Σ c·ln c)/n, and the customers exposed in l=1 cells.
* ``wav_spectral_peak`` — dominant-frequency detection over a REAL
  PCM16 WAV decode + numpy rFFT (Arrow-batched, payload-local, zero
  shuffle): the synthesized square wave's full period divides the
  64-sample window exactly, so the spectrum is exactly periodic and
  the argmax bin is the pure arithmetic function ``16 >> (id % 4)``
  — a SQL oracle hash-checks a real FFT pipeline end to end
  (llmdata/multimodal.synthesize_fft_audio / audio_spectral_peak).
* ``k_core_decomposition`` — k-cores of the co-purchase graph
  (parts co-occurring in an order) at scale-adaptive k (degree
  p02/p05/p10 + 1 — chosen because the graph has the sharp ER-style
  core transition; the three points exhibit light peel / deep peel /
  collapse) by synchronous peeling (Matula & Beck 1983;
  ops/graph.k_core): one degree aggregate + two anti-joins per
  round, localCheckpoint per round, rounds bounded by degeneracy
  depth. Oracled since round 12: the peel is integer/set-exact, so
  nested recursive CTEs replay it bit-exactly (see _k_core_sql);
  exact-vs-pure-Python-reference and in-core-degree invariants in
  tests/test_graph.py.
* ``pacf_lags`` — partial autocorrelation of daily revenue for lags
  1..12 by Durbin–Levinson recursion on the collected ACF vector
  (the bounded driver-side fit envelope: 12 floats, like the IVF
  k-means step); the ACF itself is the distributed lag-join corr of
  ``acf_lags``. Recursive solve ⇒ rows-only; cross-checked against
  an independent numpy Toeplitz least-squares AR(k) fit in
  tests/test_timeseries.py.

Reference parity: no text-mining/privacy/DSP/graph surface in the
reference (SURVEY.md §2.A); declared north-star §2.B additions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .core import QuerySpec, duck_materialize, bounded_collect, rnd, t


# --------------------------------------------------------------------------
# rake_keyphrases
# --------------------------------------------------------------------------

def _rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = d.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col("text")), r"\s+")).alias(
            "idx", "tok"
        ),
    ).filter(F.col("tok") != "")
    stops = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "tok")
        .limit(5)
        .select(F.col("tok").alias("stop_tok"))
    )
    nonstop = toks.join(
        F.broadcast(stops), toks.tok == stops.stop_tok, "left_anti"
    ).withColumn(
        "grp",
        F.col("idx")
        - F.row_number().over(W.partitionBy("doc_id").orderBy("idx")),
    )
    pl = nonstop.withColumn(
        "plen", F.count(F.lit(1)).over(W.partitionBy("doc_id", "grp"))
    ).filter(F.col("plen") <= 4)
    ws = pl.groupBy("tok").agg(
        (F.sum("plen").cast("double") / F.count(F.lit(1))).alias("wscore")
    )
    ph = (
        pl.join(ws, "tok")
        .groupBy("doc_id", "grp")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("idx", "tok"))
                    ),
                    lambda x: x["tok"],
                ),
                " ",
            ).alias("phrase"),
            (F.floor(F.sum("wscore") * 1e9 + 0.5) / 1e9).alias("score9"),
        )
    )
    return (
        ph.groupBy("phrase")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.max("score9").alias("score9"),
        )
        .orderBy(F.col("score9").desc(), "phrase")
        .limit(15)
        .select("phrase", "n_occurrences", rnd("score9", 6).alias("rake_score"))
    )


_RAKE_SQL = r"""
WITH d AS (
  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS l
  FROM documents
), toks0 AS (
  SELECT doc_id, unnest(l) AS tok,
         unnest(generate_series(1, len(l))) AS idx
  FROM d
), toks AS (
  SELECT * FROM toks0 WHERE tok <> ''
), stops AS (
  SELECT tok FROM toks GROUP BY tok ORDER BY count(*) DESC, tok LIMIT 5
), ns AS (
  SELECT t.doc_id, t.idx, t.tok,
         t.idx - row_number() OVER (PARTITION BY t.doc_id ORDER BY t.idx)
           AS grp
  FROM toks t ANTI JOIN stops s ON t.tok = s.tok
), pl0 AS (
  SELECT *, count(*) OVER (PARTITION BY doc_id, grp) AS plen FROM ns
), pl AS (
  SELECT * FROM pl0 WHERE plen <= 4
), ws AS (
  SELECT tok, CAST(sum(plen) AS DOUBLE) / count(*) AS wscore
  FROM pl GROUP BY tok
), ph AS (
  SELECT p.doc_id, p.grp,
         string_agg(p.tok, ' ' ORDER BY p.idx) AS phrase,
         floor(sum(w.wscore) * 1e9 + 0.5) / 1e9 AS score9
  FROM pl p JOIN ws w ON p.tok = w.tok
  GROUP BY p.doc_id, p.grp
), agg AS (
  SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences,
         max(score9) AS score9
  FROM ph GROUP BY phrase
)
SELECT phrase, n_occurrences,
       floor(score9 * 1000000 + 0.5) / 1000000 AS rake_score
FROM agg
ORDER BY score9 DESC, phrase
LIMIT 15
"""


# --------------------------------------------------------------------------
# ab_power_mde
# --------------------------------------------------------------------------

_Z_ALPHA = 1.959964  # two-sided alpha = 0.05
_Z_POWER = 0.841621  # power = 0.80


def _ab_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    u = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "c_mktsegment", F.col("o_totalprice").alias("x")
    )
    g = u.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    mean = F.col("sx") / F.col("n")
    s2 = (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / (
        F.col("n") - 1
    )
    n_arm = F.floor(F.col("n") / 2).cast("double")
    mde = (_Z_ALPHA + _Z_POWER) * F.sqrt(2 * s2 / n_arm)
    return g.select(
        F.col("c_mktsegment").alias("segment"),
        F.col("n").cast("long").alias("n_orders"),
        rnd(mean, 4).alias("mean_value"),
        rnd(mde, 4).alias("mde_abs"),
        rnd(mde / mean, 6).alias("mde_rel"),
    ).orderBy("segment")


_MDE_SQL = f"""
WITH u AS (
  SELECT c.c_mktsegment, o.o_totalprice AS x
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), g AS (
  SELECT c_mktsegment, CAST(count(*) AS DOUBLE) AS n,
         sum(x) AS sx, sum(x * x) AS sxx
  FROM u GROUP BY 1
), k AS (
  SELECT c_mktsegment, n, sx / n AS mean,
         (sxx - sx * sx / n) / (n - 1) AS s2,
         CAST(floor(n / 2) AS DOUBLE) AS n_arm
  FROM g
)
SELECT c_mktsegment AS segment, CAST(n AS BIGINT) AS n_orders,
       floor(mean * 10000 + 0.5) / 10000 AS mean_value,
       floor(({_Z_ALPHA} + {_Z_POWER}) * sqrt(2 * s2 / n_arm)
             * 10000 + 0.5) / 10000 AS mde_abs,
       floor(({_Z_ALPHA} + {_Z_POWER}) * sqrt(2 * s2 / n_arm) / mean
             * 1000000 + 0.5) / 1000000 AS mde_rel
FROM k
ORDER BY segment
"""


# --------------------------------------------------------------------------
# l_diversity_audit
# --------------------------------------------------------------------------

def _l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 2500.0).cast("long").alias("bal_bucket"),
    )
    o = t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_totalprice", "o_orderkey"
    )
    top = (
        o.withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("o_custkey").orderBy(
                    F.col("o_totalprice").desc(), F.col("o_orderkey")
                )
            ),
        )
        .filter(F.col("rk") == 1)
        .select("o_custkey", F.col("o_orderpriority").alias("sens"))
    )
    u = c.join(top, c.c_custkey == top.o_custkey).select(
        "c_mktsegment", "c_nationkey", "bal_bucket", "sens"
    )
    sc = u.groupBy("c_mktsegment", "c_nationkey", "bal_bucket", "sens").agg(
        F.count(F.lit(1)).cast("double").alias("cnt")
    )
    cells = sc.groupBy("c_mktsegment", "c_nationkey", "bal_bucket").agg(
        F.sum("cnt").alias("n"),
        F.count(F.lit(1)).cast("long").alias("l"),
        (
            F.log(F.sum("cnt"))
            - F.sum(F.col("cnt") * F.log("cnt")) / F.sum("cnt")
        ).alias("h"),
    )
    return (
        cells.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.min("l").cast("long").alias("min_l"),
            rnd(
                F.avg((F.col("l") >= 3).cast("double")), 6
            ).alias("cells_l_ge_3_pct"),
            rnd(F.min(F.exp("h")), 6).alias("min_eff_classes"),
            F.sum(F.when(F.col("l") == 1, F.col("n")).otherwise(0.0))
            .cast("long")
            .alias("n_customers_l1"),
        )
        .orderBy("segment")
    )


_LDIV_SQL = """
WITH top AS (
  SELECT o_custkey, o_orderpriority AS sens
  FROM (
    SELECT o_custkey, o_orderpriority,
           row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS rk
    FROM orders
  ) WHERE rk = 1
), u AS (
  SELECT c.c_mktsegment, c.c_nationkey,
         CAST(floor(c.c_acctbal / 2500.0) AS BIGINT) AS bal_bucket, t.sens
  FROM customer c JOIN top t ON c.c_custkey = t.o_custkey
), sc AS (
  SELECT c_mktsegment, c_nationkey, bal_bucket, sens,
         CAST(count(*) AS DOUBLE) AS cnt
  FROM u GROUP BY 1, 2, 3, 4
), cells AS (
  SELECT c_mktsegment, c_nationkey, bal_bucket,
         sum(cnt) AS n, CAST(count(*) AS BIGINT) AS l,
         ln(sum(cnt)) - sum(cnt * ln(cnt)) / sum(cnt) AS h
  FROM sc GROUP BY 1, 2, 3
)
SELECT c_mktsegment AS segment,
       CAST(count(*) AS BIGINT) AS n_cells,
       CAST(min(l) AS BIGINT) AS min_l,
       floor(avg(CASE WHEN l >= 3 THEN 1.0 ELSE 0.0 END)
             * 1000000 + 0.5) / 1000000 AS cells_l_ge_3_pct,
       floor(min(exp(h)) * 1000000 + 0.5) / 1000000 AS min_eff_classes,
       CAST(sum(CASE WHEN l = 1 THEN n ELSE 0 END) AS BIGINT)
         AS n_customers_l1
FROM cells
GROUP BY 1
ORDER BY 1
"""


# --------------------------------------------------------------------------
# wav_spectral_peak
# --------------------------------------------------------------------------

def _wav_spectral_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmdata import multimodal

    d = t(spark, sf_dir, "documents")
    media = multimodal.synthesize_fft_audio(d, "doc_id")
    feats = multimodal.audio_spectral_peak(media)
    return feats.select(
        F.col("media_id").alias("doc_id"),
        "n_samples",
        "peak_bin",
        "peak_freq_hz",
        "rms",
        "decode_status",
    ).orderBy("doc_id")


_SPECTRAL_SQL = """
SELECT doc_id,
       CAST(64 AS BIGINT) AS n_samples,
       CAST(16 >> (doc_id % 4) AS BIGINT) AS peak_bin,
       CAST((16 >> (doc_id % 4)) * 125 AS DOUBLE) AS peak_freq_hz,
       CAST(1 + doc_id % 300 AS DOUBLE) AS rms,
       'ok' AS decode_status
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# k_core_decomposition (oracle-converted r12: nested recursive-CTE peel)
# --------------------------------------------------------------------------

def _k_core_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.graph import k_core

    li = t(spark, sf_dir, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a = op.select("o", F.col("p").alias("p1"))
    b = op.select("o", F.col("p").alias("p2"))
    edges = (
        a.join(b, "o")
        .filter(F.col("p1") < F.col("p2"))
        .select("p1", "p2")
        .distinct()
    ).localCheckpoint()
    # Scale-adaptive k: fixed constants are vacuous on a graph whose
    # min degree already exceeds them (and would over-peel at another
    # SF). A co-occurrence graph this regular has the sharp ER-style
    # core transition (the k-core is near-full or empty), so anchor k
    # to the LOW tail of the degree distribution — measured: p02
    # peels lightly (2 rounds), p05 peels deeply but survives (~9% of
    # nodes dropped, 5 rounds), p10 cascades to full collapse — the
    # three regimes of the operator. The degree table is
    # catalog-grain (bounded), so exact percentile is a bounded frame.
    deg = (
        edges.select(F.col("p1").alias("n"))
        .unionAll(edges.select(F.col("p2").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
        .localCheckpoint()
    )
    pct = deg.agg(
        F.expr("percentile(d, array(0.02, 0.05, 0.10))").alias("p")
    ).collect()[0]["p"]
    ks = [("p02", int(pct[0]) + 1), ("p05", int(pct[1]) + 1),
          ("p10", int(pct[2]) + 1)]
    rows = []
    # k-cores are NESTED (core(k') ⊆ core(k) for k' > k), so each
    # higher-k peel starts from the previous core instead of the full
    # graph — measured 10x stress ratio dropped from 5.36 to the
    # sub-linear band once the second and third peels ran on the
    # already-peeled (much smaller or identical) edge list.
    frontier = edges.select(
        F.col("p1").alias("lo"), F.col("p2").alias("hi")
    )
    # The frontier is canonical by construction (p1 < p2, distinct, and
    # every later frontier is a subset of it), so each peel skips
    # k_core's least/greatest + distinct re-canonicalization pass
    # (~1 s × 3 peels of pure re-derivation at sf0.1). The FIRST
    # frontier is a narrow alias over the checkpointed edge list, so it
    # also skips the edge re-materialization; later frontiers are lazy
    # semi-join plans and keep it.
    first_peel = True
    for label, k in sorted(ks, key=lambda x: x[1]):
        # n_nodes comes straight from the peel's final degree table
        # (every alive node has in-core degree > 0), saving the
        # distinct-endpoint count the round-12 version ran per peel.
        core, rounds, n_nodes = k_core(
            frontier, k, a="lo", b="hi",
            pre_canonical=True, materialize=not first_peel,
            # the percentile pass already materialized the full graph's
            # degree table — peel 1 starts from it instead of
            # rebuilding it; later peels derive their own
            init_deg=deg if first_peel else None,
        )
        first_peel = False
        stats = core.agg(F.count(F.lit(1)).alias("n_edges")).collect()[0]
        n_edges = int(stats["n_edges"])
        rows.append((label, k, n_nodes, n_edges, rounds))
        if n_edges == 0:
            # every higher k is empty too (nesting); record directly
            for label2, k2 in sorted(ks, key=lambda x: x[1]):
                if k2 > k:
                    rows.append((label2, k2, 0, 0, 0))
            break
        frontier = core
    return spark.createDataFrame(
        rows,
        "k_label STRING, k INT, n_core_nodes BIGINT, "
        "n_core_edges BIGINT, rounds INT",
    ).orderBy("k")


def _k_core_sql(edges_sql: str | None = None) -> str:
    """Recursive-CTE replay of the synchronous peel (oracled r12, the
    bfs_hops_from_hub precedent): all arithmetic is integer/set work,
    so no rounding grid is needed — the only float is the degree
    percentile, replayed with Spark's exact Percentile interpolation
    ((hi-idx)*v_lo + (idx-lo)*v_hi) rather than quantile_cont, whose
    formula DuckDB doesn't document as identical. Each peel seeds from
    the previous core (the nesting optimization the engine uses); a
    NULL-marker row carries the round counter through a full-collapse
    round so `rounds` stays exact; the recursion self-terminates when
    a round drops nothing. Empty seeds (early-exit nesting) naturally
    yield (0 nodes, 0 edges, 0 rounds), matching the engine's
    short-circuit rows."""

    def peel(name: str, src: str, klabel: str) -> str:
        return f""", {name} AS (
  SELECT 0 AS rnd, lo, hi FROM {src}
  UNION ALL
  (WITH prev AS (SELECT * FROM {name}),
        cur AS (SELECT lo, hi FROM prev WHERE lo IS NOT NULL),
        dg AS (SELECT n, count(*) AS d
               FROM (SELECT lo AS n FROM cur UNION ALL SELECT hi FROM cur)
               GROUP BY n),
        bad AS (SELECT n FROM dg
                WHERE d < (SELECT k FROM ks WHERE label = '{klabel}')),
        mrnd AS (SELECT max(rnd) AS m FROM prev)
   SELECT m.m + 1, c.lo, c.hi
   FROM cur c CROSS JOIN mrnd m
   WHERE EXISTS (SELECT 1 FROM bad)
     AND NOT EXISTS (SELECT 1 FROM bad WHERE bad.n = c.lo)
     AND NOT EXISTS (SELECT 1 FROM bad WHERE bad.n = c.hi)
   UNION ALL
   SELECT m.m + 1, NULL, NULL FROM mrnd m
   WHERE EXISTS (SELECT 1 FROM bad))
), {name}_core AS (
  SELECT lo, hi FROM {name}
  WHERE lo IS NOT NULL
    AND rnd = (SELECT max(rnd) FROM {name})
), {name}_stats AS (
  SELECT (SELECT CAST(coalesce(max(rnd), 0) AS INT) FROM {name})
           AS rounds,
         (SELECT CAST(count(*) AS BIGINT) FROM {name}_core) AS n_edges,
         (SELECT CAST(count(DISTINCT n) AS BIGINT)
          FROM (SELECT lo AS n FROM {name}_core
                UNION ALL SELECT hi FROM {name}_core)) AS n_nodes
)"""

    if edges_sql is None:
        # default: the co-purchase graph (the registry oracle); tests
        # override with arbitrary canonical (lo < hi) edge lists for
        # the randomized cross-engine differential
        edges_sql = """
  SELECT DISTINCT a.p AS lo, b.p AS hi
  FROM (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem) a
  JOIN (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem) b
    ON a.o = b.o AND a.p < b.p
"""
    return f"""
WITH RECURSIVE e0 AS MATERIALIZED ({edges_sql}), deg0 AS MATERIALIZED (
  SELECT n, CAST(count(*) AS BIGINT) AS d
  FROM (SELECT lo AS n FROM e0 UNION ALL SELECT hi FROM e0)
  GROUP BY n
), degs AS MATERIALIZED (
  SELECT d, row_number() OVER (ORDER BY d) - 1 AS i FROM deg0
), nd AS MATERIALIZED (
  SELECT CAST(count(*) AS BIGINT) AS n FROM deg0
), ks AS MATERIALIZED (
  SELECT x.label,
         CAST(floor(CASE WHEN x.lo_i = x.hi_i THEN CAST(dlo.d AS DOUBLE)
                    ELSE (x.hi_i - x.idx) * CAST(dlo.d AS DOUBLE)
                         + (x.idx - x.lo_i) * CAST(dhi.d AS DOUBLE) END)
              AS INT) + 1 AS k
  FROM (
    SELECT t.label, t.p * (nd.n - 1) AS idx,
           CAST(floor(t.p * (nd.n - 1)) AS BIGINT) AS lo_i,
           CAST(ceil(t.p * (nd.n - 1)) AS BIGINT) AS hi_i
    FROM (VALUES ('p02', 0.02), ('p05', 0.05), ('p10', 0.10))
      t(label, p)
    CROSS JOIN nd
  ) x
  JOIN degs dlo ON dlo.i = x.lo_i
  JOIN degs dhi ON dhi.i = x.hi_i
){peel("peel1", "e0", "p02")}{peel("peel2", "peel1_core", "p05")}{
    peel("peel3", "peel2_core", "p10")}
SELECT 'p02' AS k_label, (SELECT k FROM ks WHERE label = 'p02') AS k,
       s.n_nodes AS n_core_nodes, s.n_edges AS n_core_edges, s.rounds
FROM peel1_stats s
UNION ALL
SELECT 'p05', (SELECT k FROM ks WHERE label = 'p05'),
       s.n_nodes, s.n_edges, s.rounds
FROM peel2_stats s
UNION ALL
SELECT 'p10', (SELECT k FROM ks WHERE label = 'p10'),
       s.n_nodes, s.n_edges, s.rounds
FROM peel3_stats s
ORDER BY k
"""


# --------------------------------------------------------------------------
# pacf_lags (oracled since round 11: Durbin-Levinson on exact moments)
# --------------------------------------------------------------------------
#
# Oracle-exactness: the lag correlations are computed from INTEGER
# cents moment sums (128-bit-exact: decimal(38,0) in Spark, HUGEINT
# in DuckDB) with a fixed convert-then-operate expression tree, so
# every rho is bit-identical across engines; the Durbin-Levinson
# recursion is then a fixed chain of +,-,*,/ ops on identical inputs
# (no transcendentals beyond one sqrt per rho, correctly rounded), so
# the unrolled SQL replay matches bit for bit.

_PACF_LAGS_N = 12


def _pacf_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        t(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5))
            .cast("long")
            .alias("rev")
        )
    )
    lags = spark.range(1, _PACF_LAGS_N + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    shifted = daily.select(F.col("d").alias("d2"), F.col("rev").alias("rev2"))
    x, y = F.col("rev"), F.col("rev2")
    acf_rows = bounded_collect(
        daily.crossJoin(F.broadcast(lags))
        .join(shifted, F.col("d2") == F.date_add(F.col("d"), F.col("lag")))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(x).alias("sx"),
            F.sum(y).alias("sy"),
            # widen BEFORE multiplying: daily cents reach ~5e9 on the
            # 10x stress corpus, so a long*long product overflows
            # int64 under ANSI (the r4 overflow class, caught by the
            # round-11 stress sweep); decimal x long multiplies exactly
            F.sum(x.cast("decimal(38,0)") * y).alias("sxy"),
            F.sum(x.cast("decimal(38,0)") * x).alias("sxx"),
            F.sum(y.cast("decimal(38,0)") * y).alias("syy"),
        )
        .orderBy("lag"),
        _PACF_LAGS_N,
        "one row per requested lag (range 1..12)",
    )
    import math

    rho = []
    for r in acf_rows:
        n = float(int(r["n"]))
        sx, sy = float(int(r["sx"])), float(int(r["sy"]))
        sxy, sxx, syy = (
            float(r["sxy"]), float(r["sxx"]), float(r["syy"])
        )
        rho.append(
            (n * sxy - sx * sy)
            / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        )
    # Durbin-Levinson: phi[k][k] is the lag-k PACF.
    m = len(rho)
    pacf: list[float | None] = []
    phi_prev: list[float] = []
    var = 1.0
    for k in range(1, m + 1):
        if var <= 0:  # process became deterministic; PACF undefined on
            pacf.append(None)  # remaining lags
            continue
        acc = rho[k - 1]
        for j in range(1, k):
            acc -= phi_prev[j - 1] * rho[k - 1 - j]
        phi_kk = acc / var
        phi = [
            phi_prev[j - 1] - phi_kk * phi_prev[k - 1 - j]
            for j in range(1, k)
        ] + [phi_kk]
        var *= 1.0 - phi_kk * phi_kk
        pacf.append(phi_kk)
        phi_prev = phi
    out = [
        (
            k + 1,
            math.floor(pacf[k] * 1e6 + 0.5) / 1e6
            if pacf[k] is not None and pacf[k] == pacf[k]
            else None,
        )
        for k in range(m)
    ]
    return spark.createDataFrame(out, "lag INT, pacf DOUBLE").orderBy("lag")


def _pacf_sql() -> str:
    """Unrolled Durbin-Levinson: par{k} carries (pacf1..k, phi1..k,
    var); the inner innovation chain is the same left-assoc
    subtraction sequence the Python loop executes; a repeated phi_kk
    expression is bit-identical recomputation, not divergence. The
    var<=0 freeze mirrors the loop's `continue` (NaN compares false
    in both engines, so NaN propagates identically)."""
    m = _PACF_LAGS_N
    rho_cols = ",\n         ".join(
        f"max(CASE WHEN lag = {k} THEN rho END) AS rho{k}"
        for k in range(1, m + 1)
    )
    stages = ""
    for k in range(1, m + 1):
        acc = f"r.rho{k}"
        for j in range(1, k):
            acc = f"({acc} - p.phi{j} * r.rho{k - j})"
        pk = f"({acc} / p.var)"
        cols = [f"p.pacf{i} AS pacf{i}" for i in range(1, k)]
        cols.append(
            f"CASE WHEN p.var <= 0 THEN CAST(NULL AS DOUBLE) "
            f"ELSE {pk} END AS pacf{k}"
        )
        for j in range(1, k):
            cols.append(
                f"CASE WHEN p.var <= 0 THEN p.phi{j} "
                f"ELSE p.phi{j} - {pk} * p.phi{k - j} END AS phi{j}"
            )
        cols.append(
            f"CASE WHEN p.var <= 0 THEN CAST(NULL AS DOUBLE) "
            f"ELSE {pk} END AS phi{k}"
        )
        cols.append(
            f"CASE WHEN p.var <= 0 THEN p.var "
            f"ELSE p.var * (1.0 - {pk} * {pk}) END AS var"
        )
        body = ",\n         ".join(cols)
        stages += f""", par{k} AS (
  SELECT {body}
  FROM par{k - 1} p CROSS JOIN rho r
)"""
    outs = "\n  UNION ALL ".join(
        f"SELECT {k} AS lag, CASE WHEN pacf{k} IS NULL OR isnan(pacf{k}) "
        f"THEN NULL ELSE floor(pacf{k} * 1000000 + 0.5) / 1000000 END "
        f"AS pacf FROM par{m}"
        for k in range(1, m + 1)
    )
    return f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS rev
  FROM orders GROUP BY 1
), lags AS (
  SELECT unnest(generate_series(1, {m})) AS lag
), j AS (
  SELECT l.lag, a.rev AS x, b.rev AS y
  FROM daily a
  CROSS JOIN lags l
  JOIN daily b ON b.d = a.d + CAST(l.lag AS INTEGER)
), mom AS (
  SELECT lag,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
         CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
  FROM j GROUP BY lag
), acf AS (
  SELECT lag,
         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS rho
  FROM mom
), rho AS (
  SELECT {rho_cols}
  FROM acf
), par0 AS (
  SELECT CAST(1.0 AS DOUBLE) AS var
){stages}
SELECT CAST(lag AS INT) AS lag, pacf FROM (
  {outs}
) ORDER BY lag
"""


_PACF_SQL = _pacf_sql()


QUERIES: dict[str, QuerySpec] = {
    "rake_keyphrases": QuerySpec(
        _rake_keyphrases,
        _RAKE_SQL,
        "RAKE keyphrase extraction with statistical stopwords: "
        "gaps-and-islands phrases, degree/frequency word scores, "
        "9dp-quantized global top-15",
    ),
    "ab_power_mde": QuerySpec(
        _ab_power_mde,
        _MDE_SQL,
        "Per-segment minimum detectable effect at alpha=0.05 / "
        "power=0.80 from realized order-value variance",
    ),
    "l_diversity_audit": QuerySpec(
        _l_diversity_audit,
        _LDIV_SQL,
        "l-diversity privacy audit of QI cells: distinct-l, entropy "
        "effective classes, customers exposed in l=1 cells",
    ),
    "wav_spectral_peak": QuerySpec(
        _wav_spectral_peak,
        _SPECTRAL_SQL,
        "Real PCM16 decode + numpy rFFT dominant-frequency detection "
        "vs the exact arithmetic oracle (period divides window)",
    ),
    "k_core_decomposition": QuerySpec(
        _k_core_decomposition,
        duck_materialize(_k_core_sql()),
        "k-cores of the co-purchase graph at degree-quantile-adaptive "
        "k by synchronous peeling (oracled r12: integer-exact peel "
        "replayed by nested recursive CTEs; Spark-formula percentile)",
    ),
    "pacf_lags": QuerySpec(
        _pacf_lags,
        duck_materialize(_PACF_SQL),
        "Partial autocorrelation of daily revenue, lags 1..12, by "
        "Durbin-Levinson on the distributed lag-join ACF "
        "(integer-cents moments make the unrolled oracle hash-exact)",
    ),
}
