"""Round-4 surface additions: fuzzy/semantic decontamination, corpus
bigram mining, Spark-4 native XML round trip, UNPIVOT/melt, per-key
EWMA smoothing, and PageRank over a derived entity graph.

Decontamination rationale (the two new ops complete the family):
``decontaminate_ngrams`` (hygiene.flag_contaminated) catches verbatim
eval overlap; ``neardup_decontaminate`` catches paraphrase-level token
overlap (set Jaccard); ``semantic_decontaminate`` catches meaning-level
overlap in embedding space. A production training pipeline runs all
three gates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fns import rnd, spread
from ..llmdata import hygiene, similarity, textstats
from ..ops import graph, timeseries
from .core import QuerySpec, duck_materialize, t


def _neardup_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-set-Jaccard decontamination of the training split
    (doc_id >= 20) against the eval split (doc_id < 20): per train doc
    the best-matching eval doc, its Jaccard, and the >=0.5 flag.
    Oracle replays the identical distinct-token join algebra in SQL
    (best-match ties break on lowest eval id over the 6dp-rounded
    similarity on BOTH sides)."""
    docs = t(spark, sf_dir, "documents")
    out = hygiene.neardup_decontaminate(
        docs.filter(F.col("doc_id") >= 20),
        docs.filter(F.col("doc_id") < 20),
        threshold=0.5,
    )
    return out.select("doc_id", "best_eval_id", "best_jaccard", "is_contaminated")


_NEARDUP_DECONTAM_SQL = r"""
WITH tr AS (
  SELECT doc_id AS tid,
         unnest(list_distinct(string_split_regex(lower(trim(text)), '\s+'))) AS tok
  FROM documents WHERE doc_id >= 20
), ev AS (
  SELECT doc_id AS eid,
         unnest(list_distinct(string_split_regex(lower(trim(text)), '\s+'))) AS tok
  FROM documents WHERE doc_id < 20
), nt AS (SELECT tid, count(*) AS n FROM tr GROUP BY tid),
ne AS (SELECT eid, count(*) AS n FROM ev GROUP BY eid),
inter AS (
  SELECT tid, eid, count(*) AS c FROM tr JOIN ev USING (tok) GROUP BY tid, eid
), jac AS (
  SELECT tid, eid,
         floor(c / (nt.n + ne.n - c) * 1000000 + 0.5) / 1000000 AS j
  FROM inter JOIN nt USING (tid) JOIN ne USING (eid)
), best AS (
  SELECT tid, eid, j,
         row_number() OVER (PARTITION BY tid ORDER BY j DESC, eid) AS rn
  FROM jac
)
SELECT d.doc_id,
       b.eid AS best_eval_id,
       coalesce(b.j, 0.0) AS best_jaccard,
       CAST(CASE WHEN coalesce(b.j, 0.0) >= 0.5 THEN 1 ELSE 0 END AS BIGINT)
         AS is_contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id >= 20) d
LEFT JOIN (SELECT tid, eid, j FROM best WHERE rn = 1) b ON d.doc_id = b.tid
"""


def _semantic_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space decontamination: max cosine of each training
    vector (vec_id >= 10) to the eval set (vec_id < 10), one matmul per
    Arrow batch against the broadcast eval matrix — no join. Oracle is
    an explicit cross join + list_cosine_similarity (the eval side is 10
    rows, so the oracle's quadratic shape is fine at sf0.01)."""
    emb = t(spark, sf_dir, "embeddings")
    return similarity.semantic_decontaminate(
        emb.filter(F.col("vec_id") >= 10),
        emb.filter(F.col("vec_id") < 10),
        threshold=0.95,
    )


_SEMANTIC_DECONTAM_SQL = """
WITH tr AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 10),
ev AS (SELECT vec_id AS eid, embedding AS evec FROM embeddings WHERE vec_id < 10),
sims AS (
  SELECT tr.vec_id, ev.eid,
         floor(list_cosine_similarity(CAST(tr.embedding AS DOUBLE[]),
                                      CAST(ev.evec AS DOUBLE[])) * 1000000 + 0.5)
           / 1000000 AS s
  FROM tr CROSS JOIN ev
), best AS (
  SELECT vec_id, eid, s,
         row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, eid) AS rn
  FROM sims
)
SELECT vec_id, eid AS nearest_eval_id, s AS max_cosine,
       CAST(CASE WHEN s >= 0.95 THEN 1 ELSE 0 END AS BIGINT) AS is_contaminated
FROM best WHERE rn = 1
"""


def _bigram_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide bigram mining (top 20 by count, total-order
    tie-break): the n>1 counterpart of vocab_top20 — phrase-level vocab
    statistics every corpus card reports. Tokenization and gram
    assembly are pure JVM expressions behind a spread() barrier (the
    CollapseProject trap documented in hygiene.ngrams_from_tokens)."""
    d = t(spark, sf_dir, "documents")
    toks = spread(
        d.select(F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("_toks")),
        force=True,
    )
    grams = toks.select(
        F.explode(hygiene.ngrams_from_tokens(F.col("_toks"), 2)).alias("gram")
    )
    return (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "gram")
        .limit(20)
    )


_BIGRAM_TOP_TERMS_SQL = r"""
WITH toks AS (
  SELECT string_split_regex(lower(trim(text)), '\s+') AS t FROM documents
), grams AS (
  SELECT t[i] || ' ' || t[i + 1] AS gram
  FROM toks, unnest(generate_series(1, len(t) - 1)) AS g(i)
  WHERE len(t) >= 2
)
SELECT gram, CAST(count(*) AS BIGINT) AS n
FROM grams GROUP BY gram ORDER BY n DESC, gram LIMIT 20
"""


def _xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-4 native XML: serialize each order row to an XML string
    (to_xml) and parse it back (from_xml). A correct round trip must
    recover the original values bit-for-bit (Java double->string is
    shortest-roundtrip), so the oracle is the identity projection of the
    source table — the same differential pattern as the BMP/WAV codec
    round trips."""
    o = t(spark, sf_dir, "orders")
    xml = o.select(
        "o_orderkey",
        F.to_xml(
            F.struct("o_custkey", "o_orderstatus", "o_totalprice")
        ).alias("_xml"),
    )
    parsed = xml.select(
        "o_orderkey",
        F.from_xml(
            F.col("_xml"),
            "o_custkey bigint, o_orderstatus string, o_totalprice double",
        ).alias("_r"),
    )
    return parsed.select(
        "o_orderkey",
        F.col("_r.o_custkey").alias("custkey"),
        F.col("_r.o_orderstatus").alias("status"),
        F.col("_r.o_totalprice").alias("totalprice"),
    )


_XML_ROUNDTRIP_SQL = """
SELECT o_orderkey, o_custkey AS custkey, o_orderstatus AS status,
       o_totalprice AS totalprice
FROM orders
"""


def _ewma_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA (alpha=0.3, pandas adjust=False semantics) over the
    daily value series — the standard smoothing pass before anomaly
    thresholds. Spark folds the recurrence per key with an aggregate HOF
    (ops/timeseries.ewma); the oracle replays the IDENTICAL recurrence
    with a recursive CTE — same multiplies, same add, same order
    (0.7*y + 0.3*x), so the two engines produce bit-identical doubles
    and the 4dp output rounding can never sit on a divergent half-grain.
    (A closed-form oracle was tried first and flipped one row's 4th
    decimal — different float path, knife-edge hit.)"""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(rnd(F.sum("value"), 6).alias("day_value"))
    sm = timeseries.ewma(daily, ["user_id"], "day", "day_value", alpha=0.3)
    return sm.select("user_id", "day", "day_value", rnd(F.col("ewma"), 4).alias("ewma"))


_EWMA_DAILY_SQL = """
WITH RECURSIVE daily AS (
  SELECT user_id, date_trunc('day', ts) AS day,
         floor(sum(value) * 1000000 + 0.5) / 1000000 AS day_value
  FROM events GROUP BY 1, 2
), r AS (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY day) AS i FROM daily
), rec AS (
  SELECT user_id, day, day_value, i, day_value AS y FROM r WHERE i = 1
  UNION ALL
  SELECT r.user_id, r.day, r.day_value, r.i, 0.7 * rec.y + 0.3 * r.day_value AS y
  FROM r JOIN rec ON r.user_id = rec.user_id AND r.i = rec.i + 1
)
SELECT user_id, day, day_value, floor(y * 10000 + 0.5) / 10000 AS ewma FROM rec
"""


def _ccnet_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style corpus partitioning: score every document with the
    corpus's own unigram LM (textstats.unigram_logprob), then split each
    LANGUAGE into head/middle/tail terciles — the standard
    perplexity-bucket step before mixing training data. Buckets are
    assigned by ntile(3) over a deterministic total order
    (score desc, doc_id), i.e. by RANK, not by float threshold — no
    knife-edge cut values to disagree about, and the window partitions
    by language exactly as CCNet shards do (never one global window)."""
    from pyspark.sql.window import Window as W

    docs = t(spark, sf_dir, "documents")
    scored = textstats.unigram_logprob(docs)
    j = scored.join(docs.select("doc_id", "lang"), "doc_id")
    w = W.partitionBy("lang").orderBy(F.col("avg_logprob").desc(), F.col("doc_id"))
    return (
        j.withColumn("bucket", F.ntile(3).over(w).cast("long"))
        .groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("avg_logprob").alias("min_lp"),
            F.max("avg_logprob").alias("max_lp"),
            rnd(F.avg("n_tokens"), 2).alias("avg_tokens"),
        )
        .orderBy("lang", "bucket")
    )


_CCNET_BUCKETS_SQL = r"""
WITH toks AS (
  SELECT doc_id AS id,
         unnest(string_split_regex(lower(text), '\s+')) AS tok
  FROM documents
), vocab AS (
  SELECT tok, count(*) AS cnt FROM toks GROUP BY tok
), tot AS (
  SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM vocab
), logp AS (
  SELECT tok, ln(cnt / total) AS lp FROM vocab, tot
), scored AS (
  SELECT id AS doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         floor(avg(lp) * 10000 + 0.5) / 10000 AS avg_logprob
  FROM toks JOIN logp USING (tok)
  GROUP BY id
), j AS (
  SELECT s.*, d.lang FROM scored s JOIN documents d USING (doc_id)
), b AS (
  SELECT *, ntile(3) OVER (PARTITION BY lang
                           ORDER BY avg_logprob DESC, doc_id) AS bucket
  FROM j
)
SELECT lang, CAST(bucket AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       min(avg_logprob) AS min_lp,
       max(avg_logprob) AS max_lp,
       floor(avg(n_tokens) * 100 + 0.5) / 100 AS avg_tokens
FROM b GROUP BY lang, bucket
"""


def _pagerank_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the supplier->customer trade graph (edges derived
    from lineitem x orders; supplier nodes offset by 10^6 to disjoint
    the id spaces): top-20 authority scores. Oracled since round 12:
    ops/graph.pagerank snaps per-edge shares and per-iteration ranks to
    the 2^-40 grid, making every float sum order-free and the whole
    power iteration bit-identical across engines — the oracle unrolls
    the 6 iterations as join+agg stages over the same distinct edge
    list. Exactness on a hand-solved graph stays asserted in
    tests/test_graph.py."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            (F.col("l_suppkey") + 1_000_000).alias("src"),
            F.col("o_custkey").alias("dst"),
        )
    )
    pr = graph.pagerank(edges, damping=0.85, iters=6)
    return (
        pr.orderBy(F.col("rank").desc(), "node")
        .limit(20)
        .select("node", rnd(F.col("rank"), 6).alias("rank"))
    )


def _pagerank_sql(iters: int = 6, edges_sql: str | None = None) -> str:
    """Unrolled power-iteration replay of ops/graph.pagerank: same
    distinct edge list, same 2^-40 share/rank snaps, same update
    expression op-for-op (teleport + d*(inflow + dangling/N)). Stage
    count is fixed (6), each stage one join + one agg over the bounded
    node/edge tables — oracle-side cost is iteration-count-linear.

    ``edges_sql`` overrides the edge source (must yield DISTINCT
    (src, dst)) so the randomized cross-engine differential in
    tests/test_round12_oracles.py can replay arbitrary graphs; the
    registry oracle uses the trade-graph default."""
    g = 2**40

    def sn(e: str) -> str:
        return f"floor(({e}) * {g} + 0.5) / {g}"

    if edges_sql is None:
        edges_sql = """
  SELECT DISTINCT l.l_suppkey + 1000000 AS src, o.o_custkey AS dst
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
"""

    stages = ""
    for k in range(1, iters + 1):
        stages += f""", dang{k - 1} AS (
  SELECT coalesce(sum(r.rank), 0.0) AS dm
  FROM r{k - 1} r LEFT JOIN deg ON deg.src = r.node
  WHERE deg.src IS NULL
), infl{k - 1} AS (
  SELECT e.dst, sum({sn("r.rank / deg.deg")}) AS inflow
  FROM e JOIN deg ON deg.src = e.src JOIN r{k - 1} r ON r.node = e.src
  GROUP BY e.dst
), r{k} AS (
  SELECT n.node,
         {sn("c.tele + 0.85 * (coalesce(i.inflow, 0.0) + g.dm / c.nd)")}
           AS rank
  FROM nodes n CROSS JOIN consts c CROSS JOIN dang{k - 1} g
  LEFT JOIN infl{k - 1} i ON i.dst = n.node
)"""

    return f"""
WITH e AS ({edges_sql}), nodes AS (
  SELECT src AS node FROM e UNION SELECT dst FROM e
), deg AS (
  SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src
), consts AS (
  SELECT CAST(count(*) AS DOUBLE) AS nd,
         (1.0 - 0.85) / CAST(count(*) AS DOUBLE) AS tele
  FROM nodes
), r0 AS (
  SELECT node, {sn("1.0 / c.nd")} AS rank
  FROM nodes CROSS JOIN consts c
){stages}, top AS (
  SELECT node, rank FROM r{iters} ORDER BY rank DESC, node LIMIT 20
)
SELECT node, floor(rank * 1000000 + 0.5) / 1000000 AS rank
FROM top
ORDER BY rank DESC, node
"""


QUERIES: dict[str, QuerySpec] = {
    "neardup_decontam": QuerySpec(
        _neardup_decontam, _NEARDUP_DECONTAM_SQL,
        "token-set Jaccard decontamination vs eval split",
    ),
    "semantic_decontam": QuerySpec(
        _semantic_decontam, _SEMANTIC_DECONTAM_SQL,
        "embedding-cosine decontamination vs eval split",
    ),
    "bigram_top_terms": QuerySpec(
        _bigram_top_terms, _BIGRAM_TOP_TERMS_SQL, "corpus top-20 bigrams"
    ),
    "xml_roundtrip": QuerySpec(
        _xml_roundtrip, _XML_ROUNDTRIP_SQL, "Spark-4 native XML to_xml/from_xml round trip"
    ),
    "ewma_daily_value": QuerySpec(
        _ewma_daily_value, duck_materialize(_EWMA_DAILY_SQL), "per-key EWMA smoothing (HOF fold)"
    ),
    "ccnet_quality_buckets": QuerySpec(
        _ccnet_quality_buckets, _CCNET_BUCKETS_SQL,
        "CCNet perplexity-tercile bucketing per language",
    ),
    "pagerank_entities": QuerySpec(
        _pagerank_entities,
        duck_materialize(_pagerank_sql()),
        "PageRank over derived trade graph (oracled r12: 2^-40 "
        "share/rank grid makes the power iteration order-free; "
        "6-stage unrolled SQL replay)",
    ),
}
