"""Round-7 eighth wave: bigram language-model scoring, market
concentration, and survey raking.

* ``bigram_backoff_scores`` — held-out bigram language-model scoring
  with Stupid Backoff (Brants et al. 2007, "Large Language Models in
  Machine Translation" — the web-scale scoring rule that skips
  normalization): docs hash-split into a train half (builds unigram +
  bigram count tables — vocabulary-bounded, broadcast) and an eval
  half whose bigrams score ln(c(w1w2)/c(w1)) when the bigram was seen
  in training, else the backed-off ln(0.4·(c(w2)+0.5)/N) (add-half
  for eval-OOV w2). Per-source mean log-score + backoff rate — the
  cheap cross-source LM-fit signal (a kenlm-shaped score without the
  kenlm dependency). All joins are token-vocabulary-bounded
  equi-joins; the eval stream is read once.
* ``hhi_concentration`` — Herfindahl–Hirschman index of revenue
  concentration per nation (sum of squared customer revenue shares,
  the antitrust-standard concentration measure), with top-customer
  share alongside. Two nation/customer-grain aggregates; the share
  arithmetic is exact integer-free division identical across engines.
* ``raking_ipf`` — survey raking via iterative proportional fitting
  (Deming & Stephan 1940): reweight the quality-filtered sample
  (``n_chars >= 300``) so its weighted lang × source margins match
  the FULL corpus margins. The margins and the sample cell table are
  distributed aggregates; the IPF loop itself runs driver-side on the
  collected ≤|langs|·|sources| cell grid (bounded at any corpus
  size — same "bounded driver-side fit" envelope as the IVF k-means
  training step), 30 sweeps, then returns the per-cell weights.
  Iterative ⇒ rows-only; margin-convergence invariants in
  tests/test_sampling.py.

Reference parity: no LM/statistics surface in the reference
(SURVEY.md §2.A); declared north-star §2.B additions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..fns import spread
from .core import QuerySpec, assert_grid_headroom, bounded_collect, rnd, t

_KNUTH = 2654435761


def _tokenized(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        (
            F.pmod(
                F.pmod(F.col("doc_id"), F.lit(2**31)) * F.lit(_KNUTH),
                F.lit(1000),
            )
            < 500
        ).alias("is_train"),
        F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("_toks"),
    )
    return spread(d, force=True)


def _bigram_backoff_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _tokenized(spark, sf_dir)
    sz = F.size("_toks")
    pair_arr = F.transform(
        F.sequence(F.lit(1), sz - 1),
        lambda i: F.struct(
            F.element_at(F.col("_toks"), i).alias("w1"),
            F.element_at(F.col("_toks"), i + 1).alias("w2"),
        ),
    )
    bigrams = (
        toks.filter(sz >= 2)
        .select("doc_id", "source", "is_train", F.explode(pair_arr).alias("p"))
        .select("doc_id", "source", "is_train", "p.w1", "p.w2")
    )
    unigrams = toks.select(
        "is_train", F.explode("_toks").alias("w")
    )
    uni_train = unigrams.filter("is_train").groupBy("w").agg(
        F.count(F.lit(1)).cast("double").alias("cu")
    )
    n_tok = unigrams.filter("is_train").agg(
        F.count(F.lit(1)).cast("double").alias("n_tok")
    )
    bi_train = (
        bigrams.filter("is_train")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("double").alias("cb"))
    )
    ev = bigrams.filter(~F.col("is_train"))
    scored = (
        ev.join(F.broadcast(bi_train), ["w1", "w2"], "left")
        .join(
            F.broadcast(uni_train.select(F.col("w").alias("w1"), F.col("cu").alias("cu1"))),
            "w1",
            "left",
        )
        .join(
            F.broadcast(uni_train.select(F.col("w").alias("w2"), F.col("cu").alias("cu2"))),
            "w2",
            "left",
        )
        .crossJoin(F.broadcast(n_tok))
    )
    logp = F.when(
        F.col("cb").isNotNull(), F.log(F.col("cb") / F.col("cu1"))
    ).otherwise(
        F.log(
            F.lit(0.4) * (F.coalesce(F.col("cu2"), F.lit(0.0)) + 0.5) / F.col("n_tok")
        )
    )
    return (
        scored.groupBy("source")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_eval_docs"),
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            rnd(F.avg(logp), 4).alias("avg_logprob"),
            rnd(
                F.avg(F.when(F.col("cb").isNull(), 1.0).otherwise(0.0)), 6
            ).alias("backoff_rate"),
        )
        .orderBy("source")
    )


_BIGRAM_BACKOFF_SQL = rf"""
WITH toks AS (
  SELECT doc_id, source,
         ((doc_id % 2147483648) * {_KNUTH}) % 1000 < 500 AS is_train,
         string_split_regex(lower(trim(text)), '\s+') AS tk
  FROM documents
), bigrams AS (
  SELECT doc_id, source, is_train, tk[i] AS w1, tk[i + 1] AS w2
  FROM toks, unnest(generate_series(1, len(tk) - 1)) AS g(i)
  WHERE len(tk) >= 2
), uni_train AS (
  SELECT w, CAST(count(*) AS DOUBLE) AS cu
  FROM (SELECT unnest(tk) AS w FROM toks WHERE is_train)
  GROUP BY w
), ntok AS (
  SELECT CAST(sum(len(tk)) AS DOUBLE) AS n_tok FROM toks WHERE is_train
), bi_train AS (
  SELECT w1, w2, CAST(count(*) AS DOUBLE) AS cb
  FROM bigrams WHERE is_train GROUP BY w1, w2
), scored AS (
  SELECT e.doc_id, e.source, b.cb,
         CASE WHEN b.cb IS NOT NULL THEN ln(b.cb / u1.cu)
              ELSE ln(0.4 * (COALESCE(u2.cu, 0.0) + 0.5) / n.n_tok)
         END AS logp
  FROM bigrams e
  LEFT JOIN bi_train b ON e.w1 = b.w1 AND e.w2 = b.w2
  LEFT JOIN uni_train u1 ON e.w1 = u1.w
  LEFT JOIN uni_train u2 ON e.w2 = u2.w
  CROSS JOIN ntok n
  WHERE NOT e.is_train
)
SELECT source,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_eval_docs,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       floor(avg(logp) * 10000 + 0.5) / 10000 AS avg_logprob,
       floor(avg(CASE WHEN cb IS NULL THEN 1.0 ELSE 0.0 END)
             * 1000000 + 0.5) / 1000000 AS backoff_rate
FROM scored GROUP BY source ORDER BY source
"""


def _hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey", "c_custkey")
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    nat = rev.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_cust"),
        F.sum("rev").alias("tot"),
        F.sum(F.col("rev") * F.col("rev")).alias("sumsq"),
        F.max("rev").alias("max_rev"),
    )
    return (
        nat.join(F.broadcast(n), nat.c_nationkey == n.n_nationkey)
        .select(
            "n_name",
            "n_cust",
            rnd(F.col("sumsq") / (F.col("tot") * F.col("tot")), 6).alias("hhi"),
            rnd(F.col("max_rev") / F.col("tot"), 6).alias("top_share"),
            rnd("tot", 2).alias("total_rev"),
        )
        .orderBy("n_name")
    )


_HHI_SQL = """
WITH rev AS (
  SELECT c.c_nationkey, c.c_custkey, sum(o.o_totalprice) AS rev
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_nationkey, c.c_custkey
), nat AS (
  SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_cust,
         sum(rev) AS tot, sum(rev * rev) AS sumsq, max(rev) AS max_rev
  FROM rev GROUP BY c_nationkey
)
SELECT n.n_name, a.n_cust,
       floor(a.sumsq / (a.tot * a.tot) * 1000000 + 0.5) / 1000000 AS hhi,
       floor(a.max_rev / a.tot * 1000000 + 0.5) / 1000000 AS top_share,
       floor(a.tot * 100 + 0.5) / 100 AS total_rev
FROM nat a JOIN nation n ON a.c_nationkey = n.n_nationkey
ORDER BY n.n_name
"""

_IPF_ITERS = 30
_IPF_Q = 16777216  # 2^-24 mass-term grid (the Platt/GMM discipline)


def _ipf_q(v: float) -> float:
    import math

    return math.floor(v * _IPF_Q + 0.5) / _IPF_Q


def ipf_rake(
    cells: dict[tuple[str, str], int],
    row_targets: dict[str, float],
    col_targets: dict[str, float],
    iters: int = _IPF_ITERS,
) -> dict[tuple[str, str], float]:
    """Driver-side IPF on the bounded cell grid (pure deterministic
    float arithmetic, fixed sweep order). Cells absent from the sample
    carry no weight; a row/col whose sample mass is zero keeps its
    weights unchanged (the margin is unreachable and reported as-is by
    the caller's invariant checks).

    Oracle-exact since round 11: each cell's mass term w·n snaps to
    the 2^-24 grid before the margin sum, so the sums are exact
    multiples summed without order sensitivity (totals stay far below
    2^53·2^-24) — the DuckDB recursive-CTE replay produces the
    identical scaling trajectory."""
    w = {k: 1.0 for k in cells}
    from ..fns import assert_grid_headroom

    for _ in range(iters):
        for axis, targets in ((0, row_targets), (1, col_targets)):
            sums: dict[str, float] = {}
            for (lg, src), n in cells.items():
                key = lg if axis == 0 else src
                sums[key] = sums.get(key, 0.0) + _ipf_q(w[(lg, src)] * n)
            # mechanical 2^-24 headroom contract (ADVICE r11): checked
            # on the OBSERVED margin masses each sweep — the tightest
            # possible bound, and it fails loudly the first sweep a
            # larger corpus would de-exactify the grid sums
            if sums:
                assert_grid_headroom(
                    1.0, max(sums.values()), "ipf margin mass sums"
                )
            for (lg, src), n in cells.items():
                key = lg if axis == 0 else src
                if sums.get(key, 0.0) > 0 and key in targets:
                    w[(lg, src)] *= targets[key] / sums[key]
    return w


def _raking_ipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select("lang", "source", "n_chars")
    sample = d.filter(F.col("n_chars") >= 300)
    cell_rows = bounded_collect(
        sample.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n")),
        10_000,
        "lang × source value grain",
    )
    corpus_lang = bounded_collect(
        d.groupBy("lang").agg(F.count(F.lit(1)).alias("n")),
        1_000,
        "lang value grain",
    )
    corpus_src = bounded_collect(
        d.groupBy("source").agg(F.count(F.lit(1)).alias("n")),
        1_000,
        "source value grain",
    )
    n_sample = sum(r["n"] for r in cell_rows)
    n_corpus = sum(r["n"] for r in corpus_lang)
    cells = {(r["lang"], r["source"]): r["n"] for r in cell_rows}
    row_t = {r["lang"]: n_sample * r["n"] / n_corpus for r in corpus_lang}
    col_t = {r["source"]: n_sample * r["n"] / n_corpus for r in corpus_src}
    w = ipf_rake(cells, row_t, col_t)
    import math

    out = sorted(
        (
            lg,
            src,
            int(n),
            math.floor(w[(lg, src)] * 1e6 + 0.5) / 1e6,
            math.floor(w[(lg, src)] * n * 1e4 + 0.5) / 1e4,
        )
        for (lg, src), n in cells.items()
    )
    schema = StructType(
        [
            StructField("lang", StringType()),
            StructField("source", StringType()),
            StructField("n_sample", LongType()),
            StructField("weight", DoubleType()),
            StructField("w_count", DoubleType()),
        ]
    )
    return spark.createDataFrame(out, schema)


# IPF as a recursive CTE (round 11): 60 steps alternate the lang and
# source axes (it%2); each step re-derives the margin sums from the
# carried weights with every w·n mass term snapped to the 2^-24 grid
# (exact order-free sums — the Platt/GMM discipline), then scales by
# target/sum. The scaling ratio and weight chain are single IEEE ops
# on identical inputs, so the trajectory is bit-identical to the
# driver-side ipf_rake.
_IPF_SQL = f"""
WITH RECURSIVE cells AS (
  SELECT lang AS lg, source AS src, CAST(count(*) AS BIGINT) AS n
  FROM documents WHERE n_chars >= 300 GROUP BY 1, 2
), ns AS (
  SELECT CAST(sum(n) AS BIGINT) AS n_sample FROM cells
), nc AS (
  SELECT CAST(count(*) AS BIGINT) AS n_corpus FROM documents
), rt AS (
  SELECT lang AS key, (ns.n_sample * CAST(count(*) AS BIGINT)) / nc.n_corpus
           AS tgt
  FROM documents CROSS JOIN ns CROSS JOIN nc
  GROUP BY lang, ns.n_sample, nc.n_corpus
), ct AS (
  SELECT source AS key, (ns.n_sample * CAST(count(*) AS BIGINT))
           / nc.n_corpus AS tgt
  FROM documents CROSS JOIN ns CROSS JOIN nc
  GROUP BY source, ns.n_sample, nc.n_corpus
), walk(it, lg, src, n, w) AS (
  SELECT 0, lg, src, n, CAST(1.0 AS DOUBLE) FROM cells
  UNION ALL
  SELECT * FROM (
    WITH sums AS (
      SELECT it, CASE WHEN it % 2 = 0 THEN lg ELSE src END AS key,
             sum(floor(w * n * {_IPF_Q} + 0.5) / {_IPF_Q}) AS sm
      FROM walk GROUP BY 1, 2
    )
    SELECT w.it + 1, w.lg, w.src, w.n,
           w.w * CASE WHEN s.sm > 0 AND t.tgt IS NOT NULL
                      THEN t.tgt / s.sm ELSE 1.0 END
    FROM walk w
    JOIN sums s ON s.it = w.it
      AND s.key = CASE WHEN w.it % 2 = 0 THEN w.lg ELSE w.src END
    LEFT JOIN (SELECT key, tgt, 0 AS ax FROM rt
               UNION ALL SELECT key, tgt, 1 FROM ct) t
      ON t.key = s.key AND t.ax = w.it % 2
    WHERE w.it < {2 * _IPF_ITERS}
  )
)
SELECT lg AS lang, src AS source, n AS n_sample,
       floor(w * 1000000 + 0.5) / 1000000 AS weight,
       floor(w * n * 10000 + 0.5) / 10000 AS w_count
FROM walk WHERE it = {2 * _IPF_ITERS}
ORDER BY lang, source
"""


QUERIES: dict[str, QuerySpec] = {
    "bigram_backoff_scores": QuerySpec(
        _bigram_backoff_scores,
        _BIGRAM_BACKOFF_SQL,
        "Held-out Stupid-Backoff bigram LM scoring per source "
        "(train/eval hash split, vocab-bounded broadcast count tables)",
    ),
    "hhi_concentration": QuerySpec(
        _hhi_concentration,
        _HHI_SQL,
        "Herfindahl-Hirschman revenue-concentration index per nation "
        "with top-customer share",
    ),
    "raking_ipf": QuerySpec(
        _raking_ipf,
        _IPF_SQL,
        "IPF raking of the quality-filtered sample onto full-corpus "
        "lang x source margins (bounded driver-side fit; 2^-24 mass "
        "grid makes the recursive-CTE oracle hash-exact; margin "
        "invariants in pytest)",
    ),
}
