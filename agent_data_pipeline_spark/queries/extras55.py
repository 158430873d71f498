"""Round-7 twenty-first wave: tail-index estimation, decision-stump
splitting, and data scaling-law measurement.

* ``hill_tail_index`` — Hill (1975) estimator of the Pareto tail
  index of order values: α̂⁻¹ = mean ln(X_(i)/X_(k+1)) over the top
  k = 500 order statistics. Selection compiles to
  TakeOrderedAndProject (per-partition heaps + driver merge — never
  a global sort materialization); the estimate itself is one tiny
  aggregate over the 501 selected rows. The near-uniform fixture
  has a thin tail, so α̂ lands high (~5+) — the calibration read;
  heavy-tailed traffic drives α̂ toward 1–3.
* ``best_split_stump`` — the CART split primitive (Breiman 1984) at
  scale: the best single threshold on ``n_chars`` for predicting
  lang='en' by information gain, evaluated for EVERY candidate
  threshold simultaneously from the value-grain cumulative
  pos/neg histogram (one pass + a bounded-spine window — never a
  per-threshold rescan). Ties break to the smallest threshold.
* ``unigram_scaling_law`` — the data-scaling-law measurement for an
  add-1 unigram LM: five NESTED training fractions (1/16..1 of the
  non-held-out buckets, deterministic md5 hash split), one
  declarative plan evaluating held-out NLL/token for all five
  simultaneously (tokens × fraction grid, vocabulary-bounded count
  tables per fraction), then the log-log OLS exponent of
  NLL-vs-train-size computed from the 5-row moment sums in the same
  plan. The pre-training question "how fast does loss fall with
  data" answered end-to-end in SQL shape; NLL must decrease
  monotonically in train size (asserted by the planted pytest
  invariant).

Reference parity: no tail/ML-primitive/scaling surface in the
reference (SURVEY.md §2.A); declared north-star §2.B additions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .core import QuerySpec, bounded_collect, rnd, t

_HILL_K = 500


def _hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("x"), "o_orderkey"
    )
    top = o.orderBy(F.col("x").desc(), F.col("o_orderkey")).limit(
        _HILL_K + 1
    )
    # window-free (round-11 allowlist burn-down; was a global
    # row_number over the already-TakeOrdered K+1 rows): the ordered
    # collect IS the rank — threshold is row K+1, the Hill mean runs
    # driver-side over K floats. The 6dp grain absorbs summation-order
    # noise exactly as it did between the engines before.
    import math

    rows = bounded_collect(
        top, _HILL_K + 1, f"top-{_HILL_K + 1} order-value tail"
    )
    if len(rows) <= _HILL_K:
        # loud, like stream_dsir_gate's empty-model guard: the old
        # distributed plan degraded silently here; an undersized input
        # means the fixture contract is broken, not "alpha = whatever"
        raise ValueError(
            f"hill_tail_index needs > {_HILL_K} orders, got {len(rows)}"
        )
    x_thr = float(rows[_HILL_K]["x"])
    inv_alpha = (
        sum(math.log(float(r["x"]) / x_thr) for r in rows[:_HILL_K])
        / _HILL_K
    )
    return spark.createDataFrame(
        [
            (
                _HILL_K,
                math.floor(x_thr * 100 + 0.5) / 100,
                math.floor(inv_alpha * 1e6 + 0.5) / 1e6,
                math.floor(1.0 / inv_alpha * 1e4 + 0.5) / 1e4,
            )
        ],
        "k BIGINT, threshold DOUBLE, mean_log_excess DOUBLE, "
        "hill_alpha DOUBLE",
    )


_HILL_SQL = f"""
WITH ranked AS (
  SELECT o_totalprice AS x,
         row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders
), thr AS (
  SELECT x AS x_thr FROM ranked WHERE rk = {_HILL_K + 1}
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS k, max(t.x_thr) AS threshold,
         avg(ln(r.x / t.x_thr)) AS inv_alpha
  FROM ranked r CROSS JOIN thr t
  WHERE r.rk <= {_HILL_K}
)
SELECT k,
       floor(threshold * 100 + 0.5) / 100 AS threshold,
       floor(inv_alpha * 1000000 + 0.5) / 1000000 AS mean_log_excess,
       floor(1.0 / inv_alpha * 10000 + 0.5) / 10000 AS hill_alpha
FROM agg
"""


# --------------------------------------------------------------------------
# best_split_stump
# --------------------------------------------------------------------------

def _best_split_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("v"),
        (F.col("lang") == "en").cast("double").alias("y"),
    )
    grain = d.groupBy("v").agg(
        F.count(F.lit(1)).cast("double").alias("c"),
        F.sum("y").alias("p"),
    )
    # Window-free since round 12 (allowlist burn-down; was a global
    # cumsum over the value grain): ONE distributed aggregate collapses
    # the corpus to the bounded n_chars value grain (≤ ~550 rows — the
    # quantile_normalize class); the cumulative split scan, entropy
    # gains and 9dp-quantized argmax run driver-side. Exactness: counts
    # are integer-valued doubles (cumsums exact), entropies use libm ln
    # — the same library DuckDB's oracle calls (the JVM path this
    # replaces already hash-matched through the 9dp pre-rank grain).
    import math

    rows = bounded_collect(
        grain.orderBy("v"), 20_000, "n_chars value grain"
    )

    def ent(p: float, n: float) -> float:
        q = p / n
        return -(
            (q * math.log(q) if q > 0 else 0.0)
            + ((1 - q) * math.log(1 - q) if q < 1 else 0.0)
        )

    n = float(sum(int(r["c"]) for r in rows))
    pos = float(sum(int(r["p"]) for r in rows))
    h0 = ent(pos, n)
    best = None
    nl = pl = 0.0
    for r in rows:
        nl += float(r["c"])
        pl += float(r["p"])
        if nl >= n:
            continue
        nr, pr = n - nl, pos - pl
        hsplit = (nl / n) * ent(pl, nl) + (nr / n) * ent(pr, nr)
        g9 = math.floor((h0 - hsplit) * 1e9 + 0.5) / 1e9
        key = (-g9, int(r["v"]))
        if best is None or key < best[0]:
            best = (key, int(r["v"]), nl, pl, g9, pl / nl, pr / nr)
    if best is None:
        raise ValueError(
            "best_split_stump needs >= 2 distinct n_chars values"
        )

    def fl6(x: float) -> float:
        return math.floor(x * 1e6 + 0.5) / 1e6

    _key, v_b, nl_b, pl_b, g9_b, lr, rr = best
    return spark.createDataFrame(
        [(v_b, int(n), int(nl_b), fl6(g9_b), fl6(lr), fl6(rr))],
        "best_threshold BIGINT, n_docs BIGINT, n_left BIGINT, "
        "info_gain_nats DOUBLE, left_en_rate DOUBLE, "
        "right_en_rate DOUBLE",
    )


_STUMP_SQL = """
WITH d AS (
  SELECT n_chars AS v,
         CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
  FROM documents
), grain AS (
  SELECT v, CAST(count(*) AS DOUBLE) AS c, sum(y) AS p
  FROM d GROUP BY 1
), cum AS (
  SELECT v,
         sum(c) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nl,
         sum(p) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pl
  FROM grain
), tot AS (
  SELECT sum(c) AS n, sum(p) AS pos FROM grain
), scored AS (
  SELECT c.v, c.nl, c.pl, t.n, t.pos,
         floor((
           -(CASE WHEN t.pos / t.n > 0
                  THEN t.pos / t.n * ln(t.pos / t.n) ELSE 0.0 END
             + CASE WHEN t.pos / t.n < 1
                    THEN (1 - t.pos / t.n) * ln(1 - t.pos / t.n)
                    ELSE 0.0 END)
           - (c.nl / t.n) * (
             -(CASE WHEN c.pl / c.nl > 0
                    THEN c.pl / c.nl * ln(c.pl / c.nl) ELSE 0.0 END
               + CASE WHEN c.pl / c.nl < 1
                      THEN (1 - c.pl / c.nl) * ln(1 - c.pl / c.nl)
                      ELSE 0.0 END))
           - ((t.n - c.nl) / t.n) * (
             -(CASE WHEN (t.pos - c.pl) / (t.n - c.nl) > 0
                    THEN (t.pos - c.pl) / (t.n - c.nl)
                         * ln((t.pos - c.pl) / (t.n - c.nl)) ELSE 0.0 END
               + CASE WHEN (t.pos - c.pl) / (t.n - c.nl) < 1
                      THEN (1 - (t.pos - c.pl) / (t.n - c.nl))
                           * ln(1 - (t.pos - c.pl) / (t.n - c.nl))
                      ELSE 0.0 END))
         ) * 1e9 + 0.5) / 1e9 AS g9
  FROM cum c CROSS JOIN tot t
  WHERE c.nl < t.n
)
SELECT CAST(v AS BIGINT) AS best_threshold,
       CAST(n AS BIGINT) AS n_docs,
       CAST(nl AS BIGINT) AS n_left,
       floor(g9 * 1000000 + 0.5) / 1000000 AS info_gain_nats,
       floor(pl / nl * 1000000 + 0.5) / 1000000 AS left_en_rate,
       floor((pos - pl) / (n - nl) * 1000000 + 0.5) / 1000000
         AS right_en_rate
FROM scored
ORDER BY g9 DESC, v
LIMIT 1
"""


# --------------------------------------------------------------------------
# unigram_scaling_law
# --------------------------------------------------------------------------

_FRACTIONS = (0.0625, 0.125, 0.25, 0.5, 1.0)
_EVAL_CUT = 900  # buckets >= this are held out


def _unigram_scaling_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 1000
    )
    toks = d.select(
        bucket.alias("b"),
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    fr = spark.createDataFrame(
        [(f,) for f in _FRACTIONS], "fraction DOUBLE"
    )
    train = (
        toks.filter(F.col("b") < _EVAL_CUT)
        .crossJoin(F.broadcast(fr))
        .filter(F.col("b") < F.col("fraction") * _EVAL_CUT)
        .groupBy("fraction", "tok")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    tstats = train.groupBy("fraction").agg(
        F.sum("c").alias("nt"), F.count(F.lit(1)).cast("double").alias("vt")
    )
    # vocabulary for add-1 smoothing: the CORPUS vocab (fixed across
    # fractions so the NLL comparison is apples-to-apples)
    vocab = toks.agg(F.count_distinct(F.col("tok")).cast("double").alias("vv"))
    ev = toks.filter(F.col("b") >= _EVAL_CUT)
    scored = (
        ev.crossJoin(F.broadcast(fr))
        .join(train, ["fraction", "tok"], "left")
        .join(F.broadcast(tstats), "fraction")
        .crossJoin(F.broadcast(vocab))
        .select(
            "fraction",
            (
                -F.log(
                    (F.coalesce(F.col("c"), F.lit(0.0)) + 1)
                    / (F.col("nt") + F.col("vv"))
                )
            ).alias("nll"),
        )
    )
    per_f = scored.groupBy("fraction").agg(
        F.count(F.lit(1)).cast("long").alias("n_eval_tokens"),
        F.avg("nll").alias("nll_tok"),
    )
    docs_per_f = (
        d.select(bucket.alias("b"))
        .filter(F.col("b") < _EVAL_CUT)
        .crossJoin(F.broadcast(fr))
        .filter(F.col("b") < F.col("fraction") * _EVAL_CUT)
        .groupBy("fraction")
        .agg(F.count(F.lit(1)).cast("long").alias("n_train_docs"))
    )
    base = per_f.join(docs_per_f, "fraction")
    # log-log OLS exponent over the 5 points, in-plan
    m = base.select(
        F.log("fraction").alias("lx"), F.log("nll_tok").alias("ly")
    ).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return (
        base.crossJoin(F.broadcast(m.select(slope.alias("b"))))
        .select(
            "fraction",
            "n_train_docs",
            "n_eval_tokens",
            rnd("nll_tok", 6).alias("eval_nll_per_token"),
            rnd("b", 6).alias("scaling_exponent"),
        )
        .orderBy("fraction")
    )


_SCALING_SQL = f"""
WITH d AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 1000 AS b,
         text
  FROM documents
), toks AS (
  SELECT b, tok FROM (
    SELECT b, unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
    FROM d
  ) WHERE tok <> ''
), fr AS (
  SELECT unnest([0.0625, 0.125, 0.25, 0.5, 1.0]) AS fraction
), train AS (
  SELECT f.fraction, t.tok, CAST(count(*) AS DOUBLE) AS c
  FROM toks t CROSS JOIN fr f
  WHERE t.b < {_EVAL_CUT} AND t.b < f.fraction * {_EVAL_CUT}
  GROUP BY 1, 2
), tstats AS (
  SELECT fraction, sum(c) AS nt FROM train GROUP BY 1
), vocab AS (
  SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS vv FROM toks
), ev AS (
  SELECT tok FROM toks WHERE b >= {_EVAL_CUT}
), scored AS (
  SELECT f.fraction,
         -ln((COALESCE(tr.c, 0.0) + 1) / (ts.nt + v.vv)) AS nll
  FROM ev e CROSS JOIN fr f
  LEFT JOIN train tr ON tr.fraction = f.fraction AND tr.tok = e.tok
  JOIN tstats ts ON ts.fraction = f.fraction
  CROSS JOIN vocab v
), per_f AS (
  SELECT fraction, CAST(count(*) AS BIGINT) AS n_eval_tokens,
         avg(nll) AS nll_tok
  FROM scored GROUP BY 1
), docs_per_f AS (
  SELECT f.fraction, CAST(count(*) AS BIGINT) AS n_train_docs
  FROM d CROSS JOIN fr f
  WHERE d.b < {_EVAL_CUT} AND d.b < f.fraction * {_EVAL_CUT}
  GROUP BY 1
), base AS (
  SELECT p.fraction, dd.n_train_docs, p.n_eval_tokens, p.nll_tok
  FROM per_f p JOIN docs_per_f dd ON p.fraction = dd.fraction
), m AS (
  SELECT (count(*) * sum(ln(fraction) * ln(nll_tok))
          - sum(ln(fraction)) * sum(ln(nll_tok)))
         / (count(*) * sum(ln(fraction) * ln(fraction))
            - sum(ln(fraction)) * sum(ln(fraction))) AS b
  FROM base
)
SELECT base.fraction, base.n_train_docs, base.n_eval_tokens,
       floor(base.nll_tok * 1000000 + 0.5) / 1000000
         AS eval_nll_per_token,
       floor(m.b * 1000000 + 0.5) / 1000000 AS scaling_exponent
FROM base CROSS JOIN m
ORDER BY base.fraction
"""


QUERIES: dict[str, QuerySpec] = {
    "hill_tail_index": QuerySpec(
        _hill_tail_index,
        _HILL_SQL,
        "Hill tail-index estimator over the top-500 order values "
        "(TakeOrdered selection, one tiny aggregate)",
    ),
    "best_split_stump": QuerySpec(
        _best_split_stump,
        _STUMP_SQL,
        "CART best-split stump on n_chars for lang='en' by information "
        "gain, all thresholds scored from one value-grain histogram",
    ),
    "unigram_scaling_law": QuerySpec(
        _unigram_scaling_law,
        _SCALING_SQL,
        "Unigram-LM data scaling law: held-out NLL at 5 nested train "
        "fractions + in-plan log-log OLS exponent",
    ),
}
