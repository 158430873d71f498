"""Round-6 fourth-wave surface: tokenizer-aware token accounting and
the quality-gate removal funnel — the two reporting steps every corpus
freeze publishes.

* ``bpe_encode_stats`` — per-source token counts UNDER THE TRAINED BPE
  tokenizer (llmdata/bpe.py ``bpe_encode_stats_df``): train merges from
  the corpus itself, encode the distinct word-type table distributed
  (Arrow-batched pandas UDF — never corpus positions), join back
  broadcast, aggregate per source. The real input to a token-budget
  mixture plan (``mixture_budget_plan`` approximates tokens by
  whitespace words; this row is the tokenizer-true version). Rows-only:
  the merge loop + greedy encode are iterative, not SQL-expressible —
  correctness is reference-equality of the encoder against the training
  segmentation plus conservation invariants (tests/test_bpe.py).

* ``quality_filter_funnel`` — the sequential Gopher-gate funnel: stages
  apply in a fixed order (length bounds → mean word length → stopword
  fraction → alphabetic fraction), each to the survivors of the
  previous, reporting docs in/removed/out and surviving tokens per
  stage. Same predicate definitions as ``gopher_filters`` (which
  reports MARGINAL pass counts); the funnel is the ablation sheet a
  pipeline publishes before a freeze. One fact scan → per-doc
  first-failed-stage → a ≤5-row aggregate; the 4-stage spine joins the
  tiny table, so nothing past the first aggregate is fact-scale.

Reference parity: the reference has no text processing (SURVEY.md §2.A);
both rows belong to the declared LLM-data north-star surface (§2.B).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llmdata import bpe
from .core import QuerySpec, rnd, t

_STOPWORDS = ["the", "a", "of", "to", "and", "in"]  # as gopher_filters


def _bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe.bpe_encode_stats_df(
        t(spark, sf_dir, "documents"),
        text_col="text",
        group_col="source",
        num_merges=32,
    ).withColumnRenamed("grp", "source")


def _quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    stop_lit = F.array(*[F.lit(w) for w in _STOPWORDS])
    n_words = F.size(toks)
    denom = F.nullif(n_words.cast("double"), F.lit(0.0))
    feat = d.select(
        n_words.cast("long").alias("n_words"),
        (
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast(
                "double"
            )
            / denom
        ).alias("mean_word_len"),
        (
            F.size(
                F.filter(toks, lambda w: F.array_contains(stop_lit, w))
            ).cast("double")
            / denom
        ).alias("stop_frac"),
        (
            F.size(F.filter(toks, lambda w: w.rlike("^[a-z]+$"))).cast(
                "double"
            )
            / denom
        ).alias("alpha_frac"),
    )
    fail_at = (
        F.when(~F.col("n_words").between(10, 100000), 1)
        .when(~F.col("mean_word_len").between(3, 10), 2)
        .when(~(F.col("stop_frac") >= 0.01), 3)
        .when(~(F.col("alpha_frac") >= 0.8), 4)
        .otherwise(5)
    )
    agg = (
        feat.select(fail_at.alias("fail_at"), "n_words")
        .groupBy("fail_at")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_words").cast("long").alias("n_tokens"),
        )
    )
    spine = spark.createDataFrame(
        [
            (1, "len_bounds"),
            (2, "mean_word_len"),
            (3, "stopword_frac"),
            (4, "alpha_frac"),
        ],
        "stage long, stage_name string",
    )

    def _s(cond):
        return F.coalesce(
            F.sum(F.when(cond, F.col("n_docs"))), F.lit(0)
        ).cast("long")

    fa = F.col("fail_at")
    st = F.col("stage")
    return (
        spine.crossJoin(agg)
        .groupBy("stage", "stage_name")
        .agg(
            _s(fa >= st).alias("docs_in"),
            _s(fa == st).alias("docs_removed"),
            _s(fa > st).alias("docs_out"),
            F.coalesce(
                F.sum(F.when(fa > st, F.col("n_tokens"))), F.lit(0)
            )
            .cast("long")
            .alias("tokens_out"),
        )
        .withColumn(
            "survival_rate",
            rnd(
                F.col("docs_out")
                / F.nullif(F.col("docs_in").cast("double"), F.lit(0.0)),
                6,
            ),
        )
        .orderBy("stage")
    )


_FUNNEL_SQL = f"""
WITH feat AS (
  SELECT CAST(len(toks) AS BIGINT)                              AS n_words,
         CAST(length(replace(text, ' ', '')) AS DOUBLE)
           / nullif(len(toks), 0)                               AS mean_word_len,
         CAST(len(list_filter(toks,
              w -> list_contains({_STOPWORDS!r}, w))) AS DOUBLE)
           / nullif(len(toks), 0)                               AS stop_frac,
         CAST(len(list_filter(toks,
              w -> regexp_full_match(w, '[a-z]+'))) AS DOUBLE)
           / nullif(len(toks), 0)                               AS alpha_frac
  FROM (SELECT text, string_split(text, ' ') AS toks FROM documents)
), fail AS (
  SELECT CASE WHEN NOT (n_words BETWEEN 10 AND 100000) THEN 1
              WHEN NOT (mean_word_len BETWEEN 3 AND 10) THEN 2
              WHEN NOT (stop_frac >= 0.01) THEN 3
              WHEN NOT (alpha_frac >= 0.8) THEN 4
              ELSE 5 END AS fail_at,
         n_words
  FROM feat
), agg AS (
  SELECT fail_at, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_words) AS BIGINT) AS n_tokens
  FROM fail GROUP BY fail_at
), spine AS (
  SELECT * FROM (VALUES (1, 'len_bounds'), (2, 'mean_word_len'),
                        (3, 'stopword_frac'), (4, 'alpha_frac'))
         AS v(stage, stage_name)
)
SELECT CAST(s.stage AS BIGINT) AS stage, s.stage_name,
       CAST(COALESCE(sum(CASE WHEN a.fail_at >= s.stage
                              THEN a.n_docs END), 0) AS BIGINT) AS docs_in,
       CAST(COALESCE(sum(CASE WHEN a.fail_at = s.stage
                              THEN a.n_docs END), 0) AS BIGINT)
         AS docs_removed,
       CAST(COALESCE(sum(CASE WHEN a.fail_at > s.stage
                              THEN a.n_docs END), 0) AS BIGINT) AS docs_out,
       CAST(COALESCE(sum(CASE WHEN a.fail_at > s.stage
                              THEN a.n_tokens END), 0) AS BIGINT)
         AS tokens_out,
       floor((COALESCE(sum(CASE WHEN a.fail_at > s.stage
                                THEN a.n_docs END), 0)
              / nullif(CAST(COALESCE(sum(CASE WHEN a.fail_at >= s.stage
                                              THEN a.n_docs END), 0)
                            AS DOUBLE), 0.0))
             * 1000000 + 0.5) / 1000000 AS survival_rate
FROM spine s CROSS JOIN agg a
GROUP BY s.stage, s.stage_name
ORDER BY stage
"""


QUERIES: dict[str, QuerySpec] = {
    "bpe_encode_stats": QuerySpec(
        _bpe_encode_stats,
        None,
        "per-source token accounting under the trained BPE tokenizer "
        "(rows-only: iterative merge training + greedy encode; pytest "
        "pins encoder/trainer reference-equality and conservation "
        "invariants)",
    ),
    "quality_filter_funnel": QuerySpec(
        _quality_filter_funnel,
        _FUNNEL_SQL,
        "sequential Gopher-gate removal funnel: docs/tokens per stage",
    ),
}
