"""Model-based quality/source classification (CCNet-style).

CCNet and FineWeb gate web documents with a lightweight linear text
classifier trained to separate a curated source from the raw crawl
(fastText in the originals). The SQL-expressible member of that family
is multinomial Naive Bayes with Laplace smoothing: the per-token
log-odds weights derive from grouped token counts, scoring is one
sum per document, and the whole train+score computation is a single
declarative plan — which means the DuckDB oracle can replay it
hash-exactly, unlike a hashed-feature SGD model.

Scale notes (100 TB): the weight table is vocabulary-bounded, and
``min_count`` prunes the hapax tail exactly the way fastText's
``minCount`` does, keeping it broadcastable (a 1M-token vocab of
(tok, w) rows is ~30 MB). Training is one token-grouped aggregation
over the labeled sample (normally a tiny fraction of the corpus);
scoring is a map-side explode + broadcast join + per-doc re-aggregate
on the natural doc key — no fact-scale sort or window anywhere.

Reference parity: the reference has no classifier (SURVEY.md §2.A);
this belongs to the declared LLM-data north-star surface (§2.B).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..fns import rnd

_TOKEN_SPLIT = r"\s+"


def _tokens(df: DataFrame, text_col: str, keep: list[str]) -> DataFrame:
    return df.select(
        *keep,
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), _TOKEN_SPLIT)
        ).alias("tok"),
    )


def nb_train_score(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    label_col: str,
    train_col: str,
    min_count: int = 1,
) -> DataFrame:
    """Train a binary multinomial NB on ``train_col`` rows, score the rest.

    ``label_col`` and ``train_col`` are boolean columns. Returns the
    held-out rows as ``(id_col, label, n_tokens, margin)`` where
    ``margin`` is the (unrounded) posterior log-odds
    ``ln P(pos|doc) - ln P(neg|doc)``; the caller thresholds at 0.

    Smoothing: add-one over the train vocabulary V for in-vocabulary
    tokens; a held-out token outside V contributes the uniform unseen
    mass ``ln(1/(tot_pos+V)) - ln(1/(tot_neg+V))``, and the class prior
    is add-one smoothed so an empty class stays finite. ``min_count``
    drops train tokens with total frequency below it from V (they score
    as unseen) — the vocabulary cap that keeps the weight table
    broadcastable at corpus scale.
    """
    lbl, trn = F.col(label_col), F.col(train_col)
    toks = _tokens(df, text_col, [id_col, label_col, train_col])

    counts = (
        toks.filter(trn)
        .groupBy("tok")
        .agg(
            F.sum(F.when(lbl, 1).otherwise(0)).cast("long").alias("n_pos"),
            F.sum(F.when(lbl, 0).otherwise(1)).cast("long").alias("n_neg"),
        )
        .filter(F.col("n_pos") + F.col("n_neg") >= min_count)
    )
    consts = counts.agg(
        F.coalesce(F.sum("n_pos"), F.lit(0)).cast("long").alias("tot_pos"),
        F.coalesce(F.sum("n_neg"), F.lit(0)).cast("long").alias("tot_neg"),
        F.count(F.lit(1)).cast("long").alias("vsize"),
    )
    priors = (
        df.filter(trn)
        .agg(
            F.sum(F.when(lbl, 1).otherwise(0)).cast("long").alias("d_pos"),
            F.sum(F.when(lbl, 0).otherwise(1)).cast("long").alias("d_neg"),
        )
        .crossJoin(consts)
        .select(
            "tot_pos",
            "tot_neg",
            "vsize",
            F.log((F.col("d_pos") + 1) / (F.col("d_neg") + 1)).alias("prior"),
            # empty vocabulary (everything pruned) -> prior-only model:
            # the unseen-token likelihood ratio degenerates to 1 (w=0)
            F.when(
                F.col("vsize") > 0,
                F.log(F.lit(1.0) / (F.col("tot_pos") + F.col("vsize")))
                - F.log(F.lit(1.0) / (F.col("tot_neg") + F.col("vsize"))),
            )
            .otherwise(F.lit(0.0))
            .alias("w_oov"),
        )
    )

    def _w(n: Column, tot: Column) -> Column:
        return F.log((n + 1) / (tot + F.col("vsize")))

    weights = (
        counts.crossJoin(F.broadcast(consts))
        .select(
            "tok",
            (
                _w(F.col("n_pos"), F.col("tot_pos"))
                - _w(F.col("n_neg"), F.col("tot_neg"))
            ).alias("w"),
        )
    )

    scored = (
        toks.filter(~trn)
        .join(F.broadcast(weights), "tok", "left")
        .crossJoin(F.broadcast(priors.select("prior", "w_oov")))
        .groupBy(id_col, label_col, "prior")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(F.coalesce(F.col("w"), F.col("w_oov"))).alias("w_sum"),
        )
        .select(
            id_col,
            F.col(label_col).alias("label"),
            "n_tokens",
            (F.col("prior") + F.col("w_sum")).alias("margin"),
        )
    )
    return scored


def dsir_tokens(text_col: str) -> Column:
    """Token array for the DSIR feature definition: lower-cased,
    trimmed, whitespace-split, empty tokens removed. Callers MUST bind
    this to a named column (``withColumn``/``select`` alias) before
    feeding it to ``dsir_grams`` — Catalyst does not eliminate common
    subexpressions across lambda boundaries, so an inline token
    expression gets re-tokenized per element inside the bigram
    transform (measured 5× wall on the sf0.1 corpus)."""
    return F.array_remove(
        F.split(
            F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))),
            _TOKEN_SPLIT,
        ),
        "",
    )


def dsir_grams(tokens_col: str) -> Column:
    """Array of DSIR features from a MATERIALIZED token-array column
    (see ``dsir_tokens``): word unigrams ++ bigrams. ``sequence(1, 0)``
    would yield a DESCENDING ``[1, 0]`` in Spark, so the ``size >= 2``
    guard on the bigram arm is load-bearing, not decorative."""
    tc = F.col(tokens_col)
    return F.when(
        F.size(tc) >= 2,
        F.concat(
            tc,
            F.transform(
                F.sequence(F.lit(1), F.size(tc) - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(tc, i), F.element_at(tc, i + 1)
                ),
            ),
        ),
    ).otherwise(tc)


def dsir_bucket(gram: Column, n_buckets: int) -> Column:
    """Engine-portable feature hash: first 8 md5 hex digits as an
    unsigned 32-bit int, mod ``n_buckets`` (the queries/extras35.py CMS
    hash; DuckDB mirror: ``CAST(concat('0x', substr(md5(g),1,8)) AS
    BIGINT) % n``)."""
    return F.pmod(
        F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long"),
        F.lit(n_buckets),
    )


def dsir_bucket_model(
    df: DataFrame,
    *,
    text_col: str = "text",
    target_col: str = "is_target",
    n_buckets: int = 1024,
) -> DataFrame:
    """Train the DSIR bucket model alone: returns the ``n_buckets``-row
    log-ratio table ``(_b, _lr, _lr_unseen)`` where ``_lr_unseen`` is
    the (row-constant) log-ratio a bucket with zero training
    occurrences would score — what a scorer shipping the model to a
    stream must substitute for buckets outside the table. O(n_buckets)
    rows at any corpus scale: safe to broadcast or bounded-collect into
    a literal map (see queries/extras64.py ``stream_dsir_gate``)."""
    stream = df.select(
        F.col(target_col).alias("_is_t"), dsir_tokens(text_col).alias("_tc")
    ).select("_is_t", F.explode(dsir_grams("_tc")).alias("_ng"))
    bucketed = stream.select(
        "_is_t", dsir_bucket(F.col("_ng"), n_buckets).alias("_b")
    )
    model = bucketed.groupBy("_b").agg(
        F.count(F.lit(1)).alias("_r"),
        F.sum(F.col("_is_t").cast("long")).alias("_t"),
    )
    tot = model.agg(F.sum("_r").alias("_rtot"), F.sum("_t").alias("_ttot"))
    smooth = float(n_buckets)
    return (
        model.crossJoin(F.broadcast(tot))
        .select(
            "_b",
            (
                F.log((F.col("_t") + 1.0) / (F.col("_ttot") + smooth))
                - F.log((F.col("_r") + 1.0) / (F.col("_rtot") + smooth))
            ).alias("_lr"),
            (
                F.log(F.lit(1.0) / (F.col("_ttot") + smooth))
                - F.log(F.lit(1.0) / (F.col("_rtot") + smooth))
            ).alias("_lr_unseen"),
        )
    )


def dsir_doc_weights(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_col: str = "is_target",
    n_buckets: int = 1024,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """DSIR-style hashed n-gram importance weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling").

    Both the target and raw distributions are bag-of-hashed-ngrams
    unigram models over ``n_buckets`` feature buckets: features are the
    word unigrams AND bigrams of the lower-cased, whitespace-split,
    empty-token-filtered text, hashed portably (first 8 md5 hex digits
    as an unsigned 32-bit int, mod ``n_buckets`` — the same
    engine-portable hash as the CMS sketch in queries/extras35.py).
    Bucket probabilities are add-one smoothed over ``n_buckets``; the
    per-document weight is the summed occurrence-level log-ratio

        w(doc) = sum_{ngram occurrences} ln p_target[b] - ln p_raw[b]

    rounded to 9dp so the two engines' different partial-sum orders
    cannot leak into a value-hash compare (fns.rnd portable rounding).

    Scale shape (100 TB): the ngram stream is fact-scale but is only
    ever aggregated — once to the ``n_buckets``-row model (map-side
    combine into <= n_buckets groups; the totals row and the log-ratio
    table are broadcast back), once to the per-document weight (the one
    unavoidable doc-key shuffle, map-combined). No window, no sort, no
    pair materialization; the model table is O(n_buckets) regardless of
    corpus size, so it broadcasts anywhere. The lineage deliberately
    recomputes the tokenize+explode for the scoring pass instead of
    persisting a fact-scale intermediate — at 100 TB a re-scan is
    cheaper than caching the exploded stream.

    Documents with zero ngrams (empty/whitespace text) drop out of the
    result — they carry no evidence either way; callers needing them
    can left-join this frame back to the corpus.

    Returns a DataFrame ``(id_col, *keep, w: double)``.
    """
    stream = df.select(
        id_col, *keep, dsir_tokens(text_col).alias("_tc")
    ).select(id_col, *keep, F.explode(dsir_grams("_tc")).alias("_ng"))
    bucketed = stream.select(
        id_col, *keep, dsir_bucket(F.col("_ng"), n_buckets).alias("_b")
    )
    logratio = dsir_bucket_model(
        df, text_col=text_col, target_col=target_col, n_buckets=n_buckets
    ).select("_b", "_lr")
    return (
        bucketed.join(F.broadcast(logratio), "_b")
        .groupBy(id_col, *keep)
        .agg(rnd(F.sum("_lr"), 9).alias("w"))
    )
