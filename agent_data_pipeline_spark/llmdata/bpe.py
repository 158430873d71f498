"""BPE (byte-pair-encoding) vocabulary induction over a document corpus
— the tokenizer-training step of an LLM data pipeline.

The scalable decomposition is the classic one (Sennrich et al. 2016,
and what sentencepiece/HF trainers do): BPE statistics depend only on
the WORD-TYPE frequency table, not on token positions — so the corpus
contributes exactly ONE distributed scan + one vocabulary-bounded
shuffle (tokenize map-side, groupBy word), and the merge loop runs over
the bounded type table. At 100 TB the type table is tens of millions of
rows where the corpus is trillions of tokens; ``max_types`` puts a
deterministic cap on even that (count-desc, word-asc cutoff — the same
head-of-Zipf truncation production trainers apply).

Determinism: pair counts are exact integers; the merge argmax
tie-breaks lexicographically on (left, right); no RNG anywhere. The
merge loop is pure driver-side Python over the bounded table — the same
economics as the IVF k-means fit (bounded state, corpus-size-free).

Reference parity note: the reference pipeline has no text processing at
all (SURVEY.md §2.A — its transforms are taxi-trip SQL); this operator
belongs to the declared LLM-data north-star surface.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_END = "</w>"  # end-of-word marker, per the original BPE formulation


def word_type_counts(
    df: DataFrame, text_col: str = "text", max_types: int | None = None
) -> DataFrame:
    """Word-type frequency table: lower-cased whitespace tokens with
    exact counts. The ONLY fact-scale work in BPE training — map-side
    tokenize + one groupBy whose output is vocabulary-bounded. With
    ``max_types``, keep the most frequent types with a deterministic
    (count desc, word asc) cutoff."""
    words = df.select(
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    if max_types is not None:
        counts = counts.orderBy(F.col("n").desc(), F.col("word")).limit(max_types)
    return counts


def bpe_train_merges(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 20,
    max_types: int | None = 100_000,
) -> list[tuple[int, str, str, int]]:
    """Learn ``num_merges`` BPE merges; returns
    ``[(step, left, right, pair_count), ...]`` (1-based steps).

    Words split into character symbols + an end-of-word marker; each
    step merges the adjacent symbol pair with the highest total count
    (weighted by word-type frequency; adjacent pairs count zip-style as
    in the original formulation, and the winning merge is then applied
    greedily left-to-right within each word), ties broken
    lexicographically on (left, right). Stops early when no pair occurs
    at least twice. Tests assert the reference-equality of the merge
    sequence against an independent implementation and the
    non-increasing winning-pair count observed across steps."""
    from ..fns import bounded_collect

    rows = bounded_collect(
        word_type_counts(df, text_col, max_types=max_types),
        max_types if max_types is not None else 1_000_000,
        "word-TYPE vocab capped at max_types (1e6 envelope when uncapped)",
    )
    vocab: dict[tuple[str, ...], int] = {}
    for r in rows:
        sym = tuple(r["word"]) + (_END,)
        vocab[sym] = vocab.get(sym, 0) + int(r["n"])

    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, num_merges + 1):
        pair_counts: dict[tuple[str, str], int] = {}
        for sym, n in vocab.items():
            i = 0
            while i < len(sym) - 1:
                p = (sym[i], sym[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + n
                i += 1
        if not pair_counts:
            break
        # argmax with deterministic lexicographic tie-break
        best = min(pair_counts, key=lambda p: (-pair_counts[p], p))
        if pair_counts[best] < 2:
            break
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, n in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == best[0] and sym[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + n
        vocab = new_vocab
        merges.append((step, best[0], best[1], pair_counts[best]))
    return merges


def bpe_encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Encode one word with a trained merge list: merges apply in
    training order, each greedily left-to-right — the exact rule the
    trainer itself uses per step (subword-nmt semantics), so encoding a
    training word reproduces its final training segmentation."""
    sym: list[str] = list(word) + [_END]
    for left, right in merges:
        if len(sym) < 2:
            break
        out: list[str] = []
        i = 0
        while i < len(sym):
            if i < len(sym) - 1 and sym[i] == left and sym[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def bpe_encode_stats_df(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    num_merges: int = 32,
    max_types: int | None = 100_000,
) -> DataFrame:
    """Per-group token accounting under the trained tokenizer:
    ``(group, n_words, n_types, n_tokens, chars_per_token)``.

    The budget-sheet step after tokenizer training — "how many tokens is
    each source under MY tokenizer" — which is what a mixture planner
    actually allocates. Scale shape: train touches the corpus once
    (``word_type_counts``); the encoder runs distributed over the
    DISTINCT word-type table only (Arrow-batched pandas UDF, pure
    function of the word), never over corpus positions; per-group word
    counts are one groupBy bounded by |groups|·|vocab|; the encoded type
    table joins back broadcast (``max_types``-capped by construction).
    """
    merges = [
        (left, right)
        for _, left, right, _ in bpe_train_merges(
            df, text_col, num_merges=num_merges, max_types=max_types
        )
    ]

    gw = (
        df.select(
            F.col(group_col).alias("grp"),
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("word"),
        )
        .filter(F.col("word") != "")
        .groupBy("grp", "word")
        .agg(F.count(F.lit(1)).alias("n"))
    )

    @F.pandas_udf("long")
    def _n_tokens(words: pd.Series) -> pd.Series:
        return words.map(lambda w: len(bpe_encode_word(w, merges)))

    types_enc = (
        gw.select("word")
        .distinct()
        .withColumn("toks_per_word", _n_tokens("word"))
    )
    joined = gw.join(F.broadcast(types_enc), "word")
    from ..fns import rnd

    return (
        joined.groupBy("grp")
        .agg(
            F.sum("n").cast("long").alias("n_words"),
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.sum(F.col("n") * F.col("toks_per_word"))
            .cast("long")
            .alias("n_tokens"),
            F.sum(F.col("n") * F.length("word")).cast("long").alias("_chars"),
        )
        .select(
            "grp",
            "n_words",
            "n_types",
            "n_tokens",
            rnd(F.col("_chars") / F.col("n_tokens"), 6).alias(
                "chars_per_token"
            ),
        )
        .orderBy("grp")
    )


def bpe_merges_df(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 20,
    max_types: int | None = 100_000,
) -> DataFrame:
    """``bpe_train_merges`` as a DataFrame (step, left, right,
    pair_count) — the registry surface."""
    spark = df.sparkSession
    merges = bpe_train_merges(
        df, text_col, num_merges=num_merges, max_types=max_types
    )
    return spark.createDataFrame(
        [(int(s), l, r, int(c)) for s, l, r, c in merges],
        "step long, left string, right string, pair_count long",
    )
