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
    rows = word_type_counts(df, text_col, max_types=max_types).collect()
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
