"""Differential tests: hygiene Spark expressions vs a pure-Python mirror
on adversarial texts (whitespace runs, empties, unicode, heavy repeats).
One Spark job covers the whole corpus, so this stays fast."""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import Row

from agent_data_pipeline_spark.llmdata import hygiene

TEXTS = [
    "",
    " ",
    "one",
    "a a a a a a",
    "a b a b a b a b",
    "the quick brown fox jumps over the lazy dog",
    "  leading and   multiple   spaces  ",
    "tabs\tand\nnewlines mixed\t\twith  spaces",
    "Ünïcode wörds ünïcode wörds",
    "x " * 50,
    "repeat repeat repeat distinct tail",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z",
]


def _toks(text: str) -> list[str]:
    return re.split(r"\s+", text.strip().lower())


def _dup_frac(text: str, n: int) -> float:
    toks = _toks(text)
    grams = [tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    if not grams:
        return 0.0
    return 1.0 - len(set(grams)) / len(grams)


def _top_word_frac(text: str) -> float:
    toks = _toks(text)
    if not toks:
        return 0.0
    return max(toks.count(w) for w in set(toks)) / len(toks)


def _rnd6(x: float) -> float:
    import math

    return math.floor(x * 1_000_000 + 0.5) / 1_000_000


def test_repetition_stats_matches_python_reference(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(TEXTS)]
    )
    rows = {r.doc_id: r for r in hygiene.with_repetition_stats(df).collect()}
    for i, t in enumerate(TEXTS):
        r = rows[i]
        assert abs(r.dup_2gram_frac - _rnd6(_dup_frac(t, 2))) < 1e-9, (i, t)
        assert abs(r.dup_3gram_frac - _rnd6(_dup_frac(t, 3))) < 1e-9, (i, t)
        assert abs(r.top_word_frac - _rnd6(_top_word_frac(t))) < 1e-9, (i, t)


def test_shard_assign_matches_python_reference(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    rows = {
        r.doc_id: (r.shard, r.shuffle_key)
        for r in hygiene.shard_assign(df, "doc_id", n_shards=8).collect()
    }
    for i in range(1000):
        h = hashlib.md5(f"s42:{i}".encode()).hexdigest()
        assert rows[i][1] == h
        assert rows[i][0] == int(h[:2], 16) % 8
    # and the distribution is roughly uniform (binomial 3-sigma bound)
    counts = [0] * 8
    for shard, _ in rows.values():
        counts[shard] += 1
    assert all(85 <= c <= 165 for c in counts), counts


def test_flag_contaminated_monotone_in_eval_set(spark):
    """Growing the eval set can only add contaminated docs, never clear
    a flag — the monotonicity a decontamination gate must have."""
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(TEXTS) if t.strip()]
    )
    small = spark.createDataFrame([Row(doc_id=100, text=TEXTS[5])])
    big = spark.createDataFrame(
        [Row(doc_id=100, text=TEXTS[5]), Row(doc_id=101, text=TEXTS[4])]
    )
    f_small = {
        r.doc_id: r.is_contaminated
        for r in hygiene.flag_contaminated(
            docs, hygiene.eval_ngram_set(small, n=3), n=3
        ).collect()
    }
    f_big = {
        r.doc_id: r.is_contaminated
        for r in hygiene.flag_contaminated(
            docs, hygiene.eval_ngram_set(big, n=3), n=3
        ).collect()
    }
    assert all(f_big[k] >= f_small[k] for k in f_small)
    assert sum(f_big.values()) > sum(f_small.values())  # TEXTS[4] now flagged
