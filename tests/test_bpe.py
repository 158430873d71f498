"""BPE vocabulary induction (llmdata/bpe.py): reference-equality of the
merge sequence against an INDEPENDENT pure-Python implementation (the
rows-only check the driver can't do), plus the algorithmic invariants.

The reference below is written from the original formulation (count
adjacent pairs over word-type frequencies, merge the argmax, apply
left-to-right) with a different code shape — dict-of-strings rather
than tuple-of-symbols — so a shared bug would have to be a shared
misreading of BPE itself, not a copied implementation detail.
"""

from __future__ import annotations

from collections import Counter

from agent_data_pipeline_spark.llmdata.bpe import (
    bpe_merges_df,
    bpe_train_merges,
    word_type_counts,
)

SF = "/root/testdata/sf0.001"


def _reference_bpe(word_counts: dict[str, int], num_merges: int):
    """Independent reference: words kept as space-joined symbol strings."""
    vocab = Counter()
    for w, n in word_counts.items():
        vocab[" ".join(list(w) + ["</w>"])] += n
    merges = []
    for step in range(1, num_merges + 1):
        pairs = Counter()
        for sym_str, n in vocab.items():
            syms = sym_str.split(" ")
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        best = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if best[1] < 2:
            break
        (la, rb), cnt = best
        new_vocab = Counter()
        for sym_str, n in vocab.items():
            syms = sym_str.split(" ")
            out = []
            i = 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == la and syms[i + 1] == rb:
                    out.append(la + rb)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[" ".join(out)] += n
        vocab = new_vocab
        merges.append((step, la, rb, cnt))
    return merges


def test_bpe_matches_reference_on_literal_corpus(spark):
    docs = spark.createDataFrame(
        [(1, "low low low lower lower newest newest newest widest widest")],
        "doc_id long, text string",
    )
    got = bpe_train_merges(docs, num_merges=10)
    wc = {"low": 3, "lower": 2, "newest": 3, "widest": 2}
    ref = _reference_bpe(wc, 10)
    assert got == ref, (got, ref)
    # the classic example's first merges build 'est</w>' from the -est
    # words (count 5) before anything rarer
    assert got[0][3] == 5, got[0]


def test_bpe_matches_reference_on_fixture(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    wc = {r["word"]: r["n"] for r in word_type_counts(docs).collect()}
    got = bpe_train_merges(docs, num_merges=24)
    ref = _reference_bpe(wc, 24)
    assert got == ref
    # winning-pair counts never increase step over step
    counts = [c for _, _, _, c in got]
    assert counts == sorted(counts, reverse=True), counts
    # every merge was supported by at least 2 occurrences
    assert all(c >= 2 for c in counts)


def test_bpe_df_surface_and_determinism(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = [tuple(r) for r in bpe_merges_df(docs, num_merges=8).collect()]
    b = [tuple(r) for r in bpe_merges_df(docs.repartition(7), num_merges=8).collect()]
    assert a == b  # layout-independent
    assert [r[0] for r in a] == list(range(1, len(a) + 1))


def test_bpe_max_types_cutoff_deterministic(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    full = bpe_train_merges(docs, num_merges=6, max_types=None)
    capped = bpe_train_merges(docs, num_merges=6, max_types=10_000)
    # fixture vocabulary is far below the cap: identical sequences
    assert full == capped


# --- encoder (bpe_encode_word / bpe_encode_stats_df) -----------------------


def _reference_encode(word: str, merges):
    """Independent encoder: same merge-in-training-order rule, written
    over space-joined symbol strings like _reference_bpe."""
    s = " ".join(list(word) + ["</w>"])
    for la, rb in merges:
        syms = s.split(" ")
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == la and syms[i + 1] == rb:
                out.append(la + rb)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        s = " ".join(out)
    return s.split(" ")


def test_encoder_matches_training_segmentation(spark):
    from agent_data_pipeline_spark.llmdata.bpe import bpe_encode_word

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    merges = [(la, rb) for _, la, rb, _ in bpe_train_merges(docs, num_merges=32)]
    for word in ["low", "lower", "newest", "table", "query", "zzz", "a"]:
        assert bpe_encode_word(word, merges) == _reference_encode(word, merges)
    # no merges -> characters + end marker
    assert bpe_encode_word("spark", []) == ["s", "p", "a", "r", "k", "</w>"]


def test_encode_stats_conservation(spark):
    from agent_data_pipeline_spark.llmdata.bpe import (
        bpe_encode_stats_df,
        bpe_encode_word,
        bpe_train_merges,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    stats = bpe_encode_stats_df(docs, group_col="source", num_merges=32)
    rows = stats.collect()
    assert stats.columns == [
        "grp", "n_words", "n_types", "n_tokens", "chars_per_token",
    ]
    # conservation: group word totals sum to the corpus word count
    wc = {r["word"]: r["n"] for r in word_type_counts(docs).collect()}
    assert sum(r["n_words"] for r in rows) == sum(wc.values())
    # token totals match a driver-side re-encode of the type table
    merges = [(la, rb) for _, la, rb, _ in bpe_train_merges(docs, num_merges=32)]
    expect_tokens = sum(
        n * len(bpe_encode_word(w, merges)) for w, n in wc.items()
    )
    assert sum(r["n_tokens"] for r in rows) == expect_tokens
    # more merges never lengthen the encoding
    stats0 = bpe_encode_stats_df(docs, group_col="source", num_merges=0)
    tok0 = sum(r["n_tokens"] for r in stats0.collect())
    assert sum(r["n_tokens"] for r in rows) <= tok0
