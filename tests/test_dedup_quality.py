"""Near-dup dedup quality checks on hand-built fixtures — the semantic
assertions the driver's rows-only pass can't make."""

from __future__ import annotations

import pytest

from agent_data_pipeline_spark.llmdata import dedup


@pytest.fixture(scope="module")
def docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from a warm windowsill in the late afternoon sun light"
    )
    near = base.replace("late afternoon", "early morning")
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, near),  # near dup of 0 (2 words changed)
        (3, "completely different text about spark adaptive query execution plans"),
        (4, "unrelated words entirely numbers one two three four five six seven"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_identical_docs_score_one(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in dedup.minhash_lsh_pairs(docs, threshold=0.3).collect()
    }
    assert pairs[(0, 1)] == 1.0  # identical signatures
    assert (0, 2) in pairs  # near-dup caught by some band
    assert pairs[(0, 2)] >= 0.3
    # unrelated docs never pair up
    assert not any({a, b} & {3, 4} and {a, b} <= {0, 1, 2, 3, 4} and {a, b} & {0, 1, 2}
                   for a, b in pairs)


def test_minhash_est_tracks_exact_jaccard(spark, docs):
    """est_jaccard for the near-dup pair should approximate the exact
    3-shingle Jaccard within MinHash sampling error (64 hashes -> ~0.12
    std)."""
    got = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in dedup.minhash_lsh_pairs(docs, threshold=0.1).collect()
    }
    sh = {
        r["doc_id"]: set(r["sh_hashes"])
        for r in dedup.shingle_hashes(docs).select("doc_id", "sh_hashes").collect()
    }
    exact = len(sh[0] & sh[2]) / len(sh[0] | sh[2])
    assert abs(got[(0, 2)] - exact) < 0.25


def test_exact_dedup_collapses_identical(spark, docs):
    out = dedup.exact_dedup(docs)
    reps = {r["doc_id"]: r["n_copies"] for r in out.collect()}
    assert reps[0] == 2  # doc 1 folded into doc 0
    assert 1 not in reps
    assert reps[2] == reps[3] == reps[4] == 1


def test_simhash_near_dups_close_in_hamming(spark, docs):
    fp = {r["doc_id"]: r["simhash"] for r in dedup.simhash64(docs).collect()}
    assert fp[0] == fp[1]
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham(fp[0], fp[2]) <= 12  # near dup: few bits differ
    assert ham(fp[0], fp[3]) > ham(fp[0], fp[2])  # unrelated further away


def test_passage_dedup_removes_boilerplate(spark):
    """A passage repeated across documents survives only at its first
    global occurrence; unique passages all survive; reassembly preserves
    original within-doc order."""
    boiler = "this license text repeats in every file exactly the same way"  # 11 tokens
    rows = [
        (0, boiler + " alpha beta gamma delta epsilon zeta eta theta"),
        (1, boiler + " one two three four five six seven eight"),
        (2, "totally unique words nine ten eleven twelve thirteen fourteen fifteen sixteen"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup.passage_dedup(df, unit_tokens=4).collect()}
    # 19 tokens -> 5 units of 4 (last short); boiler spans units 0-2 of docs 0,1
    assert out[0]["n_units"] == 5 and out[0]["n_kept"] == 5  # first occurrence keeps all
    assert out[1]["n_units"] == 5
    # doc 1 loses the two fully-boilerplate leading units (tokens 1-8 =
    # units 0,1; unit 2 mixes the boiler tail with new words so it
    # survives: "the same way one")
    assert out[1]["n_kept"] == 3
    assert out[1]["kept_text"].startswith("the same way one")
    assert out[2]["n_kept"] == out[2]["n_units"]
    # order preserved within the survivors
    assert out[0]["kept_text"] == rows[0][1]
    assert out[2]["kept_text"] == rows[2][1]


def test_keep_representatives(spark, docs):
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.3)
    kept = dedup.keep_representatives(docs, pairs)
    ids = {r["doc_id"] for r in kept.collect()}
    assert 0 in ids and 1 not in ids and 2 not in ids
    assert {3, 4} <= ids


def test_duplicate_span_stats_planted_and_short_docs(spark):
    """Two docs sharing one exact 5-token span flag exactly the shared
    windows; a unique doc flags none; sub-window docs survive with
    zeros (explode_outer)."""
    from agent_data_pipeline_spark.llmdata.dedup import duplicate_span_stats

    shared = "alpha beta gamma delta epsilon"
    df = spark.createDataFrame(
        [
            (1, shared + " one two three"),
            (2, "x y " + shared),
            (3, "totally unrelated words here now then"),
            (4, "tiny doc"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in duplicate_span_stats(df, window=5).collect()}
    # doc1: 4 windows of 5 tokens over 8 tokens; only the first (the
    # shared span) recurs (as doc2's last window)
    assert rows[1]["n_spans"] == 4 and rows[1]["n_dup_spans"] == 1
    assert rows[2]["n_spans"] == 3 and rows[2]["n_dup_spans"] == 1
    assert rows[3]["n_dup_spans"] == 0
    assert rows[4]["n_spans"] == 0 and rows[4]["dup_span_fraction"] == 0.0


def test_duplicate_span_stats_within_doc_repeat_counts(spark):
    """A span repeated INSIDE one document counts as duplicated (total
    occurrences > 1), matching the substring-dedup contract."""
    from agent_data_pipeline_spark.llmdata.dedup import duplicate_span_stats

    df = spark.createDataFrame(
        [(1, "a b c a b c")], "doc_id long, text string"
    )
    r = duplicate_span_stats(df, window=3).collect()[0]
    # windows: abc bca cab abc -> 'a b c' occurs twice
    assert r["n_spans"] == 4 and r["n_dup_spans"] == 2


def test_minhash_calibration_within_binomial_envelope(spark):
    """minhash_jaccard_calibration (extras56): per exact-J decile the
    mean MinHash estimate must sit within the 64-hash binomial SE
    envelope of the mean exact Jaccard (3 sigma, sigma <=
    sqrt(0.25/64)/sqrt(n)) for every bucket with >= 20 pairs — the
    unbiasedness property that makes LSH thresholds transferable."""
    import math

    from agent_data_pipeline_spark.queries import REGISTRY

    rows = (
        REGISTRY["minhash_jaccard_calibration"]
        .spark(spark, "/root/testdata/sf0.01")
        .collect()
    )
    assert len(rows) >= 5  # the corruption spans a real similarity range
    checked = 0
    for r in rows:
        if r["n_pairs"] < 20:
            continue
        se = math.sqrt(0.25 / 64) / math.sqrt(r["n_pairs"])
        assert abs(r["mean_estimate"] - r["mean_exact"]) <= 3 * se + 0.01, (
            r["decile"],
            r["mean_estimate"],
            r["mean_exact"],
        )
        checked += 1
    assert checked >= 4
