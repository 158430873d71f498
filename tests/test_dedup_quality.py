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


def test_keep_representatives(spark, docs):
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.3)
    kept = dedup.keep_representatives(docs, pairs)
    ids = {r["doc_id"] for r in kept.collect()}
    assert 0 in ids and 1 not in ids and 2 not in ids
    assert {3, 4} <= ids
