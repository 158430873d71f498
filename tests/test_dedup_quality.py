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
