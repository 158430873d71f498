"""Unit tests for llmdata/hygiene.py edge semantics: short-doc n-grams,
contamination flagging, PII redaction order, shard determinism."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from agent_data_pipeline_spark.llmdata import hygiene


def test_word_ngrams_short_doc_is_empty(spark):
    df = spark.createDataFrame(
        [Row(t="one two"), Row(t="a b c"), Row(t="")]
    ).select(hygiene.word_ngrams(F.col("t"), 3).alias("g"))
    rows = [r.g for r in df.collect()]
    assert rows[0] == []          # 2 words < n=3 (guard against descending sequence)
    assert rows[1] == ["a b c"]
    assert rows[2] == []


def test_flag_contaminated_exact_overlap(spark):
    train = spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox jumps"),
            Row(doc_id=2, text="completely different words here now"),
        ]
    )
    eval_df = spark.createDataFrame([Row(doc_id=9, text="quick brown fox goes home")])
    out = hygiene.flag_contaminated(
        train, hygiene.eval_ngram_set(eval_df, n=3), n=3
    )
    flags = {r.doc_id: r.is_contaminated for r in out.collect()}
    assert flags == {1: 1, 2: 0}  # "quick brown fox" shared; doc 2 clean


def test_scrub_pii_counts_and_order(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="mail a1@b.co or a2@b.co call 415-555-0100 ip 10.0.0.1")]
    )
    row = hygiene.scrub_pii(df).collect()[0]
    assert (row.n_emails, row.n_phones, row.n_ips) == (2, 1, 1)
    assert row.redacted == "mail [EMAIL] or [EMAIL] call [PHONE] ip [IP]"


def test_scrub_pii_email_digits_not_double_counted(spark):
    # the email contains digit runs — email must be scrubbed first so the
    # phone/ip patterns never fire inside it
    df = spark.createDataFrame([Row(doc_id=1, text="x 123-456-7890@mail.com y")])
    row = hygiene.scrub_pii(df).collect()[0]
    assert (row.n_emails, row.n_ips) == (1, 0)
    assert row.redacted == "x [EMAIL] y"


def test_shard_assign_deterministic_and_partition_stable(spark):
    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    a = hygiene.shard_assign(df, "doc_id", n_shards=8)
    b = hygiene.shard_assign(df.repartition(13), "doc_id", n_shards=8)
    assert {r.doc_id: r.shard for r in a.collect()} == {
        r.doc_id: r.shard for r in b.collect()
    }
    counts = [r["count"] for r in a.groupBy("shard").count().collect()]
    assert len(counts) == 8 and min(counts) > 20  # roughly balanced


def test_repetition_stats_known_values(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="a a a b")])
    row = hygiene.with_repetition_stats(df).collect()[0]
    # 2-grams: "a a","a a","a b" -> 1 dup of 3
    assert abs(row.dup_2gram_frac - (1 / 3)) < 1e-6
    assert abs(row.top_word_frac - 0.75) < 1e-6


def test_sample_frames_empty_payload_yields_one_frame(spark):
    from pyspark.sql import Row

    from agent_data_pipeline_spark.llmdata import multimodal

    docs = spark.createDataFrame([Row(doc_id=1, text=""), Row(doc_id=2, text="x" * 64)])
    media = multimodal.text_as_media(docs)
    rows = multimodal.sample_frames(media, stride=4, bytes_per_frame=16).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r.frame_idx)
    assert by_id[1] == [0]          # empty payload still emits frame 0
    assert sorted(by_id[2]) == [0]  # 64//16 = 4 frames, stride 4 -> idx 0


def test_unigram_logprob_ranks_common_above_rare(spark):
    """The corpus-unigram LM proxy must score a document of frequent
    tokens above one of hapax tokens — the property perplexity-bucket
    filtering depends on."""
    from agent_data_pipeline_spark.llmdata import textstats

    rows = [(i, "common words appear here often") for i in range(9)]
    rows.append((100, "zyx qwv jkl pqr mno"))  # all hapax
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["avg_logprob"] for r in textstats.unigram_logprob(df).collect()}
    assert got[0] > got[100]
    assert all(v < 0 for v in got.values())  # log-probs


def test_neardup_decontaminate_planted_paraphrase(spark):
    """A training doc that is a re-whitespaced/reordered token copy of an
    eval doc must flag (set-Jaccard 1.0 ignores order and spacing); a
    token-disjoint doc must not, and keeps a NULL best match."""
    from agent_data_pipeline_spark.llmdata.hygiene import neardup_decontaminate

    eval_df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (100, "dog lazy the   over jumps fox brown quick the"),  # permuted copy
            (101, "entirely different words everywhere here"),
            (102, "the quick brown fox jumps over the hazy dog"),    # 1-token swap
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in neardup_decontaminate(train, eval_df, 0.5).collect()}
    assert out[100]["best_jaccard"] == 1.0 and out[100]["is_contaminated"] == 1
    assert out[101]["best_jaccard"] == 0.0 and out[101]["is_contaminated"] == 0
    assert out[101]["best_eval_id"] is None
    # 8 distinct tokens each, 7 shared -> 7/9
    assert abs(out[102]["best_jaccard"] - 7 / 9) < 1e-6
    assert out[102]["is_contaminated"] == 1


def test_vocab_encode_checksum_and_oov(spark):
    """3-word vocab over a tiny corpus: ids by (count desc, word);
    checksum proves per-token id assignment, not just counts."""
    from agent_data_pipeline_spark.llmdata.textstats import vocab_encode_stats

    df = spark.createDataFrame(
        [
            (1, "b b a c zz"),
            (2, "a b"),
        ],
        "doc_id long, text string",
    )
    # counts: b=3, a=2, c=1, zz=1 -> vocab3: b->1, a->2, c->3 (count desc, word)
    rows = {r["doc_id"]: r for r in vocab_encode_stats(df, vocab_size=3).collect()}
    assert rows[1]["n_tokens"] == 5 and rows[1]["n_oov"] == 1
    assert rows[1]["id_checksum"] == 1 + 1 + 2 + 3  # b b a c
    assert rows[2]["id_checksum"] == 2 + 1


def test_compression_ratio_exact_and_band_ordering(spark):
    """Kernel output must equal a direct zlib call byte-for-byte, and
    the redundancy band must order: repetitive < prose < random-ish."""
    import zlib

    from agent_data_pipeline_spark.llmdata.textstats import (
        with_compression_ratio,
    )

    rep = "spam " * 200
    prose = (
        "the quick brown fox jumps over the lazy dog while the "
        "farmer watches from the old wooden fence near the river "
    ) * 8
    rnd_ish = " ".join(f"x{i * 2654435761 % 9973}" for i in range(200))
    df = spark.createDataFrame(
        [(1, rep), (2, prose), (3, rnd_ish)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in with_compression_ratio(df).collect()}
    for i, text in [(1, rep), (2, prose), (3, rnd_ish)]:
        b = text.encode("utf-8")
        assert rows[i]["raw_bytes"] == len(b)
        assert rows[i]["compressed_bytes"] == len(zlib.compress(b, 6))
    assert (
        rows[1]["compression_ratio"]
        < rows[2]["compression_ratio"]
        < rows[3]["compression_ratio"]
    )
