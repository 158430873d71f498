"""Planted-fixture verification for the DSIR wave (queries/extras64.py).

The sf fixtures' 31-word global vocabulary makes them a weak probe of a
hashed n-gram model (most buckets are shared by every doc), so — like
tests/test_retrieval_planted.py — these tests plant a vocabulary-
separated corpus locally:

* target docs (lang=en) draw from vocabulary A,
* raw-only docs (lang=xx) draw from a disjoint vocabulary B,
* a third group is lang=xx but written in vocabulary A — the documents
  DSIR exists to find: target-LIKE mass outside the declared target.

Checks: (1) the engine's weights equal an independent pure-Python
recomputation (hashlib md5, same bucketing/smoothing) on the 9dp grid;
(2) vocabulary-A docs — including the lang=xx ones — all outweigh every
vocabulary-B doc; (3) both registry queries hash-match their own DuckDB
oracle SQL over the planted files (the tests/test_extras61_edges.py
pattern), so the richer-vocab behavior is oracle-verified end to end,
not just at the 31-word fixture vocabulary.
"""

from __future__ import annotations

import hashlib
import math
import re

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from agent_data_pipeline_spark.llmdata.classify import dsir_doc_weights
from agent_data_pipeline_spark.queries import REGISTRY

_VOCAB_A = "alpha beta gamma delta epsilon zeta eta theta".split()
_VOCAB_B = "crimson umber ochre viridian cobalt sienna madder russet".split()
_B = 1024


def _text(vocab: list[str], seed: int, n_words: int = 12) -> str:
    return " ".join(vocab[(seed * 3 + j * (1 + seed % 5)) % len(vocab)] for j in range(n_words))


def _plant() -> pd.DataFrame:
    rows = []
    for i in range(10):  # target: vocabulary A, lang=en
        rows.append((i, _text(_VOCAB_A, i), "en", f"s{i % 2}"))
    for i in range(10, 20):  # raw-only: vocabulary B, lang=xx
        rows.append((i, _text(_VOCAB_B, i), "xx", f"s{i % 2}"))
    for i in range(20, 24):  # the DSIR catch: vocabulary A, lang=xx
        rows.append((i, _text(_VOCAB_A, i), "xx", f"s{i % 2}"))
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    df["n_chars"] = df["text"].str.len()
    return df


def _py_weights(df: pd.DataFrame) -> dict[int, float]:
    """Independent reference: same tokenization/hash/smoothing, stdlib only."""

    def grams(text: str) -> list[str]:
        toks = [t for t in re.split(r"\s+", text.strip().lower()) if t]
        return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    def bucket(ng: str) -> int:
        return int(hashlib.md5(ng.encode()).hexdigest()[:8], 16) % _B

    r_cnt: dict[int, int] = {}
    t_cnt: dict[int, int] = {}
    doc_buckets: dict[int, list[int]] = {}
    for _, row in df.iterrows():
        bs = [bucket(g) for g in grams(row["text"])]
        doc_buckets[row["doc_id"]] = bs
        for b in bs:
            r_cnt[b] = r_cnt.get(b, 0) + 1
            if row["lang"] == "en":
                t_cnt[b] = t_cnt.get(b, 0) + 1
    big_r, big_t = sum(r_cnt.values()), sum(t_cnt.values())
    out = {}
    for doc_id, bs in doc_buckets.items():
        w = sum(
            math.log((t_cnt.get(b, 0) + 1.0) / (big_t + _B))
            - math.log((r_cnt[b] + 1.0) / (big_r + _B))
            for b in bs
        )
        out[doc_id] = math.floor(w * 1e9 + 0.5) / 1e9
    return out


@pytest.fixture(scope="module")
def planted_sf(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("dsir_sf")
    _plant().to_parquet(d / "documents.parquet")
    return str(d)


def test_dsir_weights_match_python_reference(spark, planted_sf):
    docs = spark.read.parquet(f"{planted_sf}/documents.parquet").withColumn(
        "is_target", F.coalesce(F.col("lang") == "en", F.lit(False))
    )
    got = {
        r["doc_id"]: r["w"]
        for r in dsir_doc_weights(docs, n_buckets=_B).collect()
    }
    want = _py_weights(_plant())
    assert set(got) == set(want)
    for doc_id in want:
        assert abs(got[doc_id] - want[doc_id]) <= 2e-9, (
            doc_id,
            got[doc_id],
            want[doc_id],
        )


def test_dsir_separates_vocabularies(spark, planted_sf):
    docs = spark.read.parquet(f"{planted_sf}/documents.parquet").withColumn(
        "is_target", F.coalesce(F.col("lang") == "en", F.lit(False))
    )
    w = {
        r["doc_id"]: r["w"]
        for r in dsir_doc_weights(docs, n_buckets=_B).collect()
    }
    vocab_a = [w[i] for i in range(10)] + [w[i] for i in range(20, 24)]
    vocab_b = [w[i] for i in range(10, 20)]
    # every vocabulary-A doc (INCLUDING the lang=xx ones no label-based
    # filter could find) must outweigh every vocabulary-B doc
    # (the ABSOLUTE sign of w is not a DSIR invariant — it depends on
    # corpus composition under smoothing — but the ORDERING is; the
    # planted gap is ~35 nats, far beyond hash-collision noise)
    assert min(vocab_a) > max(vocab_b) + 10.0, (min(vocab_a), max(vocab_b))


def test_dsir_registry_queries_oracle_match_on_planted_corpus(
    spark, planted_sf
):
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{planted_sf}/documents.parquet'"
    )
    for name in (
        "dsir_importance_weights",
        "dsir_resample_census",
        "stream_dsir_gate",  # streaming execution, same batch oracle
    ):
        spec = REGISTRY[name]
        got = sorted(tuple(r) for r in spec.spark(spark, planted_sf).collect())
        want = sorted(tuple(r) for r in con.sql(spec.oracle).fetchall())
        assert got == want, (name, got[:4], want[:4])


def test_dsir_resample_prefers_target_like_docs(spark, planted_sf):
    # on the planted corpus the selected top-50 is everything (24 docs);
    # shrink the reservoir by re-running the A-Res construction at k=8:
    # with |w| ~ 5-15 the exp(w) weights are so extreme the selection is
    # deterministic — all 8 must come from vocabulary A (14 candidates)
    docs = spark.read.parquet(f"{planted_sf}/documents.parquet").withColumn(
        "is_target", F.coalesce(F.col("lang") == "en", F.lit(False))
    )
    w = dsir_doc_weights(docs, n_buckets=_B)
    u = (
        F.pmod(F.col("doc_id"), F.lit(2147483648)) * F.lit(2654435761)
    ) % F.lit(4294967296)
    u = (u + F.lit(0.5)) / F.lit(4294967296.0)
    wc = F.greatest(F.least(F.col("w"), F.lit(30.0)), F.lit(-30.0))
    sel = (
        w.withColumn("_key", F.log(u) / F.exp(wc))
        .orderBy(F.col("_key").desc(), "doc_id")
        .limit(8)
        .collect()
    )
    picked = {r["doc_id"] for r in sel}
    vocab_a_ids = set(range(10)) | set(range(20, 24))
    assert picked <= vocab_a_ids, picked
