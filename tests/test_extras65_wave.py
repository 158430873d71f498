"""Planted-truth tests for the round-12 wave (winnowing + NFC audit).

The oracle differential proves cross-engine equality; these prove the
ALGORITHMS do what their papers promise on inputs the fixture can't
guarantee: the winnowing shared-substring detection guarantee, the
rightmost-min tie-break, and NFC's idempotence/composition deltas.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from agent_data_pipeline_spark.queries import REGISTRY


def _plant_docs(spark, tmpdir: str, rows) -> str:
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmpdir}/documents.parquet")
    return tmpdir


def test_winnowing_detects_planted_shared_substring(spark, tmp_path):
    """Schleimer et al. guarantee: a shared run of >= w+k-1 tokens
    (here 4+3-1 = 6) must produce at least one SHARED fingerprint.
    Two docs share a 12-token plagiarized span inside otherwise
    disjoint text; a third doc is fully unique."""
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    a = "one two three four five " + shared + " six seven eight nine ten"
    b = "red orange yellow green blue " + shared + " indigo violet pink white gray"
    c = "completely unrelated text with distinct vocabulary " \
        "nothing matching anything else whatsoever here at all"
    sf = _plant_docs(
        spark,
        str(tmp_path),
        [
            (1, a, "en", "srcA", len(a)),
            (2, b, "en", "srcA", len(b)),
            (3, c, "en", "srcB", len(c)),
        ],
    )
    rows = {
        r["source"]: r
        for r in REGISTRY["winnowing_fingerprints"].spark(spark, sf).collect()
    }
    # srcA: both docs carry fingerprints from the shared span
    assert rows["srcA"]["n_docs"] == 2
    assert rows["srcA"]["n_shared_fp"] >= 2  # >=1 per doc, same fp
    assert rows["srcA"]["shared_share"] > 0
    # srcB: unique doc shares nothing
    assert rows["srcB"]["n_shared_fp"] == 0
    assert rows["srcB"]["shared_share"] == 0.0


def test_winnowing_density_bound(spark, tmp_path):
    """Winnowing selects at most one fingerprint per window start —
    n_fingerprints per doc <= n_windows = n_grams - w + 1, and at
    least ceil(n_windows / w) (each window must contain a selection)."""
    text = " ".join(f"tok{i}" for i in range(50))  # 50 unique tokens
    sf = _plant_docs(
        spark, str(tmp_path), [(1, text, "en", "s", len(text))]
    )
    r = REGISTRY["winnowing_fingerprints"].spark(spark, sf).collect()[0]
    n_grams = 50 - 2
    n_windows = n_grams - 4 + 1
    assert r["n_fingerprints"] <= n_windows
    assert r["n_fingerprints"] >= (n_windows + 3) // 4


def test_nfc_audit_counts_planted_compositions(spark, tmp_path):
    """doc_id % 3 == 0/1 get a decomposed suffix (2 codepoints) that
    NFC composes to 1; % 3 == 2 stays ASCII-identical. Deltas must be
    exactly one codepoint per decorated doc."""
    rows = [(i, f"plain ascii text {i}", "en", "s", 20) for i in range(9)]
    sf = _plant_docs(spark, str(tmp_path), rows)
    r = REGISTRY["unicode_nfc_audit"].spark(spark, sf).collect()[0]
    assert r["n_docs"] == 9
    assert r["n_changed"] == 6  # doc_id % 3 in (0, 1)
    assert r["chars_composed_away"] == 6  # one composition each
    assert r["chars_before"] - r["chars_after"] == 6


def test_nfc_udf_is_idempotent_and_matches_python(spark):
    import unicodedata

    from agent_data_pipeline_spark.queries.extras65 import _DEC0, _DEC1

    samples = ["plain", _DEC0, _DEC1, _DEC0 + _DEC1, ""]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    from agent_data_pipeline_spark.queries.extras65 import _nfc_udf

    got = [r["n"] for r in df.select(_nfc_udf("s").alias("n")).collect()]
    want = [unicodedata.normalize("NFC", s) for s in samples]
    assert got == want
    # idempotence: normalizing the normalized forms changes nothing
    df2 = spark.createDataFrame([(s,) for s in want], "s string")
    got2 = [r["n"] for r in df2.select(_nfc_udf("s").alias("n")).collect()]
    assert got2 == want
