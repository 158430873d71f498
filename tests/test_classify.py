"""Planted-truth checks for the NB quality classifier
(llmdata/classify.py): on a separable planted corpus the held-out
predictions must be perfect, OOV-only documents must fall back to the
unseen-mass score, and min_count must prune the vocabulary without
breaking scoring.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from agent_data_pipeline_spark.llmdata.classify import nb_train_score

POS_WORDS = "clean prose paragraph coherent sentence"
NEG_WORDS = "zzqj garble xkcd noise spamspam"


def _planted(spark, n_per_class=20):
    rows = []
    for i in range(n_per_class):
        rows.append((2 * i, f"{POS_WORDS} extra{i % 3}", True))
        rows.append((2 * i + 1, f"{NEG_WORDS} extra{i % 3}", False))
    df = spark.createDataFrame(rows, "doc_id long, text string, lab boolean")
    # train on the first half of each class, hold out the second half
    return df.withColumn("trn", F.col("doc_id") < n_per_class)


def test_planted_separable_accuracy_is_one(spark):
    scored = nb_train_score(
        _planted(spark),
        id_col="doc_id",
        text_col="text",
        label_col="lab",
        train_col="trn",
    )
    rows = scored.collect()
    assert len(rows) == 20  # the held-out half
    assert all((r["margin"] > 0) == r["label"] for r in rows)
    # margins should be decisive, not knife-edge
    assert min(abs(r["margin"]) for r in rows) > 1.0


def test_oov_only_doc_scores_by_prior_and_unseen_mass(spark):
    df = _planted(spark).union(
        spark.createDataFrame(
            [(999, "wholly unseen tokens only", True)],
            "doc_id long, text string, lab boolean",
        ).withColumn("trn", F.lit(False))
    )
    scored = nb_train_score(
        df, id_col="doc_id", text_col="text", label_col="lab", train_col="trn"
    )
    row = scored.filter(F.col("doc_id") == 999).collect()[0]
    # balanced classes + symmetric token totals -> near-zero margin;
    # the point is it is finite and defined, not NaN/null
    assert row["margin"] is not None
    assert abs(row["margin"]) < 1.0


def test_min_count_prunes_vocab_but_scores_everything(spark):
    scored = nb_train_score(
        _planted(spark),
        id_col="doc_id",
        text_col="text",
        label_col="lab",
        train_col="trn",
        min_count=1000,  # prunes the ENTIRE vocabulary
    )
    rows = scored.collect()
    assert len(rows) == 20
    # with an empty vocabulary every token is OOV: margin == prior
    # (balanced planted classes -> prior == ln(11/11) == 0... but the
    # class totals differ only via vsize=0; all margins equal the prior)
    margins = {round(r["margin"], 9) for r in rows}
    assert len(margins) <= 2  # prior + n_tokens * w_oov, two doc shapes


def test_registry_confusion_matrix_shape(spark):
    from agent_data_pipeline_spark.queries import REGISTRY

    df = REGISTRY["nb_source_classifier"].spark(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert 1 <= len(rows) <= 4
    assert df.columns == [
        "actual_curated",
        "predicted_curated",
        "n_docs",
        "avg_margin",
    ]
    assert sum(r["n_docs"] for r in rows) > 0


@pytest.mark.parametrize("name", ["mixture_budget_plan"])
def test_mixture_plan_invariants(spark, name):
    from agent_data_pipeline_spark.queries import REGISTRY

    rows = REGISTRY[name].spark(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 20  # one row per source
    for r in rows:
        assert 0.0 < r["sample_rate"] <= 1.0
        assert r["epochs"] >= r["sample_rate"]
        assert r["oversampled"] == (r["target_tokens"] > r["avail_tokens"])
    # uniform targets: every source gets the same allocation
    assert len({r["target_tokens"] for r in rows}) == 1
