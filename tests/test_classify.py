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


def _pav_reference(n, pos):
    """Independent O(n^2) PAV: repeatedly merge ANY adjacent violating
    pair until the sequence is monotone — the fixed point is unique
    (the isotonic projection), so any merge order must agree with the
    stack implementation."""
    blocks = [[float(w), float(s), 1] for w, s in zip(n, pos)]
    changed = True
    while changed:
        changed = False
        i = 0
        while i < len(blocks) - 1:
            w1, s1, c1 = blocks[i]
            w2, s2, c2 = blocks[i + 1]
            if s1 * w2 >= s2 * w1:  # rate_i >= rate_{i+1}
                blocks[i] = [w1 + w2, s1 + s2, c1 + c2]
                del blocks[i + 1]
                changed = True
            else:
                i += 1
    out = []
    for w, s, c in blocks:
        out.extend([s / w if w else 0.0] * c)
    return out


def test_pav_fit_matches_independent_reference():
    import numpy as np

    from agent_data_pipeline_spark.ops.calibrate import pav_fit

    rng = np.random.default_rng(3)
    for _ in range(20):
        m = int(rng.integers(1, 40))
        n = rng.integers(1, 50, size=m)
        pos = np.array([rng.integers(0, k + 1) for k in n])
        got = pav_fit(n, pos)
        ref = _pav_reference(n, pos)
        assert np.allclose(got, ref), (n.tolist(), pos.tolist())
        assert all(got[i] <= got[i + 1] + 1e-12 for i in range(m - 1))
        # pool-mean invariant: weighted mean preserved exactly
        assert abs((got * n).sum() - pos.sum()) < 1e-6


def test_isotonic_calibration_recovers_planted_monotone(spark):
    """Noisy samples of a monotone probability curve: the binned PAV
    fit must be monotone and track the true curve within the noise
    floor (planted recovery)."""
    import numpy as np

    from pyspark.sql import functions as F

    from agent_data_pipeline_spark.ops.calibrate import isotonic_calibrate_binned

    rng = np.random.default_rng(5)
    rows = []
    for i in range(20_000):
        s = rng.uniform(0, 1)
        p_true = s * s  # monotone ground truth
        rows.append((float(s), int(rng.uniform() < p_true)))
    df = spark.createDataFrame(rows, "score double, label int")
    out = isotonic_calibrate_binned(df, "score", F.col("label") == 1, bins=50)
    got = {r["bin"]: r["calibrated"] for r in out.collect()}
    cal = [got[b] for b in sorted(got)]
    assert all(cal[i] <= cal[i + 1] + 1e-12 for i in range(len(cal) - 1))
    # mid-curve bins must be near the planted s^2 (noise floor ~0.06
    # at ~400 samples/bin plus pooling)
    for b in (10, 25, 40):
        s_mid = (b + 0.5) / 50
        assert abs(got[b] - s_mid**2) < 0.08, (b, got[b], s_mid**2)


def test_isotonic_calibration_layout_independent(spark):
    from pyspark.sql import functions as F

    from agent_data_pipeline_spark.llmdata import textstats
    from agent_data_pipeline_spark.ops.calibrate import isotonic_calibrate_binned

    d = textstats.with_text_stats(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    )
    a = sorted(
        map(
            tuple,
            isotonic_calibrate_binned(
                d, F.col("quality_score"), F.col("n_chars") >= 300
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            isotonic_calibrate_binned(
                d.repartition(13), F.col("quality_score"), F.col("n_chars") >= 300
            ).collect(),
        )
    )
    assert a == b


# --------------------------------------------------------------------------
# platt_scaling_irls (queries/extras50.py): planted-parameter recovery
# and distributed-vs-pure-Python Newton equality — the checks the
# rows-only driver pass can't do. (On the organic fixture lang is
# nearly independent of n_chars, so the interesting behavior only
# shows on a plant.)
# --------------------------------------------------------------------------


def test_platt_recovers_planted_coefficients(spark):
    import hashlib

    import pyspark.sql.functions as F
    import pytest

    from agent_data_pipeline_spark.queries.extras50 import _platt_fit

    # z on a grid, labels drawn from sigmoid(1 + 2z) via deterministic
    # md5 uniforms — the MLE must land near (1, 2) for n = 4000.
    import math

    rows = []
    for i in range(4000):
        z = -2.0 + 4.0 * (i / 3999.0)
        u = int(hashlib.md5(f"platt|{i}".encode()).hexdigest()[:8], 16) / (
            1 << 32
        )
        p = 1.0 / (1.0 + math.exp(-(1.0 + 2.0 * z)))
        rows.append((1.0 if u < p else 0.0, z))
    u_df = spark.createDataFrame(rows, "y double, z double")
    a, b, n = _platt_fit(u_df)
    assert n == 4000
    assert a == pytest.approx(1.0, abs=0.15)
    assert b == pytest.approx(2.0, abs=0.2)


def test_platt_distributed_equals_python_newton(spark):
    import pytest

    from agent_data_pipeline_spark.queries.extras50 import (
        _platt_fit,
        platt_newton_step,
    )

    rows = [
        (1.0, 0.5), (0.0, -1.2), (1.0, 1.7), (0.0, 0.1), (1.0, 0.9),
        (0.0, -0.4), (1.0, 2.2), (0.0, -2.0), (1.0, 0.3), (0.0, 0.0),
    ]
    u_df = spark.createDataFrame([(y, z) for y, z in rows], "y double, z double")
    a, b, _n = _platt_fit(u_df, iters=6)
    pa, pb = 0.0, 0.0
    for _ in range(6):
        pa, pb = platt_newton_step(pa, pb, [(z, y) for y, z in rows])
    assert a == pytest.approx(pa, abs=1e-9)
    assert b == pytest.approx(pb, abs=1e-9)


def test_gmm2_em_recovers_planted_components(spark):
    """gmm2_em_fit (extras52): a planted two-cluster sample (N(100,10)
    and N(300,20), fixed numpy seed) must be recovered by the
    distributed EM to a few units."""
    import numpy as np
    import pytest

    from agent_data_pipeline_spark.queries.extras52 import _gmm2_fit

    rng = np.random.default_rng(0)
    xs = np.concatenate(
        [rng.normal(100.0, 10.0, 600), rng.normal(300.0, 20.0, 400)]
    )
    u = spark.createDataFrame([(float(x),) for x in xs], "x double")
    w2, mu1, s1, mu2, s2, ll = _gmm2_fit(u, 120.0, 280.0, 80.0, iters=15)
    lo, hi = sorted([(mu1, s1, 1 - w2), (mu2, s2, w2)])
    assert lo[0] == pytest.approx(100.0, abs=3.0)
    assert lo[1] == pytest.approx(10.0, abs=3.0)
    assert lo[2] == pytest.approx(0.6, abs=0.05)
    assert hi[0] == pytest.approx(300.0, abs=6.0)
    assert hi[1] == pytest.approx(20.0, abs=6.0)


def test_unigram_scaling_law_nll_monotone(spark):
    """unigram_scaling_law (extras55): held-out NLL must be
    non-increasing in training-set size (nested subsets + add-1
    smoothing guarantee more data never hurts on average here), and
    the fitted exponent must be negative."""
    from agent_data_pipeline_spark.queries import REGISTRY

    rows = (
        REGISTRY["unigram_scaling_law"]
        .spark(spark, "/root/testdata/sf0.01")
        .collect()
    )
    nlls = [r["eval_nll_per_token"] for r in sorted(rows, key=lambda r: r["fraction"])]
    assert all(a >= b for a, b in zip(nlls, nlls[1:]))
    assert rows[0]["scaling_exponent"] < 0
    docs = [r["n_train_docs"] for r in sorted(rows, key=lambda r: r["fraction"])]
    assert all(a < b for a, b in zip(docs, docs[1:]))  # nested growth


def test_isotonic_binning_clamps_out_of_range_scores(spark):
    """Regression (round-8 advice): scores below 0 must clamp into bin
    0 (mirroring the existing upper-edge clamp at bins-1), not create a
    negative leading bin."""
    from agent_data_pipeline_spark.ops.calibrate import isotonic_calibrate_binned

    df = spark.createDataFrame(
        [(-0.7, 0), (-0.01, 1), (0.0, 0), (0.5, 1), (1.5, 1)],
        "score double, label int",
    )
    rows = (
        isotonic_calibrate_binned(df, "score", F.col("label") == 1, bins=10)
        .orderBy("bin")
        .collect()
    )
    bins = [r["bin"] for r in rows]
    assert bins[0] == 0 and bins[-1] == 9, bins
    assert all(b >= 0 for b in bins)
    # the three clamped/edge scores (-0.7, -0.01, 0.0) share bin 0
    assert rows[0]["n"] == 3
