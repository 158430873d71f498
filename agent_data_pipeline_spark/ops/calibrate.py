"""Isotonic (PAV) score calibration over a binned score distribution.

A data-curation classifier (quality model, toxicity filter, language
scorer) emits scores that rank well but are not probabilities; the
standard fix is isotonic regression — pool-adjacent-violators (PAV)
over (score, label) pairs (Zadrozny & Elkan, KDD 2002; Ayer et al.
1955 — public methods).

Scale shape: raw PAV is sequential over SORTED points, which does not
distribute. The scalable formulation (the same one Spark MLlib's
IsotonicRegression uses) aggregates first: bin scores on a fixed grid
(one fact-scale groupBy → ≤``bins`` rows carrying (n, n_pos)), then run
exact weighted PAV over the bounded bin table inside ONE
``applyInPandas`` group. The result is the exact isotonic fit of the
binned empirical rates — deterministic, and the per-bin pooling is the
monotone-projection optimum for squared loss (PAV's guarantee).

The STACK form of the pooling is not SQL-expressible, but the isotonic
fit has a minimax closed form (ŷ_i = max_{j≤i} min_{k≥i} of the run
average, Ayer et al. 1955) that IS — and because IEEE rounding is
monotone, min/max over the correctly-rounded run averages equals the
correctly-rounded block rate the stack computes. The registry query is
therefore hash-oracled since round 12 (queries/extras38.py
_ISOTONIC_SQL); the monotonicity + pool-mean invariants and a
planted-recovery test live in tests/test_classify.py.

Reference parity: the reference has no model-calibration surface
(SURVEY.md §2.A); north-star §2.B.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pav_fit(n: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Exact weighted PAV over bins in ascending score order: returns
    the monotone non-decreasing rates minimizing weighted squared error.
    Pure numpy/lists — also usable as the reference implementation in
    tests."""
    # stack of (weight, sum_pos, n_bins) blocks; merge while the tail
    # violates monotonicity (prev rate >= next rate, cross-multiplied
    # to stay in exact integer arithmetic as long as inputs are ints)
    blocks: list[list[float]] = []
    for w, s in zip(n.astype(float), pos.astype(float)):
        blocks.append([w, s, 1])
        while len(blocks) >= 2 and (
            blocks[-2][1] * blocks[-1][0] >= blocks[-1][1] * blocks[-2][0]
        ):
            w2, s2, c2 = blocks.pop()
            blocks[-1][0] += w2
            blocks[-1][1] += s2
            blocks[-1][2] += c2
    rates = np.empty(len(n), dtype=np.float64)
    i = 0
    for w, s, c in blocks:
        rate = s / w if w > 0 else 0.0
        rates[i : i + c] = rate
        i += c
    return rates


def isotonic_calibrate_binned(
    df: DataFrame,
    score_col: str | Column,
    label_col: str | Column,
    bins: int = 1000,
) -> DataFrame:
    """Returns one row per non-empty score bin:
    (bin, n, pos_rate, calibrated) with ``calibrated`` monotone
    non-decreasing in ``bin``. One fact-scale aggregate; PAV runs over
    the ≤``bins``-row table in a single bounded group."""
    score = F.col(score_col) if isinstance(score_col, str) else score_col
    label = F.col(label_col) if isinstance(label_col, str) else label_col
    binned = df.select(
        # Clamp BOTH edges: scores are nominally in [0, 1] but a caller
        # passing an unnormalized score below 0 must land in bin 0, not
        # a silent negative bin that sorts ahead of the real range.
        F.greatest(
            F.lit(0).cast("long"),
            F.least(F.floor(score * bins).cast("long"), F.lit(bins - 1)),
        ).alias("bin"),
        label.cast("long").alias("y"),
    )
    agg = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("n_pos"),
    )

    def run_pav(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bin").reset_index(drop=True)
        rates = pav_fit(pdf["n"].to_numpy(), pdf["n_pos"].to_numpy())
        scale = 1e6
        return pd.DataFrame(
            {
                "bin": pdf["bin"],
                "n": pdf["n"],
                "pos_rate": np.floor(
                    pdf["n_pos"].to_numpy() / pdf["n"].to_numpy() * scale + 0.5
                )
                / scale,
                "calibrated": np.floor(rates * scale + 0.5) / scale,
            }
        )

    return (
        agg.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(run_pav, schema="bin long, n long, pos_rate double, calibrated double")
    )
