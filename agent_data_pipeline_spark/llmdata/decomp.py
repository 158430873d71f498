"""Distributed decomposition ops for embedding columns.

PCA at corpus scale is a one-pass moment computation: each Arrow batch
contributes a partial (count, sum vector, Gram matrix) via a single
numpy matmul, partials reduce in Spark (the only shuffled data is d and
d² scalars per batch — never the vectors), and the d×d eigensolve runs
on the driver where it belongs (d is the embedding width, 64 here; the
cost is microseconds and independent of corpus size). This is the same
partial-moments design the reference-class systems use for covariance
at scale; compare `similarity.cosine_topk_bruteforce` for the kernel
conventions (self-contained closures, float64 accumulation).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def moment_partials(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """The lazy distributed stage of PCA: per-Arrow-batch partial
    moments (n, Σx, flattened XᵀX) via one numpy matmul each — the only
    Python pass, and the only data that ever shuffles (d and d² scalars
    per batch, never the vectors)."""

    def moments(batches):
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = _np.stack(
                [_np.asarray(v, dtype=_np.float64) for v in pdf[vec_col]]
            )
            g = x.T @ x
            yield _pd.DataFrame(
                {
                    "n": [len(x)],
                    "s": [x.sum(axis=0).tolist()],
                    "g": [g.ravel().tolist()],
                }
            )

    return df.select(vec_col).mapInPandas(
        moments, "n long, s array<double>, g array<double>"
    )


def pca_explained_variance(
    spark: SparkSession,
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
    round_digits: int = 6,
) -> DataFrame:
    """Top-k PCA explained-variance ratios over an embedding column.

    One distributed pass over the corpus (plus a limit(1) dimension
    probe): mapInPandas emits per-batch
    partials (n, Σx, flattened XᵀX); the three moments are concatenated
    into a single long-form (idx, value) frame — idx 0 is n, 1..d is Σx,
    d+1.. is the Gram — and reduced by index in ONE groupBy collected
    with ONE collect(), so the moment kernel scans the corpus exactly
    once (the shuffle is 1+d+d² scalars per batch, independent of corpus
    size; n rides as an exact double, counts ≪ 2^53). The covariance
    C = (G − n·μμᵀ)/(n−1) is then eigensolved with numpy on the driver.
    Returns a DataFrame (component, eigenvalue, explained_ratio,
    cum_ratio) with component 1-based in descending-eigenvalue order,
    floats rounded so partial accumulation order cannot leak into the
    result.
    """

    parts = moment_partials(df, vec_col)
    flat = (
        parts.select(
            F.posexplode(
                F.concat(
                    F.array(F.col("n").cast("double")), F.col("s"), F.col("g")
                )
            ).alias("i", "v")
        )
        .groupBy("i")
        .agg(F.sum("v").alias("v"))
    )
    from ..fns import bounded_collect

    # The moment grain is exactly 1+d+d² scalars, NOT corpus rows — but
    # d must come from the data, not a hardcoded envelope (ADVICE r8: a
    # fixed d ≤ 1024 bound falsely rejected wider embeddings). One
    # limit(1) probe reads a single row's vector length; the corpus
    # itself is still scanned exactly once, by the moment kernel.
    # NULL guard (ADVICE r9): size(NULL) is -1 in Spark, which would
    # collapse the bound to 1 and reject a valid corpus; probe only
    # non-null vectors and clamp to >= 0 for the empty-array row case.
    probe = (
        df.filter(F.col(vec_col).isNotNull())
        .select(F.size(F.col(vec_col)).alias("d"))
        .limit(1)
        .collect()
    )
    d_probe = max(int(probe[0].d), 0) if probe else 0
    vals = {
        r.i: r.v
        for r in bounded_collect(
            flat,
            1 + d_probe + d_probe * d_probe,
            f"PCA moment grain 1+d+d², probed d={d_probe}",
        )
    }
    if not vals:
        return spark.createDataFrame(
            [], "component long, eigenvalue double, explained_ratio double, cum_ratio double"
        )
    d = round((-1 + (1 + 4 * (len(vals) - 1)) ** 0.5) / 2)
    if 1 + d + d * d != len(vals):  # not assert: must survive python -O
        raise ValueError(
            f"malformed moment set: {len(vals)} partials do not form "
            f"1 + d + d^2 for any integer d (nearest d={d})"
        )
    n_total = int(vals[0])
    if n_total < 2:
        return spark.createDataFrame(
            [], "component long, eigenvalue double, explained_ratio double, cum_ratio double"
        )
    s = np.array([vals[1 + i] for i in range(d)])
    g = np.array([vals[1 + d + i] for i in range(d * d)]).reshape(d, d)
    mu = s / n_total
    cov = (g - n_total * np.outer(mu, mu)) / (n_total - 1)
    evals = np.linalg.eigh(cov)[0][::-1]  # descending
    evals = np.clip(evals, 0.0, None)
    trace = evals.sum() or 1.0
    ratios = evals / trace
    scale = 10.0**round_digits
    rows = []
    cum = 0.0
    for i in range(min(k, d)):
        cum += ratios[i]
        rows.append(
            (
                i + 1,
                float(np.floor(evals[i] * scale + 0.5) / scale),
                float(np.floor(ratios[i] * scale + 0.5) / scale),
                float(np.floor(cum * scale + 0.5) / scale),
            )
        )
    return spark.createDataFrame(
        rows, "component long, eigenvalue double, explained_ratio double, cum_ratio double"
    )
