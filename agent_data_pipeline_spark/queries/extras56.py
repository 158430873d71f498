"""Round-7 twenty-second wave: forecast skill scoring and sketch
calibration.

* ``forecast_skill_mase`` — forecast evaluation done right (MASE,
  Hyndman & Koehler 2006): the last 28 days are held out, the
  seasonal-naive (t−7) and naive (t−1) one-step forecasts are scored
  on the holdout, and both MAEs are scaled by the in-sample naive
  MAE — the scale-free skill score that makes "is my model better
  than persistence" answerable. All lags run on the bounded
  calendar-day grain (adjudicated class); the whole thing is one
  day-grain aggregate + two windows + one final aggregate. The
  seasonal-naive skill > 0 read on this fixture quantifies exactly
  the weekly structure `dow_seasonality` found.
* ``minhash_jaccard_calibration`` — estimator calibration for the
  engine's own MinHash: every document gets a deterministic
  corruption (every k-th token dropped, k = 3 + doc_id % 6, so true
  similarity SPANS a range instead of clustering at one value), the
  EXACT shingle Jaccard is computed from distinct shingle-hash sets,
  the 64-hash MinHash estimate from llmdata.dedup.minhash_signatures
  — and the output is the calibration table per exact-Jaccard decile
  (n_pairs, mean exact, mean estimate, MAE). Hash-seeded ⇒
  rows-only; the per-bucket bias bound (|mean_est − mean_exact|
  within the binomial SE envelope) is pinned in
  tests/test_dedup_quality.py.

Reference parity: no forecasting/sketch-calibration surface in the
reference (SURVEY.md §2.A); declared north-star §2.B additions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .core import QuerySpec, bounded_collect, rnd, t

_TEST_DAYS = 28


def _forecast_skill_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        t(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5))
            .cast("double")
            .alias("y")
        )
    )
    # Window-free since round 12 (allowlist burn-down; was lag/rank
    # windows over the single daily series): the series is calendar-
    # bounded (~2,400 rows at ANY fact scale), so the lags, holdout
    # split and MAE sums run driver-side over the collected series.
    # Exactness: y is integer cents (exact as double), every |y−yk|
    # is an exact integer, and the MAEs are exact-int sums divided
    # once — bit-equal to the window form's avg() in any order.
    import math

    rows = sorted(
        (r["day"], int(r["y"]))
        for r in bounded_collect(
            daily, 5_000, "daily calendar grain (~2,400 days)"
        )
    )
    ys = [y for _d, y in rows]
    n = len(ys)
    test_lo = n - _TEST_DAYS  # rk_desc <= _TEST_DAYS  <=>  idx >= n-28
    sum_tr = n_tr = 0
    sum_na = sum_sn = n_te = 0
    for i in range(n):
        if i >= 1 and i < test_lo:
            sum_tr += abs(ys[i] - ys[i - 1])
            n_tr += 1
        if i >= 7 and i >= test_lo:
            sum_na += abs(ys[i] - ys[i - 1])
            sum_sn += abs(ys[i] - ys[i - 7])
            n_te += 1
    scale = sum_tr / n_tr
    mae_naive = sum_na / n_te
    mae_snaive = sum_sn / n_te

    def fl(x: float, s: float) -> float:
        return math.floor(x * s + 0.5) / s

    return spark.createDataFrame(
        [
            (
                n_tr,
                n_te,
                fl(mae_naive / 100.0, 100),
                fl(mae_snaive / 100.0, 100),
                fl(mae_naive / scale, 1e6),
                fl(mae_snaive / scale, 1e6),
                fl(1 - mae_snaive / mae_naive, 1e6),
            )
        ],
        "n_train BIGINT, n_test BIGINT, mae_naive_dollars DOUBLE, "
        "mae_snaive_dollars DOUBLE, mase_naive DOUBLE, "
        "mase_snaive DOUBLE, snaive_skill_vs_naive DOUBLE",
    )


_MASE_SQL = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
           AS y
  FROM orders GROUP BY 1
), lagged AS (
  SELECT day, y,
         lag(y, 1) OVER (ORDER BY day) AS y1,
         lag(y, 7) OVER (ORDER BY day) AS y7,
         row_number() OVER (ORDER BY day DESC) AS rk_desc
  FROM daily
), test AS (
  SELECT * FROM lagged
  WHERE rk_desc <= {_TEST_DAYS} AND y1 IS NOT NULL AND y7 IS NOT NULL
), train AS (
  SELECT * FROM lagged WHERE rk_desc > {_TEST_DAYS} AND y1 IS NOT NULL
), scale AS (
  SELECT avg(abs(y - y1)) AS scale,
         CAST(count(*) AS BIGINT) AS n_train
  FROM train
), errs AS (
  SELECT CAST(count(*) AS BIGINT) AS n_test,
         avg(abs(y - y1)) AS mae_naive,
         avg(abs(y - y7)) AS mae_snaive
  FROM test
)
SELECT s.n_train, e.n_test,
       floor(e.mae_naive / 100.0 * 100 + 0.5) / 100 AS mae_naive_dollars,
       floor(e.mae_snaive / 100.0 * 100 + 0.5) / 100 AS mae_snaive_dollars,
       floor(e.mae_naive / s.scale * 1000000 + 0.5) / 1000000
         AS mase_naive,
       floor(e.mae_snaive / s.scale * 1000000 + 0.5) / 1000000
         AS mase_snaive,
       floor((1 - e.mae_snaive / e.mae_naive) * 1000000 + 0.5) / 1000000
         AS snaive_skill_vs_naive
FROM errs e CROSS JOIN scale s
"""


# --------------------------------------------------------------------------
# minhash_jaccard_calibration (rows-only: hash-seeded estimate)
# --------------------------------------------------------------------------

def _minhash_jaccard_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..llmdata import dedup

    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    k = (3 + F.col("doc_id") % 6).cast("int")
    corrupted_text = F.array_join(
        F.filter(
            F.split(F.lower(F.col("text")), r"\s+"),
            lambda x, i: (i % F.col("k")) != 0,
        ),
        " ",
    )
    corr = d.withColumn("k", k).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        corrupted_text.alias("text"),
    )
    both = d.select("doc_id", F.lower("text").alias("text")).unionAll(corr)
    # exact shingle jaccard per original/corrupted pair
    sh = dedup.shingle_hashes(both, "text").select(
        "doc_id", F.explode("sh_hashes").alias("h")
    ).distinct()
    a = sh.filter(F.col("doc_id") < 10_000_000).select(
        F.col("doc_id").alias("id"), "h"
    )
    b = sh.filter(F.col("doc_id") >= 10_000_000).select(
        (F.col("doc_id") - 10_000_000).alias("id"), "h"
    )
    sizes_a = a.groupBy("id").agg(F.count(F.lit(1)).cast("double").alias("na"))
    sizes_b = b.groupBy("id").agg(F.count(F.lit(1)).cast("double").alias("nb"))
    inter = (
        a.join(b, ["id", "h"])
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("double").alias("ni"))
    )
    exact = (
        sizes_a.join(sizes_b, "id")
        .join(inter, "id", "left")
        .withColumn("ni", F.coalesce(F.col("ni"), F.lit(0.0)))
        .select(
            "id",
            (
                F.col("ni")
                / (F.col("na") + F.col("nb") - F.col("ni"))
            ).alias("j_exact"),
        )
    )
    sig = dedup.minhash_signatures(both, "text", "doc_id")
    sa = sig.filter(F.col("id") < 10_000_000)
    sb = sig.filter(F.col("id") >= 10_000_000).select(
        (F.col("id") - 10_000_000).alias("id"),
        F.col("signature").alias("sig_b"),
    )
    est = sa.join(sb, "id").select(
        "id",
        (
            F.size(
                F.filter(
                    F.zip_with(
                        "signature", "sig_b", lambda x, y: x == y
                    ),
                    lambda z: z,
                )
            )
            / F.lit(64.0)
        ).alias("j_est"),
    )
    pairs = exact.join(est, "id")
    return (
        pairs.groupBy(
            F.floor(F.col("j_exact") * 10).cast("int").alias("decile")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            rnd(F.avg("j_exact"), 4).alias("mean_exact"),
            rnd(F.avg("j_est"), 4).alias("mean_estimate"),
            rnd(F.avg(F.abs(F.col("j_est") - F.col("j_exact"))), 4).alias(
                "mae"
            ),
        )
        .orderBy("decile")
    )


QUERIES: dict[str, QuerySpec] = {
    "forecast_skill_mase": QuerySpec(
        _forecast_skill_mase,
        _MASE_SQL,
        "MASE forecast evaluation on a 28-day holdout: seasonal-naive "
        "vs naive, scaled by in-sample naive MAE",
    ),
    "minhash_jaccard_calibration": QuerySpec(
        _minhash_jaccard_calibration,
        None,
        "Calibration of the 64-hash MinHash estimator vs exact shingle "
        "Jaccard on deterministic corruptions, per exact-J decile",
    ),
}
