"""Time-series operators (ops/timeseries.py): rollup nesting, gap-fill
grids, LOCF, and linear interpolation semantics on crafted series."""

from __future__ import annotations

from pyspark.sql import functions as F

from agent_data_pipeline_spark.ops.timeseries import (
    bucket_agg,
    gap_fill,
    hypertable_rollup,
    interpolate_linear,
    locf,
)


def _series(spark):
    rows = [
        ("a", "2024-03-01 00:03:00", 1.0),
        ("a", "2024-03-01 00:22:00", 3.0),
        ("a", "2024-03-01 01:40:00", 5.0),  # 15-min gaps in between
        ("b", "2024-03-01 00:10:00", 10.0),
    ]
    return spark.createDataFrame(rows, "k string, ts string, v double").withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    )


def test_rollup_levels_nest_exactly(spark):
    """Coarse levels computed from the finer level must equal the same
    aggregation computed directly from raw rows (compositionality is the
    whole point: at 100 TB only level 0 touches the raw table)."""
    df = _series(spark)
    r = hypertable_rollup(df, "ts", ["15 minutes", "1 hour"], ["k"], "v")
    hourly = {
        (row["k"], str(row["bucket"])): (row["n_events"], row["sum_value"])
        for row in r.filter(F.col("bucket_width") == "1 hour").collect()
    }
    direct = {
        (row["k"], str(row["bucket"])): (row["n_events"], row["sum_value"])
        for row in bucket_agg(df, "ts", "1 hour", ["k"], "v").collect()
    }
    assert hourly == direct
    assert hourly[("a", "2024-03-01 00:00:00")] == (2, 4.0)


def test_gap_fill_builds_uniform_grid(spark):
    b = bucket_agg(_series(spark), "ts", "15 minutes", ["k"], "v")
    g = gap_fill(b, "bucket", "15 minutes", ["k"])
    a_rows = sorted(
        (str(r["bucket"]), r["is_gap"]) for r in g.filter(F.col("k") == "a").collect()
    )
    # span 00:00 .. 01:30 inclusive = 7 buckets, observations in 3
    assert len(a_rows) == 7
    assert [x[1] for x in a_rows] == [0, 0, 1, 1, 1, 1, 0]
    # single-bucket key: grid collapses to that bucket, no gaps
    assert [r["is_gap"] for r in g.filter(F.col("k") == "b").collect()] == [0]


def test_locf_and_linear_interpolation(spark):
    b = bucket_agg(_series(spark), "ts", "15 minutes", ["k"], "v").select(
        "bucket", "k", F.col("sum_value").alias("x")
    )
    g = interpolate_linear(
        locf(gap_fill(b, "bucket", "15 minutes", ["k"]), "bucket", ["k"], "x"),
        "bucket",
        ["k"],
        "x",
    )
    a = {
        str(r["bucket"]): (r["x"], r["locf_x"], r["interp_x"])
        for r in g.filter(F.col("k") == "a").collect()
    }
    assert a["2024-03-01 00:15:00"] == (3.0, 3.0, 3.0)
    # four gap buckets 00:30..01:15 between x=3.0 (idx 2) and x=5.0 (idx 7)
    assert a["2024-03-01 00:30:00"][1] == 3.0  # LOCF holds last obs
    assert abs(a["2024-03-01 00:30:00"][2] - (3.0 + 2.0 * 1 / 5)) < 1e-12
    assert abs(a["2024-03-01 01:15:00"][2] - (3.0 + 2.0 * 4 / 5)) < 1e-12


def test_interpolation_edges_stay_null(spark):
    rows = [("k", "2024-01-01 00:15:00", None), ("k", "2024-01-01 00:30:00", 2.0),
            ("k", "2024-01-01 00:45:00", None)]
    df = spark.createDataFrame(rows, "k string, bucket string, x double").withColumn(
        "bucket", F.col("bucket").cast("timestamp_ntz")
    )
    out = {str(r["bucket"]): r["interp_x"]
           for r in interpolate_linear(df, "bucket", ["k"], "x").collect()}
    assert out["2024-01-01 00:15:00"] is None  # before first observation
    assert out["2024-01-01 00:30:00"] == 2.0
    assert out["2024-01-01 00:45:00"] is None  # after last observation


def test_sessionize_ntz_is_dst_safe(spark):
    """NTZ gap arithmetic must never consult the session timezone: two
    events 62 wall-clock minutes apart that straddle a spring-forward
    transition (02:00 doesn't exist in America/Los_Angeles on
    2026-03-08) are > the 30-min gap and MUST split into two sessions.
    A cast-through-TIMESTAMP implementation sees them 2 minutes apart
    and wrongly merges them."""
    from agent_data_pipeline_spark.ops.sessionize import sessionize

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
        df = spark.createDataFrame(
            [("u", "2026-03-08 01:59:00"), ("u", "2026-03-08 03:01:00")],
            "k string, ts string",
        ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        sessions = sessionize(df, "k", "ts", 1800)
        assert sessions.select("session_id").distinct().count() == 2
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def test_sessionize_matches_native_session_window(spark):
    """ops.sessionize (lag+cumsum) against Spark's own session_window on
    a crafted keyed series with sub-second gaps at the boundary: the
    session bounds and event counts must agree exactly."""
    from agent_data_pipeline_spark.ops.sessionize import session_summary

    rows = [
        ("a", "2024-01-01 00:00:00.000", 1.0),
        ("a", "2024-01-01 00:29:59.999", 1.0),  # < gap: same session
        ("a", "2024-01-01 00:59:59.999", 1.0),  # exactly gap: touching windows MERGE
        ("a", "2024-01-01 01:29:59.999", 1.0),  # exactly gap again: still merged
        ("a", "2024-01-01 02:00:00.000", 1.0),  # 0.001s past gap: new session
        ("b", "2024-01-01 05:00:00.000", 2.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts string, v double").withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    )
    ours = {
        (r["k"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in session_summary(df, "k", "ts", 1800, "v").collect()
    }
    native = {
        (r["k"], str(r["start"]), str(r["end"]), r["n"])
        for r in df.groupBy(F.session_window("ts", "30 minutes").alias("w"), "k")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("k", F.col("w.start").alias("start"), F.col("w.end").alias("end"), "n")
        .collect()
    }
    assert ours == native


def test_gap_fill_chunked_grid_equals_unchunked(spark):
    """Grid-size guard: with max_grid_per_row smaller than a key's span,
    the two-level sequence must produce EXACTLY the same grid as one big
    sequence — chunk boundaries aligned, no duplicate or missing buckets
    (including a span not divisible by the chunk size)."""
    df = _series(spark)
    b = df.groupBy(
        F.window("ts", "15 minutes")["start"].alias("bucket"), "k"
    ).agg(F.avg("v").alias("avg_v"))
    want = {
        (r["k"], str(r["bucket"]), r["is_gap"])
        for r in gap_fill(b, "bucket", "15 minutes", ["k"]).collect()
    }
    got = {
        (r["k"], str(r["bucket"]), r["is_gap"])
        for r in gap_fill(b, "bucket", "15 minutes", ["k"], max_grid_per_row=3).collect()
    }
    assert got == want
    # key 'a' spans 00:00..01:30 -> 7 buckets; chunks of 3 => 3+3+1
    assert len({g for g in got if g[0] == "a"}) == 7


def test_ewma_matches_pandas_adjust_false(spark):
    """ops/timeseries.ewma implements pandas ewm(adjust=False) semantics
    per key: verify the HOF fold against pandas directly, including
    single-point series and multiple keys."""
    import pandas as pd
    import pytest

    from agent_data_pipeline_spark.ops.timeseries import ewma

    rows = [
        ("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 5.0), ("a", 4, 40.0),
        ("b", 1, 7.0), ("b", 2, 7.0),
        ("c", 5, 3.25),
    ]
    df = spark.createDataFrame(rows, "k string, o int, x double")
    got = {
        (r["k"], r["o"]): r["ewma"]
        for r in ewma(df, ["k"], "o", "x", alpha=0.3).collect()
    }
    pdf = pd.DataFrame(rows, columns=["k", "o", "x"]).sort_values(["k", "o"])
    for k, grp in pdf.groupby("k"):
        want = grp["x"].ewm(alpha=0.3, adjust=False).mean().tolist()
        for o, w in zip(grp["o"], want):
            assert got[(k, o)] == pytest.approx(w, abs=1e-12), (k, o)


def test_ewma_ignores_input_row_order(spark):
    """The fold sorts each key's series by the order column, so a
    shuffled input must produce the identical smoothing."""
    from agent_data_pipeline_spark.ops.timeseries import ewma

    rows = [("a", i, float((i * 37) % 11)) for i in range(1, 30)]
    df = spark.createDataFrame(rows, "k string, o int, x double")
    shuffled = spark.createDataFrame(list(reversed(rows)), "k string, o int, x double")
    a = sorted(map(tuple, ewma(df, ["k"], "o", "x", 0.3).collect()))
    b = sorted(map(tuple, ewma(shuffled.repartition(5), ["k"], "o", "x", 0.3).collect()))
    assert a == b


def test_time_weighted_avg_locf_weights(spark):
    """Hand series: v=10 held 3s, v=20 held 1s -> twap (10*3+20*1)/4;
    the final observation carries no weight; single-obs keys yield NULL."""
    from pyspark.sql import functions as F

    from agent_data_pipeline_spark.ops.timeseries import time_weighted_avg

    df = spark.createDataFrame(
        [
            ("a", "2024-01-01 00:00:00", 10.0),
            ("a", "2024-01-01 00:00:03", 20.0),
            ("a", "2024-01-01 00:00:04", 99.0),
            ("b", "2024-01-01 00:00:00", 7.0),
        ],
        "k string, ts string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    rows = {r["k"]: r for r in time_weighted_avg(df, ["k"], "ts", "v").collect()}
    assert rows["a"]["twap"] == (10.0 * 3 + 20.0 * 1) / 4
    assert rows["a"]["n_obs"] == 3
    assert rows["b"]["twap"] is None


def test_time_weighted_avg_subsecond_exact(spark):
    """Sub-second gaps weight exactly (microsecond integers, not
    truncated whole seconds)."""
    from pyspark.sql import functions as F

    from agent_data_pipeline_spark.ops.timeseries import time_weighted_avg

    df = spark.createDataFrame(
        [
            ("k", "2024-01-01 00:00:00.000000", 0.0),
            ("k", "2024-01-01 00:00:00.250000", 100.0),
            ("k", "2024-01-01 00:00:01.000000", 50.0),
        ],
        "k string, ts string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    got = time_weighted_avg(df, ["k"], "ts", "v").collect()[0]["twap"]
    assert got == (0.0 * 250000 + 100.0 * 750000) / 1000000


def test_counter_deltas_reset_semantics(spark):
    """Counter 5,8,2,4: increase = 3 + 2(reset: new reading) + 2 = 7,
    one reset; first sample contributes nothing."""
    from pyspark.sql import functions as F

    from agent_data_pipeline_spark.ops.timeseries import counter_deltas

    df = spark.createDataFrame(
        [("k", 1, 5), ("k", 2, 8), ("k", 3, 2), ("k", 4, 4)],
        "k string, ts int, c int",
    )
    r = counter_deltas(df, ["k"], "ts", "c").collect()[0]
    assert (r["total_increase"], r["n_resets"], r["n_obs"]) == (7, 1, 4)


def test_epoch_micros_tz_immune_across_dst(spark):
    """epoch_micros on TIMESTAMP_NTZ must equal the naive-as-UTC epoch
    regardless of session TZ — including for wall clocks inside a DST
    transition window, where any cast-through-TIMESTAMP path shifts."""
    from pyspark.sql import functions as F

    from agent_data_pipeline_spark.fns import epoch_micros

    # 2024-03-10 02:30 does not exist in America/New_York (spring
    # forward); 2024-11-03 01:30 happens twice. Both must map to their
    # naive-as-UTC micros exactly.
    df = spark.createDataFrame(
        [("2024-03-10 02:30:00.123456",), ("2024-11-03 01:30:00.5",)],
        "s string",
    ).withColumn("ts", F.col("s").cast("timestamp_ntz"))
    import datetime as dt

    want = [
        int(
            dt.datetime(2024, 3, 10, 2, 30, 0, 123456, tzinfo=dt.timezone.utc).timestamp()
            * 1_000_000
        ),
        int(
            dt.datetime(2024, 11, 3, 1, 30, 0, 500000, tzinfo=dt.timezone.utc).timestamp()
            * 1_000_000
        ),
    ]
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("UTC", "America/New_York", "Asia/Kolkata"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            got = [
                r["e"]
                for r in df.select(epoch_micros("ts").alias("e"))
                .orderBy("e")
                .collect()
            ]
            assert got == sorted(want), (tz, got, want)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


# --------------------------------------------------------------------------
# pacf_lags (queries/extras44.py): the Durbin-Levinson recursion is
# cross-checked against an independent numpy Toeplitz solve of the
# Yule-Walker equations — pacf(k) is the last coefficient of the AR(k)
# fit. Same ACF input, entirely different algorithm.
# --------------------------------------------------------------------------


def test_pacf_matches_yule_walker_toeplitz_solve(spark):
    import numpy as np
    import pytest
    import pyspark.sql.functions as F

    from agent_data_pipeline_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.01"
    got = {
        r["lag"]: r["pacf"]
        for r in REGISTRY["pacf_lags"].spark(spark, sf).collect()
    }
    # rebuild the identical ACF input the query used
    daily = (
        spark.read.parquet(f"{sf}/orders.parquet")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    lags = spark.range(1, 13).select(F.col("id").cast("int").alias("lag"))
    shifted = daily.select(F.col("d").alias("d2"), F.col("rev").alias("rev2"))
    acf_rows = (
        daily.crossJoin(F.broadcast(lags))
        .join(shifted, F.col("d2") == F.date_add(F.col("d"), F.col("lag")))
        .groupBy("lag")
        .agg(F.corr("rev", "rev2").alias("acf"))
        .orderBy("lag")
        .collect()
    )
    rho = np.array([float(r["acf"]) for r in acf_rows])
    for k in range(1, 13):
        # Yule-Walker: R phi = rho[0:k], R Toeplitz of [1, rho_1..]
        col = np.concatenate(([1.0], rho[: k - 1]))
        R = np.array(
            [[col[abs(i - j)] for j in range(k)] for i in range(k)]
        )
        phi = np.linalg.solve(R, rho[:k])
        assert got[k] == pytest.approx(phi[-1], abs=2e-6), f"lag {k}"


# --------------------------------------------------------------------------
# holt_winters_additive (queries/extras48.py): a planted
# trend + zero-mean weekly season series must be tracked with small
# one-step error and forecast error after burn-in — the check the
# rows-only driver pass can't do.
# --------------------------------------------------------------------------


def test_holt_winters_tracks_planted_seasonal_trend():
    from agent_data_pipeline_spark.queries.extras48 import (
        holt_winters_additive,
    )

    season = [30.0, -10.0, 25.0, -45.0, 15.0, -20.0, 5.0]  # sums to 0
    ys = [1000.0 + 5.0 * t + season[t % 7] for t in range(280)]
    fitted, fc = holt_winters_additive(ys)
    # after burn-in the one-step predictions track closely
    tail_err = max(
        abs(fitted[i] - ys[i]) / ys[i] for i in range(len(ys) - 10, len(ys))
    )
    assert tail_err < 0.01
    # and the 7-day-ahead forecast continues the planted process
    want = [1000.0 + 5.0 * (280 + h) + season[(280 + h) % 7] for h in range(7)]
    for got, exp in zip(fc, want):
        assert abs(got - exp) / exp < 0.02


def test_holt_winters_rejects_short_series():
    import pytest

    from agent_data_pipeline_spark.queries.extras48 import (
        holt_winters_additive,
    )

    with pytest.raises(ValueError):
        holt_winters_additive([1.0] * 13)


def test_binseg_recovers_planted_piecewise_breaks():
    """binseg (extras51): a noise-free piecewise-constant series must
    yield exactly the planted break indices, highest-gain first, and a
    stationary series must yield none."""
    from agent_data_pipeline_spark.queries.extras51 import binseg

    ys = [100.0] * 120 + [250.0] * 90 + [80.0] * 100
    got = binseg(ys, min_seg=30, max_breaks=5, gain_frac=0.02)
    assert [i for i, _g in got[:2]] in ([120, 210], [210, 120])
    assert len(got) == 2  # no spurious third break on constant segs
    flat = [42.0] * 300
    assert binseg(flat, min_seg=30) == []


def test_binseg_respects_min_segment():
    from agent_data_pipeline_spark.queries.extras51 import binseg

    # true step at index 10 < min_seg: binseg may report the closest
    # ALLOWED split but never one inside the min_seg margin
    ys = [0.0] * 10 + [100.0] * 290
    got = binseg(ys, min_seg=30)
    assert all(30 <= i <= len(ys) - 30 for i, _g in got)
    # and the greedy first pick is the tightest allowed isolation of
    # the contaminated prefix
    assert got and got[0][0] == 30


def test_dtw_invariants_and_shift_tolerance():
    """dtw_l1 (extras52): identity, symmetry, the diagonal upper bound
    (DTW <= L1 for equal-length series), and the selling point — a
    time-shifted copy has near-zero DTW while L1 stays large."""
    from agent_data_pipeline_spark.queries.extras52 import dtw_l1

    a = [float((i * 7) % 13) for i in range(60)]
    b = [a[0]] * 3 + a[:-3]  # 3-step delayed copy
    assert dtw_l1(a, a) == 0.0
    assert dtw_l1(a, b) == dtw_l1(b, a)
    l1 = sum(abs(x - y) for x, y in zip(a, b))
    assert dtw_l1(a, b) <= l1
    # alignment absorbs the shift almost entirely
    assert dtw_l1(a, b) < 0.2 * l1


def test_haar_energy_conservation_and_scale_localization():
    """haar_energies (extras59): orthonormal transform conserves total
    energy exactly, and a planted pure alternating series concentrates
    ALL energy in detail level 1."""
    import pytest

    from agent_data_pipeline_spark.queries.extras59 import haar_energies

    ys = [float((i * 13) % 29) for i in range(64)]
    total = sum(y * y for y in ys)
    parts = haar_energies(ys)
    assert abs(sum(e for _n, e in parts) - total) < 1e-9 * total
    alt = [1.0 if i % 2 == 0 else -1.0 for i in range(64)]
    p2 = dict(haar_energies(alt))
    assert p2["detail_1"] == pytest.approx(64.0, abs=1e-9)
    assert sum(v for k, v in p2.items() if k != "detail_1") < 1e-9


def test_haar_rejects_non_power_of_two():
    import pytest

    from agent_data_pipeline_spark.queries.extras59 import haar_energies

    with pytest.raises(ValueError):
        haar_energies([1.0] * 100)


def test_ljung_box_fires_on_seasonal_residuals_not_noise():
    """ljung_box_q (extras59): a still-seasonal residual series must
    reject whiteness decisively; LCG pseudo-noise must not."""
    from agent_data_pipeline_spark.queries.extras59 import ljung_box_q

    seasonal = [
        [10.0, -3.0, 5.0, -8.0, 2.0, -6.0, 4.0][i % 7] for i in range(400)
    ]
    q_seasonal, _ = ljung_box_q(seasonal)
    assert q_seasonal > 200  # wildly non-white

    # md5-based uniforms: genuinely white (an LCG mod-1000 slice was
    # tried first and scored Q=1149 — itself a nice demonstration of
    # why hash-based noise is the engine's convention)
    import hashlib

    noise = [
        int(hashlib.md5(f"lb|{i}".encode()).hexdigest()[:8], 16)
        / float(1 << 32)
        - 0.5
        for i in range(400)
    ]
    q_noise, _ = ljung_box_q(noise)
    assert q_noise < 30  # ~chi2_14 under whiteness
