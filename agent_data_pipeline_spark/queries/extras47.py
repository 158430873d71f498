"""Round-7 thirteenth wave: interrupted time series, grid-bounded
nearest neighbors, and robust location.

* ``its_segmented_regression`` — interrupted-time-series analysis
  (segmented regression; Wagner et al. 2002): daily revenue regressed
  on a day index separately before and after the 1998-01-01
  intervention date, reporting pre/post slopes, the slope change, and
  the level (step) change at the cutoff. Inputs follow the
  ``rolling_ols_slope`` numerical-portability rule — revenue
  quantized to integer cents, day index an exact small integer — so
  every OLS sufficient statistic is exactly representable and the
  fitted coefficients are bit-identical across engines at any scale.
  Two hash aggregates on the calendar-bounded day grain; no windows.
* ``spatial_knn_grid`` — grid-bounded nearest-neighbor audit over the
  md5-scatter customer coordinates of ``grid_proximity_join``: each
  point's nearest OTHER point among candidates in its 3×3 cell ring
  (the deliberate scale trade-off of grid methods: a point whose true
  NN lies outside the ring counts as unmatched — at 100 TB you widen
  the ring, never fall back to the cross join), aggregated to a
  per-km-band histogram plus match-rate and mean-NN-distance summary
  columns. Candidate generation is the same 9× one-side-fanout cell
  equi-join; the per-point NN is a plain min aggregate — no window,
  no theta join.
* ``huber_mean_irls`` — Huber M-estimator of location (Huber 1964,
  c = 1.345 on the MAD scale) for order values per market segment via
  IRLS: median/MAD seed, then 5 iterations, each ONE distributed
  weighted aggregate over the fact stream (the iterative-fixpoint
  envelope of PageRank/k-core: per-iteration state is 5 scalars per
  segment, broadcast back). Oracled since round 11 via the
  integer-exact scheme documented at the implementation — cents
  quantization, order-statistic midpoint seed/MAD, 1e-9 integer
  weight grid with 128-bit-exact sums — so the driver hash check is
  exact; pure-Python IRLS equality and outlier-resistance invariants
  stay in tests/test_properties.py.

Reference parity: no causal-inference/spatial/robust-statistics
surface in the reference (SURVEY.md §2.A); declared north-star §2.B
additions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core import QuerySpec, bounded_collect, rnd, t

_CUT = "1998-01-01"


def _its_segmented_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("day"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).alias("cents"),
    )
    daily = o.groupBy("day").agg(
        F.sum("cents").cast("double").alias("y")
    ).select(
        F.datediff(F.col("day"), F.lit("1995-01-01"))
        .cast("double")
        .alias("x"),
        "y",
        (F.col("day") >= F.lit(_CUT)).alias("post"),
    )
    g = daily.groupBy("post").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    p = g.select(
        "post",
        F.col("n").cast("long").alias("n_days"),
        slope.alias("b"),
        intercept.alias("a"),
    )
    pre = p.filter(~F.col("post")).select(
        F.col("n_days").alias("n_pre"),
        F.col("b").alias("b1"),
        F.col("a").alias("a1"),
    )
    post = p.filter(F.col("post")).select(
        F.col("n_days").alias("n_post"),
        F.col("b").alias("b2"),
        F.col("a").alias("a2"),
    )
    cut_x = F.datediff(F.lit(_CUT), F.lit("1995-01-01")).cast("double")
    return pre.crossJoin(F.broadcast(post)).select(
        "n_pre",
        "n_post",
        rnd(F.col("b1") / 100.0, 6).alias("slope_pre"),
        rnd(F.col("b2") / 100.0, 6).alias("slope_post"),
        rnd((F.col("b2") - F.col("b1")) / 100.0, 6).alias("slope_change"),
        rnd(
            (
                (F.col("a2") + F.col("b2") * cut_x)
                - (F.col("a1") + F.col("b1") * cut_x)
            )
            / 100.0,
            4,
        ).alias("level_change"),
    )


_ITS_SQL = f"""
WITH daily AS (
  SELECT CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
              AS DOUBLE) AS x,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
           AS y,
         CAST(o_orderdate AS DATE) >= DATE '{_CUT}' AS post
  FROM orders GROUP BY CAST(o_orderdate AS DATE)
), g AS (
  SELECT post, CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM daily GROUP BY 1
), p AS (
  SELECT post, n,
         (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b,
         (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS a
  FROM g
), k AS (
  SELECT CAST(datediff('day', DATE '1995-01-01', DATE '{_CUT}') AS DOUBLE)
           AS cut_x
)
SELECT CAST(pre.n AS BIGINT) AS n_pre,
       CAST(post.n AS BIGINT) AS n_post,
       floor(pre.b / 100.0 * 1000000 + 0.5) / 1000000 AS slope_pre,
       floor(post.b / 100.0 * 1000000 + 0.5) / 1000000 AS slope_post,
       floor((post.b - pre.b) / 100.0 * 1000000 + 0.5) / 1000000
         AS slope_change,
       floor(((post.a + post.b * k.cut_x) - (pre.a + pre.b * k.cut_x))
             / 100.0 * 10000 + 0.5) / 10000 AS level_change
FROM (SELECT * FROM p WHERE NOT post) pre
CROSS JOIN (SELECT * FROM p WHERE post) post
CROSS JOIN k
"""


# --------------------------------------------------------------------------
# spatial_knn_grid
# --------------------------------------------------------------------------

def _spatial_knn_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .extras45 import _coords, _CELL_DEG

    pts = _coords(t(spark, sf_dir, "customer"))
    cx = F.floor((F.col("lon") + 180.0) / _CELL_DEG).cast("long")
    cy = F.floor((F.col("lat") + 90.0) / _CELL_DEG).cast("long")
    home = pts.select("k", "lat", "lon", cx.alias("cx"), cy.alias("cy"))
    d9 = spark.range(9).select(
        (F.col("id") % 3 - 1).cast("long").alias("dx"),
        ((F.col("id") / 3).cast("long") - 1).alias("dy"),
    )
    probe = home.crossJoin(F.broadcast(d9)).select(
        F.col("k").alias("ka"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
        (F.col("cx") + F.col("dx")).alias("jx"),
        (F.col("cy") + F.col("dy")).alias("jy"),
    )
    other = home.select(
        F.col("k").alias("kb"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
    )
    rad = 0.017453292519943295
    dlat = (F.col("lat_b") - F.col("lat_a")) * rad / 2
    dlon = (F.col("lon_b") - F.col("lon_a")) * rad / 2
    hav = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(F.col("lat_a") * rad)
        * F.cos(F.col("lat_b") * rad)
        * F.sin(dlon)
        * F.sin(dlon)
    )
    km = 2 * 6371.0 * F.asin(F.sqrt(hav))
    nn = (
        probe.join(other, ["jx", "jy"])
        .filter(F.col("ka") != F.col("kb"))
        .withColumn("km9", F.floor(km * 1e9 + 0.5) / 1e9)
        .groupBy("ka")
        .agg(F.min("km9").alias("nn_km"))
    )
    tot = pts.agg(F.count(F.lit(1)).cast("double").alias("n_points"))
    summary = nn.agg(
        F.count(F.lit(1)).cast("double").alias("n_matched"),
        F.sum("nn_km").alias("s_nn"),
    ).crossJoin(F.broadcast(tot))
    bands = (
        nn.groupBy(F.floor(F.col("nn_km") / 10).cast("long").alias("band_10km"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_in_band"))
    )
    return (
        bands.crossJoin(F.broadcast(summary))
        .select(
            "band_10km",
            "n_in_band",
            F.col("n_points").cast("long").alias("n_points"),
            F.col("n_matched").cast("long").alias("n_matched"),
            rnd(F.col("n_matched") / F.col("n_points"), 6).alias(
                "match_rate"
            ),
            rnd(F.col("s_nn") / F.col("n_matched"), 6).alias("mean_nn_km"),
        )
        .orderBy("band_10km")
    )


_KNN_SQL = f"""
WITH pts AS (
  SELECT c_custkey AS k,
         -6.0 + CAST(CAST(('0x' || substring(
                 md5(CAST(c_custkey AS VARCHAR)), 1, 8)) AS BIGINT)
               % 120000 AS DOUBLE) / 10000.0 AS lat,
         -18.0 + CAST(CAST(('0x' || substring(
                 md5(CAST(c_custkey AS VARCHAR)), 9, 8)) AS BIGINT)
               % 360000 AS DOUBLE) / 10000.0 AS lon
  FROM customer
), home AS (
  SELECT k, lat, lon,
         CAST(floor((lon + 180.0) / 0.5) AS BIGINT) AS cx,
         CAST(floor((lat + 90.0) / 0.5) AS BIGINT) AS cy
  FROM pts
), d9 AS (
  SELECT dx, dy
  FROM (SELECT unnest([-1, 0, 1]) AS dx),
       (SELECT unnest([-1, 0, 1]) AS dy)
), cand AS (
  SELECT h.k AS ka, o.k AS kb, h.lat AS lat_a, h.lon AS lon_a,
         o.lat AS lat_b, o.lon AS lon_b
  FROM home h CROSS JOIN d9 d
  JOIN home o ON h.cx + d.dx = o.cx AND h.cy + d.dy = o.cy
  WHERE h.k <> o.k
), nn AS (
  SELECT ka,
         min(floor(2 * 6371.0 * asin(sqrt(
             sin((lat_b - lat_a) * 0.017453292519943295 / 2)
               * sin((lat_b - lat_a) * 0.017453292519943295 / 2)
             + cos(lat_a * 0.017453292519943295)
               * cos(lat_b * 0.017453292519943295)
               * sin((lon_b - lon_a) * 0.017453292519943295 / 2)
               * sin((lon_b - lon_a) * 0.017453292519943295 / 2)
         )) * 1e9 + 0.5) / 1e9) AS nn_km
  FROM cand GROUP BY ka
), tot AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_points FROM pts
), summary AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_matched, sum(nn_km) AS s_nn FROM nn
)
SELECT CAST(floor(nn_km / 10) AS BIGINT) AS band_10km,
       CAST(count(*) AS BIGINT) AS n_in_band,
       CAST(t.n_points AS BIGINT) AS n_points,
       CAST(s.n_matched AS BIGINT) AS n_matched,
       floor(s.n_matched / t.n_points * 1000000 + 0.5) / 1000000
         AS match_rate,
       floor(s.s_nn / s.n_matched * 1000000 + 0.5) / 1000000 AS mean_nn_km
FROM nn CROSS JOIN tot t CROSS JOIN summary s
GROUP BY 1, 3, 4, 5, 6
ORDER BY 1
"""


# --------------------------------------------------------------------------
# huber_mean_irls (oracled since round 11: integer-exact IRLS)
# --------------------------------------------------------------------------
#
# The round-10 playbook (PRF/DP-mean), pushed one step further: the
# whole fit is restructured so EVERY cross-engine quantity is either an
# exact integer or a single correctly-rounded IEEE op on identical
# inputs — no rounding grid needed at any iteration boundary:
#   * order values are quantized to integer CENTS once at the scan;
#   * the median seed and MAD are midpoints of two exact order
#     statistics (statistics.median convention) located WITHOUT a
#     fact-scale sort — $100-bucket histogram + refine, the
#     median_ci_order_stats pattern — so they are halves/quarters of
#     integers, binary-exact in both engines;
#   * each IRLS iteration quantizes the Huber weight to an integer
#     1e-9 grid per row (w9 = floor(c/r·1e9+0.5); c/r is one division
#     on identical inputs, hence identical), then takes INTEGER sums
#     Σw9·x_c (decimal(38,0) in Spark, HUGEINT in DuckDB — both exact)
#     and divides once: est = double(Σw9·x_c)/double(Σw9). Integer →
#     double conversion is correctly rounded in both engines even
#     above 2^53, so est is bit-identical. Overflow headroom: w9·x_c
#     ≤ 1e9·5e7 = 5e16 per row fits int64; the sums live in 128-bit.
# The Spark side keeps the scale shape: per-iteration state is 5
# scalars per segment broadcast back; the only fact-scale work per
# iteration is one weighted hash aggregate.

_HUBER_C = 1.345
_IRLS_ITERS = 5
_W9 = 1_000_000_000  # per-row weight grid (1e-9 relative quantization)


def _rank_midpoint(u: DataFrame, val: str) -> DataFrame:
    """Per-seg midpoint of the two middle order statistics of ``val``
    (ranks (n+1)//2 and (n+2)//2 — the statistics.median convention),
    located via $100-bucket histogram + refine (no fact-scale sort,
    no per-seg buffering). Returns (seg, med DOUBLE)."""
    from pyspark.sql.window import Window as W

    stats = u.groupBy("seg").agg(F.count(F.lit(1)).alias("n"))
    r1 = F.floor((F.col("n") + 1) / 2).cast("long")
    r2 = F.floor((F.col("n") + 2) / 2).cast("long")
    targets = stats.select(
        "seg", r1.alias("r"), F.lit("lo").alias("lbl")
    ).unionAll(stats.select("seg", r2.alias("r"), F.lit("hi").alias("lbl")))
    bucketed = u.withColumn("b", F.floor(F.col(val) / 10_000).cast("long"))
    bcnt = bucketed.groupBy("seg", "b").agg(F.count(F.lit(1)).alias("cnt"))
    wb = W.partitionBy("seg").orderBy("b").rowsBetween(
        W.unboundedPreceding, -1
    )
    bcum = bcnt.withColumn(
        "cum_before", F.coalesce(F.sum("cnt").over(wb), F.lit(0))
    )
    located = targets.join(bcum, "seg").filter(
        (F.col("cum_before") < F.col("r"))
        & (F.col("r") <= F.col("cum_before") + F.col("cnt"))
    )
    refined = bucketed.join(
        F.broadcast(located.select("seg", "b", "lbl", "r", "cum_before")),
        ["seg", "b"],
    )
    picked = refined.withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("seg", "lbl").orderBy(val)
        ),
    ).filter(F.col("rk") == F.col("r") - F.col("cum_before"))
    return picked.groupBy("seg").agg(
        (
            (
                F.max(F.when(F.col("lbl") == "lo", F.col(val)))
                + F.max(F.when(F.col("lbl") == "hi", F.col(val)))
            )
            / F.lit(2.0)
        ).alias("med")
    )


def _huber_mean_irls(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    c = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    u = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("xc"),
    ).localCheckpoint()
    stats = {
        r["seg"]: (int(r["n"]), int(r["sx"]))
        for r in bounded_collect(
            u.groupBy("seg").agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("xc").alias("sx"),
            ),
            1_000,
            "segment value grain",
        )
    }
    m0 = {
        r["seg"]: float(r["med"])
        for r in bounded_collect(
            _rank_midpoint(u, "xc"), 1_000, "segment value grain"
        )
    }

    def seg_lit(vals: dict[str, float]):
        if len(vals) == 1:
            return F.lit(next(iter(vals.values())))
        return F.coalesce(
            *[
                F.when(F.col("seg") == s, F.lit(v))
                for s, v in sorted(vals.items())
            ]
        )

    dev = u.select("seg", F.abs(F.col("xc") - seg_lit(m0)).alias("dc"))
    scale = {
        r["seg"]: max(1.4826 * float(r["med"]), 1e-9)
        for r in bounded_collect(
            _rank_midpoint(dev, "dc"), 1_000, "segment value grain"
        )
    }
    est = dict(m0)
    for _ in range(_IRLS_ITERS):
        r = F.abs(F.col("xc") - seg_lit(est)) / seg_lit(scale)
        w9 = (
            F.when(r <= _HUBER_C, F.lit(_W9).cast("long"))
            .otherwise(
                F.floor(F.lit(_HUBER_C) / r * _W9 + 0.5).cast("long")
            )
        )
        it = bounded_collect(
            u.withColumn("w9", w9)
            .groupBy("seg")
            .agg(
                F.sum(
                    (F.col("w9") * F.col("xc")).cast("decimal(38,0)")
                ).alias("swx"),
                F.sum(F.col("w9").cast("decimal(38,0)")).alias("sw"),
            ),
            1_000,
            "segment value grain",
        )
        est = {
            row["seg"]: float(row["swx"]) / float(row["sw"]) for row in it
        }

    def f4(x: float) -> float:
        return math.floor(x * 1e4 + 0.5) / 1e4

    rows = [
        (
            s,
            stats[s][0],
            f4(float(stats[s][1]) / float(stats[s][0]) / 100.0),
            f4(m0[s] / 100.0),
            f4(scale[s] / 100.0),
            f4(est[s] / 100.0),
        )
        for s in sorted(stats)
    ]
    return spark.createDataFrame(
        rows,
        "segment STRING, n BIGINT, mean DOUBLE, median_seed DOUBLE, "
        "mad_scale DOUBLE, huber_mean DOUBLE",
    ).orderBy("segment")


def _huber_sql() -> str:
    # one rank-midpoint block, reused for the seed and the MAD; the
    # oracle side may sort per segment (DuckDB at oracle scale), the
    # VALUES are the same exact order statistics the engine locates
    # via bucket+refine
    def mid(src: str, vcol: str, out: str) -> str:
        return f"""(
  SELECT seg,
         (max(CASE WHEN rk = (n + 1) // 2 THEN {vcol} END)
          + max(CASE WHEN rk = (n + 2) // 2 THEN {vcol} END)) / 2.0 AS {out}
  FROM (SELECT seg, {vcol},
               row_number() OVER (PARTITION BY seg ORDER BY {vcol}) AS rk,
               count(*) OVER (PARTITION BY seg) AS n
        FROM {src})
  GROUP BY seg
)"""

    w9 = (
        f"CASE WHEN abs(u.xc - e.est) / s.scale <= {_HUBER_C} "
        f"THEN CAST({_W9} AS BIGINT) "
        f"ELSE CAST(floor({_HUBER_C} / (abs(u.xc - e.est) / s.scale) "
        f"* {_W9} + 0.5) AS BIGINT) END"
    )
    its = ""
    prev = "seed"
    for k in range(1, _IRLS_ITERS + 1):
        its += f""", it{k} AS (
  SELECT u.seg,
         CAST(sum({w9} * u.xc) AS DOUBLE)
           / CAST(sum({w9}) AS DOUBLE) AS est
  FROM u JOIN {prev} e USING (seg) JOIN sc s USING (seg)
  GROUP BY u.seg
)"""
        prev = f"it{k}"
    return f"""
WITH u AS (
  SELECT c.c_mktsegment AS seg,
         CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS xc
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), st AS (
  SELECT seg, CAST(count(*) AS BIGINT) AS n, CAST(sum(xc) AS BIGINT) AS sx
  FROM u GROUP BY seg
), seed AS (
  SELECT seg, med AS est FROM {mid("u", "xc", "med")}
), dev AS (
  SELECT u.seg, abs(u.xc - e.est) AS dc FROM u JOIN seed e USING (seg)
), madm AS (
  SELECT seg, med AS mad FROM {mid("dev", "dc", "med")}
), sc AS (
  SELECT seg, greatest(1.4826 * mad, 1e-9) AS scale FROM madm
){its}
SELECT st.seg AS segment,
       st.n AS n,
       floor(CAST(st.sx AS DOUBLE) / CAST(st.n AS DOUBLE) / 100.0
             * 10000 + 0.5) / 10000 AS mean,
       floor(seed.est / 100.0 * 10000 + 0.5) / 10000 AS median_seed,
       floor(sc.scale / 100.0 * 10000 + 0.5) / 10000 AS mad_scale,
       floor(it{_IRLS_ITERS}.est / 100.0 * 10000 + 0.5) / 10000
         AS huber_mean
FROM st
JOIN seed USING (seg) JOIN sc USING (seg) JOIN it{_IRLS_ITERS} USING (seg)
ORDER BY segment
"""


_HUBER_SQL = _huber_sql()


QUERIES: dict[str, QuerySpec] = {
    "its_segmented_regression": QuerySpec(
        _its_segmented_regression,
        _ITS_SQL,
        "Interrupted-time-series segmented regression around 1998-01-01: "
        "pre/post slopes, slope change, level change (cents-exact OLS)",
    ),
    "spatial_knn_grid": QuerySpec(
        _spatial_knn_grid,
        _KNN_SQL,
        "Grid-bounded nearest-neighbor audit: per-point NN within the "
        "3x3 cell ring, 10 km band histogram + match-rate summary",
    ),
    "huber_mean_irls": QuerySpec(
        _huber_mean_irls,
        _HUBER_SQL,
        "Huber M-estimator of order value per segment via IRLS "
        "(median/MAD seed, 5 one-aggregate iterations; integer-exact "
        "cents + 1e-9 weight grid make the oracle hash-exact)",
    ),
}
