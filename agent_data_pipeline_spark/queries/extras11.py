"""Round-4 surface additions, part 6: sequence/interval analytics and
schema-evolution unions.

The interval family (gaps-and-islands streaks, binned overlap joins,
sweep-line concurrency, sliding distinct counts) covers the classic
"time intervals at warehouse scale" patterns: every one of them is
expressed so the shuffle key is the interval's OWN key (user, 7-day bin,
event date) rather than a cross join — the binned overlap join in
particular is the standard cure for Spark's quadratic default on
non-equi range predicates (the bin equi-join bounds candidates; a
"count the pair only in the bin that contains the overlap start" rule
makes it exactly-once without a distinct; and since the query needs
pair COUNTS, both sides pre-aggregate to day-grain counts so the join
input is bounded by the time span, not the row count).

Determinism: every query here is integer-or-grid arithmetic (counts,
day diffs, ratios of exact integers, sums over values already rounded
onto a fixed decimal grid), so the oracle hash compare is knife-edge
free per the core.py rules; the one transcendental kit (haversine)
rounds per-pair distances before any aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import QuerySpec, rnd, t


# --------------------------------------------------------------------------
# streak_islands — gaps-and-islands longest consecutive-day streak
# --------------------------------------------------------------------------


def _streak_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user (gaps-and-islands):
    distinct activity days, island id = day - row_number days (constant
    within a run of consecutive days), then max streak with an
    earliest-start tie-break. The explicit repartition on user_id makes
    ONE shuffle serve the whole chain: hashpartitioning(user_id)
    satisfies the distinct's ClusteredDistribution on (user_id, d) AND
    both windows' requirement, so Catalyst inserts no further Exchange
    before the final presentation sort (asserted in test_plans)."""
    e = t(spark, sf_dir, "events")
    days = (
        e.select("user_id", F.to_date("ts").alias("d"))
        .repartition("user_id")
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.withColumn("grp", F.date_sub(F.col("d"), F.row_number().over(w)))
    streaks = isl.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("streak"), F.min("d").alias("start")
    )
    pick = Window.partitionBy("user_id").orderBy(
        F.col("streak").desc(), F.col("start").asc()
    )
    return (
        streaks.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("streak").alias("best_streak"),
            F.date_format("start", "yyyy-MM-dd").alias("streak_start"),
        )
        .orderBy("user_id")
    )


_STREAK_SQL = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
), isl AS (
  SELECT user_id, d,
         d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d) AS INTEGER)
           AS grp
  FROM days
), streaks AS (
  SELECT user_id, grp,
         CAST(count(*) AS BIGINT) AS streak,
         min(d) AS start
  FROM isl GROUP BY user_id, grp
), pick AS (
  SELECT user_id, streak, start,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY streak DESC, start ASC) AS rn
  FROM streaks
)
SELECT user_id, streak AS best_streak,
       strftime(start, '%Y-%m-%d') AS streak_start
FROM pick WHERE rn = 1
ORDER BY user_id
"""


# --------------------------------------------------------------------------
# interval_overlap_join — bin-blocked non-equi overlap join
# --------------------------------------------------------------------------


def _interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlap join between two interval sets (urgent-order weeks vs
    low-priority-order weeks, each [orderdate, +7d)) WITHOUT the
    quadratic theta join Spark would otherwise plan: each interval is
    exploded into the 7-day epoch bins it covers (≤2 for a 7-day
    interval), the join is an equi-join on the bin, the true overlap
    predicate runs as a residual filter, and a pair is counted only in
    the bin containing its overlap start — exactly-once with no
    distinct. Because the result is aggregate pair counts, each side is
    first collapsed to per-START-DAY counts, so the bin join processes
    distinct-day rows (time-span-bounded) instead of order rows, and
    every day-pair contributes cnt_a·cnt_b pairs — at 10x data the join
    input is UNCHANGED and only the integer products grow (measured in
    SCALING.md). Per-year overlap-pair counts and total overlap days;
    all integer arithmetic. The oracle is the plain theta join over raw
    intervals, which proves the binned day-grain plan counts exactly
    the same pair set."""
    o = t(spark, sf_dir, "orders")

    def day_counts(prio: str, side: str) -> DataFrame:
        d = F.to_date("o_orderdate")
        dnum = F.datediff(d, F.lit("1970-01-01"))
        return (
            o.filter(F.col("o_orderpriority") == prio)
            .groupBy(dnum.alias(f"dn_{side}"))
            .agg(F.count(F.lit(1)).alias(f"cnt_{side}"))
            .withColumn(
                "bin",
                F.explode(
                    F.sequence(
                        F.floor(F.col(f"dn_{side}") / 7),
                        F.floor((F.col(f"dn_{side}") + 6) / 7),
                    )
                ),
            )
        )

    a = day_counts("1-URGENT", "a")
    b = day_counts("5-LOW", "b")
    start = F.greatest(F.col("dn_a"), F.col("dn_b"))
    day_pairs = (
        a.join(b, "bin")
        .filter(F.abs(F.col("dn_a") - F.col("dn_b")) < 7)
        .filter(F.col("bin") == F.floor(start / 7))
    )
    n_pairs = F.col("cnt_a") * F.col("cnt_b")
    return (
        day_pairs.select(
            F.year(F.date_add(F.lit("1970-01-01"), start.cast("int")))
            .cast("long")
            .alias("y"),
            n_pairs.alias("np"),
            (
                (F.lit(7) - F.abs(F.col("dn_a") - F.col("dn_b"))) * n_pairs
            ).alias("od"),
        )
        .groupBy("y")
        .agg(
            F.sum("np").cast("bigint").alias("n_pairs"),
            F.sum("od").cast("bigint").alias("overlap_days"),
        )
        .orderBy("y")
    )


_INTERVAL_OVERLAP_SQL = """
WITH a AS (
  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS s FROM orders
  WHERE o_orderpriority = '1-URGENT'
), b AS (
  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS s FROM orders
  WHERE o_orderpriority = '5-LOW'
), p AS (
  SELECT year(greatest(a.s, b.s)) AS y,
         7 - abs(datediff('day', b.s, a.s)) AS od
  FROM a JOIN b ON abs(datediff('day', b.s, a.s)) < 7
)
SELECT y, CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(od) AS BIGINT) AS overlap_days
FROM p GROUP BY y ORDER BY y
"""


# --------------------------------------------------------------------------
# event_transitions — Markov transition matrix over per-user sequences
# --------------------------------------------------------------------------


def _event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clickstream transition matrix: for each user's event sequence
    (ordered by ts with the unique event_id as tie-break), count
    from-type → next-type transitions and the per-from-type transition
    probability. One shuffle for the lead window, one for the count;
    the probability is a single IEEE division of two exact integers, so
    it is bit-identical across engines at any rounding."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counts = nxt.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = Window.partitionBy("from_type")
    return (
        counts.withColumn(
            "p", rnd(F.col("n") / F.sum("n").over(tot), 6)
        )
        .orderBy("from_type", "to_type")
    )


_EVENT_TRANSITIONS_SQL = """
WITH seq AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_type
  FROM events
), counts AS (
  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE to_type IS NOT NULL
  GROUP BY from_type, to_type
)
SELECT from_type, to_type, n,
       floor(n / sum(n) OVER (PARTITION BY from_type) * 1000000 + 0.5)
         / 1000000 AS p
FROM counts
ORDER BY from_type, to_type
"""


# --------------------------------------------------------------------------
# quantile_bins — equal-frequency discretization (decile binning)
# --------------------------------------------------------------------------


def _quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency decile binning of order totals (feature
    discretization) with EXACT ntile(10) semantics — equal counts,
    remainder to the early bins, (price, unique key) total order — but
    WITHOUT the single-partition fact sort ntile plans (round-8 rework;
    the op carried a measured ~5x ratio at 10x for rounds as the
    documented small-table variant). The 9 decile boundary ROWS are
    order statistics r_i = i·(n div 10) + min(i, n mod 10), located by
    the bucket-histogram + refine pattern ($100 cents buckets, a
    bucket-grain cumulative window, per-boundary rank of ONE bucket's
    rows); the 9 (cents, orderkey) boundary pairs — a bounded_collect
    of exactly 9 rows — then assign bins in a single map-side
    lexicographic comparison pass, and one hash agg finishes. Exact
    equal-frequency binning at any scale: the only windows run on the
    bucket grain (~#distinct-$100-values rows) and inside located
    buckets. Assumes n ≥ 10 (any driver fixture). Sum stays over
    2-decimal money values on the same rounding grid as the oracle —
    no float knife-edge; cents = floor(p·100+0.5) orders identically
    to p for 2-decimal money."""
    o = t(spark, sf_dir, "orders")
    u = o.select(
        "o_totalprice",
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    tot = u.agg(F.count(F.lit(1)).alias("n_tot"))
    ranks = (
        spark.range(1, 10)
        .select(F.col("id").alias("i"))
        .crossJoin(F.broadcast(tot))
        .select(
            "i",
            (
                F.col("i") * F.floor(F.col("n_tot") / 10).cast("long")
                + F.least(F.col("i"), F.col("n_tot") % 10)
            ).alias("r"),
        )
    )
    bucketed = u.withColumn("b", F.floor(F.col("cents") / 10000).cast("long"))
    bagg = bucketed.groupBy("b").agg(F.count(F.lit(1)).alias("cnt"))
    wb = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    bcum = bagg.withColumn(
        "cum_before", F.coalesce(F.sum("cnt").over(wb), F.lit(0))
    )
    located = ranks.join(
        bcum,
        (F.col("cum_before") < F.col("r"))
        & (F.col("r") <= F.col("cum_before") + F.col("cnt")),
    ).select("i", "r", "b", "cum_before")
    cand = bucketed.join(F.broadcast(located), "b")
    w_in = Window.partitionBy("i").orderBy("cents", "o_orderkey")
    bval = (
        cand.withColumn("rk", F.row_number().over(w_in))
        .filter(F.col("rk") == F.col("r") - F.col("cum_before"))
        .select("i", "cents", "o_orderkey")
    )
    from .core import bounded_collect

    bounds = sorted(
        (int(r["cents"]), int(r["o_orderkey"]))
        for r in bounded_collect(bval, 9, "exactly one row per decile boundary")
    )
    bin_expr = F.lit(1)
    for bc, bk in bounds:
        after = (F.col("cents") > bc) | (
            (F.col("cents") == bc) & (F.col("o_orderkey") > bk)
        )
        bin_expr = bin_expr + after.cast("long")
    return (
        u.withColumn("bin", bin_expr.cast("long"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
            rnd(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .orderBy("bin")
    )


_QUANTILE_BINS_SQL = """
WITH binned AS (
  SELECT ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bin,
         o_totalprice
  FROM orders
)
SELECT bin, CAST(count(*) AS BIGINT) AS n,
       min(o_totalprice) AS lo,
       max(o_totalprice) AS hi,
       floor(sum(o_totalprice) * 100 + 0.5) / 100 AS sum_price
FROM binned GROUP BY bin ORDER BY bin
"""


# --------------------------------------------------------------------------
# concurrency_peaks — sweep-line max concurrent intervals
# --------------------------------------------------------------------------


def _concurrency_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per year over order intervals [orderdate, +7d):
    the sweep-line classic — emit +1/-1 boundary events, COLLAPSE ties
    by summing deltas per day first (removing any same-timestamp
    ordering ambiguity), then a running sum ordered by day gives the
    concurrent-interval count, and a per-year max finishes. Half-open
    intervals mean an interval ending on day d never overlaps one
    starting on day d. All integers. Window-free since round 12
    (allowlist burn-down): the collapsed boundary table is calendar-
    bounded (~2·|days| rows — <1k per year regardless of input
    size), so the running sum and per-year max run driver-side over
    the collected boundaries; exact integer arithmetic, values
    unchanged."""
    o = t(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    starts = o.select(d.alias("day"), F.lit(1).alias("delta"))
    ends = o.select(F.date_add(d, 7).alias("day"), F.lit(-1).alias("delta"))
    net = (
        starts.unionByName(ends)
        .groupBy("day")
        .agg(F.sum("delta").alias("net"))
    )
    from ..fns import bounded_collect

    rows = sorted(
        (r["day"], int(r["net"]))
        for r in bounded_collect(
            net, 50_000, "calendar boundary grain (~2 rows per day)"
        )
    )
    conc = 0
    peaks: dict[int, int] = {}
    for day, delta in rows:
        conc += delta
        y = day.year
        if y not in peaks or conc > peaks[y]:
            peaks[y] = conc
    return spark.createDataFrame(
        sorted(peaks.items()), "y LONG, peak_concurrency BIGINT"
    )


_CONCURRENCY_SQL = """
WITH ev AS (
  SELECT CAST(o_orderdate AS DATE) AS day, 1 AS delta FROM orders
  UNION ALL
  SELECT CAST(o_orderdate AS DATE) + 7 AS day, -1 AS delta FROM orders
), net AS (
  SELECT day, sum(delta) AS net FROM ev GROUP BY day
), running AS (
  SELECT day, sum(net) OVER (ORDER BY day
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS conc
  FROM net
)
SELECT year(day) AS y, CAST(max(conc) AS BIGINT) AS peak_concurrency
FROM running GROUP BY year(day) ORDER BY y
"""


# --------------------------------------------------------------------------
# union_by_name_kit — schema-evolution union across heterogenous sources
# --------------------------------------------------------------------------


def _union_by_name_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: two differently-shaped revenue feeds
    (orders carry no quantity column, lineitems do) combined with
    unionByName(allowMissingColumns=True) — the position-independent,
    null-filling union a long-lived ingest pipeline needs when one
    source grows a column. Aggregates per source prove the null fill:
    sums over 2-decimal money / integral quantities, rounded on-grid."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    feed_a = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("amount"),
        F.lit("orders").alias("src"),
    )
    feed_b = li.select(
        F.col("l_orderkey").alias("k"),
        F.col("l_extendedprice").alias("amount"),
        F.col("l_quantity").alias("qty"),
        F.lit("lineitem").alias("src"),
    )
    u = feed_a.unionByName(feed_b, allowMissingColumns=True)
    return (
        u.groupBy("src")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("qty").alias("n_with_qty"),
            rnd(F.sum("amount"), 2).alias("sum_amount"),
            rnd(F.coalesce(F.sum("qty"), F.lit(0.0)), 2).alias("sum_qty"),
        )
        .orderBy("src")
    )


_UNION_BY_NAME_SQL = """
WITH u AS (
  SELECT o_orderkey AS k, o_totalprice AS amount, 'orders' AS src
  FROM orders
  UNION ALL BY NAME
  SELECT l_orderkey AS k, l_extendedprice AS amount, l_quantity AS qty,
         'lineitem' AS src
  FROM lineitem
)
SELECT src, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(qty) AS BIGINT) AS n_with_qty,
       floor(sum(amount) * 100 + 0.5) / 100 AS sum_amount,
       floor(coalesce(sum(qty), 0.0) * 100 + 0.5) / 100 AS sum_qty
FROM u GROUP BY src ORDER BY src
"""


# --------------------------------------------------------------------------
# haversine_kit — geospatial distance scalar over synthetic coordinates
# --------------------------------------------------------------------------


def _haversine_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Great-circle (haversine) distances between same-nation supplier
    pairs, over coordinates synthesized deterministically from keys by
    modular arithmetic (the fixtures carry no geo columns; the POINT is
    the scalar surface + the nation-blocked self-join shape, which is
    how a geo pair join avoids the global cross product). Per-pair
    distances are rounded to 3 decimals BEFORE aggregation (trig libm
    differs in the last ulp across engines) and the per-nation sum then
    sits on the same 1e-3 grid — knife-edge free. Identical operation
    order is spelled out in both engines."""
    s = t(spark, sf_dir, "supplier")
    k = F.col("s_suppkey")
    base = s.select(
        k.alias("k"),
        F.col("s_nationkey").alias("nk"),
        (((k * 7919) % 18000) / 100.0 - 90.0).alias("lat"),
        (((k * 104729) % 36000) / 100.0 - 180.0).alias("lon"),
    )
    a = base.select(
        F.col("k").alias("k1"),
        F.col("nk").alias("nk"),
        F.col("lat").alias("lat1"),
        F.col("lon").alias("lon1"),
    )
    b = base.select(
        F.col("k").alias("k2"),
        F.col("nk").alias("nk2"),
        F.col("lat").alias("lat2"),
        F.col("lon").alias("lon2"),
    )
    pairs = a.join(b, (F.col("nk") == F.col("nk2")) & (F.col("k1") < F.col("k2")))
    rlat1 = F.radians("lat1")
    rlat2 = F.radians("lat2")
    dlat2 = F.radians(F.col("lat2") - F.col("lat1")) / 2
    dlon2 = F.radians(F.col("lon2") - F.col("lon1")) / 2
    h = (
        F.sin(dlat2) * F.sin(dlat2)
        + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon2) * F.sin(dlon2)
    )
    dist = rnd(F.asin(F.sqrt(h)) * 12742.0, 3)
    return (
        pairs.select(F.col("nk").alias("nationkey"), dist.alias("km"))
        .groupBy("nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min("km").alias("min_km"),
            F.max("km").alias("max_km"),
            rnd(F.sum("km"), 3).alias("sum_km"),
        )
        .orderBy("nationkey")
    )


_HAVERSINE_SQL = """
WITH c AS (
  SELECT s_suppkey AS k, s_nationkey AS nk,
         ((s_suppkey * 7919) % 18000) / 100.0 - 90.0 AS lat,
         ((s_suppkey * 104729) % 36000) / 100.0 - 180.0 AS lon
  FROM supplier
), pairs AS (
  SELECT a.nk AS nationkey,
         floor(asin(sqrt(
             sin(radians(b.lat - a.lat) / 2) * sin(radians(b.lat - a.lat) / 2)
             + cos(radians(a.lat)) * cos(radians(b.lat))
               * sin(radians(b.lon - a.lon) / 2)
               * sin(radians(b.lon - a.lon) / 2)
           )) * 12742.0 * 1000 + 0.5) / 1000 AS km
  FROM c a JOIN c b ON a.nk = b.nk AND a.k < b.k
)
SELECT nationkey, CAST(count(*) AS BIGINT) AS n_pairs,
       min(km) AS min_km, max(km) AS max_km,
       floor(sum(km) * 1000 + 0.5) / 1000 AS sum_km
FROM pairs GROUP BY nationkey ORDER BY nationkey
"""


# --------------------------------------------------------------------------
# rolling_7d_users — sliding-window exact distinct via bounded fan-out
# --------------------------------------------------------------------------


def _rolling_7d_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per observed day — the
    dashboard staple that naive SQL makes quadratic (a self-join of
    every day against a week of rows). The distributed form: reduce to
    distinct (day, user) pairs, explode each pair to the ≤7 target days
    it can influence (bounded fan-out, shuffle carries day+user only),
    semi-join back to observed days, then count distinct per target
    day. Work is O(7 · |distinct day-user|), independent of raw event
    count after the first distinct."""
    e = t(spark, sf_dir, "events")
    du = e.select(F.to_date("ts").alias("d"), "user_id").distinct()
    days = du.select("d").distinct().withColumnRenamed("d", "td")
    expl = du.select(
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), 6))
        ).alias("td"),
        "user_id",
    )
    return (
        expl.join(days, "td", "semi")
        .groupBy("td")
        .agg(F.count_distinct("user_id").alias("active_users_7d"))
        .select(
            F.date_format("td", "yyyy-MM-dd").alias("day"), "active_users_7d"
        )
        .orderBy("day")
    )


_ROLLING_7D_SQL = """
WITH du AS (
  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
), days AS (
  SELECT DISTINCT d FROM du
)
SELECT strftime(days.d, '%Y-%m-%d') AS day,
       CAST(count(DISTINCT du.user_id) AS BIGINT) AS active_users_7d
FROM days JOIN du ON du.d BETWEEN days.d - 6 AND days.d
GROUP BY days.d
ORDER BY day
"""


QUERIES: dict[str, QuerySpec] = {
    "streak_islands": QuerySpec(
        _streak_islands,
        _STREAK_SQL,
        "gaps-and-islands longest consecutive-day streak per user",
    ),
    "interval_overlap_join": QuerySpec(
        _interval_overlap_join,
        _INTERVAL_OVERLAP_SQL,
        "bin-blocked interval overlap join == theta-join oracle",
    ),
    "event_transitions": QuerySpec(
        _event_transitions,
        _EVENT_TRANSITIONS_SQL,
        "per-user event-type Markov transition matrix",
    ),
    "quantile_bins": QuerySpec(
        _quantile_bins,
        _QUANTILE_BINS_SQL,
        "equal-frequency decile binning (feature discretization)",
    ),
    "concurrency_peaks": QuerySpec(
        _concurrency_peaks,
        _CONCURRENCY_SQL,
        "sweep-line peak concurrent intervals per year",
    ),
    "union_by_name_kit": QuerySpec(
        _union_by_name_kit,
        _UNION_BY_NAME_SQL,
        "schema-evolution union (unionByName allowMissingColumns)",
    ),
    "haversine_kit": QuerySpec(
        _haversine_kit,
        _HAVERSINE_SQL,
        "haversine distances, nation-blocked supplier pair join",
    ),
    "rolling_7d_users": QuerySpec(
        _rolling_7d_users,
        _ROLLING_7D_SQL,
        "trailing-7-day distinct users via bounded explode fan-out",
    ),
}
