"""Round-4 surface additions, part 3: product-analytics and
time-series-operations operators.

The reference's events pipeline ends at windowed aggregates
(`dags/events_stream_dag.py` analogs in queries/temporal.py); the four
analytics ops here — funnels, retention cohorts, time-weighted
averages, counter deltas — are the standard questions asked OF that
events table, expressed as compositions the engine already optimizes
(windows + joins + aggregations, no UDFs anywhere). Plus: key-skew
diagnostics (the measurement step before ops/skew mitigations) and
tokenizer-vocabulary encoding audit (llmdata).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fns import epoch_micros, rnd
from ..llmdata import textstats
from ..ops import skew, timeseries
from .core import QuerySpec, t


# --------------------------------------------------------------------------
# funnel_conversion
# --------------------------------------------------------------------------


def _funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view -> click -> purchase: a user converts a step
    only with an event STRICTLY AFTER their entry into the previous
    step (min-timestamp semantics, the standard product-analytics
    funnel). One row: per-step user counts + mean minutes from first
    view to converting purchase. Three min-aggregations chained by
    equi-joins on user_id — no window over the whole event log, no
    per-user UDF."""
    e = t(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"), F.first("t1").alias("t1"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"), F.first("t1").alias("t1"))
    )
    mins = (epoch_micros(F.col("t3")) - epoch_micros(F.col("t1"))) / F.lit(6e7)
    return (
        v.agg(F.count(F.lit(1)).alias("step1_view_users"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("step2_click_users")))
        .crossJoin(
            p.agg(
                F.count(F.lit(1)).alias("step3_purchase_users"),
                rnd(F.avg(mins), 4).alias("avg_minutes_to_convert"),
            )
        )
    )


_FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(e.ts) AS t2, min(v.t1) AS t1
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t1
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(e.ts) AS t3, min(c.t1) AS t1
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t2
  GROUP BY e.user_id
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM v) AS step1_view_users,
       (SELECT CAST(count(*) AS BIGINT) FROM c) AS step2_click_users,
       (SELECT CAST(count(*) AS BIGINT) FROM p) AS step3_purchase_users,
       (SELECT floor(avg((epoch_us(t3) - epoch_us(t1)) / 6e7) * 10000 + 0.5)
               / 10000 FROM p) AS avg_minutes_to_convert
"""


# --------------------------------------------------------------------------
# retention_cohorts
# --------------------------------------------------------------------------


def _retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by the ISO week of their
    first event; for each (cohort week, weeks-since-cohort) cell, how
    many distinct cohort members were active. Week arithmetic is pure
    date arithmetic (date_trunc to Monday + day-diff / 7) — no epoch
    math, so session-TZ-immune. Two shuffles: first-event per user,
    then the cohort-cell distinct count."""
    e = t(spark, sf_dir, "events")
    first = e.groupBy("user_id").agg(F.min("ts").alias("fts"))
    joined = e.join(first, "user_id").select(
        "user_id",
        F.date_trunc("week", F.col("fts")).alias("cw"),
        F.date_trunc("week", F.col("ts")).alias("ww"),
    )
    return (
        joined.groupBy(
            F.date_format("cw", "yyyy-MM-dd").alias("cohort_week"),
            F.floor(F.datediff(F.col("ww"), F.col("cw")) / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count_distinct(F.col("user_id")).alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )


_RETENTION_SQL = """
WITH first AS (
  SELECT user_id, min(ts) AS fts FROM events GROUP BY user_id
), cells AS (
  SELECT e.user_id,
         date_trunc('week', f.fts) AS cw,
         date_trunc('week', e.ts) AS ww
  FROM events e JOIN first f ON e.user_id = f.user_id
)
SELECT strftime(cw, '%Y-%m-%d') AS cohort_week,
       CAST(floor(date_diff('day', cw, ww) / 7) AS BIGINT) AS week_offset,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
FROM cells
GROUP BY 1, 2
ORDER BY cohort_week, week_offset
"""


# --------------------------------------------------------------------------
# time_weighted_avg
# --------------------------------------------------------------------------


def _time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average of the value gauge
    (ops/timeseries.time_weighted_avg — TimescaleDB time_weight LOCF
    semantics): each reading weighted by how long it was current.
    Oracle replays the identical lead-window algebra with
    microsecond-exact integer durations on both sides."""
    e = t(spark, sf_dir, "events")
    out = timeseries.time_weighted_avg(e, ["user_id"], "ts", "value")
    return out.select(
        "user_id", "n_obs", rnd(F.col("twap"), 6).alias("twap")
    ).orderBy("user_id")


_TWAP_SQL = """
WITH d AS (
  SELECT user_id, value,
         CAST(epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts))
              - epoch_us(ts) AS DOUBLE) AS dt
  FROM events
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_obs,
       floor(sum(value * dt) / sum(dt) * 1000000 + 0.5) / 1000000 AS twap
FROM d
GROUP BY user_id
ORDER BY user_id
"""


# --------------------------------------------------------------------------
# counter_deltas
# --------------------------------------------------------------------------


def _counter_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counter-reset-aware delta aggregation (ops/timeseries
    .counter_deltas — PromQL increase semantics) over a synthetic
    per-user monotonic-with-wraparound counter (event ordinal mod 50,
    the shape of an uptime or request counter from a periodically
    restarting service): a drop means restart, so the increase across
    it is the new reading. Integer-only algebra — bit-exact across
    engines."""
    from pyspark.sql import Window as W

    e = t(spark, sf_dir, "events")
    wo = W.partitionBy("user_id").orderBy("ts", "event_id")
    counter = (F.row_number().over(wo) % 50).cast("long")
    src = e.select("user_id", "ts", "event_id", counter.alias("c"))
    out = timeseries.counter_deltas(
        src, ["user_id"], "ts", "c", order_tiebreak=["event_id"]
    )
    return out.select(
        "user_id", "n_obs", "n_resets", "total_increase"
    ).orderBy("user_id")


_COUNTER_DELTAS_SQL = """
WITH src AS (
  SELECT user_id, ts, event_id,
         CAST(row_number() OVER w % 50 AS BIGINT) AS c
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), lagged AS (
  SELECT user_id, c,
         lag(c) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p
  FROM src
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_obs,
       CAST(count(*) FILTER (p IS NOT NULL AND c < p) AS BIGINT) AS n_resets,
       CAST(sum(CASE WHEN p IS NULL THEN NULL
                     WHEN c >= p THEN c - p ELSE c END) AS BIGINT)
         AS total_increase
FROM lagged
GROUP BY user_id
ORDER BY user_id
"""


# --------------------------------------------------------------------------
# mad_outliers
# --------------------------------------------------------------------------


def _mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier census per event type: median/MAD (the
    breakdown-resistant location/scale pair) and the count of points
    whose modified z-score 0.6745·|x−med|/MAD exceeds 3.5 — the
    Iglewicz-Hoaglin rule. Two percentile aggregations chained by a
    broadcast join of the per-type stats back onto the rows; no
    windows, no UDFs."""
    e = t(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med"),
        F.count(F.lit(1)).alias("n"),
    )
    with_med = e.join(F.broadcast(med), "event_type")
    mad = with_med.groupBy("event_type").agg(
        F.expr("percentile(abs(value - med), 0.5)").alias("mad")
    )
    flagged = with_med.join(F.broadcast(mad), "event_type")
    return (
        flagged.groupBy("event_type")
        .agg(
            F.first("n").alias("n"),
            rnd(F.first("med"), 6).alias("med"),
            rnd(F.first("mad"), 6).alias("mad"),
            F.count_if(
                F.abs(F.col("value") - F.col("med")) * 0.6745
                > F.col("mad") * 3.5
            ).alias("n_outliers"),
        )
        .orderBy("event_type")
    )


_MAD_OUTLIERS_SQL = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type
), mad AS (
  SELECT e.event_type, quantile_cont(abs(e.value - m.med), 0.5) AS mad
  FROM events e JOIN med m ON e.event_type = m.event_type
  GROUP BY e.event_type
)
SELECT e.event_type,
       min(m.n) AS n,
       floor(min(m.med) * 1000000 + 0.5) / 1000000 AS med,
       floor(min(d.mad) * 1000000 + 0.5) / 1000000 AS mad,
       CAST(count(*) FILTER (abs(e.value - m.med) * 0.6745 > d.mad * 3.5)
            AS BIGINT) AS n_outliers
FROM events e
JOIN med m ON e.event_type = m.event_type
JOIN mad d ON e.event_type = d.event_type
GROUP BY e.event_type
ORDER BY e.event_type
"""


# --------------------------------------------------------------------------
# skew_report
# --------------------------------------------------------------------------


def _skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-distribution diagnostics (ops/skew.skew_report) for
    lineitem's supplier key — the measurement that decides whether a
    join on this key needs salting/AQE skew handling. One row:
    group count, min/max/percentile group sizes, hottest key."""
    li = t(spark, sf_dir, "lineitem")
    out = skew.skew_report(li, ["l_suppkey"])
    return out.select(
        "n_groups",
        "max_size",
        "min_size",
        rnd(F.col("p50_size"), 4).alias("p50_size"),
        rnd(F.col("p99_size"), 4).alias("p99_size"),
        "hottest_key",
    )


_SKEW_REPORT_SQL = """
WITH sizes AS (
  SELECT CAST(l_suppkey AS VARCHAR) AS k, CAST(count(*) AS BIGINT) AS n
  FROM lineitem GROUP BY l_suppkey
)
SELECT CAST(count(*) AS BIGINT) AS n_groups,
       max(n) AS max_size,
       min(n) AS min_size,
       floor(quantile_cont(n, 0.5) * 10000 + 0.5) / 10000 AS p50_size,
       floor(quantile_cont(n, 0.99) * 10000 + 0.5) / 10000 AS p99_size,
       (SELECT k FROM sizes ORDER BY n DESC, k LIMIT 1) AS hottest_key
FROM sizes
"""


# --------------------------------------------------------------------------
# vocab_encode_stats
# --------------------------------------------------------------------------


def _vocab_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary encoding audit (llmdata/textstats
    .vocab_encode_stats): top-20 corpus vocabulary (deterministic
    count-desc/word tie-break), ids by rank, every document re-encoded
    — per doc the token/OOV counts and the id-sum checksum, which
    forces both engines to agree on the id of every token."""
    d = t(spark, sf_dir, "documents")
    out = textstats.vocab_encode_stats(d, "doc_id", "text", vocab_size=20)
    return out.select(
        "doc_id",
        "n_tokens",
        "n_oov",
        "id_checksum",
    ).orderBy("doc_id")


_VOCAB_ENCODE_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
  FROM documents
), vocab AS (
  SELECT w, CAST(row_number() OVER (ORDER BY cnt DESC, w) AS BIGINT) AS tok_id
  FROM (SELECT w, count(*) AS cnt FROM toks GROUP BY w
        ORDER BY cnt DESC, w LIMIT 20)
)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(*) FILTER (v.tok_id IS NULL) AS BIGINT) AS n_oov,
       CAST(coalesce(sum(v.tok_id), 0) AS BIGINT) AS id_checksum
FROM toks t LEFT JOIN vocab v ON t.w = v.w
GROUP BY t.doc_id
ORDER BY t.doc_id
"""


QUERIES: dict[str, QuerySpec] = {
    "funnel_conversion": QuerySpec(
        _funnel_conversion,
        _FUNNEL_SQL,
        "ordered 3-step funnel with strict-after conversion semantics",
    ),
    "retention_cohorts": QuerySpec(
        _retention_cohorts,
        _RETENTION_SQL,
        "weekly retention cohort matrix, date-arithmetic-only",
    ),
    "time_weighted_avg": QuerySpec(
        _time_weighted_avg,
        _TWAP_SQL,
        "per-key time-weighted average (LOCF weights)",
    ),
    "counter_deltas": QuerySpec(
        _counter_deltas,
        _COUNTER_DELTAS_SQL,
        "counter-reset-aware increase aggregation (PromQL increase)",
    ),
    "mad_outliers": QuerySpec(
        _mad_outliers,
        _MAD_OUTLIERS_SQL,
        "median/MAD robust outlier census per event type",
    ),
    "skew_report": QuerySpec(
        _skew_report,
        _SKEW_REPORT_SQL,
        "join-key skew diagnostics: group-size distribution + hottest key",
    ),
    "vocab_encode_stats": QuerySpec(
        _vocab_encode_stats,
        _VOCAB_ENCODE_SQL,
        "top-V vocabulary encoding audit with id-sum checksum",
    ),
}
