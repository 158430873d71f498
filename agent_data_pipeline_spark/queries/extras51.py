"""Round-7 seventeenth wave: multiple changepoint detection, the
corpus datasheet, and sketch-based join-size estimation.

* ``binseg_changepoints`` — multiple changepoint detection on daily
  revenue by binary segmentation (Scott & Knott 1974; the greedy
  elder of PELT): the fact stream collapses to the calendar-bounded
  day grain distributed, then the recursive split search runs
  driver-side on prefix sums of the collected ≤2,400-point series
  (O(n) per candidate split via the prefix-sum SSE identity; the
  PACF/Holt-Winters bounded-recursion envelope). Splits accepted
  while the SSE reduction exceeds 2% of the parent segment's SSE,
  minimum segment 30 days, at most 5 breaks. Search ⇒ rows-only;
  exact break recovery on a planted piecewise-constant series in
  tests/test_timeseries.py.
* ``corpus_datasheet`` — the one-query dataset card: corpus size,
  composition (language/source concentration), exact-duplicate rate,
  quality-gate pass rate, token and character volume — the ~12
  numbers every "datasheet for datasets" (Gebru et al. 2018) table
  leads with, emitted as a tall (metric, value) table from a handful
  of hash aggregates so ONE query produces the datasheet at any
  corpus scale.
* ``selfjoin_size_cms_estimate`` — join-size / second-frequency-
  moment estimation with a Count-Min sketch (Cormode & Muthukrishnan
  2005; Alon-Matias-Szegedy's F₂ question): the events user-id
  self-join size Σf² is estimated by the CMS inner product
  min_d Σ_w c_d[w]², with d = 3 md5-keyed rows of width 1024 built
  as three hash aggregates — the cardinality-estimation primitive a
  cost-based planner consults before choosing a join strategy. The
  sketch is deterministic (md5), so the DuckDB oracle reproduces it
  bit-identically; the exact Σf² is reported alongside with the
  relative error (CMS inner products overestimate, never under).

Reference parity: no changepoint/datasheet/estimation surface in the
reference (SURVEY.md §2.A); declared north-star §2.B additions.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core import QuerySpec, duck_materialize, bounded_collect, rnd, t

_MIN_SEG = 30
_MAX_BREAKS = 5
_GAIN_FRAC = 0.02


def binseg(ys: list[float], min_seg: int = _MIN_SEG,
           max_breaks: int = _MAX_BREAKS,
           gain_frac: float = _GAIN_FRAC) -> list[tuple[int, float]]:
    """Greedy binary segmentation on a numeric series. Returns
    [(break_index, sse_gain)] in discovery order. A break at index i
    splits [lo, hi) into [lo, i) and [i, hi). Pure function (tested
    against planted series).

    Cross-engine portability contract (round 11): when ``ys`` are
    Python ints (the query passes integer cents), the prefix sums are
    EXACT big-ints, and every SSE is convert-then-divide —
    ``float(s2) - float(s*s)/float(m)`` — the precise op sequence the
    DuckDB oracle executes over HUGEINT prefix sums, so gains and the
    greedy split sequence are bit-identical across engines."""
    n = len(ys)
    pre = [0] * (n + 1)
    pre2 = [0] * (n + 1)
    for i, y in enumerate(ys):
        pre[i + 1] = pre[i] + y
        pre2[i + 1] = pre2[i] + y * y

    def sse(lo: int, hi: int) -> float:
        m = hi - lo
        if m <= 0:
            return 0.0
        s = pre[hi] - pre[lo]
        s2 = pre2[hi] - pre2[lo]
        # convert-then-divide: float(s*s) FIRST (exact int product,
        # one correctly-rounded conversion), then the division —
        # Python's int/int true division is correctly rounded on the
        # EXACT rational, which disagrees with engines that round the
        # operands to double first once s*s exceeds 2^53
        return float(s2) - float(s * s) / float(m)

    breaks: list[tuple[int, float]] = []
    segments = [(0, n)]
    while len(breaks) < max_breaks:
        best = None
        for si, (lo, hi) in enumerate(segments):
            parent = sse(lo, hi)
            if hi - lo < 2 * min_seg or parent <= 0:
                continue
            for i in range(lo + min_seg, hi - min_seg + 1):
                gain = parent - sse(lo, i) - sse(i, hi)
                if best is None or gain > best[0]:
                    best = (gain, i, si, parent)
        if best is None:
            break
        gain, i, si, parent = best
        if gain < gain_frac * parent:
            break
        lo, hi = segments[si]
        segments[si : si + 1] = [(lo, i), (i, hi)]
        breaks.append((i, gain))
    return breaks


def _binseg_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = bounded_collect(
        t(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5))
            .cast("long")
            .alias("cents")
        )
        .orderBy("day"),
        3_000,
        "daily calendar grain (TPC-H order-date span is ~2,406 days)",
    )
    days = [r["day"] for r in rows]
    # integer CENTS series: prefix sums stay exact big-ints, gains are
    # in cents^2 (the /1e10 in the output restores dollars^2 millions)
    ys = [int(r["cents"]) for r in rows]
    n = len(ys)
    if n:
        s_tot = sum(ys)
        s2_tot = sum(y * y for y in ys)
        total_sse = float(s2_tot) - float(s_tot * s_tot) / float(n)
    else:
        total_sse = 0.0
    found = binseg(ys)
    accepted = True
    if not found:
        # no significant break: still report the BEST candidate with
        # its (sub-threshold) gain — "the most likely break is X and
        # it is not significant" is the useful answer on a stationary
        # series, and keeps the fixture output non-degenerate.
        found = binseg(ys, gain_frac=0.0, max_breaks=1)
        accepted = False
    out = [
        (
            rank + 1,
            days[i].isoformat(),
            math.floor(gain / 10000000000.0 * 100 + 0.5) / 100,
            math.floor(gain / total_sse * 1e6 + 0.5) / 1e6
            if total_sse > 0
            else None,
            accepted,
        )
        for rank, (i, gain) in enumerate(found)
    ]
    return spark.createDataFrame(
        out,
        "break_rank INT, day STRING, sse_gain_millions DOUBLE, "
        "gain_frac_of_total DOUBLE, accepted BOOLEAN",
    ).orderBy("break_rank")


def _binseg_sql() -> str:
    """Unrolled greedy binary segmentation in SQL: stage k recomputes
    segments from the boundary set after stage k-1 (lead() over the
    boundaries), scores every admissible split via HUGEINT-exact
    prefix sums, picks the best by (gain DESC, lo, i) — the Python
    first-max iteration order — and accepts iff gain >= frac*parent.
    A rejected stage leaves the boundary set unchanged, so every later
    stage deterministically recomputes and re-rejects the same best:
    the unrolled pipeline is self-terminating exactly like the loop."""

    def sse(plo: str, phi: str, m: str) -> str:
        return (
            f"(CAST({phi}.s2 - {plo}.s2 AS DOUBLE) - "
            f"CAST(({phi}.s - {plo}.s) * ({phi}.s - {plo}.s) AS DOUBLE)"
            f" / CAST({m} AS DOUBLE))"
        )

    parent = sse("plo", "phi", "s.hi - s.lo")
    sse_l = sse("plo", "pi", "pi.k - s.lo")
    sse_r = sse("pi", "phi", "s.hi - pi.k")
    stages = ""
    for k in range(1, _MAX_BREAKS + 1):
        stages += f""", segs{k} AS (
  SELECT lo, hi FROM (
    SELECT b AS lo, lead(b) OVER (ORDER BY b) AS hi FROM bnd{k - 1}
  ) WHERE hi IS NOT NULL
), cand{k} AS (
  SELECT s.lo AS lo, s.hi AS hi, pi.k AS i,
         {parent} AS parent,
         (({parent} - {sse_l}) - {sse_r}) AS gain
  FROM segs{k} s
  JOIN pre plo ON plo.k = s.lo
  JOIN pre phi ON phi.k = s.hi
  JOIN pre pi ON pi.k >= s.lo + {_MIN_SEG} AND pi.k <= s.hi - {_MIN_SEG}
  WHERE s.hi - s.lo >= {2 * _MIN_SEG} AND {parent} > 0
), acc{k} AS (
  SELECT lo, hi, i, parent, gain, gain >= {_GAIN_FRAC!r} * parent AS ok
  FROM cand{k} ORDER BY gain DESC, lo, i LIMIT 1
), bnd{k} AS (
  SELECT b FROM bnd{k - 1}
  UNION ALL SELECT i FROM acc{k} WHERE ok
)"""
    found = "\n  UNION ALL ".join(
        f"SELECT {k} AS break_rank, i, gain, TRUE AS accepted "
        f"FROM acc{k} WHERE ok"
        for k in range(1, _MAX_BREAKS + 1)
    )
    return f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY 1
), ys AS (
  SELECT CAST(day AS VARCHAR) AS day_s,
         CAST(row_number() OVER (ORDER BY day) - 1 AS BIGINT) AS i,
         cents
  FROM daily
), nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM ys
), pre AS (
  SELECT CAST(0 AS BIGINT) AS k, CAST(0 AS HUGEINT) AS s,
         CAST(0 AS HUGEINT) AS s2
  UNION ALL
  SELECT i + 1,
         sum(CAST(cents AS HUGEINT)) OVER (ORDER BY i),
         sum(CAST(cents AS HUGEINT) * cents) OVER (ORDER BY i)
  FROM ys
), tot AS (
  SELECT CAST(p.s2 AS DOUBLE)
           - CAST(p.s * p.s AS DOUBLE) / CAST(nn.n AS DOUBLE) AS total
  FROM pre p CROSS JOIN nn WHERE p.k = nn.n
), bnd0 AS (
  SELECT CAST(0 AS BIGINT) AS b UNION ALL SELECT n FROM nn
){stages}, found AS (
  {found}
  UNION ALL SELECT 1, i, gain, FALSE FROM acc1
  -- gain >= 0 mirrors the Python fallback: binseg(gain_frac=0.0) still
  -- rejects a negative best gain, so a near-stationary series must
  -- yield 0 rows on BOTH engines (ADVICE r11)
  WHERE NOT ok AND gain >= 0
)
SELECT CAST(f.break_rank AS INT) AS break_rank,
       y.day_s AS day,
       floor(f.gain / 10000000000.0 * 100 + 0.5) / 100
         AS sse_gain_millions,
       CASE WHEN tot.total > 0
            THEN floor(f.gain / tot.total * 1000000 + 0.5) / 1000000
       END AS gain_frac_of_total,
       f.accepted AS accepted
FROM found f JOIN ys y ON y.i = f.i CROSS JOIN tot
ORDER BY break_rank
"""


_BINSEG_SQL = _binseg_sql()


# --------------------------------------------------------------------------
# corpus_datasheet
# --------------------------------------------------------------------------

def _corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("double")
    base = d.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.count_distinct(F.col("source")).cast("double").alias("n_sources"),
        F.count_distinct(F.col("lang")).cast("double").alias("n_langs"),
        F.count_distinct(F.md5("text")).cast("double").alias("n_distinct"),
        F.sum(F.col("n_chars").cast("double")).alias("total_chars"),
        F.avg(F.col("n_chars").cast("double")).alias("mean_chars"),
        F.sum(toks).alias("total_tokens"),
        F.avg((F.col("n_chars") >= 300).cast("double")).alias("quality_rate"),
        F.avg((F.col("lang") == "en").cast("double")).alias("en_share"),
    )
    topsrc = (
        d.groupBy("source")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .agg(F.max("c").alias("max_src"))
    )
    j = base.crossJoin(F.broadcast(topsrc))
    metrics = [
        ("n_docs", F.col("n_docs")),
        ("n_sources", F.col("n_sources")),
        ("n_langs", F.col("n_langs")),
        ("exact_dup_rate", 1 - F.col("n_distinct") / F.col("n_docs")),
        ("total_chars", F.col("total_chars")),
        ("mean_chars", F.col("mean_chars")),
        ("total_ws_tokens", F.col("total_tokens")),
        ("quality_rate_ge300", F.col("quality_rate")),
        ("en_share", F.col("en_share")),
        ("top_source_share", F.col("max_src") / F.col("n_docs")),
    ]
    stacked = j.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("metric"),
                        rnd(col, 6).alias("value"),
                    )
                    for name, col in metrics
                ]
            )
        ).alias("kv")
    )
    return stacked.select("kv.metric", "kv.value").orderBy("metric")


_DATASHEET_SQL = """
WITH base AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         CAST(count(DISTINCT source) AS DOUBLE) AS n_sources,
         CAST(count(DISTINCT lang) AS DOUBLE) AS n_langs,
         CAST(count(DISTINCT md5(text)) AS DOUBLE) AS n_distinct,
         sum(CAST(n_chars AS DOUBLE)) AS total_chars,
         avg(CAST(n_chars AS DOUBLE)) AS mean_chars,
         sum(CAST(len(regexp_split_to_array(trim(text), '\\s+'))
                  AS DOUBLE)) AS total_tokens,
         avg(CASE WHEN n_chars >= 300 THEN 1.0 ELSE 0.0 END)
           AS quality_rate,
         avg(CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END) AS en_share
  FROM documents
), topsrc AS (
  SELECT max(c) AS max_src FROM (
    SELECT CAST(count(*) AS DOUBLE) AS c FROM documents GROUP BY source
  )
), m AS (
  SELECT * FROM base CROSS JOIN topsrc
)
SELECT metric, floor(value * 1000000 + 0.5) / 1000000 AS value FROM (
  SELECT 'n_docs' AS metric, n_docs AS value FROM m
  UNION ALL SELECT 'n_sources', n_sources FROM m
  UNION ALL SELECT 'n_langs', n_langs FROM m
  UNION ALL SELECT 'exact_dup_rate', 1 - n_distinct / n_docs FROM m
  UNION ALL SELECT 'total_chars', total_chars FROM m
  UNION ALL SELECT 'mean_chars', mean_chars FROM m
  UNION ALL SELECT 'total_ws_tokens', total_tokens FROM m
  UNION ALL SELECT 'quality_rate_ge300', quality_rate FROM m
  UNION ALL SELECT 'en_share', en_share FROM m
  UNION ALL SELECT 'top_source_share', max_src / n_docs FROM m
)
ORDER BY metric
"""


# --------------------------------------------------------------------------
# selfjoin_size_cms_estimate
# --------------------------------------------------------------------------

_CMS_D = 3
_CMS_W = 1024


def _selfjoin_size_cms_estimate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = t(spark, sf_dir, "events").select("user_id")
    depths = spark.range(_CMS_D).select(
        F.col("id").cast("int").alias("d")
    )
    hashed = ev.crossJoin(F.broadcast(depths)).select(
        "d",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("|", F.col("d"), F.col("user_id"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % _CMS_W
        ).alias("w"),
    )
    counters = hashed.groupBy("d", "w").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    per_d = counters.groupBy("d").agg(
        F.sum(F.col("c") * F.col("c")).alias("est")
    )
    est = per_d.agg(F.min("est").alias("cms_est"))
    exact = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("double").alias("f"))
        .agg(F.sum(F.col("f") * F.col("f")).alias("f2"))
    )
    return est.crossJoin(F.broadcast(exact)).select(
        F.col("f2").cast("long").alias("exact_f2"),
        F.col("cms_est").cast("long").alias("cms_estimate"),
        rnd((F.col("cms_est") - F.col("f2")) / F.col("f2"), 6).alias(
            "overestimate_frac"
        ),
    )


_CMS_F2_SQL = f"""
WITH depths AS (
  SELECT unnest([0, 1, 2]) AS d
), hashed AS (
  SELECT dd.d,
         CAST(('0x' || substring(md5(CAST(dd.d AS VARCHAR) || '|' ||
              CAST(e.user_id AS VARCHAR)), 1, 8)) AS BIGINT)
           % {_CMS_W} AS w
  FROM events e CROSS JOIN depths dd
), counters AS (
  SELECT d, w, CAST(count(*) AS DOUBLE) AS c FROM hashed GROUP BY 1, 2
), per_d AS (
  SELECT d, sum(c * c) AS est FROM counters GROUP BY 1
), est AS (
  SELECT min(est) AS cms_est FROM per_d
), exact AS (
  SELECT sum(f * f) AS f2 FROM (
    SELECT CAST(count(*) AS DOUBLE) AS f FROM events GROUP BY user_id
  )
)
SELECT CAST(x.f2 AS BIGINT) AS exact_f2,
       CAST(e.cms_est AS BIGINT) AS cms_estimate,
       floor((e.cms_est - x.f2) / x.f2 * 1000000 + 0.5) / 1000000
         AS overestimate_frac
FROM est e CROSS JOIN exact x
"""


QUERIES: dict[str, QuerySpec] = {
    "binseg_changepoints": QuerySpec(
        _binseg_changepoints,
        duck_materialize(_BINSEG_SQL),
        "Multiple changepoints on daily revenue by binary segmentation "
        "(prefix-sum SSE, bounded driver-side search, <=5 breaks; "
        "HUGEINT-exact prefix sums make the unrolled oracle hash-exact)",
    ),
    "corpus_datasheet": QuerySpec(
        _corpus_datasheet,
        _DATASHEET_SQL,
        "One-query dataset card: size, composition, dup rate, quality "
        "rate, token volume as a tall (metric, value) table",
    ),
    "selfjoin_size_cms_estimate": QuerySpec(
        _selfjoin_size_cms_estimate,
        _CMS_F2_SQL,
        "Self-join size / F2 estimation via Count-Min inner product "
        "(d=3, w=1024, md5-keyed) vs the exact sum of squared counts",
    ),
}
