"""Round-4 surface additions, part 10: warehouse integrity and record
linkage.

`sequence_gaps` finds the missing ranges in a key sequence (the
"did the extract drop a chunk?" audit — run against a feed with
chunks deliberately withheld, since the fixture's keys are contiguous
and a vacuously-empty audit proves nothing); `orphan_audit` counts
referential-integrity violations per foreign-key edge (one edge is
deliberately broken by withholding dimension rows, so the audit proves
it detects as well as passes); `fuzzy_part_match` is blocked
record-linkage — Levenshtein pairs inside first-token blocks, the
standard blocking-key design that keeps the candidate set linear in
block sizes instead of quadratic in the corpus; `weighted_percentile_kit`
computes exact weighted quantiles via integer cumulative-weight
thresholds; `corr_matrix` is the pairwise Pearson matrix in long form;
`date_spine_fill` generates a calendar spine and zero-fills the months a
group never traded in (the gap-visible rollup every BI layer needs).

Determinism: gap bounds, orphan counts, block pairs, and weighted
quantile picks are all integer decisions; only Pearson correlations are
float (rounded at 6, like the covar/regr kit).

Scale notes (100 TB): sequence_gaps lags within fixed-width key-range
buckets (parallel windows, each bounded by the bucket width) and
stitches boundary-straddling gaps from the per-bucket (min,max)
aggregate — no global single-partition sort ever touches the key scan;
the orphan audit is six
anti-joins, each broadcastable on its dim side; fuzzy blocking bounds
the self-join by block cardinality (at larger corpora, widen the block
key — the docstring documents first-token as the demo operating point);
weighted percentiles use one window per group; the spine is
dimension × months, never fact-scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import QuerySpec, bounded_collect, rnd, t


# --------------------------------------------------------------------------
# sequence_gaps — missing ranges in a key sequence
# --------------------------------------------------------------------------


def gap_ranges(
    keys: DataFrame,
    key_col: str,
    bucket_width: int = 8192,
    super_width: int = 8192,
) -> DataFrame:
    """All missing ranges (gap_start, gap_end, gap_len) in an integer
    key sequence, with NO unpartitioned window anywhere (round-10
    burn-down of the last sequence_gaps allowlist flags).

    Three-level decomposition — the single-level version's boundary
    stitch was a lag over ALL non-empty buckets (keyspace/8192 rows in
    one sort partition: dimension-scale but still a serialization
    point at a 1e10 keyspace). Lifted one level:

      1. in-bucket gaps: lag partitioned by ``bucket = key div
         bucket_width`` — parallel, window input ≤ bucket_width rows;
      2. cross-bucket gaps within a super-bucket: lag over the
         per-bucket (min,max) span rows partitioned by ``super =
         bucket div super_width`` — parallel, ≤ super_width rows per
         window;
      3. cross-SUPER-bucket gaps: per-super spans collapse to
         keyspan/(bucket_width·super_width) rows (≤ ~225 at a 1.5e10
         keyspace — genuinely driver-bounded, enforced by
         bounded_collect against a 1-row keyspan probe), stitched in a
         Python loop and unioned back as a literal frame.

    Whole missing buckets/super-buckets simply have no span row and
    fall out of the stitch arithmetic exactly as before; the union of
    the three levels is the global lag() gap set (same argument as the
    two-level proof, applied once more). Integer-only throughout."""
    from ..fns import bounded_collect

    key = F.col(key_col)
    o = (
        keys.select(key_col)
        .distinct()
        .withColumn("bucket", (key / bucket_width).cast("long"))
        .withColumn("super", (F.col("bucket") / super_width).cast("long"))
    )
    w_in = Window.partitionBy("bucket").orderBy(key_col)
    inner = (
        o.withColumn("prev_k", F.lag(key_col).over(w_in))
        .filter(key - F.col("prev_k") > 1)
        .select(key, F.col("prev_k"))
    )
    spans = o.groupBy("super", "bucket").agg(
        F.min(key_col).alias("min_k"), F.max(key_col).alias("max_k")
    )
    w_b = Window.partitionBy("super").orderBy("bucket")
    mid = (
        spans.withColumn("prev_max", F.lag("max_k").over(w_b))
        .filter(F.col("min_k") - F.col("prev_max") > 1)
        .select(
            F.col("min_k").alias(key_col), F.col("prev_max").alias("prev_k")
        )
    )
    # level-3 side job: the per-super spans are keyspan/(bw·sw) rows —
    # probe the actual keyspan for the bound, then stitch driver-side
    spark = keys.sparkSession
    probe = bounded_collect(
        o.agg(F.min(key_col).alias("lo"), F.max(key_col).alias("hi")),
        1,
        "1-row keyspan probe",
    )
    lo, hi = probe[0].lo, probe[0].hi
    cross_rows: list[tuple[int, int]] = []
    if lo is not None:
        n_super_bound = (hi - lo) // (bucket_width * super_width) + 2
        sspans = bounded_collect(
            spans.groupBy("super").agg(
                F.min("min_k").alias("smin"), F.max("max_k").alias("smax")
            ),
            n_super_bound,
            f"per-super spans ≤ keyspan/(bw·sw)+2 = {n_super_bound}",
        )
        sspans.sort(key=lambda r: r.super)
        for prev, nxt in zip(sspans, sspans[1:]):
            if nxt.smin - prev.smax > 1:
                cross_rows.append((int(nxt.smin), int(prev.smax)))
    cross = spark.createDataFrame(
        cross_rows, f"{key_col} long, prev_k long"
    )
    return inner.unionByName(mid).unionByName(cross).select(
        (F.col("prev_k") + 1).alias("gap_start"),
        (key - 1).alias("gap_end"),
        (key - F.col("prev_k") - 1).alias("gap_len"),
    )


def _sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing ranges in the order-key sequence via ``gap_ranges`` —
    the three-level bucket decomposition (in-bucket lag, per-super
    bucket-span lag, driver-stitched super spans; see its docstring)
    with NO unpartitioned window (round-10 burn-down; the single-level
    version's bucket-grain boundary lag was the last allowlist flag).
    Emits the 10 longest gaps (length desc, start asc tie-break) with
    the global totals (n_gaps, missing_keys) carried on each row so
    the audit is one result set. Integer-only. The fixture's key space
    is contiguous, so the feed simulates dropped extract chunks (keys
    ≡ 7,8,9 mod 1000 withheld) — the audit must find exactly those
    ranges. Level boundaries are exercised with tiny widths in
    tests/test_extras63_burndown.py."""
    o = (
        t(spark, sf_dir, "orders")
        .select("o_orderkey")
        .filter(~(F.col("o_orderkey") % 1000).isin(7, 8, 9))
    )
    gaps = gap_ranges(o, "o_orderkey")
    tot = gaps.agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("gap_len").alias("missing_keys"),
    )
    return (
        gaps.crossJoin(F.broadcast(tot))
        .orderBy(F.col("gap_len").desc(), F.col("gap_start"))
        .limit(10)
        .orderBy(F.col("gap_len").desc(), F.col("gap_start"))
    )


_SEQUENCE_GAPS_SQL = """
WITH ks AS (
  SELECT DISTINCT o_orderkey FROM orders
  WHERE o_orderkey % 1000 NOT IN (7, 8, 9)
), gaps AS (
  SELECT prev_k + 1 AS gap_start, o_orderkey - 1 AS gap_end,
         o_orderkey - prev_k - 1 AS gap_len
  FROM (SELECT o_orderkey,
               lag(o_orderkey) OVER (ORDER BY o_orderkey) AS prev_k
        FROM ks)
  WHERE o_orderkey - prev_k > 1
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_gaps,
         CAST(sum(gap_len) AS BIGINT) AS missing_keys
  FROM gaps
)
SELECT gap_start, gap_end, gap_len, n_gaps, missing_keys
FROM gaps CROSS JOIN tot
ORDER BY gap_len DESC, gap_start
LIMIT 10
"""


# --------------------------------------------------------------------------
# orphan_audit — referential integrity per FK edge
# --------------------------------------------------------------------------


def orphan_edges_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DISTRIBUTED half of the orphan audit: the 6 FK-edge anti-join
    counts as one unioned plan (one job). Exposed so the plan test can
    keep pinning the broadcast-anti shape after the round-12 rework
    moved the final 6-row ordering driver-side (the returned query
    frame is a LocalRelation and no longer carries the joins)."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    part_held = t(spark, sf_dir, "part").filter(F.col("p_partkey") % 97 != 0)

    def edge(name, child, ckey, parent, pkey):
        orphans = child.select(F.col(ckey)).join(
            F.broadcast(parent.select(F.col(pkey))),
            F.col(ckey) == F.col(pkey),
            "left_anti",
        )
        return child.agg(
            F.lit(name).alias("edge"),
            F.count(F.lit(1)).alias("n_child"),
        ).crossJoin(
            orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
        )

    edges = [
        edge("lineitem->orders", li, "l_orderkey", o, "o_orderkey"),
        edge("lineitem->part(held)", li, "l_partkey", part_held, "p_partkey"),
        edge("orders->customer", o, "o_custkey", c, "c_custkey"),
        edge("customer->nation", c, "c_nationkey", n, "n_nationkey"),
        edge("supplier->nation", s, "s_nationkey", n, "n_nationkey"),
        edge("nation->region", n, "n_regionkey", r, "r_regionkey"),
    ]
    out = edges[0]
    for e in edges[1:]:
        out = out.unionAll(e)
    return out


def _orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: for each foreign-key edge, count
    child rows whose parent key is absent (anti-join). One edge
    (lineitem→part) runs against a dimension with every 97th key
    withheld, so the audit demonstrably detects orphans rather than
    vacuously passing. Every parent side is dim-scale (broadcast); the
    child side is scanned once per edge with only its key column.

    Window/sort-free since round 12 (allowlist burn-down): the edge
    census is STRUCTURALLY 6 rows (one per FK edge — a code constant,
    not a data bound), so the final ordering happens driver-side over
    the collected union instead of planning a global Sort; the
    distributed work (orphan_edges_frame: 6 anti-join counts in one
    unioned plan, one job — plan shape pinned in tests/test_plans.py)
    is unchanged."""
    out = orphan_edges_frame(spark, sf_dir)
    rows = sorted(
        bounded_collect(out, 6, "one row per audited FK edge"),
        key=lambda r: r["edge"],
    )
    return spark.createDataFrame(
        [(r["edge"], int(r["n_child"]), int(r["n_orphans"])) for r in rows],
        "edge STRING, n_child BIGINT, n_orphans BIGINT",
    )


_ORPHAN_SQL = """
SELECT 'lineitem->orders' AS edge,
       CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_child,
       CAST((SELECT count(*) FROM lineitem l WHERE NOT EXISTS
             (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
            AS BIGINT) AS n_orphans
UNION ALL
SELECT 'lineitem->part(held)',
       CAST((SELECT count(*) FROM lineitem) AS BIGINT),
       CAST((SELECT count(*) FROM lineitem l WHERE NOT EXISTS
             (SELECT 1 FROM part p WHERE p.p_partkey % 97 != 0
              AND p.p_partkey = l.l_partkey)) AS BIGINT)
UNION ALL
SELECT 'orders->customer',
       CAST((SELECT count(*) FROM orders) AS BIGINT),
       CAST((SELECT count(*) FROM orders o WHERE NOT EXISTS
             (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
            AS BIGINT)
UNION ALL
SELECT 'customer->nation',
       CAST((SELECT count(*) FROM customer) AS BIGINT),
       CAST((SELECT count(*) FROM customer c WHERE NOT EXISTS
             (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
            AS BIGINT)
UNION ALL
SELECT 'supplier->nation',
       CAST((SELECT count(*) FROM supplier) AS BIGINT),
       CAST((SELECT count(*) FROM supplier s WHERE NOT EXISTS
             (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey))
            AS BIGINT)
UNION ALL
SELECT 'nation->region',
       CAST((SELECT count(*) FROM nation) AS BIGINT),
       CAST((SELECT count(*) FROM nation n WHERE NOT EXISTS
             (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey))
            AS BIGINT)
ORDER BY edge
"""


# --------------------------------------------------------------------------
# fuzzy_part_match — blocked Levenshtein record linkage
# --------------------------------------------------------------------------


def blocked_name_candidates(names: DataFrame) -> DataFrame:
    """Candidate pairs of DISTINCT names under dual-key blocking.

    `names` must carry (p_name, m) — distinct name + multiplicity.
    Two blocking keys are unioned: the FIRST name token and the LAST
    name token; a pair is a candidate if it shares either key, and
    candidates matched by both keys are deduplicated. A single-key
    (first-token) block can never pair records whose edit changed the
    first token (QUALITY_r05 measured that recall at literally 0.0);
    the last-token key recovers those at the cost of one more
    block-bounded self-join — candidates stay Σ(block²) per key, never
    corpus², so the composition holds at 100 TB. Returns columns
    (name_a, name_b, m_a, m_b) with name_a < name_b."""
    keyed = names.select(
        "p_name",
        "m",
        F.split(F.col("p_name"), " ")[0].alias("blk1"),
        F.element_at(F.split(F.col("p_name"), " "), -1).alias("blk2"),
    )
    a, b = keyed.alias("a"), keyed.alias("b")

    def _join_on(key: str) -> DataFrame:
        return (
            a.join(b, F.col(f"a.{key}") == F.col(f"b.{key}"))
            .filter(F.col("a.p_name") < F.col("b.p_name"))
            .select(
                F.col("a.p_name").alias("name_a"),
                F.col("b.p_name").alias("name_b"),
                F.col("a.m").alias("m_a"),
                F.col("b.m").alias("m_b"),
            )
        )

    return _join_on("blk1").unionAll(_join_on("blk2")).dropDuplicates(
        ["name_a", "name_b"]
    )


def _fuzzy_part_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy matching over part names: candidate pairs share a
    blocking key (first OR last name token — see
    `blocked_name_candidates`), then exact Levenshtein filters to
    distance ≤ 10; emits the distance histogram. Blocking keeps the
    self-join candidate set Σ(block²) per key instead of corpus² — at
    larger corpora the keys widen (token bigrams / token+size), the
    same knob every record-linkage deployment tunes; the dual-key
    union is the standard fix for edits that break one key.

    Dedup-first candidate generation: the block join runs over DISTINCT
    names with multiplicities, and row-pair counts come back by
    arithmetic (m_a·m_b across names, C(m,2) within a duplicated name
    at distance 0). On a duplicate-heavy corpus the expensive
    Levenshtein join is bounded by distinct-name block sizes — the same
    exact-dedup-first composition the MinHash path uses — while the
    oracle stays the raw pair join, proving the rewrite counts the
    identical pair set. Row-pair identity is (key_a < key_b);
    distances are exact integers."""
    p = t(spark, sf_dir, "part").select("p_name")
    names = p.groupBy("p_name").agg(F.count(F.lit(1)).alias("m"))
    cross_pairs = (
        blocked_name_candidates(names)
        .select(
            F.levenshtein(F.col("name_a"), F.col("name_b"))
            .cast("long")
            .alias("dist"),
            (F.col("m_a") * F.col("m_b")).alias("n"),
        )
        .filter(F.col("dist") <= 10)
    )
    within = names.filter(F.col("m") > 1).select(
        F.lit(0).cast("long").alias("dist"),
        F.expr("(m * (m - 1)) div 2").alias("n"),
    )
    return (
        cross_pairs.unionAll(within)
        .groupBy("dist")
        .agg(F.sum("n").alias("n_pairs"))
        .orderBy("dist")
    )


_FUZZY_SQL = """
WITH p AS (
  SELECT p_partkey, p_name,
         split_part(p_name, ' ', 1) AS blk1,
         string_split(p_name, ' ')[-1] AS blk2
  FROM part
), cand AS (
  SELECT a.p_partkey AS ka, b.p_partkey AS kb, a.p_name AS na, b.p_name AS nb
  FROM p a JOIN p b ON a.blk1 = b.blk1 AND a.p_partkey < b.p_partkey
  UNION
  SELECT a.p_partkey, b.p_partkey, a.p_name, b.p_name
  FROM p a JOIN p b ON a.blk2 = b.blk2 AND a.p_partkey < b.p_partkey
), pairs AS (
  SELECT CAST(levenshtein(na, nb) AS BIGINT) AS dist FROM cand
)
SELECT dist, CAST(count(*) AS BIGINT) AS n_pairs
FROM pairs WHERE dist <= 10
GROUP BY dist ORDER BY dist
"""


# --------------------------------------------------------------------------
# weighted_percentile_kit — exact weighted quantiles
# --------------------------------------------------------------------------


def _weighted_percentile_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted percentiles (p25/p50/p75) of extended price
    weighted by quantity, per return flag: the smallest price whose
    cumulative weight crosses q·W. The crossing test is pure integer
    arithmetic (4·cum ≥ q·4·W), so the pick is exact — no
    interpolation, no float.

    Bucket-then-refine, NOT a fact-scale cumulative window: the return
    flag has only 3 values, so a running-sum window partitioned on it
    serializes the whole fact table into 3 sorted partitions (measured
    4.3× at 10× data — SCALING.md). Instead, (1) aggregate weights into
    $1000 price buckets — windows then run over the tiny bucket
    histogram to locate each quantile's target bucket and the
    cumulative weight before it; (2) re-scan only the rows landing in a
    target bucket (~1/n_buckets of the data) and refine the exact
    crossing price inside it. Both passes are fully parallel; the pick
    is identical because the global cumulative at any price equals
    cum_before(bucket) + within-bucket cumulative."""
    rows = t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("price_cents"),
        F.col("l_quantity").cast("long").alias("w"),
    ).withColumn("bucket", F.expr("price_cents div 100000"))
    bstats = rows.groupBy("l_returnflag", "bucket").agg(
        F.sum("w").alias("bw")
    )
    wcum = Window.partitionBy("l_returnflag").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wtot = Window.partitionBy("l_returnflag")
    bcum = bstats.withColumn("cum", F.sum("bw").over(wcum)).withColumn(
        "totw", F.sum("bw").over(wtot)
    )
    qs = spark.range(1, 4).select(F.col("id").alias("qnum"))
    targets = (
        bcum.crossJoin(F.broadcast(qs))
        .filter(F.col("cum") * 4 >= F.col("qnum") * F.col("totw"))
        .groupBy("l_returnflag", "qnum")
        .agg(
            F.min_by(
                F.struct(
                    F.col("bucket"),
                    (F.col("cum") - F.col("bw")).alias("cum_before"),
                    F.col("totw"),
                ),
                F.col("bucket"),
            ).alias("tgt")
        )
        .select(
            "l_returnflag",
            "qnum",
            F.col("tgt.bucket").alias("bucket"),
            F.col("tgt.cum_before").alias("cum_before"),
            F.col("tgt.totw").alias("totw"),
        )
    )
    refine_rows = rows.join(
        F.broadcast(targets), ["l_returnflag", "bucket"]
    )
    # Within one (flag, qnum) target bucket: collapse to per-price
    # weights, then the cumulative over distinct prices picks the
    # crossing price — identical to a row-level cumulative because all
    # rows at one price cross together.
    per_price = refine_rows.groupBy(
        "l_returnflag", "qnum", "cum_before", "totw", "price_cents"
    ).agg(F.sum("w").alias("pw"))
    win_p = Window.partitionBy("l_returnflag", "qnum").orderBy(
        "price_cents"
    ).rowsBetween(Window.unboundedPreceding, 0)
    picks = (
        per_price.withColumn("cum_in", F.sum("pw").over(win_p))
        .filter(
            (F.col("cum_before") + F.col("cum_in")) * 4
            >= F.col("qnum") * F.col("totw")
        )
        .groupBy("l_returnflag", "qnum")
        .agg(
            F.min("price_cents").alias("pick"),
            F.min("totw").alias("totw"),
        )
    )
    return (
        picks.groupBy("l_returnflag")
        .agg(
            F.min("totw").alias("total_weight"),
            F.min(F.when(F.col("qnum") == 1, F.col("pick"))).alias(
                "wp25_cents"
            ),
            F.min(F.when(F.col("qnum") == 2, F.col("pick"))).alias(
                "wp50_cents"
            ),
            F.min(F.when(F.col("qnum") == 3, F.col("pick"))).alias(
                "wp75_cents"
            ),
        )
        .orderBy("l_returnflag")
    )


_WEIGHTED_PCT_SQL = """
WITH li AS (
  SELECT l_returnflag,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_cents,
         CAST(l_quantity AS BIGINT) AS w, l_orderkey, l_linenumber
  FROM lineitem
), cum AS (
  SELECT l_returnflag, price_cents, w,
         CAST(sum(w) OVER (PARTITION BY l_returnflag
              ORDER BY price_cents, l_orderkey, l_linenumber
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cumw,
         CAST(sum(w) OVER (PARTITION BY l_returnflag) AS BIGINT) AS totw
  FROM li
)
SELECT l_returnflag,
       CAST(sum(w) AS BIGINT) AS total_weight,
       min(CASE WHEN cumw * 4 >= totw * 1 THEN price_cents END) AS wp25_cents,
       min(CASE WHEN cumw * 4 >= totw * 2 THEN price_cents END) AS wp50_cents,
       min(CASE WHEN cumw * 4 >= totw * 3 THEN price_cents END) AS wp75_cents
FROM cum
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# --------------------------------------------------------------------------
# corr_matrix — pairwise Pearson correlations, long form
# --------------------------------------------------------------------------

_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over the lineitem measures,
    long form (one row per ordered pair, upper triangle). All six
    correlations come out of ONE aggregate pass (partial-aggregated
    map-side); rounded at 6 like the covar/regr kit."""
    li = t(spark, sf_dir, "lineitem")
    aggs = []
    for i, x in enumerate(_CORR_COLS):
        for y in _CORR_COLS[i + 1:]:
            aggs.append(rnd(F.corr(x, y), 6).alias(f"{x}__{y}"))
    wide = li.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(c.split("__")[0]).alias("col_x"),
                F.lit(c.split("__")[1]).alias("col_y"),
                F.col(c).alias("pearson_r"),
            )
            for c in wide.columns
        ]
    )
    return (
        wide.select(F.explode(pairs).alias("p"))
        .select("p.col_x", "p.col_y", "p.pearson_r")
        .orderBy("col_x", "col_y")
    )


_CORR_SQL = """
WITH wide AS (
  SELECT
    floor(corr(l_quantity, l_extendedprice) * 1000000 + 0.5) / 1000000 AS a,
    floor(corr(l_quantity, l_discount) * 1000000 + 0.5) / 1000000 AS b,
    floor(corr(l_quantity, l_tax) * 1000000 + 0.5) / 1000000 AS c,
    floor(corr(l_extendedprice, l_discount) * 1000000 + 0.5) / 1000000 AS d,
    floor(corr(l_extendedprice, l_tax) * 1000000 + 0.5) / 1000000 AS e,
    floor(corr(l_discount, l_tax) * 1000000 + 0.5) / 1000000 AS f
  FROM lineitem
)
SELECT col_x, col_y, pearson_r FROM (
  SELECT 'l_quantity' AS col_x, 'l_extendedprice' AS col_y, a AS pearson_r FROM wide
  UNION ALL SELECT 'l_quantity', 'l_discount', b FROM wide
  UNION ALL SELECT 'l_quantity', 'l_tax', c FROM wide
  UNION ALL SELECT 'l_extendedprice', 'l_discount', d FROM wide
  UNION ALL SELECT 'l_extendedprice', 'l_tax', e FROM wide
  UNION ALL SELECT 'l_discount', 'l_tax', f FROM wide
)
ORDER BY col_x, col_y
"""


# --------------------------------------------------------------------------
# date_spine_fill — calendar spine with zero-filled gaps
# --------------------------------------------------------------------------


def _date_spine_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine zero-fill: generate the full month spine between
    the dataset's first and last order month, cross it with the nation
    dimension, and left-join monthly revenue so months a nation never
    traded in appear as explicit zero rows (is_gap = 1). The spine is
    dimension × months — generated with sequence()/explode, never
    fact-scale; revenue is exact cents. Months travel as 'yyyy-MM'
    strings (DATE columns are not driver-safe)."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    monthly = (
        o.join(F.broadcast(c.select("c_custkey", "c_nationkey")),
               o.o_custkey == c.c_custkey)
        .join(F.broadcast(n.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "n_name",
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        )
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            ).alias("rev_cents")
        )
    )
    bounds = o.agg(
        F.date_format(F.min("o_orderdate"), "yyyy-MM-01").alias("lo"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-01").alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence(
                F.to_date("lo"),
                F.to_date("hi"),
                F.expr("interval 1 month"),
            )
        ).alias("m")
    ).select(F.date_format("m", "yyyy-MM").alias("month"))
    grid = n.select("n_name").crossJoin(spine)
    return (
        grid.join(monthly, ["n_name", "month"], "left")
        .select(
            "n_name",
            "month",
            F.coalesce("rev_cents", F.lit(0)).alias("rev_cents"),
            F.when(F.col("rev_cents").isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("is_gap"),
        )
        .orderBy("n_name", "month")
    )


_DATE_SPINE_SQL = """
WITH monthly AS (
  SELECT n.n_name, strftime(o.o_orderdate, '%Y-%m') AS month,
         CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
), bounds AS (
  SELECT date_trunc('month', min(o_orderdate)) AS lo,
         date_trunc('month', max(o_orderdate)) AS hi
  FROM orders
), spine AS (
  SELECT strftime(m, '%Y-%m') AS month
  FROM bounds, LATERAL (
    SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS m
  )
), grid AS (
  SELECT n_name, month FROM nation CROSS JOIN spine
)
SELECT g.n_name, g.month,
       CAST(coalesce(m.rev_cents, 0) AS BIGINT) AS rev_cents,
       CAST(CASE WHEN m.rev_cents IS NULL THEN 1 ELSE 0 END AS BIGINT)
         AS is_gap
FROM grid g
LEFT JOIN monthly m ON g.n_name = m.n_name AND g.month = m.month
ORDER BY g.n_name, g.month
"""


QUERIES: dict[str, QuerySpec] = {
    "sequence_gaps": QuerySpec(
        _sequence_gaps,
        _SEQUENCE_GAPS_SQL,
        "missing key ranges in a sequence (top gaps + totals)",
    ),
    "orphan_audit": QuerySpec(
        _orphan_audit,
        _ORPHAN_SQL,
        "referential-integrity orphan counts per FK edge",
    ),
    "fuzzy_part_match": QuerySpec(
        _fuzzy_part_match,
        _FUZZY_SQL,
        "blocked Levenshtein record linkage (distance histogram)",
    ),
    "weighted_percentile_kit": QuerySpec(
        _weighted_percentile_kit,
        _WEIGHTED_PCT_SQL,
        "exact weighted p25/p50/p75 via integer cumulative weights",
    ),
    "corr_matrix": QuerySpec(
        _corr_matrix,
        _CORR_SQL,
        "pairwise Pearson correlation matrix in one aggregate pass",
    ),
    "date_spine_fill": QuerySpec(
        _date_spine_fill,
        _DATE_SPINE_SQL,
        "calendar month spine with zero-filled group gaps",
    ),
}
