"""Round-8 wave: sketch-merge set similarity, audio loudness profiling,
template-prefix censusing, and engagement stickiness.

* ``kmv_source_jaccard`` — pairwise source-vocabulary Jaccard via
  MERGED KMV (bottom-k) sketches: each source's sketch is its k = 16
  smallest md5-derived word hashes; for every source pair the union
  cardinality is estimated from the merged sketch's k-th order
  statistic ((k−1)/U_(k)), the intersection by inclusion–exclusion,
  and the estimate is calibrated against the EXACT Jaccard computed
  from the same distinct-word sets — the sketch-merge path a 100 TB
  curation pipeline uses to cheaply rank source-pair overlap before
  paying for exact dedup. Hashes are md5 slices (bit-identical in both
  engines), so the whole estimator — not just the exact contrast — is
  hash-checked by the oracle. Scale shape: the only fact-scale work is
  the distinct (source, word) projection (vocabulary-bounded, the same
  two-phase hash agg every dedup op pays); sketches are k rows per
  source, pair frames are |sources|²·k rows — value-grain throughout.
* ``wav_block_loudness`` — per-block loudness profile over a REAL
  PCM16 WAV decode (llmdata/multimodal.synthesize_block_wavs /
  audio_block_loudness): 256-sample blocks, vectorized per-block RMS,
  summarized as min/max/mean RMS, dynamic range (dB) and peak level
  (dBFS). The blocked square-wave fixture makes every output a pure
  arithmetic function of the id (per-block RMS is EXACTLY the block
  amplitude; ≥ 4 distinct amplitudes per media so the dynamic range is
  never degenerate), so the SQL oracle hash-checks a real decode +
  blocking + RMS pipeline end to end — the loudness sibling of
  ``wav_spectral_peak``. Payload-local, zero shuffle.
* ``prefix_dup_census`` — template-prefix duplication census per
  source: distinct leading-8-char prefixes vs docs, duplicate-prefix
  rate, and the share of the most common prefix — the first-cut
  detector for template-heavy / boilerplate-heavy sources (a source
  whose docs all start identically is usually a scraper artifact).
  Prefix length 8 chosen by fixture probe: 34% of sf0.01 docs share
  their 8-char prefix (substr(1,16) would give ~5% — too sparse to
  exercise the census; the degenerate-fixture-labels lesson).
* ``dau_wau_stickiness`` — daily-active / trailing-7-day-active user
  ratio (the classic DAU/WAU engagement number) per day: distinct
  (user, day) pairs once, then a constant-7× explode of each user-day
  to the window anchor days it serves — equi-join/equi-agg only, no
  window over fact rows and deliberately NOT a day-spine range join
  (that plans as BroadcastNestedLoopJoin); interval arithmetic keeps
  the comparison TZ-safe for the events fixture. The user-day grain is
  bounded (≤ a few thousand rows at any SF);
  dates are emitted as ISO strings (driver contract: never DATE).

Reference parity: no sketch/audio/census surface in the reference
(SURVEY.md §2.A); declared north-star §2.B additions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .core import QuerySpec, rnd, t

_K = 16  # bottom-k sketch size; sf0.01 per-source vocab is 31 > k
_PFX = 8


def _kmv_source_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select("source", "text")
    words = (
        d.select(
            "source",
            F.explode(F.split(F.lower("text"), " ")).alias("word"),
        )
        .filter(F.col("word") != "")
        .distinct()
    )
    hashed = words.select(
        "source",
        F.conv(F.substring(F.md5("word"), 1, 8), 16, 10)
        .cast("long")
        .alias("h"),
    ).distinct()
    sk = hashed.withColumn(
        "rk", F.row_number().over(W.partitionBy("source").orderBy("h"))
    ).filter(F.col("rk") <= _K)
    est = sk.filter(F.col("rk") == _K).select(
        "source",
        ((_K - 1) / (F.col("h").cast("double") / F.lit(float(1 << 32)))).alias(
            "est"
        ),
    )
    pairs = (
        est.select(F.col("source").alias("src_a"), F.col("est").alias("est_a"))
        .crossJoin(
            est.select(
                F.col("source").alias("src_b"), F.col("est").alias("est_b")
            )
        )
        .filter(F.col("src_a") < F.col("src_b"))
    )
    # merged bottom-k: k-th smallest DISTINCT hash of the two sketches
    sk_a = sk.select(F.col("source").alias("src_a"), "h")
    sk_b = sk.select(F.col("source").alias("src_b"), "h")
    merged = (
        pairs.select("src_a", "src_b")
        .join(sk_a, "src_a")
        .unionByName(pairs.select("src_a", "src_b").join(sk_b, "src_b"))
        .distinct()
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("src_a", "src_b").orderBy("h")
            ),
        )
        .filter(F.col("rk") == _K)
        .select(
            "src_a",
            "src_b",
            (
                (_K - 1) / (F.col("h").cast("double") / F.lit(float(1 << 32)))
            ).alias("est_union"),
        )
    )
    # exact Jaccard from the same distinct word sets (vocab-bounded)
    nsrc = words.groupBy("source").agg(F.count(F.lit(1)).alias("nw"))
    inter = (
        words.select(F.col("source").alias("src_a"), "word")
        .join(
            words.select(F.col("source").alias("src_b"), "word"), "word"
        )
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    exact = (
        inter.join(
            nsrc.select(F.col("source").alias("src_a"), F.col("nw").alias("na")),
            "src_a",
        )
        .join(
            nsrc.select(F.col("source").alias("src_b"), F.col("nw").alias("nb")),
            "src_b",
        )
        .select(
            "src_a",
            "src_b",
            (
                F.col("n_inter")
                / (F.col("na") + F.col("nb") - F.col("n_inter"))
            ).alias("jaccard_exact"),
        )
    )
    out = (
        pairs.join(merged, ["src_a", "src_b"])
        .join(exact, ["src_a", "src_b"])
        .select(
            "src_a",
            "src_b",
            rnd(
                F.greatest(
                    F.lit(0.0),
                    (F.col("est_a") + F.col("est_b") - F.col("est_union"))
                    / F.col("est_union"),
                ),
                6,
            ).alias("jaccard_kmv"),
            rnd("jaccard_exact", 6).alias("jaccard_exact"),
        )
    )
    return out.select(
        "src_a",
        "src_b",
        "jaccard_kmv",
        "jaccard_exact",
        rnd(F.abs(F.col("jaccard_kmv") - F.col("jaccard_exact")), 6).alias(
            "abs_err"
        ),
    ).orderBy("src_a", "src_b")


_KMV_JACCARD_SQL = f"""
WITH words AS (
  SELECT DISTINCT source, word
  FROM (
    SELECT source, unnest(string_split(lower(text), ' ')) AS word
    FROM documents
  ) WHERE word <> ''
), hashed AS (
  SELECT DISTINCT source,
         CAST(('0x' || substring(md5(word), 1, 8)) AS BIGINT) AS h
  FROM words
), sk AS (
  SELECT source, h,
         row_number() OVER (PARTITION BY source ORDER BY h) AS rk
  FROM hashed
  QUALIFY rk <= {_K}
), est AS (
  SELECT source,
         ({_K} - 1) / (CAST(h AS DOUBLE) / {float(1 << 32)}) AS est
  FROM sk WHERE rk = {_K}
), pairs AS (
  SELECT a.source AS src_a, b.source AS src_b,
         a.est AS est_a, b.est AS est_b
  FROM est a JOIN est b ON a.source < b.source
), merged_rows AS (
  SELECT DISTINCT p.src_a, p.src_b, s.h
  FROM pairs p JOIN sk s ON s.source = p.src_a OR s.source = p.src_b
), merged AS (
  SELECT src_a, src_b,
         ({_K} - 1) / (CAST(h AS DOUBLE) / {float(1 << 32)}) AS est_union
  FROM (
    SELECT src_a, src_b, h,
           row_number() OVER (PARTITION BY src_a, src_b ORDER BY h) AS rk
    FROM merged_rows
  ) WHERE rk = {_K}
), nsrc AS (
  SELECT source, count(*) AS nw FROM words GROUP BY 1
), inter AS (
  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_inter
  FROM words a JOIN words b ON a.word = b.word AND a.source < b.source
  GROUP BY 1, 2
), exact AS (
  SELECT i.src_a, i.src_b,
         CAST(i.n_inter AS DOUBLE) / (na.nw + nb.nw - i.n_inter)
           AS jaccard_exact
  FROM inter i
  JOIN nsrc na ON na.source = i.src_a
  JOIN nsrc nb ON nb.source = i.src_b
), scored AS (
  SELECT p.src_a, p.src_b,
         floor(greatest(0.0,
             (p.est_a + p.est_b - m.est_union) / m.est_union
           ) * 1000000 + 0.5) / 1000000 AS jaccard_kmv,
         floor(e.jaccard_exact * 1000000 + 0.5) / 1000000 AS jaccard_exact
  FROM pairs p
  JOIN merged m ON m.src_a = p.src_a AND m.src_b = p.src_b
  JOIN exact e ON e.src_a = p.src_a AND e.src_b = p.src_b
)
SELECT src_a, src_b, jaccard_kmv, jaccard_exact,
       floor(abs(jaccard_kmv - jaccard_exact) * 1000000 + 0.5) / 1000000
         AS abs_err
FROM scored
ORDER BY src_a, src_b
"""


def _wav_block_loudness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmdata import multimodal

    d = t(spark, sf_dir, "documents")
    media = multimodal.synthesize_block_wavs(d, "doc_id")
    feats = multimodal.audio_block_loudness(media)
    return feats.select(
        F.col("media_id").alias("doc_id"),
        "n_blocks",
        rnd("rms_min", 6).alias("rms_min"),
        rnd("rms_max", 6).alias("rms_max"),
        rnd("rms_mean", 6).alias("rms_mean"),
        rnd("dyn_range_db", 6).alias("dyn_range_db"),
        rnd("peak_dbfs", 6).alias("peak_dbfs"),
        "decode_status",
    ).orderBy("doc_id")


_LOUDNESS_SQL = """
WITH blocks AS (
  SELECT doc_id, 4 + doc_id % 4 AS nb,
         1000 + 500 * ((doc_id + b) % 5) AS amp
  FROM (
    SELECT doc_id,
           unnest(generate_series(0, CAST(3 + doc_id % 4 AS BIGINT))) AS b
    FROM documents
  )
), agg AS (
  SELECT doc_id, CAST(nb AS INT) AS n_blocks,
         CAST(min(amp) AS DOUBLE) AS rmin,
         CAST(max(amp) AS DOUBLE) AS rmax,
         sum(CAST(amp AS DOUBLE)) / nb AS rmean
  FROM blocks GROUP BY doc_id, nb
)
SELECT doc_id, n_blocks,
       floor(rmin * 1000000 + 0.5) / 1000000 AS rms_min,
       floor(rmax * 1000000 + 0.5) / 1000000 AS rms_max,
       floor(rmean * 1000000 + 0.5) / 1000000 AS rms_mean,
       floor(20.0 * log10(rmax / rmin) * 1000000 + 0.5) / 1000000
         AS dyn_range_db,
       floor(20.0 * log10(rmax / 32768.0) * 1000000 + 0.5) / 1000000
         AS peak_dbfs,
       'ok' AS decode_status
FROM agg
ORDER BY doc_id
"""


def _prefix_dup_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "source", F.substring("text", 1, _PFX).alias("pfx")
    )
    per_pfx = d.groupBy("source", "pfx").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        per_pfx.groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_prefixes"),
            F.max("c").cast("long").alias("top_prefix_docs"),
        )
        .select(
            "source",
            "n_docs",
            "n_prefixes",
            rnd(
                F.lit(1.0) - F.col("n_prefixes") / F.col("n_docs"), 6
            ).alias("dup_rate"),
            rnd(F.col("top_prefix_docs") / F.col("n_docs"), 6).alias(
                "top_share"
            ),
        )
        .orderBy("source")
    )


_PREFIX_SQL = f"""
WITH per_pfx AS (
  SELECT source, substr(text, 1, {_PFX}) AS pfx, count(*) AS c
  FROM documents GROUP BY 1, 2
)
SELECT source,
       CAST(sum(c) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_prefixes,
       floor((1.0 - CAST(count(*) AS DOUBLE) / sum(c)) * 1000000 + 0.5)
         / 1000000 AS dup_rate,
       floor((CAST(max(c) AS DOUBLE) / sum(c)) * 1000000 + 0.5)
         / 1000000 AS top_share
FROM per_pfx GROUP BY 1
ORDER BY source
"""


def _dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Trailing-window membership by EXPLODE, not by range join: each
    # (user, day) contributes to exactly the 7 window anchor days
    # day..day+6, a constant fanout that keeps the whole query
    # equi-join/equi-agg (a day-spine range join plans as a
    # BroadcastNestedLoopJoin — |spine|·|user-days| comparisons).
    # Anchor days with no activity of their own (day > last active
    # day) drop out in the inner join with the DAU grain.
    uday = (
        t(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    dau = uday.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("dau")
    )
    wau = (
        uday.select(
            "user_id",
            F.explode(
                F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
            ).alias("d"),
        )
        .groupBy("d")
        .agg(F.count_distinct("user_id").cast("long").alias("wau"))
    )
    return (
        dau.join(wau, dau["day"] == wau["d"])
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            rnd(F.col("dau") / F.col("wau"), 6).alias("stickiness"),
        )
        .orderBy("day")
    )


_DAU_WAU_SQL = """
WITH uday AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), dau AS (
  SELECT day, CAST(count(*) AS BIGINT) AS dau FROM uday GROUP BY 1
), wau AS (
  SELECT d, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
  FROM (
    SELECT user_id,
           CAST(unnest(generate_series(day, day + INTERVAL 6 DAY,
                                       INTERVAL 1 DAY)) AS DATE) AS d
    FROM uday
  )
  GROUP BY 1
)
SELECT strftime(a.day, '%Y-%m-%d') AS day, a.dau, w.wau,
       floor(CAST(a.dau AS DOUBLE) / w.wau * 1000000 + 0.5) / 1000000
         AS stickiness
FROM dau a JOIN wau w ON w.d = a.day
ORDER BY day
"""


QUERIES: dict[str, QuerySpec] = {
    "kmv_source_jaccard": QuerySpec(
        _kmv_source_jaccard,
        _KMV_JACCARD_SQL,
        "Pairwise source-vocabulary Jaccard from MERGED bottom-k KMV "
        "sketches (md5 hashes, k-th order statistic, inclusion-"
        "exclusion) calibrated against the exact Jaccard",
    ),
    "wav_block_loudness": QuerySpec(
        _wav_block_loudness,
        _LOUDNESS_SQL,
        "Real PCM16 decode -> 256-sample block RMS profile: min/max/"
        "mean RMS, dynamic range dB, peak dBFS vs the exact arithmetic "
        "oracle (blocked square-wave fixture)",
    ),
    "prefix_dup_census": QuerySpec(
        _prefix_dup_census,
        _PREFIX_SQL,
        "Template-prefix duplication census per source: distinct "
        "8-char prefixes, dup rate, top-prefix share",
    ),
    "dau_wau_stickiness": QuerySpec(
        _dau_wau_stickiness,
        _DAU_WAU_SQL,
        "DAU / trailing-7-day WAU engagement ratio per day via a "
        "constant-7x explode of the distinct user-day grain to its "
        "window anchor days (equi-join only, no range join)",
    ),
}
