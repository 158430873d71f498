"""Round-7 twenty-fourth wave: image channel statistics and network
rollups.

* ``bmp_channel_stats`` — per-image channel statistics over a REAL
  BMP decode (llmdata/multimodal.synthesize_gradient_images /
  image_channel_stats): the gradient construction makes every output
  a pure arithmetic function of the id — R mean = base + (w−1)/2 +
  7(h−1)/2, min/max exact, G mean = 255 − R mean, B constant, and
  because all w·h red values are distinct, R entropy = ln(w·h)
  exactly — so the SQL oracle hash-checks a real decode + histogram
  + entropy pipeline end to end (the image sibling of
  ``wav_spectral_peak``). Payload-local, zero shuffle.
* ``ip_subnet_rollup`` — network-log rollup surface: deterministic
  md5-derived IPv4s inside 10.0.0.0/8 (second octet ∈ {0..3}, third
  ∈ {0..31}), aggregated per /16 with distinct-/24 and distinct-host
  counts and the top-/24 concentration share — the standard
  first-cut abuse/traffic-shape query, all integer-and-string
  arithmetic identical in both engines.

Reference parity: no image-statistics/network surface in the
reference (SURVEY.md §2.A); declared north-star §2.B additions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core import QuerySpec, rnd, t


def _bmp_channel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmdata import multimodal

    d = t(spark, sf_dir, "documents")
    media = multimodal.synthesize_gradient_images(d, "doc_id")
    feats = multimodal.image_channel_stats(media)
    return feats.select(
        F.col("media_id").alias("doc_id"),
        "width",
        "height",
        rnd("r_mean", 6).alias("r_mean"),
        "r_min",
        "r_max",
        rnd("g_mean", 6).alias("g_mean"),
        rnd("b_mean", 6).alias("b_mean"),
        rnd("r_entropy_nats", 6).alias("r_entropy_nats"),
        "decode_status",
    ).orderBy("doc_id")


_BMP_STATS_SQL = """
WITH p AS (
  SELECT doc_id,
         4 + doc_id % 4 AS w,
         4 + doc_id % 5 AS h,
         doc_id % 192 AS base
  FROM documents
)
SELECT doc_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       floor((base + (w - 1) / 2.0 + 7 * (h - 1) / 2.0)
             * 1000000 + 0.5) / 1000000 AS r_mean,
       CAST(base AS BIGINT) AS r_min,
       CAST(base + (w - 1) + 7 * (h - 1) AS BIGINT) AS r_max,
       floor((255 - (base + (w - 1) / 2.0 + 7 * (h - 1) / 2.0))
             * 1000000 + 0.5) / 1000000 AS g_mean,
       floor(CAST(base AS DOUBLE) * 1000000 + 0.5) / 1000000 AS b_mean,
       floor(ln(CAST(w * h AS DOUBLE)) * 1000000 + 0.5) / 1000000
         AS r_entropy_nats,
       'ok' AS decode_status
FROM p
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# ip_subnet_rollup
# --------------------------------------------------------------------------

def _ip_subnet_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select("event_id")
    h = F.conv(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    ips = ev.select(
        (h % 4).alias("o2"),
        ((h / 4).cast("long") % 32).alias("o3"),
        ((h / 128).cast("long") % 256).alias("o4"),
    )
    per16 = ips.groupBy("o2").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.count_distinct(F.col("o3")).cast("long").alias("n_slash24"),
        F.count_distinct(F.col("o3") * 256 + F.col("o4"))
        .cast("long")
        .alias("n_hosts"),
    )
    top24 = (
        ips.groupBy("o2", "o3")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .groupBy("o2")
        .agg(F.max("c").alias("max24"))
    )
    return (
        per16.join(top24, "o2")
        .select(
            F.concat(
                F.lit("10."), F.col("o2").cast("string"), F.lit(".0.0/16")
            ).alias("subnet16"),
            "n_events",
            "n_slash24",
            "n_hosts",
            rnd(F.col("max24") / F.col("n_events"), 6).alias(
                "top24_share"
            ),
        )
        .orderBy("subnet16")
    )


_IP_SQL = """
WITH ips AS (
  SELECT h % 4 AS o2, (h // 4) % 32 AS o3, (h // 128) % 256 AS o4
  FROM (
    SELECT CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8))
                AS BIGINT) AS h
    FROM events
  )
), per16 AS (
  SELECT o2, CAST(count(*) AS BIGINT) AS n_events,
         CAST(count(DISTINCT o3) AS BIGINT) AS n_slash24,
         CAST(count(DISTINCT o3 * 256 + o4) AS BIGINT) AS n_hosts
  FROM ips GROUP BY 1
), top24 AS (
  SELECT o2, max(c) AS max24 FROM (
    SELECT o2, o3, CAST(count(*) AS DOUBLE) AS c FROM ips GROUP BY 1, 2
  ) GROUP BY 1
)
SELECT '10.' || CAST(p.o2 AS VARCHAR) || '.0.0/16' AS subnet16,
       p.n_events, p.n_slash24, p.n_hosts,
       floor(t.max24 / p.n_events * 1000000 + 0.5) / 1000000
         AS top24_share
FROM per16 p JOIN top24 t ON p.o2 = t.o2
ORDER BY subnet16
"""


QUERIES: dict[str, QuerySpec] = {
    "bmp_channel_stats": QuerySpec(
        _bmp_channel_stats,
        _BMP_STATS_SQL,
        "Real BMP decode -> per-channel mean/min/max + red-histogram "
        "entropy vs the exact arithmetic oracle (gradient fixture)",
    ),
    "ip_subnet_rollup": QuerySpec(
        _ip_subnet_rollup,
        _IP_SQL,
        "Per-/16 traffic rollup of md5-derived 10/8 IPv4s: events, "
        "distinct /24s, distinct hosts, top-/24 concentration",
    ),
}
