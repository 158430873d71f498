"""Round-4 surface additions, part 15: URL canonicalization dedup.

`url_canonical_dedup` is the web-crawl dedup step that runs BEFORE any
content hashing: strip fragments and tracking parameters (utm_*, ref),
sort the surviving query parameters, and count how many raw URLs
collapse per canonical form and per host. Raw URLs here are
deterministically synthesized (like `url_parse_kit`) with per-doc
tracking noise, so the collapse is real and exactly predictable.

Determinism: pure string surgery with RE2-safe patterns; counts are
integers. Scale: per-row expressions + one (host, canonical) aggregate
— one shuffle, no joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core import QuerySpec, rnd, t


def _url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalize synthesized crawl URLs (drop #fragment, drop
    utm_*/ref params, sort the rest) and report per-host collapse:
    raw count, canonical count, and the dup ratio the canonicalizer
    recovered."""
    d = t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://H"), F.col("doc_id") % 5,
        F.lit(".Example.org/c/item"), F.col("doc_id") % 10,
        F.lit("?utm_source=s"), F.col("doc_id") % 3,
        F.lit("&page="), F.col("doc_id") % 2,
        F.lit("&ref=r"), F.col("doc_id") % 2,
        F.lit("&b=1&utm_campaign=c"), F.col("doc_id"),
        F.lit("#sec"), F.col("doc_id") % 4,
    )
    no_frag = F.regexp_replace(url, r"#.*$", "")
    base = F.lower(F.regexp_extract(no_frag, r"^([^?]*)", 1))
    qs = F.regexp_extract(no_frag, r"\?(.*)$", 1)
    params = F.filter(
        F.split(qs, "&"),
        lambda p: ~(
            p.startswith("utm_") | p.startswith("ref=") | (p == F.lit(""))
        ),
    )
    canonical = F.concat(
        base,
        F.when(F.size(params) > 0, F.concat(F.lit("?"), F.array_join(F.array_sort(params), "&"))).otherwise(F.lit("")),
    )
    host = F.regexp_extract(base, r"^[a-z]+://([^/]+)", 1)
    per = d.select(host.alias("host"), canonical.alias("canon"))
    return (
        per.groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_raw"),
            F.countDistinct("canon").alias("n_canonical"),
        )
        .withColumn(
            "dup_ratio",
            rnd(
                1.0 - F.col("n_canonical") / F.col("n_raw").cast("double"), 6
            ),
        )
        .orderBy("host")
    )


_URL_CANON_SQL = r"""
WITH raw AS (
  SELECT 'https://H' || (doc_id % 5) || '.Example.org/c/item'
         || (doc_id % 10) || '?utm_source=s' || (doc_id % 3)
         || '&page=' || (doc_id % 2) || '&ref=r' || (doc_id % 2)
         || '&b=1&utm_campaign=c' || doc_id || '#sec' || (doc_id % 4) AS url
  FROM documents
), pieces AS (
  SELECT lower(regexp_extract(regexp_replace(url, '#.*$', ''), '^([^?]*)', 1))
           AS base,
         regexp_extract(regexp_replace(url, '#.*$', ''), '\?(.*)$', 1) AS qs
  FROM raw
), canon AS (
  SELECT base,
         regexp_extract(base, '^[a-z]+://([^/]+)', 1) AS host,
         list_sort(list_filter(string_split(qs, '&'),
             p -> NOT (p LIKE 'utm_%' OR p LIKE 'ref=%' OR p = ''))) AS params
  FROM pieces
), final AS (
  SELECT host,
         base || CASE WHEN len(params) > 0
                      THEN '?' || array_to_string(params, '&') ELSE '' END
           AS canon
  FROM canon
)
SELECT host, CAST(count(*) AS BIGINT) AS n_raw,
       CAST(count(DISTINCT canon) AS BIGINT) AS n_canonical,
       floor((1.0 - count(DISTINCT canon) / CAST(count(*) AS DOUBLE))
             * 1000000 + 0.5) / 1000000 AS dup_ratio
FROM final
GROUP BY host
ORDER BY host
"""


QUERIES: dict[str, QuerySpec] = {
    "url_canonical_dedup": QuerySpec(
        _url_canonical_dedup,
        _URL_CANON_SQL,
        "URL canonicalization (tracking strip, param sort) + dedup census",
    ),
}
