"""Round-12 wave: winnowing fingerprints and Unicode normalization —
two standard corpus-hygiene operators the dedup/cleanup family lacked.

* ``winnowing_fingerprints`` — the MOSS fingerprinting scheme
  (Schleimer, Wilkerson & Aiken, SIGMOD 2003, public method): hash
  every token 3-gram, slide a window of w=4 over the hash sequence,
  select each window's minimum (rightmost on ties — the "robust
  winnowing" rule), and report the per-source fingerprint census plus
  how many selected fingerprints are shared across documents. The
  guarantee that makes it the local-dedup workhorse: any shared
  substring of >= w+k-1 tokens yields at least one SHARED fingerprint,
  while storing ~2/(w+1) of the grams. Complements the engine's
  MinHash (set-level), SimHash (vector-level) and dup-span (exact
  cross-doc) family at the substring level.

  Cross-engine exactness: the gram hash is the portable md5-prefix
  32-bit int (the cms_heavy_hitters pattern — NOT xxhash64), the
  rightmost-min tie-break is encoded arithmetically as
  min(hash * 4096 + (4095 - pos)) so both engines take the identical
  argmin with no struct-ordering semantics in play, and every output
  is an integer count or one 6dp division.

  Scale shape: one posexplode (linear), the sliding min is a window
  PARTITIONED BY doc (never global), the shared-fingerprint join runs
  on the fingerprint value grain (vocabulary-bounded), and the final
  rollup is source-grain. Positions are guarded < 4096 (the tie-break
  encoding's domain; fixture docs are ~10² tokens — a loud filter,
  not silent truncation, because the window min ignores excluded
  rows on BOTH engines identically).

* ``unicode_nfc_audit`` — NFC normalization audit (UAX #15, public
  spec): the standard pre-tokenization cleanup that collapses
  decomposed sequences (e + U+0301 -> é). The fixture text is ASCII,
  so the op would be vacuous on it; a DETERMINISTIC non-ASCII
  decoration (doc_id % 3 selects a decomposed suffix) makes the
  normalization measurable and the oracle exact: Python
  ``unicodedata.normalize("NFC", ...)`` inside an Arrow-batched
  pandas UDF vs DuckDB's ``nfc_normalize`` — both implement the same
  stable composition (the injected sequences are Unicode-3.0-stable
  compositions, identical in any table version). Reports per-source
  doc counts, changed-doc counts, and codepoint deltas (the injected
  chars are BMP, so Spark's UTF-16 length == DuckDB's codepoint
  length).

Reference parity: no fingerprinting/normalization surface in the
reference (SURVEY.md §2.A); declared north-star §2.B additions.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType
from pyspark.sql.window import Window as W

from ..fns import spread
from .core import QuerySpec, rnd, t

_WIN_W = 4  # winnowing window (over gram positions)
_POS_CAP = 4096  # tie-break encoding domain: pos must stay below this


def _winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread BEFORE building grams: the tokenize + 3-gram transform is
    # interpreted (CodegenFallback) HOF work that otherwise runs in the
    # scan stage — one task on a one-split parquet source (the round-13
    # band-key pathology, SCALING.md). No-op on a well-split scan.
    d = spread(t(spark, sf_dir, "documents").select("doc_id", "source", "text"))
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda x: x != ""
    )
    n = F.size(toks)
    grams = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(0), n - 3),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks, i + 1),
                F.element_at(toks, i + 2),
                F.element_at(toks, i + 3),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # posexplode_outer: the non-outer form lets InferFiltersFromGenerate
    # duplicate the whole inlined gram computation into a pushed Filter
    # (hof_filter_recompute). The existing `pos < cap` predicate on the
    # GENERATED attribute already drops outer's null rows (NULL < cap is
    # NULL) and cannot be pushed below the Generate.
    g = d.select(
        "doc_id", "source", F.posexplode_outer(grams).alias("pos", "gram")
    ).filter(F.col("pos") < _POS_CAP)
    h = F.pmod(
        F.conv(F.substring(F.md5(F.col("gram")), 1, 8), 16, 10).cast("long"),
        F.lit(2**31),
    )
    enc = g.select(
        "doc_id",
        "source",
        "pos",
        (h * _POS_CAP + (F.lit(_POS_CAP - 1) - F.col("pos"))).alias("comb"),
        F.count(F.lit(1)).over(W.partitionBy("doc_id")).alias("n_grams"),
    )
    wm = W.partitionBy("doc_id").orderBy("pos").rowsBetween(0, _WIN_W - 1)
    sel = (
        enc.withColumn("wmin", F.min("comb").over(wm))
        .filter(F.col("pos") <= F.col("n_grams") - _WIN_W)
        .select(
            "doc_id",
            "source",
            F.expr(f"wmin div {_POS_CAP}").alias("fp"),
        )
        .distinct()
    )
    fp_docs = sel.groupBy("fp").agg(
        F.countDistinct("doc_id").alias("n_docs_with_fp")
    )
    j = sel.join(fp_docs, "fp")
    return (
        j.groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_fingerprints"),
            F.countDistinct("fp").alias("n_distinct_fp"),
            F.sum((F.col("n_docs_with_fp") > 1).cast("long")).alias(
                "n_shared_fp"
            ),
            rnd(
                F.sum((F.col("n_docs_with_fp") > 1).cast("long"))
                / F.count(F.lit(1)),
                6,
            ).alias("shared_share"),
        )
        .orderBy("source")
    )


_WINNOW_SQL = rf"""
WITH d AS (
  SELECT doc_id, source,
         list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                     x -> x <> '') AS toks
  FROM documents
), g AS (
  SELECT doc_id, source, i - 1 AS pos,
         toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS gram
  FROM (SELECT doc_id, source, toks,
               unnest(generate_series(1, len(toks) - 2)) AS i
        FROM d)
  WHERE i - 1 < {_POS_CAP}
), enc AS (
  SELECT doc_id, source, pos,
         (CAST(('0x' || substring(md5(gram), 1, 8)) AS BIGINT)
            % 2147483648) * {_POS_CAP}
           + ({_POS_CAP - 1} - pos) AS comb,
         count(*) OVER (PARTITION BY doc_id) AS n_grams
  FROM g
), sel AS (
  SELECT DISTINCT doc_id, source, wmin // {_POS_CAP} AS fp
  FROM (
    SELECT doc_id, source, pos, n_grams,
           min(comb) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN CURRENT ROW AND {_WIN_W - 1} FOLLOWING)
             AS wmin
    FROM enc
  )
  WHERE pos <= n_grams - {_WIN_W}
), fp_docs AS (
  SELECT fp, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs_with_fp
  FROM sel GROUP BY fp
)
SELECT s.source,
       CAST(count(DISTINCT s.doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_fingerprints,
       CAST(count(DISTINCT s.fp) AS BIGINT) AS n_distinct_fp,
       CAST(sum(CASE WHEN f.n_docs_with_fp > 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_shared_fp,
       floor(sum(CASE WHEN f.n_docs_with_fp > 1 THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE) * 1000000 + 0.5) / 1000000
         AS shared_share
FROM sel s JOIN fp_docs f ON s.fp = f.fp
GROUP BY s.source
ORDER BY s.source
"""


# --------------------------------------------------------------------------
# unicode_nfc_audit
# --------------------------------------------------------------------------

# deterministic decomposed decorations (Unicode-3.0-stable compositions):
# doc_id % 3 == 0 -> " cafe" + COMBINING ACUTE (NFC: é, -1 codepoint)
# doc_id % 3 == 1 -> " A" + COMBINING RING ABOVE (NFC: Å, -1 codepoint)
# doc_id % 3 == 2 -> no decoration (NFC is identity on the ASCII text)
_DEC0 = " café"
_DEC1 = " Å"


@F.pandas_udf(StringType())
def _nfc_udf(s: pd.Series) -> pd.Series:
    import unicodedata

    return s.map(
        lambda x: unicodedata.normalize("NFC", x) if x is not None else None
    )


def _unicode_nfc_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    dec = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(_DEC0))
        .when(F.col("doc_id") % 3 == 1, F.lit(_DEC1))
        .otherwise(F.lit("")),
    )
    u = d.select(
        "source",
        dec.alias("dec"),
    ).withColumn("nfc", _nfc_udf(F.col("dec")))
    return (
        u.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("nfc") != F.col("dec")).cast("long")).alias(
                "n_changed"
            ),
            F.sum(F.length("dec")).cast("long").alias("chars_before"),
            F.sum(F.length("nfc")).cast("long").alias("chars_after"),
            (
                F.sum(F.length("dec")) - F.sum(F.length("nfc"))
            ).cast("long").alias("chars_composed_away"),
        )
        .orderBy("source")
    )


_NFC_SQL = f"""
WITH u AS (
  SELECT source,
         text || CASE WHEN doc_id % 3 = 0 THEN ' cafe' || chr(769)
                      WHEN doc_id % 3 = 1 THEN ' A' || chr(778)
                      ELSE '' END AS dec
  FROM documents
), n AS (
  SELECT source, dec, nfc_normalize(dec) AS nfc FROM u
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN nfc <> dec THEN 1 ELSE 0 END) AS BIGINT)
         AS n_changed,
       CAST(sum(length(dec)) AS BIGINT) AS chars_before,
       CAST(sum(length(nfc)) AS BIGINT) AS chars_after,
       CAST(sum(length(dec)) - sum(length(nfc)) AS BIGINT)
         AS chars_composed_away
FROM n
GROUP BY source
ORDER BY source
"""


QUERIES: dict[str, QuerySpec] = {
    "winnowing_fingerprints": QuerySpec(
        _winnowing_fingerprints,
        _WINNOW_SQL,
        "MOSS winnowing fingerprint census (portable md5 3-gram "
        "hashes, w=4 rightmost-min windows encoded arithmetically): "
        "per-source selected/distinct/cross-doc-shared fingerprints",
    ),
    "unicode_nfc_audit": QuerySpec(
        _unicode_nfc_audit,
        _NFC_SQL,
        "NFC normalization audit over deterministically decorated "
        "text: Arrow-batched unicodedata.normalize vs DuckDB "
        "nfc_normalize, per-source changed-doc and codepoint deltas",
    ),
}
