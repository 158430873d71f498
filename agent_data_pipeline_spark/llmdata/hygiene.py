"""Training-set hygiene operators: eval-set decontamination, intra-doc
repetition signals, PII detection/redaction, deterministic global
shuffle-sharding.

Nothing in the reference touches these (its whole surface is the taxi
ELT, SURVEY §2.A); they are north-star LLM-pipeline operators mandated by
BASELINE.json. All four are pure JVM expression/join work — no Python in
the hot path — so they stay scan-bound at 100 TB:

* Decontamination joins the (huge) training corpus against a (small)
  eval-set n-gram table: explode train n-grams, broadcast-semi-join the
  eval grams, distinct doc ids. One shuffle (the distinct), no cartesian.
* Repetition stats are per-row higher-order array fns — shuffle-free.
* PII scrub is regexp_extract_all / regexp_replace — shuffle-free.
* Shuffle-sharding assigns shards from a content hash (md5), NOT a global
  row_number — at 100 TB a global sort-for-ordering is one range-
  partitioned sort, but shard ASSIGNMENT must not serialize through a
  single-partition window, so it hashes instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..fns import rnd, spread

_WS = r"\s+"


def ngrams_from_tokens(toks: Column, n: int) -> Column:
    """Array of word ``n``-grams from an ALREADY-MATERIALIZED token-array
    column. Callers must materialize the tokens on their own projection
    behind an exchange (spread(force=True)) — otherwise CollapseProject
    inlines the ``split`` into the transform lambda and tokenization
    re-runs per gram index, O(len²) per doc (same trap as dedup.shingles;
    measured ~6× slower on the 10× stress corpus). Empty array when the
    doc has fewer than ``n`` words — guarded because ``F.sequence`` with
    start > stop yields a DESCENDING sequence, not an empty one."""
    n_out = F.size(toks) - F.lit(n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), n_out),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(n_out >= 1, grams).otherwise(F.array().cast("array<string>"))


def word_ngrams(text: Column, n: int) -> Column:
    """Array of lowercase word ``n``-grams straight from a text column.
    Convenience for tiny inputs/tests; hot paths go through
    ``ngrams_from_tokens`` over a materialized token column instead."""
    return ngrams_from_tokens(F.split(F.trim(F.lower(text)), _WS), n)


def _ngram_hashes(toks: Column, n: int) -> Column:
    """64-bit identities of the word ``n``-grams (xxhash64 of each
    n-token window) — for joins/distincts where only gram IDENTITY
    matters: no per-gram string allocation, and the downstream join or
    set carries 8-byte longs. Both sides of a comparison must hash the
    same way, so this stays internal to the module. Same materialized-
    token contract as ``ngrams_from_tokens``."""
    n_out = F.size(toks) - F.lit(n - 1)
    hashes = F.transform(
        F.sequence(F.lit(1), n_out), lambda i: F.xxhash64(F.slice(toks, i, n))
    )
    return F.when(n_out >= 1, hashes).otherwise(F.array().cast("array<bigint>"))


def eval_ngram_set(
    eval_df: DataFrame, text_col: str = "text", n: int = 8
) -> DataFrame:
    """Distinct word n-grams of an eval/benchmark set — the blocklist side
    of decontamination. Eval sets are tiny relative to a training corpus
    (thousands of docs vs billions), so the result is broadcast-sized."""
    toksed = spread(
        eval_df.select(
            F.split(F.trim(F.lower(F.col(text_col))), _WS).alias("_toks")
        ),
        force=True,
    )
    return (
        toksed.select(
            F.explode(_ngram_hashes(F.col("_toks"), n)).alias("gram_hash")
        ).distinct()
    )


def flag_contaminated(
    df: DataFrame,
    eval_grams: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Mark training docs sharing any word ``n``-gram with the eval set
    (``is_contaminated`` 1/0) — the standard benchmark-decontamination
    gate (e.g. GPT-3/PaLM appendix methodology: 8-13 word overlap).

    Plan shape: explode train grams -> broadcast LEFT SEMI join against
    the eval gram set -> distinct hit ids -> broadcast the (small) hit
    list back onto the corpus. The corpus is scanned once; nothing wide
    shuffles the full text."""
    toksed = spread(
        df.select(
            id_col, F.split(F.trim(F.lower(F.col(text_col))), _WS).alias("_toks")
        ),
        force=True,
    )
    grams = toksed.select(
        id_col, F.explode(_ngram_hashes(F.col("_toks"), n)).alias("gram_hash")
    )
    hits = (
        grams.join(F.broadcast(eval_grams), "gram_hash", "left_semi")
        .select(id_col)
        .distinct()
        .withColumn("is_contaminated", F.lit(1))
    )
    out = df.join(F.broadcast(hits), id_col, "left")
    return out.withColumn(
        "is_contaminated", F.coalesce(F.col("is_contaminated"), F.lit(0))
    )


def neardup_decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """NEAR-duplicate decontamination: flag training docs whose token-SET
    Jaccard similarity to ANY eval doc reaches ``threshold`` — the
    fuzzy-overlap complement of ``flag_contaminated`` (exact n-gram
    hits miss an eval doc that was lightly paraphrased or re-whitespaced
    into the training crawl; set-Jaccard catches it).

    Plan shape: distinct tokens per doc on both sides; the eval posting
    list is broadcast (eval sets are thousands of docs vs billions —
    broadcast-sized by contract, same as ``eval_ngram_set``); equi-join
    on token gives per-(train, eval) intersection counts; Jaccard =
    |A∩B| / (|A| + |B| − |A∩B|) from the two set sizes; keep each train
    doc's best match. The training corpus is scanned once and shuffles
    only (train_id, eval_id) count rows — never text. Candidate fan-out
    per train doc is bounded by eval postings, not the corpus.

    Returns every train row with (best_eval_id, best_jaccard,
    is_contaminated); docs sharing no token keep best_eval_id NULL and
    jaccard 0. Deterministic: best match ties break on lowest eval id
    over the ROUNDED similarity (6dp) so engine ulp noise can't flip
    the pick.
    """
    from pyspark.sql.window import Window as W

    def tok_set(df: DataFrame, out_id: str) -> DataFrame:
        toksed = spread(
            df.select(
                F.col(id_col).alias(out_id),
                F.split(F.trim(F.lower(F.col(text_col))), _WS).alias("_toks"),
            ),
            force=True,
        )
        return toksed.select(out_id, F.explode(F.array_distinct("_toks")).alias("tok"))

    tr = tok_set(train, "_tid")
    ev = tok_set(eval_df, "_eid")
    ev_sizes = ev.groupBy("_eid").agg(F.count(F.lit(1)).alias("_ne"))
    tr_sizes = tr.groupBy("_tid").agg(F.count(F.lit(1)).alias("_nt"))

    inter = (
        tr.join(F.broadcast(ev), "tok")
        .groupBy("_tid", "_eid")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    jac = (
        inter.join(tr_sizes, "_tid")
        .join(F.broadcast(ev_sizes), "_eid")
        .withColumn(
            "_jac",
            rnd(F.col("_c") / (F.col("_nt") + F.col("_ne") - F.col("_c")), 6),
        )
    )
    w = W.partitionBy("_tid").orderBy(F.col("_jac").desc(), F.col("_eid"))
    best = (
        jac.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("_tid").alias(id_col),
            F.col("_eid").alias("best_eval_id"),
            F.col("_jac").alias("best_jaccard"),
        )
    )
    out = train.join(best, id_col, "left")
    return out.select(
        *train.columns,
        F.col("best_eval_id"),
        F.coalesce(F.col("best_jaccard"), F.lit(0.0)).alias("best_jaccard"),
        (F.coalesce(F.col("best_jaccard"), F.lit(0.0)) >= threshold)
        .cast("long")
        .alias("is_contaminated"),
    )


def with_repetition_stats(
    df: DataFrame, text_col: str = "text", ns: tuple[int, ...] = (2, 3)
) -> DataFrame:
    """Per-doc duplicate-n-gram fractions (Gopher-style repetition
    signals): ``dup_{n}gram_frac`` = 1 - distinct/total n-grams, plus
    ``top_word_frac`` = frequency share of the most common word. All
    higher-order array fns — per-row, shuffle-free, codegen'd."""
    text = F.col(text_col)
    df = spread(
        df.withColumn("_toks", F.split(F.trim(F.lower(text)), _WS)), force=True
    )
    toks = F.col("_toks")
    for n in ns:
        # duplicate fraction needs only gram IDENTITY, not the gram text
        # (_ngram_hashes): distinct over longs, no string allocation. A
        # 64-bit collision would undercount distinct by 1; at ~10²
        # grams/doc the probability is ~2^-52, far below the 1e-6 grain.
        hashes = _ngram_hashes(toks, n)
        total = F.size(hashes)
        frac = F.when(
            total > 0, 1.0 - F.size(F.array_distinct(hashes)) / total
        ).otherwise(0.0)
        df = df.withColumn(f"dup_{n}gram_frac", rnd(frac, 6))
    # max count of any single word: sort tokens, then a single aggregate
    # pass tracking the longest equal-run — O(w log w) per doc. (The
    # distinct×filter formulation is O(w²): ~6× slower on the 10× stress
    # corpus.) The "" init for prev is safe: a first token matching it
    # still starts its run at 1.
    top = F.aggregate(
        F.array_sort(toks),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    top_frac = F.when(F.size(toks) > 0, top / F.size(toks)).otherwise(0.0)
    return df.withColumn("top_word_frac", rnd(top_frac, 6)).drop("_toks")


# Conservative, deterministic PII shapes. Real pipelines layer model-based
# NER on top; the regex tier is the scan-bound first pass.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Detect and redact emails / NANP phone numbers / IPv4 literals:
    adds ``n_emails``/``n_phones``/``n_ips`` counts and a ``redacted``
    text with typed placeholders. Order matters: emails first (an email
    can contain digits), then phones, then IPs."""
    df = spread(df)
    text = F.col(text_col)
    counts = {
        "n_emails": EMAIL_RE,
        "n_phones": PHONE_RE,
        "n_ips": IPV4_RE,
    }
    for name, pat in counts.items():
        df = df.withColumn(
            name, F.size(F.regexp_extract_all(text, F.lit(pat), 0)).cast("long")
        )
    red = F.regexp_replace(text, EMAIL_RE, "[EMAIL]")
    red = F.regexp_replace(red, PHONE_RE, "[PHONE]")
    red = F.regexp_replace(red, IPV4_RE, "[IP]")
    return df.withColumn("redacted", red)


def shard_assign(
    df: DataFrame, id_col: str = "doc_id", n_shards: int = 8, seed: str = "s42"
) -> DataFrame:
    """Deterministic pseudo-random shard assignment for training-data
    interleave: shard = md5(seed||id) mapped to [0, n_shards) via the
    first two hex digits. Engine-portable (md5+ascii only), shuffle-free,
    and stable under repartitioning — the property a resumable 100 TB
    training-data writer needs. Within-shard order is md5 ascending
    (a range-partitioned sort at scale, never a single-partition window).
    """
    h = F.md5(F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string")))
    # two hex chars -> int in [0,255]: ascii arithmetic is identical in
    # Spark and DuckDB (no conv() in DuckDB, no from_hex in Spark).
    def hexval(c: Column) -> Column:
        a = F.ascii(c)
        return F.when(a >= 97, a - 87).otherwise(a - 48)

    v = hexval(F.substring(h, 1, 1)) * 16 + hexval(F.substring(h, 2, 1))
    return df.withColumn("shuffle_key", h).withColumn(
        "shard", (v % F.lit(n_shards)).cast("long")
    )
