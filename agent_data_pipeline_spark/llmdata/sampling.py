"""Deterministic sampling / splitting / sequence packing for training
pipelines.

Why not ``df.sample()``/``randomSplit()``: their outputs depend on
partitioning and Spark's internal RNG stream — re-running after a
repartition (or in another engine) yields a different subset, which is
poison for dataset reproducibility. The scalable pattern is CONTENT
hashing: a pure arithmetic function of the row's id decides membership,
so any engine, any partitioning, any day produces the same split —
and the decision needs no shuffle at all (a map-side filter).

The hash here is Knuth's multiplicative scheme on the id column — weak
as a cryptographic hash but perfectly adequate for decorrelating ids
from buckets, and expressible in ANY SQL engine (the DuckDB oracle runs
the same integer arithmetic; Spark's xxhash64 would be faster but is
not portable). Production variant: swap ``_bucket`` for
``F.xxhash64`` when cross-engine parity is not required.

Sequence packing fills fixed token-budget context windows ("bins") from
documents: per shard, documents in deterministic id order are packed
contiguously by running token count. One window partitioned by shard —
no global sort, no driver state; shard count scales the parallelism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

_KNUTH = 2654435761  # 2^32 * golden-ratio conjugate, Knuth vol. 3 §6.4


def hash_bucket(id_col: str | Column, buckets: int = 1000) -> Column:
    """Deterministic bucket in [0, buckets) from an integer id.

    The id is reduced mod 2^31 BEFORE the Knuth multiply: a raw
    ``id * 2654435761`` overflows int64 for ids above ~3.47e9 (ANSI
    arithmetic raises — caught by the round-6 10× stress corpus, whose
    key remapping pushes ids to ~9e9), while ``(id mod 2^31) * K`` is
    bounded by ~5.7e18 for ANY id. Bucket values are identical to the
    raw formula for every ``0 <= id < 2^31`` (all fixtures and
    oracles); NEGATIVE ids are remapped by the pmod reduction, so their
    buckets differ from the historical raw formula — a persisted split
    keyed on negative ids would change membership, which is why the
    equivalence claim is stated for the non-negative range only. The
    same reduction is portable SQL
    (``(id % 2147483648) * 2654435761``) so the DuckDB oracles stay in
    lockstep at any scale."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.pmod(F.pmod(c, F.lit(2**31)) * F.lit(_KNUTH), F.lit(buckets))


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: list[tuple[str, float]],
    buckets: int = 1000,
) -> DataFrame:
    """Assign every row a split label with the given fractions, e.g.
    ``[("train", 0.8), ("val", 0.1), ("test", 0.1)]``. Pure map-side
    expression: no shuffle, no RNG, stable under re-partitioning."""
    b = hash_bucket(id_col, buckets)
    expr: Column | None = None
    edge = 0.0
    for name, frac in splits[:-1]:
        edge += frac
        cond = b < F.lit(int(round(edge * buckets)))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = splits[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def deterministic_sample(
    df: DataFrame, id_col: str, fraction: float, buckets: int = 1000
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by id hash — reproducible and
    shuffle-free (unlike ``df.sample``)."""
    return df.filter(hash_bucket(id_col, buckets) < int(round(fraction * buckets)))


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    n_shards: int = 64,
) -> DataFrame:
    """Contiguous-fill sequence packing: per shard (id mod n_shards),
    documents in id order accumulate into bins of ~``budget`` tokens;
    a document lands in the bin its RUNNING total (exclusive of itself)
    falls into. Documents longer than ``budget`` occupy bins alone (the
    running total still advances past them — chunking oversized docs is
    a separate upstream op).

    Deterministic and window-expressible, so the DuckDB oracle can check
    it exactly; greedy best-fit packing would need per-group state
    (applyInPandas) and is NOT order-stable under re-partitioning.
    """
    shard = F.pmod(F.col(id_col), F.lit(n_shards))
    w = (
        W.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    out = df.withColumn("shard", shard).withColumn(
        "_cum_before", F.coalesce(F.sum(token_col).over(w), F.lit(0))
    )
    return out.withColumn(
        "bin_id", F.floor(F.col("_cum_before") / F.lit(budget))
    ).drop("_cum_before")


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str,
    buckets: int = 1000,
) -> DataFrame:
    """``df.sampleBy`` analog with deterministic membership: per-stratum
    keep-fraction decided by the id hash. Strata missing from
    ``fractions`` are dropped (sampleBy semantics). Map-side only."""
    import math

    b = hash_bucket(id_col, buckets)
    thr: Column | None = None
    for stratum, frac in fractions.items():
        t = F.lit(int(math.floor(frac * buckets + 0.5)))
        cond = F.col(strata_col) == stratum
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    return df.filter(b < thr.otherwise(F.lit(0)))


def stratified_split_floors(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    val_pm: int = 100,
    test_pm: int = 100,
    floor: int = 10,
    buckets: int = 1000,
) -> DataFrame:
    """Train/val/test split with PER-STRATUM FLOORS: every stratum
    contributes at least ``floor`` rows to val and to test (stratum
    size permitting), so rare languages/sources never evaluate on 2
    documents just because they are 0.1% of the corpus. Fractions are
    exact per-mille integers (``val_pm``/``test_pm`` out of 1000) so
    every threshold is integer arithmetic — no float boundary ever
    decides membership differently across engines.

    Two deterministic paths, chosen per stratum from its REALIZED
    hash-bucket draw (not an expected-value estimate — a stratum just
    over the threshold whose actual draw lands under the floor is
    routed to the floor path, so the guarantee holds by construction):

    * FRACTION path (large strata, the 100 TB common case): the
      stratum's actual count of rows in the val buckets AND in the
      test buckets each already meets the floor, so rows split by the
      portable id-hash bucket (map-side expression, no shuffle beyond
      the tiny per-stratum agg) — identical semantics to
      :func:`hash_split`.
    * FLOOR path (strata whose realized draw misses a floor): exact
      rank by the injective Knuth hash (odd multiplier ⇒
      (id mod 2^31)·K mod 2^32 is tie-free for ids below 2^31 — all
      fixture ids; ``id_col`` breaks the congruent-id tie beyond) —
      first ``floor`` ranks to val, next ``floor`` to test, rest to
      train. A stratum smaller than 2·floor yields an empty train
      split by design (floors take priority: eval sets are the scarce
      resource).

    Scale shape: the window runs ONLY over floor-path strata. Their
    size is ~``floor·1000/min(val_pm,test_pm)`` rows in expectation: a
    larger stratum takes the floor path only when its hash draw
    undershoots the floor, which is exponentially unlikely beyond ~2×
    that size (Chernoff) — only a hash-adversarial id set could push a
    big stratum through the window. The fact-table bulk stays on the
    pure map-side branch. Adds ``split`` and ``floor_path`` columns."""
    if floor < 1:
        raise ValueError("floor must be >= 1")
    b = hash_bucket(id_col, buckets)
    val_thr = F.lit(int(round(val_pm / 1000 * buckets)))
    test_thr = val_thr + F.lit(int(round(test_pm / 1000 * buckets)))
    # Path selection uses the REALIZED bucket draw, not ceil(n·pm/1000):
    # the estimate meets the floor in expectation only — a stratum with
    # n just over floor·1000/pm usually draws fewer than `floor` val
    # rows, silently violating the documented guarantee. Counting the
    # actual val/test bucket membership in the same per-stratum agg
    # costs nothing extra and makes the floor a hard invariant.
    counts = df.groupBy(strata_col).agg(
        F.sum((b < val_thr).cast("long")).alias("_real_val"),
        F.sum(((b >= val_thr) & (b < test_thr)).cast("long")).alias("_real_test"),
    )
    joined = df.join(F.broadcast(counts), strata_col)
    on_fraction = (F.col("_real_val") >= floor) & (F.col("_real_test") >= floor)
    big = joined.filter(on_fraction).select(
        *df.columns,
        F.when(b < val_thr, "val")
        .when(b < test_thr, "test")
        .otherwise("train")
        .alias("split"),
        F.lit(False).alias("floor_path"),
    )

    # injective on [0, 2^31): x*K ≡ y*K (mod 2^32) with K odd forces
    # x ≡ y (mod 2^32), and |x−y| < 2^31 — so ranks are tie-free for
    # ids below 2^31 (the id tie-break covers congruent ids beyond);
    # the mod-2^31 reduction keeps the multiply inside int64 (see
    # hash_bucket).
    h32 = F.pmod(
        F.pmod(F.col(id_col) if isinstance(id_col, str) else id_col, F.lit(2**31))
        * F.lit(_KNUTH),
        F.lit(2**32),
    )
    w = W.partitionBy(strata_col).orderBy(h32.asc(), F.col(id_col).asc())
    small = (
        joined.filter(~on_fraction)
        .withColumn("_rk", F.row_number().over(w))
        .select(
            *df.columns,
            F.when(F.col("_rk") <= floor, "val")
            .when(F.col("_rk") <= 2 * floor, "test")
            .otherwise("train")
            .alias("split"),
            F.lit(True).alias("floor_path"),
        )
    )
    return big.unionByName(small)


def weighted_mix(
    sources: dict[str, tuple[DataFrame, float]],
    id_col: str,
    buckets: int = 1000,
) -> DataFrame:
    """Mix datasets to target proportions WITHOUT upsampling: keep
    fraction ``f_i = w_i * C / n_i`` of source i, where
    ``C = min_i(n_i / w_i)`` — the largest total size at which every
    source can meet its weight share from real rows. Membership is the
    deterministic id hash; output carries a ``mix_source`` tag.

    All source counts come from ONE Spark job (union of tagged 1-column
    projections, then a single groupBy) instead of a driver round-trip
    per source; the filters and union stay map-side (no shuffle beyond
    that one metadata agg), so the mix is reproducible and re-runnable
    on any partitioning — the property training-data freezes require.
    """
    import math

    tagged = None
    for name, (df, _) in sources.items():
        part = df.select(F.lit(name).alias("_mix_src"))
        tagged = part if tagged is None else tagged.unionByName(part)
    from ..fns import bounded_collect

    counts = {
        r["_mix_src"]: r["n"]
        for r in bounded_collect(
            tagged.groupBy("_mix_src").agg(F.count(F.lit(1)).alias("n")),
            len(sources),
            "one row per mixture source",
        )
    }
    c = min(counts[n] / w for n, (_, w) in sources.items())
    parts = []
    for name, (df, w) in sources.items():
        thr = int(math.floor(w * c / counts[name] * buckets + 0.5))
        parts.append(
            df.filter(hash_bucket(id_col, buckets) < thr).withColumn(
                "mix_source", F.lit(name)
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    budget: int,
    overlap: int = 0,
) -> DataFrame:
    """Split each document into token windows of ``budget`` tokens with
    ``overlap`` tokens shared between consecutive chunks (stride =
    budget - overlap) — the upstream op that makes every document fit a
    ``pack_sequences`` bin. One row per chunk: (id, chunk_id,
    chunk_tokens, chunk_text).

    Pure array arithmetic (split + sequence + explode + slice): chunk
    fan-out happens where the row lives, no shuffle, no UDF; a 100 TB
    corpus chunks in a single map stage.
    """
    step = budget - overlap
    if step <= 0:
        raise ValueError("overlap must be smaller than budget")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    n_chunks = F.when(n <= budget, F.lit(1)).otherwise(
        (F.ceil((n - budget) / F.lit(step)) + 1).cast("int")
    )
    chunked = df.withColumn("_toks", toks).withColumn(
        "chunk_id", F.explode(F.sequence(F.lit(0), n_chunks - 1))
    )
    piece = F.slice(F.col("_toks"), F.col("chunk_id") * step + 1, budget)
    return (
        chunked.withColumn("chunk_tokens", F.size(piece).cast("long"))
        .withColumn("chunk_text", F.concat_ws(" ", piece))
        .drop("_toks")
    )


def cap_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    cap: int,
) -> DataFrame:
    """Deterministic per-group cap: keep at most ``cap`` rows per group,
    chosen by ``order_cols`` rank (ascending, must form a total order
    within the group for reproducibility). The corpus-balancing step
    that stops one domain/source from dominating a training mix —
    CommonCrawl pipelines cap documents per registered domain exactly
    this way.

    Plan shape: one window (``row_number`` partitioned by the group) —
    a single shuffle on the group key. Groups are domains/sources, so
    cardinality is high and per-group size moderate; for a pathological
    heavy-hitter group the window still ranks all its rows on one
    partition before the filter drops them — if one group were a large
    fraction of 100 TB, pre-aggregate group counts and short-circuit
    groups already under the cap, windowing only the oversized ones.
    """
    if cap < 1:
        raise ValueError("cap_per_group: cap must be >= 1")
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*group_cols)
        .orderBy(*[F.col(c) for c in order_cols])
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )


def temperature_mix(
    df: DataFrame,
    group_col: str,
    id_col: str,
    alpha: float = 0.5,
    buckets: int = 1000,
) -> DataFrame:
    """Temperature-based mixture resampling (the multilingual-corpus
    rebalancing rule from mBERT/XLM-R and the shape DoReMi tunes): each
    group's target share is ``n_g^alpha / sum(n^alpha)`` — alpha<1
    up-samples the tail and caps the head — realized as a deterministic
    per-group KEEP RATE ``min(1, share * N / n_g)`` applied with the
    same id-hash bucketing as hash_split (reproducible, shuffle-free at
    the row level). alpha=0.5 keeps the weight function inside exact
    IEEE ops (sqrt), so both engines derive bit-identical rates; the
    rate is rounded (engine-portable 6dp) BEFORE the bucket threshold.

    Returns the sampled rows plus the group's ``mix_rate``. Plan shape:
    one aggregation over group sizes (tiny), broadcast back; the corpus
    itself never shuffles — filter + broadcast join only.
    """
    if alpha != 0.5:
        raise ValueError(
            "temperature_mix: only alpha=0.5 is offered — sqrt is the "
            "one power both engines (and any two libms) compute "
            "bit-identically; other exponents would make the keep-rate "
            "threshold engine-dependent"
        )
    from ..fns import rnd

    sizes = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    totals = sizes.agg(
        F.sum("_n").alias("_N"), F.sum(F.sqrt(F.col("_n"))).alias("_Z")
    )
    # rename the per-group count before the cross join: totals derives
    # FROM sizes, so an unrenamed `_n` would be ambiguous against the
    # aggregate's child lineage
    rates = (
        sizes.withColumnRenamed("_n", "_gn")
        .crossJoin(F.broadcast(totals))
        .select(
            group_col,
            rnd(
                F.least(
                    F.lit(1.0),
                    F.sqrt(F.col("_gn")) / F.col("_Z") * F.col("_N") / F.col("_gn"),
                ),
                6,
            ).alias("mix_rate"),
        )
    )
    thr = F.floor(F.col("mix_rate") * buckets + F.lit(0.5))
    return df.join(F.broadcast(rates), group_col).filter(
        hash_bucket(id_col, buckets) < thr
    )
