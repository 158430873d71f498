"""Embedding similarity search over an ``array<float>`` column.

Three tiers, in increasing scale:

* ``cosine_topk_bruteforce`` — exact top-k for a (small) query set against
  the full corpus: broadcast the queries, JVM-side zip_with/aggregate dot
  product, per-query window top-k. Cost O(|Q| * n); the baseline and the
  oracle for recall measurements. No Python in the loop.
* ``cosine_pairs`` — exact near-dup pairs above a similarity threshold
  (all-pairs within small corpora / within buckets).
* ``lsh_topk`` — random-hyperplane (SRP) LSH bucketed ANN: probe only
  candidates sharing a hash bucket with the query (multi-table OR-
  amplification). The candidate join is an equi-join on (table, bucket):
  at 100 TB this is the only viable shape — shuffle co-locates bucket
  members, never a cross join. Recall is tunable via (n_tables, n_bits).

Hyperplanes are derived deterministically from xxhash64 of (table, bit,
dim) — no RNG at runtime, reproducible across runs and engines (seed via
hash constants, satisfying the determinism requirement of the harness).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..fns import rnd


def _norm(col):
    dbl = F.transform(col, lambda x: x.cast("double"))
    return F.sqrt(F.aggregate(dbl, F.lit(0.0), lambda a, x: a + x * x))


def with_unit_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Pre-normalize: cosine becomes a plain dot product downstream."""
    dbl = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    nrm = _norm(F.col(vec_col))
    unit = F.when(nrm > 0, F.transform(dbl, lambda x: x / nrm)).otherwise(dbl)
    return df.withColumn("unit_vec", unit)


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Determinism: neighbors are ranked by (rounded similarity desc, id) so
    float noise below the rounding grain cannot reorder the result.
    Excludes self-matches.
    Returns (query_id, neighbor_id, cosine_sim, sim_rank).
    """
    c = with_unit_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("unit_vec").alias("c_vec")
    )
    q = with_unit_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("unit_vec").alias("q_vec")
    )
    sims = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            rnd(_dot(F.col("q_vec"), F.col("c_vec")), round_digits).alias("cosine_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("sim_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sim_rank") <= k)
    )


def cosine_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine near-dup pairs (id_a < id_b) above threshold."""
    u = with_unit_norm(df, vec_col)
    a = u.select(F.col(id_col).alias("id_a"), F.col("unit_vec").alias("va"))
    b = u.select(F.col(id_col).alias("id_b"), F.col("unit_vec").alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", rnd(_dot(F.col("va"), F.col("vb")), 6).alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def _srp_hyperplanes(dim: int, n_tables: int, n_bits: int) -> list[list[list[float]]]:
    """Deterministic pseudo-random hyperplanes from a splitmix64-style
    integer mix — reproducible without any RNG state."""

    def mix(x: int) -> int:
        x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 % (1 << 64)
        x = (x ^ (x >> 27)) * 0x94D049BB133111EB % (1 << 64)
        return (x ^ (x >> 31)) % (1 << 64)

    planes = []
    for t in range(n_tables):
        bits = []
        for b in range(n_bits):
            vec = []
            for d in range(dim):
                h = mix((t * 1_000_003 + b) * 1_000_033 + d + 0x9E3779B97F4A7C15)
                vec.append((h / float(1 << 64)) * 2.0 - 1.0)
            bits.append(vec)
        planes.append(bits)
    return planes


def srp_bucket_ids(
    df: DataFrame,
    dim: int,
    n_tables: int = 8,
    n_bits: int = 12,
    vec_col: str = "embedding",
) -> DataFrame:
    """Attach ``buckets``: one signed-random-projection bucket per table.

    bucket[t] = sum over bits of (dot(vec, plane[t][b]) > 0) << b.
    Hyperplane constants fold into the plan as literals (broadcast-free;
    for very large dim x tables x bits move them to a broadcast variable).
    """
    dbl = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    planes = _srp_hyperplanes(dim, n_tables, n_bits)
    buckets = []
    for ti in range(n_tables):
        bucket = F.lit(0).cast("long")
        for bi in range(n_bits):
            plane = F.array(*[F.lit(v) for v in planes[ti][bi]])
            bit = (_dot(dbl, plane) > 0).cast("long")
            bucket = bucket + F.shiftleft(bit, bi)
        buckets.append(F.struct(F.lit(ti).alias("table"), bucket.alias("bucket")))
    return df.withColumn("buckets", F.array(*buckets))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_tables: int = 8,
    n_bits: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share >= 1 SRP bucket with the query,
    then exact cosine re-rank within candidates.

    Plan shape: explode buckets on both sides -> equi-join on
    (table, bucket) -> dropDuplicates(query, candidate) -> exact re-rank.
    Shuffle keys are bucket ids; n_bits controls bucket occupancy
    (~n / 2^n_bits per table), the skew knob.
    """
    c = srp_bucket_ids(with_unit_norm(corpus, vec_col), dim, n_tables, n_bits, "unit_vec")
    q = srp_bucket_ids(with_unit_norm(queries, vec_col), dim, n_tables, n_bits, "unit_vec")
    ce = c.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("unit_vec").alias("c_vec"),
        F.explode("buckets").alias("cb"),
    )
    qe = q.select(
        F.col(id_col).alias("query_id"),
        F.col("unit_vec").alias("q_vec"),
        F.explode("buckets").alias("qb"),
    )
    cand = (
        ce.join(
            qe,
            (F.col("cb.table") == F.col("qb.table"))
            & (F.col("cb.bucket") == F.col("qb.bucket"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .select("query_id", "neighbor_id", "q_vec", "c_vec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    sims = cand.select(
        "query_id",
        "neighbor_id",
        rnd(_dot(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("sim_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sim_rank") <= k)
    )
