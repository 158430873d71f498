"""Round-7 second wave: three rows-only operators (iterative / decode
algorithms SQL cannot express), each with a planted-truth or
recall-floor quality test instead of a DuckDB oracle.

* ``pq_ann_topk`` — Product-Quantization ANN (llmdata/pq.py): the third
  ANN scale path beside SRP-LSH and IVF. 16 codebooks × 16 codes over
  the 64-dim fixture = 16 bytes/vector (16× compression); ADC scan with
  per-batch partial top-100, exact cosine re-rank of the shortlist.
  Measured recall@5 = 0.98 vs brute force (floor 0.95 in
  tests/test_similarity.py). Same (query_id, neighbor_id, cosine_sim,
  sim_rank) contract as the LSH/IVF rows.
* ``mmr_diverse_topk`` — Maximal Marginal Relevance diversified top-10
  (llmdata/similarity.mmr_topk): greedy λ·relevance − (1−λ)·redundancy
  selection over a 50-candidate pool per query. The pool is one
  brute-force partial-top-k corpus pass; the greedy quadratic work is
  pool²-bounded inside applyInPandas per query. Planted-cluster
  diversity floor in tests/test_similarity.py.
* ``image_dhash_neardup`` — perceptual-hash image dedup
  (llmdata/phash.py): dHash64 over REAL BMP payloads (stdlib codec) via
  one Arrow-batched kernel, then pigeonhole-blocked Hamming pairs —
  the image counterpart of simhash_hamming_pairs. The fixture plants
  near-duplicate renders (Hamming ≤ 3 measured) among structurally
  distinct textures (cross-id Hamming ≥ 12), so the planted truth is
  exact; P/R = 1.0 asserted in tests/test_multimodal.py.

Reference parity: the reference has no vector search, diversification,
or image processing (SURVEY.md §2.A); all three belong to the declared
north-star §2.B surface (multimodal + similarity families).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llmdata import phash, pq, similarity
from .core import QuerySpec, t


def _pq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return pq.pq_topk(
        emb, queries, k=5, n_sub=16, n_codes=16, refine=100
    ).orderBy("query_id", "sim_rank")


def _mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.mmr_topk(emb, queries, k=10, pool=50, lam=0.7).orderBy(
        "query_id", "mmr_rank"
    )


def _image_dhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """240 textured BMPs (every 3rd a planted near-dup of its
    predecessor) → dHash kernel → blocked Hamming pairs at ≤ 6.
    Returns (id_a, id_b, hamming) — exactly the 80 planted pairs on
    this fixture (verified by the planted P/R test)."""
    base = t(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 240
    )
    media = phash.synthesize_textured_images(base, "doc_id", near_dup_every=3)
    hashed = phash.with_dhash(media)
    return phash.hamming_pairs(hashed, max_hamming=6, blocks=8).orderBy(
        "id_a", "id_b"
    )


QUERIES: dict[str, QuerySpec] = {
    "pq_ann_topk": QuerySpec(
        _pq_ann_topk,
        None,
        "product-quantization ANN top-5 (rows-only: seeded k-means "
        "codebooks + ADC shortlist; recall@5 >= 0.95 floor in pytest)",
    ),
    "mmr_diverse_topk": QuerySpec(
        _mmr_diverse_topk,
        None,
        "MMR diversified top-10 (rows-only: iterative greedy selection; "
        "planted-cluster diversity floor in pytest)",
    ),
    "image_dhash_neardup": QuerySpec(
        _image_dhash_neardup,
        None,
        "perceptual dHash near-dup image pairs (rows-only: binary BMP "
        "decode kernel; planted-pair P/R = 1.0 in pytest)",
    ),
}
