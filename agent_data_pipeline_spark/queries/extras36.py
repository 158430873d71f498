"""Round-7 second wave: three operators originally declared rows-only
(iterative / decode algorithms), each with a planted-truth or
recall-floor quality test; round 11 oracle-converted the MMR entry.

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
  pool²-bounded inside applyInPandas per query. Oracled since round
  11 (the greedy replays as a recursive CTE over the 6dp similarity
  grid); planted-cluster diversity floor in tests/test_similarity.py.
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


# MMR oracle (round 11). Everything the greedy loop compares lives on
# the 6dp grid BEFORE any comparison: the pool relevances are the
# engine's rounded cosines (the proven embedding_topk cross-engine
# contract), the pairwise redundancy matrix is floor(cos*1e6+0.5)/1e6
# on both sides (numpy normalize-then-matmul vs DuckDB
# list_cosine_similarity differ ~1e-15, far inside the grid), and the
# blended score re-floors to the same grid — so selection order and
# scores are engine-identical. The recursion carries (max_sim,
# picked_rank, mmr_score) per candidate and picks argmax(score desc,
# id asc) per query per step, exactly numpy's first-max over
# id-sorted candidates. Assumes non-zero embedding norms (guaranteed
# by the fixture and audited by embedding_norm_audit — the kernel's
# zero-norm fallback has no DuckDB analog).
_MMR_LAM = 0.7
_MMR_SQL = f"""
WITH RECURSIVE sims AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         floor((list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                       CAST(c.embedding AS DOUBLE[])))
               * 1000000 + 0.5) / 1000000 AS cosine_sim
  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < 10
), pool AS (
  SELECT query_id, neighbor_id, cosine_sim AS relevance
  FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine_sim DESC, neighbor_id)
              AS rn
    FROM sims
  ) WHERE rn <= 50
), pairs AS (
  SELECT p1.query_id, p1.neighbor_id AS a, p2.neighbor_id AS b,
         floor((list_cosine_similarity(CAST(e1.embedding AS DOUBLE[]),
                                       CAST(e2.embedding AS DOUBLE[])))
               * 1000000 + 0.5) / 1000000 AS sim
  FROM pool p1
  JOIN pool p2 ON p2.query_id = p1.query_id
  JOIN embeddings e1 ON e1.vec_id = p1.neighbor_id
  JOIN embeddings e2 ON e2.vec_id = p2.neighbor_id
), walk(query_id, cand, rel, max_sim, picked_rank, mmr_score, step) AS (
  SELECT query_id, neighbor_id, relevance, CAST(NULL AS DOUBLE),
         CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), CAST(0 AS BIGINT)
  FROM pool
  UNION ALL
  SELECT * FROM (
    WITH chosen AS (
      SELECT query_id, cand AS sel, score AS sel_score FROM (
        SELECT query_id, cand,
               floor(({_MMR_LAM!r} * rel
                      - {1 - _MMR_LAM!r} * coalesce(max_sim, 0.0))
                     * 1000000 + 0.5) / 1000000 AS score,
               row_number() OVER (
                 PARTITION BY query_id
                 ORDER BY floor(({_MMR_LAM!r} * rel
                                 - {1 - _MMR_LAM!r}
                                   * coalesce(max_sim, 0.0))
                                * 1000000 + 0.5) / 1000000 DESC,
                          cand) AS rn
        FROM walk WHERE picked_rank IS NULL
      ) WHERE rn = 1
    )
    SELECT c.query_id, c.cand, c.rel,
           CASE WHEN ch.sel IS NULL THEN c.max_sim
                WHEN c.max_sim IS NULL OR pr.sim > c.max_sim THEN pr.sim
                ELSE c.max_sim END,
           CASE WHEN c.cand = ch.sel THEN c.step + 1
                ELSE c.picked_rank END,
           CASE WHEN c.cand = ch.sel THEN ch.sel_score
                ELSE c.mmr_score END,
           c.step + 1
    FROM walk c
    LEFT JOIN chosen ch ON ch.query_id = c.query_id
    LEFT JOIN pairs pr ON pr.query_id = c.query_id AND pr.a = c.cand
                       AND pr.b = ch.sel
    WHERE c.step < 10
  )
)
SELECT query_id, cand AS neighbor_id, rel AS relevance,
       mmr_score,
       picked_rank AS mmr_rank
FROM walk
WHERE step = 10 AND picked_rank IS NOT NULL
ORDER BY query_id, mmr_rank
"""


QUERIES: dict[str, QuerySpec] = {
    "pq_ann_topk": QuerySpec(
        _pq_ann_topk,
        None,
        "product-quantization ANN top-5 (rows-only: seeded k-means "
        "codebooks + ADC shortlist; recall@5 >= 0.95 floor in pytest)",
    ),
    "mmr_diverse_topk": QuerySpec(
        _mmr_diverse_topk,
        _MMR_SQL,
        "MMR diversified top-10 (oracle since round 11: the greedy "
        "selection replays as a 10-step recursive CTE over the 6dp "
        "candidate/pair similarity grid; planted-cluster diversity "
        "floor stays in pytest)",
    ),
    "image_dhash_neardup": QuerySpec(
        _image_dhash_neardup,
        None,
        "perceptual dHash near-dup image pairs (rows-only: binary BMP "
        "decode kernel; planted-pair P/R = 1.0 in pytest)",
    ),
}
