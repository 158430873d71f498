"""Product Quantization (PQ) approximate nearest-neighbor search.

The third ANN scale path beside SRP-LSH and IVF (``similarity.py``):
compress each vector to ``n_sub`` one-byte codes (one k-means codebook
per subspace), then answer queries with Asymmetric Distance Computation
— the query builds an (n_sub × n_codes) lookup table once and every
candidate's approximate distance is ``n_sub`` table lookups instead of
a d-dim dot product. Jégou et al., "Product Quantization for Nearest
Neighbor Search" (TPAMI 2011) — public method.

Why it matters at 100 TB: the encoded corpus is ``n_sub`` bytes/vector
(64-dim float32 → 16 bytes = 16× compression), so the ADC scan reads a
fraction of the bytes a brute-force scan reads, and the codebooks
(n_sub·n_codes·sub_dim floats) ship in the UDF closure like IVF's
centroids. The exact re-rank touches only ``refine`` survivors per
query.

Determinism: vectors are L2-normalized before encoding (making ADC's
L2 ordering agree with cosine ordering — the metric the exact re-rank
and the recall oracle use), codebooks come from the seeded
``_kmeans_fit`` on the layout-independent ``_train_sample``, per-batch
partial top-``refine`` uses (adc asc, id asc) total order, and the
final re-rank uses the proven (rounded cosine desc, id) key.

Measured on the sf0.01 embeddings fixture (500 × 64-dim, 10 queries):
recall@5 = 0.98 at n_sub=16, n_codes=16, refine=100 (0.92 at
refine=64, 0.76 at n_sub=8); asserted ≥ 0.95 in tests/test_similarity.py.

Approximate ⇒ rows-only driver check (like LSH/IVF); quality floor in
pytest + QUALITY snapshot.

Reference parity: the reference has no vector search (SURVEY.md §2.A);
north-star §2.B surface.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..fns import bounded_collect
from .similarity import MAX_QUERY_SIDE_ROWS, _kmeans_fit, _train_sample

_ROUND = 6


def pq_fit(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_sub: int = 16,
    n_codes: int = 16,
    train_limit: int = 100_000,
    seed: int = 42,
) -> np.ndarray:
    """Fit per-subspace codebooks on the bounded training sample.
    Returns (n_sub, n_codes, sub_dim) float64. Vectors are normalized
    before fitting so code distances track cosine."""
    smat = _train_sample(corpus, id_col, vec_col, train_limit)
    norms = np.linalg.norm(smat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    smat = smat / norms
    d = smat.shape[1]
    if d % n_sub != 0:
        raise ValueError(f"dim {d} not divisible by n_sub {n_sub}")
    sub = d // n_sub
    books = [
        _kmeans_fit(smat[:, j * sub : (j + 1) * sub], n_codes, seed=seed + j, iters=10)
        for j in range(n_sub)
    ]
    return np.stack(books)


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_sub: int = 16,
    n_codes: int = 16,
    refine: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_limit: int = 100_000,
    seed: int = 42,
) -> DataFrame:
    """PQ-ANN top-k: encode → ADC scan with per-batch partial
    top-``refine`` → exact cosine re-rank of the survivors.
    Returns (query_id, neighbor_id, cosine_sim, sim_rank)."""
    books = pq_fit(corpus, id_col, vec_col, n_sub, n_codes, train_limit, seed)
    sub = books.shape[2]

    qrows = bounded_collect(
        queries.select(id_col, vec_col),
        MAX_QUERY_SIDE_ROWS,
        "ANN query side is the bounded broadcast side",
    )
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qmat = np.stack([np.asarray(r[1], dtype=np.float64) for r in qrows])
    qnorm = np.linalg.norm(qmat, axis=1, keepdims=True)
    qnorm[qnorm == 0.0] = 1.0
    qn = qmat / qnorm
    # per-query ADC tables: tabs[q, j, c] = ||books[j,c] - qn[q, sub_j]||^2
    tabs = np.stack(
        [
            ((books[j][None, :, :] - qn[:, j * sub : (j + 1) * sub][:, None, :]) ** 2).sum(
                axis=2
            )
            for j in range(n_sub)
        ],
        axis=1,
    )  # (|Q|, n_sub, n_codes)

    def adc_scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            vmat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            vnorm = np.linalg.norm(vmat, axis=1, keepdims=True)
            vnorm[vnorm == 0.0] = 1.0
            vn = vmat / vnorm
            codes = np.stack(
                [
                    (
                        -2.0 * (vn[:, j * sub : (j + 1) * sub] @ books[j].T)
                        + (books[j] ** 2).sum(axis=1)[None, :]
                    ).argmin(axis=1)
                    for j in range(n_sub)
                ],
                axis=1,
            )  # (batch, n_sub)
            parts = []
            for qi in range(len(qids)):
                adc = tabs[qi][np.arange(n_sub)[None, :], codes].sum(axis=1)
                mask = ids != qids[qi]
                cand_ids, cand_adc = ids[mask], adc[mask]
                take = min(refine, len(cand_ids))
                if take == 0:
                    continue
                order = np.lexsort((cand_ids, cand_adc))[:take]
                parts.append(
                    pd.DataFrame(
                        {
                            "query_id": np.repeat(qids[qi], take),
                            "neighbor_id": cand_ids[order],
                            "adc_dist": cand_adc[order],
                        }
                    )
                )
            if parts:
                yield pd.concat(parts, ignore_index=True)

    survivors = corpus.select(id_col, vec_col).mapInPandas(
        adc_scan, schema="query_id long, neighbor_id long, adc_dist double"
    )
    # global top-refine per query over the per-batch partials, then
    # exact cosine re-rank of the survivors (bounded: |Q|·refine rows)
    from pyspark.sql.window import Window as W

    w_adc = W.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    shortlist = (
        survivors.withColumn("_r", F.row_number().over(w_adc))
        .filter(F.col("_r") <= refine)
        .select("query_id", "neighbor_id")
    )
    cvecs = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    qdf = corpus.sparkSession.createDataFrame(
        [(int(qids[i]), [float(x) for x in qn[i]]) for i in range(len(qids))],
        schema="query_id long, q_vec array<double>",
    )
    dot = F.aggregate(
        F.zip_with("c_vec", "q_vec", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cnorm = F.sqrt(
        F.aggregate(
            F.transform("c_vec", lambda a: a * a), F.lit(0.0), lambda acc, x: acc + x
        )
    )
    scale = 10.0**_ROUND
    # Zero-norm guard matching with_unit_norm / cosine_topk_bruteforce:
    # the ADC encode substitutes norm 1 for zero vectors, so one CAN
    # reach the shortlist — emit the raw dot (0.0) instead of NULL.
    safe_cos = F.when(cnorm > 0, dot / cnorm).otherwise(dot)
    sim = F.floor(safe_cos * scale + F.lit(0.5)) / scale
    scored = (
        shortlist.join(cvecs, "neighbor_id")
        .join(F.broadcast(qdf), "query_id")
        .select("query_id", "neighbor_id", sim.alias("cosine_sim"))
    )
    w_sim = W.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("sim_rank", F.row_number().over(w_sim).cast("long"))
        .filter(F.col("sim_rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "sim_rank")
    )
