#!/usr/bin/env python
"""Approximate-operator quality metrics, emitted as ONE JSON line.

The driver's rows-only check proves the approx operators run; the test
suite asserts recall FLOORS; this script emits the MEASURED values so
round-over-round quality regressions are visible, not just pass/fail
(ANN recall@5 vs the exact brute-force top-k, MinHash-LSH pair recall
vs exact same-shingle-space Jaccard pairs).

Usage: python quality.py > QUALITY_r{N}.json
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01 — quality is
       measured where the correctness gate runs; pass sf0.1 for scale).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from agent_data_pipeline_spark.llmdata import dedup, similarity
from agent_data_pipeline_spark.session import get_spark


def _pairs(rows, a="query_id", b="neighbor_id"):
    return {(r[a], r[b]) for r in rows}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="agent_data_pipeline_spark-quality")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    emb.count()
    queries = emb.filter(F.col("vec_id") < 10)

    # Same parameters as the registry queries (queries/llmdata_q.py) so
    # the numbers describe what the driver actually runs.
    exact = _pairs(similarity.cosine_topk_bruteforce(emb, queries, k=5).collect())
    lsh = _pairs(
        similarity.lsh_topk(emb, queries, dim=64, k=5, n_tables=64, n_bits=8).collect()
    )
    ivf = _pairs(similarity.ivf_topk(emb, queries, k=5, n_cells=32, n_probe=12).collect())

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 100
    ).cache()
    docs.count()
    exact_jac = {
        (r["id_a"], r["id_b"])
        for r in dedup.token_jaccard_pairs(
            docs, threshold=0.7, max_df_ratio=1.0
        ).collect()
    }
    lsh_jac = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_pairs(
            docs, num_hashes=64, bands=16, shingle_n=1, threshold=0.7
        ).collect()
    }

    # Planted-duplicate quality for passage- and semantic-dedup: append
    # exact copies under shifted (higher) ids, so every planted unit /
    # vector duplicates a lower-id original and a correct operator must
    # flag exactly the planted side. recall = planted items flagged;
    # precision = of the flags the planting ADDED (vs the base corpus's
    # natural duplicates), the fraction that are planted items.
    copies = docs.filter(F.col("doc_id") < 30).withColumn(
        "doc_id", F.col("doc_id") + 10_000
    )
    aug = docs.unionByName(copies)

    def _passage_flags(df):
        rows = dedup.passage_dedup(df, unit_tokens=8).collect()
        return {r["doc_id"]: (r["n_units"], r["n_kept"]) for r in rows}

    base_p = _passage_flags(docs)
    aug_p = _passage_flags(aug)
    planted_units = sum(n for n, _ in (aug_p[d] for d in aug_p if d >= 10_000))
    planted_flagged = sum(
        n - k for n, k in (aug_p[d] for d in aug_p if d >= 10_000)
    )
    base_flagged = sum(n - k for n, k in base_p.values())
    delta_flagged = sum(n - k for n, k in aug_p.values()) - base_flagged

    emb_copies = emb.filter(F.col("vec_id") < 50).withColumn(
        "vec_id", F.col("vec_id") + 10_000
    )
    emb_aug = emb.unionByName(emb_copies)
    sem_base = {
        r["vec_id"]
        for r in similarity.semantic_dedup(emb, threshold=0.92, n_cells=16).collect()
        if r["is_dup"] == 1
    }
    sem_aug = {
        r["vec_id"]
        for r in similarity.semantic_dedup(emb_aug, threshold=0.92, n_cells=16).collect()
        if r["is_dup"] == 1
    }
    sem_planted_flagged = len({v for v in sem_aug if v >= 10_000})
    sem_delta = len(sem_aug) - len(sem_base)

    # approx_percentile sketch error at the registry's operating point
    # (approx_quantile_kit: accuracy 10000, grouped by return flag):
    # max relative deviation from the exact interpolated percentile.
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    both = li.groupBy("l_returnflag").agg(
        F.expr(
            "approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99), 10000)"
        ).alias("a"),
        F.expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))").alias("e"),
    )
    max_rel_err = 0.0
    for r in both.collect():
        for av, ev in zip(r["a"], r["e"]):
            if ev:
                max_rel_err = max(max_rel_err, abs(av - ev) / abs(ev))

    out = {
        "sf_dir": sf_dir,
        "approx_quantile_max_rel_err": round(max_rel_err, 6),
        "ann_lsh_recall_at_5": round(len(lsh & exact) / len(exact), 4),
        "ann_ivf_recall_at_5": round(len(ivf & exact) / len(exact), 4),
        "ann_n_queries": 10,
        "minhash_pair_recall": round(
            len(lsh_jac & exact_jac) / len(exact_jac), 4
        ) if exact_jac else None,
        "minhash_pair_precision": round(
            len(lsh_jac & exact_jac) / len(lsh_jac), 4
        ) if lsh_jac else None,
        "minhash_exact_pairs": len(exact_jac),
        "minhash_lsh_pairs": len(lsh_jac),
        "passage_planted_recall": round(planted_flagged / planted_units, 4)
        if planted_units
        else None,
        "passage_planted_precision": round(planted_flagged / delta_flagged, 4)
        if delta_flagged
        else None,
        "semantic_planted_recall": round(sem_planted_flagged / 50, 4),
        "semantic_planted_precision": round(sem_planted_flagged / sem_delta, 4)
        if sem_delta
        else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
