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

from agent_data_pipeline_spark.llmdata import dedup, phash, pq, similarity
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
        similarity.lsh_topk(emb, queries, dim=64, k=5, n_tables=128, n_bits=8).collect()
    )
    ivf = _pairs(similarity.ivf_topk(emb, queries, k=5, n_cells=32, n_probe=12).collect())
    ivf_hi = _pairs(
        similarity.ivf_topk(emb, queries, k=5, n_cells=128, n_probe=40).collect()
    )
    pq_pairs = _pairs(
        pq.pq_topk(emb, queries, k=5, n_sub=16, n_codes=16, refine=100).collect()
    )

    # MMR diversified selection: planted 5-cluster redundancy fixture —
    # coverage (distinct clusters in the top-10) is the diversification
    # contract, reported next to plain top-k's coverage on the same data.
    import numpy as np

    _rng = np.random.default_rng(11)
    _centers = _rng.standard_normal((5, 16))
    _centers /= np.linalg.norm(_centers, axis=1, keepdims=True)
    _rows = [(0, [float(x) for x in 0.6 * _centers[0] + 0.4 * _centers.mean(axis=0)])]
    for _c in range(5):
        for _j in range(10):
            _v = _centers[_c] + 0.01 * _rng.standard_normal(16)
            _rows.append((100 + 10 * _c + _j, [float(x) for x in _v]))
    _mdf = spark.createDataFrame(_rows, "vec_id long, embedding array<float>")
    _mcorpus = _mdf.filter(F.col("vec_id") >= 100)
    _mq = _mdf.filter(F.col("vec_id") == 0)
    _plain10 = _pairs(similarity.cosine_topk_bruteforce(_mcorpus, _mq, k=10).collect())
    _mmr10 = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.mmr_topk(_mcorpus, _mq, k=10, pool=50, lam=0.5).collect()
    }
    _cov = lambda prs: len({(nid - 100) // 10 for _, nid in prs})

    # dHash perceptual near-dup: planted-pair P/R over the textured-BMP
    # fixture (80 planted near-dup renders among 240 images).
    _imgbase = spark.range(0, 240).selectExpr("id as doc_id")
    _media = phash.synthesize_textured_images(_imgbase, "doc_id", near_dup_every=3)
    _got_img = {
        (r["id_a"], r["id_b"])
        for r in phash.hamming_pairs(
            phash.with_dhash(_media), max_hamming=6, blocks=8
        ).collect()
    }
    _truth_img = {(i - 1, i) for i in range(2, 240, 3)}

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

    # ---- round-5 additions (round-4 verdict ask #7): planted-truth ------
    # metrics for the statistical / record-linkage families.

    # fuzzy_part_match — planted-pair recall of the blocked candidate
    # generation (the query's OWN dual-key blocking via
    # extras15.blocked_name_candidates, so the metric measures what the
    # driver runs). Mutated copies of real part names are planted two
    # ways: an edit in a LATER token keeps the first-token key, an edit
    # in the FIRST token breaks it — the round-5 single-key blocking
    # measured the latter at literally 0.0 recall; the last-token key
    # added in round 6 recovers those pairs while staying block-bounded.
    from agent_data_pipeline_spark.queries.extras15 import (
        blocked_name_candidates,
    )

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    base_names = [
        r["p_name"]
        for r in part.select("p_name")
        .distinct()
        .orderBy("p_name")
        .limit(50)
        .collect()
    ]
    planted_names = []  # (original, mutated, block_preserving)
    for i, nm in enumerate(base_names):
        toks = nm.split(" ")
        if i % 2 == 0 and len(toks) > 1:
            toks[-1] = toks[-1] + "x"  # later-token edit: same first-token block
            planted_names.append((nm, " ".join(toks), True))
        else:
            toks[0] = toks[0] + "x"  # first-token edit: first-token block broken
            planted_names.append((nm, " ".join(toks), False))
    aug_names = part.select("p_name").unionByName(
        spark.createDataFrame(
            [(m,) for _, m, _ in planted_names], "p_name string"
        )
    )
    names_m = aug_names.groupBy("p_name").agg(F.count(F.lit(1)).alias("m"))
    got_pairs = {
        (r["name_a"], r["name_b"])
        for r in (
            blocked_name_candidates(names_m)
            .filter(F.levenshtein(F.col("name_a"), F.col("name_b")) <= 10)
            .select("name_a", "name_b")
            .collect()
        )
    }

    def _ordered(x, y):
        return (x, y) if x < y else (y, x)

    keep_pairs = [_ordered(o, m) for o, m, p in planted_names if p]
    break_pairs = [_ordered(o, m) for o, m, p in planted_names if not p]
    fuzzy_keep_recall = sum(pr in got_pairs for pr in keep_pairs) / len(keep_pairs)
    fuzzy_break_recall = sum(pr in got_pairs for pr in break_pairs) / len(
        break_pairs
    )

    # cusum_changepoint — detection delay on planted level shifts:
    # deterministic synthetic daily series (LCG noise, ±10) with a known
    # shift day per series; run the query's exact CUSUM-argmax shape and
    # measure |detected − last pre-shift day| in days.
    shifts = {"A": (80, 40), "B": (30, 25), "C": (60, -30)}
    syn_rows = []
    for st, (s_day, delta) in shifts.items():
        for i in range(120):
            noise = ((i * 1103515245 + ord(st) * 12345) % 21) - 10
            level = 200 + (delta if i >= s_day else 0) + noise
            syn_rows.append((st, i, level))
    syn = spark.createDataFrame(syn_rows, "event_type string, day long, n long")
    stats_syn = syn.groupBy("event_type").agg(
        F.sum("n").alias("tot"), F.count(F.lit(1)).alias("n_days")
    )
    from pyspark.sql import Window as _W

    wc = (
        _W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(_W.unboundedPreceding, 0)
    )
    cus = (
        syn.join(F.broadcast(stats_syn), "event_type")
        .withColumn("dev", F.col("n") - F.col("tot") / F.col("n_days"))
        .withColumn("abs_cusum", F.abs(F.sum("dev").over(wc)))
    )
    wr = _W.partitionBy("event_type").orderBy(
        F.col("abs_cusum").desc(), F.col("day")
    )
    detected = {
        r["event_type"]: r["day"]
        for r in cus.withColumn("_rk", F.row_number().over(wr))
        .filter(F.col("_rk") == 1)
        .collect()
    }
    cusum_delays = {
        st: abs(detected[st] - (s_day - 1)) for st, (s_day, _) in shifts.items()
    }

    # knn_label_vote — (a) accuracy on the real fixture from the
    # registry query's confusion census; (b) planted accuracy: each
    # query is an exact copy of a corpus vector planted with two extra
    # copies, so ≥3 of its 5 neighbors carry the true label and the
    # majority vote MUST recover it (accuracy must be 1.0).
    from agent_data_pipeline_spark.queries import REGISTRY as _REG

    conf = _REG["knn_label_vote"].spark(spark, sf_dir).collect()
    knn_total = sum(r["n"] for r in conf)
    knn_correct = sum(
        r["n"] for r in conf if r["true_label"] == r["pred_label"]
    )

    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        src = emb.filter((F.col("vec_id") >= 20) & (F.col("vec_id") < 40))
        q_planted = src.withColumn("vec_id", F.col("vec_id") - 20)
        copies1 = src.withColumn("vec_id", F.col("vec_id") + 100_000)
        copies2 = src.withColumn("vec_id", F.col("vec_id") + 200_000)
        emb.filter(F.col("vec_id") >= 20).unionByName(q_planted).unionByName(
            copies1
        ).unionByName(copies2).write.mode("overwrite").parquet(
            f"{tmp}/embeddings.parquet"
        )
        conf_p = _REG["knn_label_vote"].spark(spark, tmp).collect()
        knn_planted_total = sum(r["n"] for r in conf_p)
        knn_planted_correct = sum(
            r["n"] for r in conf_p if r["true_label"] == r["pred_label"]
        )

    # nb_source_classifier — planted separable corpus: held-out accuracy
    # MUST be 1.0 (operator-correctness floor, same idea as the knn
    # planted vote). The fixture confusion accuracy is reported alongside
    # as a data property (sources share one vocabulary, so near-chance is
    # expected — analogous to knn_fixture_accuracy).
    from agent_data_pipeline_spark.llmdata.classify import nb_train_score

    nb_rows = []
    for i in range(20):
        nb_rows.append((2 * i, f"clean prose paragraph coherent sentence extra{i % 3}", True))
        nb_rows.append((2 * i + 1, f"zzqj garble xkcd noise spamspam extra{i % 3}", False))
    nb_df = spark.createDataFrame(
        nb_rows, "doc_id long, text string, lab boolean"
    ).withColumn("trn", F.col("doc_id") < 20)
    nb_scored = nb_train_score(
        nb_df, id_col="doc_id", text_col="text", label_col="lab", train_col="trn"
    ).collect()
    nb_planted_acc = sum(
        (r["margin"] > 0) == r["label"] for r in nb_scored
    ) / len(nb_scored)
    conf_nb = _REG["nb_source_classifier"].spark(spark, sf_dir).collect()
    nb_fix_total = sum(r["n_docs"] for r in conf_nb)
    nb_fix_correct = sum(
        r["n_docs"]
        for r in conf_nb
        if r["actual_curated"] == r["predicted_curated"]
    )

    out = {
        "sf_dir": sf_dir,
        "approx_quantile_max_rel_err": round(max_rel_err, 6),
        "ann_lsh_recall_at_5": round(len(lsh & exact) / len(exact), 4),
        "ann_ivf_recall_at_5": round(len(ivf & exact) / len(exact), 4),
        "ann_ivf_hi_recall_at_5": round(len(ivf_hi & exact) / len(exact), 4),
        "ann_pq_recall_at_5": round(len(pq_pairs & exact) / len(exact), 4),
        "mmr_cluster_coverage_at_10": _cov(_mmr10),
        "plain_topk_cluster_coverage_at_10": _cov(_plain10),
        "mmr_n_clusters": 5,
        "dhash_planted_recall": round(
            len(_got_img & _truth_img) / len(_truth_img), 4
        ),
        "dhash_planted_precision": round(
            len(_got_img & _truth_img) / len(_got_img), 4
        ) if _got_img else None,
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
        "fuzzy_block_preserving_recall": round(fuzzy_keep_recall, 4),
        "fuzzy_block_breaking_recall": round(fuzzy_break_recall, 4),
        "fuzzy_planted_pairs": len(keep_pairs) + len(break_pairs),
        "cusum_detection_delay_days": cusum_delays,
        "cusum_max_delay_days": max(cusum_delays.values()),
        # fixture accuracy is a DATA property (10 near-uniform labels →
        # chance 0.1; the synthetic embeddings carry only weak label
        # signal) — the operator-correctness metric is planted accuracy.
        # Renamed from `knn_accuracy` in round 6 so the low fixture
        # number is never misread as an operator defect.
        "knn_fixture_accuracy": round(knn_correct / knn_total, 4)
        if knn_total
        else None,
        "knn_chance_accuracy": 0.1,
        "knn_n_queries": knn_total,
        "knn_planted_accuracy": round(
            knn_planted_correct / knn_planted_total, 4
        )
        if knn_planted_total
        else None,
        "nb_planted_accuracy": round(nb_planted_acc, 4),
        "nb_fixture_accuracy": round(nb_fix_correct / nb_fix_total, 4)
        if nb_fix_total
        else None,
        "nb_fixture_n_docs": nb_fix_total,
        "nb_chance_accuracy": 0.5,
    }

    # round-7 late waves: self-certifying planted metrics pulled from
    # the operators' own outputs (the pytest planted suites carry the
    # deeper checks; these rows surface the headline numbers).
    from agent_data_pipeline_spark.queries import REGISTRY as _REG

    jw = _REG["jaro_winkler_linkage"].spark(spark, sf_dir).collect()
    out["jw_linkage_accuracy_min_block"] = min(r["accuracy"] for r in jw)
    out["jw_linkage_n_probes"] = int(sum(r["n_probes"] for r in jw))
    pro = _REG["embedding_procrustes_align"].spark(spark, sf_dir).collect()[0]
    out["procrustes_frob_before"] = pro["frob_before"]
    out["procrustes_frob_after"] = pro["frob_after"]
    out["procrustes_rotation_max_err"] = pro["rotation_max_err"]
    mk = _REG["markov_attribution"].spark(spark, sf_dir).collect()
    out["markov_share_sum"] = round(
        sum(r["attribution_share"] for r in mk), 6
    )
    out["markov_p_conv"] = mk[0]["p_conv"] if mk else None

    # round-9: two-stage re-rank recall vs the exact full-candidate
    # blended scoring (same 6dp rounding on both sides) — the shortlist
    # quality number tests/test_extras62.py floors at 0.80.
    import numpy as np

    docs_pd = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .collect()
    )
    emb_pd = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    V = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in emb_pd])
    V = V / np.linalg.norm(V, axis=1, keepdims=True)
    tok_sets = [set(r["text"].lower().split()) for r in docs_pd]

    def _r6(x):
        return np.floor(x * 1e6 + 0.5) / 1e6

    exact_top = {}
    for q in range(10):
        cos = V @ V[q]
        scored = []
        for c in range(len(V)):
            if c == q:
                continue
            jac = len(tok_sets[q] & tok_sets[c]) / len(tok_sets[q] | tok_sets[c])
            scored.append((_r6(0.5 * _r6(cos[c]) + 0.5 * _r6(jac)), -c))
        scored.sort(reverse=True)
        exact_top[q] = {-c for _s, c in scored[:5]}
    ce = _REG["crossenc_rerank_topk"].spark(spark, sf_dir).collect()
    got: dict[int, set[int]] = {}
    for r in ce:
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    out["crossenc_rerank_recall_at_5"] = round(
        sum(len(got[q] & exact_top[q]) / 5 for q in range(10)) / 10, 4
    )

    # Hybrid BM25 ∪ ANN (round 10): same exact blended top-5 target, so
    # the number is directly comparable to crossenc's vector-only
    # recall. The union candidate set is a superset of the vector
    # shortlist and the re-ranker scores candidates exactly, so hybrid
    # recall is ≥ vector-only BY CONSTRUCTION — measured here for the
    # round-over-round record. (The designed lift is proven on the
    # planted lexical-twin corpus in tests/test_retrieval_planted.py,
    # deterministically 1.0 vs 0.6; the sf fixture's 31-word vocabulary
    # makes its lexical arm near-degenerate — see
    # queries/extras63.py docstring.)
    hy = _REG["hybrid_bm25_ann_rerank"].spark(spark, sf_dir).collect()
    hgot: dict[int, set[int]] = {}
    for r in hy:
        hgot.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    out["hybrid_rerank_recall_at_5"] = round(
        sum(len(hgot[q] & exact_top[q]) / 5 for q in range(10)) / 10, 4
    )

    # Composed PRF → hybrid (round 11, VERDICT r10 item 3): same
    # target, same re-ranker — the only moving part is the lexical
    # arm's PRF-expanded weighted query set. Compare directly against
    # hybrid_rerank_recall_at_5 (the 0.90 line). Registry promotion
    # is gated on this number materially beating it.
    from agent_data_pipeline_spark.llmdata import retrieval as _ret

    hp = (
        _ret.hybrid_bm25_ann_rerank(
            emb,
            spark.read.parquet(f"{sf_dir}/documents.parquet"),
            list(range(10)),
            shortlist_k=50,
            final_k=5,
            n_cells=32,
            n_probe=16,
            prf_expand=True,
        )
        .collect()
    )
    pgot: dict[int, set[int]] = {}
    for r in hp:
        pgot.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    out["hybrid_prf_rerank_recall_at_5"] = round(
        sum(len(pgot.get(q, set()) & exact_top[q]) / 5 for q in range(10))
        / 10,
        4,
    )

    # Round-13 near-dup gate (md5-portable banded MinHash, 12/3x4):
    # recall of the gate's planted re-crawls whose original IS in the
    # reference band store (doc_id % 5 == 1 and % 3 != 0, 2-token edit
    # suffix) — the quality number behind stream_neardup_gate /
    # incremental_neardup_census; tests/test_extras66.py floors it at
    # 0.90 on sf0.001.
    from agent_data_pipeline_spark.llmdata import incremental as _inc

    _alldocs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    _ref = _alldocs.filter(F.col("doc_id") % 3 != 0).select("doc_id", "text")
    _refkeys = (
        _inc.portable_band_keys(_ref).select("band", "band_key").distinct()
    )
    _planted = _alldocs.filter(
        (F.col("doc_id") % 5 == 1) & (F.col("doc_id") % 3 != 0)
    ).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" rev2 edit")).alias("text"),
    )
    _n_planted = _planted.count()
    _n_flagged = (
        _inc.portable_band_keys(_planted)
        .join(_refkeys, ["band", "band_key"], "left_semi")
        .select("doc_id")
        .distinct()
        .count()
    )
    out["neardup_gate_planted_recall"] = round(_n_flagged / _n_planted, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
