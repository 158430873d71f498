"""Planted-fixture tests for the hybrid BM25 ∪ ANN retrieval arm
(llmdata/retrieval.py, registry ``hybrid_bm25_ann_rerank``).

The sf fixtures CANNOT measure the hybrid's point: their global
vocabulary is 31 words (median df 388/500 — every posting list covers
~80% of the corpus), so a lexical arm would "win" by accidental brute
force (degenerate-fixture-labels). This file plants a richer-vocab
corpus instead, constructed so the lift is PROVABLE, not statistical:

* 10 queries, embeddings = standard basis vectors e_q (dims 0..9).
* 3 SEMANTIC twins per query: cosine exactly 0.9 with e_q, sharing
  4/12 query tokens (Jaccard 0.2) — any vector arm finds these.
* 3 LEXICAL twins per query: embeddings supported ONLY on spare dims
  10..15 ⇒ cosine with every query is EXACTLY 0, yet they share 10/12
  query tokens (Jaccard 10/14 ≈ 0.714). They also get the HIGHEST ids,
  so cosine-tie ordering (cosine desc, id asc) provably keeps them out
  of ANY vector top-k shortlist with k ≤ |background|: no shortlist
  depth short of the whole corpus surfaces them.
* 330 background docs: embeddings also on spare dims (cosine 0 with
  queries), tokens from a disjoint pool (Jaccard 0 with queries).

Exact blended top-5 per query (0.5·cosine + 0.5·Jaccard, the engine's
6dp floor rounding) is therefore 3 semantic + 2 lexical twins — and a
vector-only two-stage pipeline caps at recall 3/5 = 0.6 BY
CONSTRUCTION, mirroring (and explaining) the 0.86 saturation the
round-9 crossenc re-ranker measured on real-ish data
(queries/extras62.py). The hybrid's BM25 arm surfaces every twin
(only twins share ≥1 query token, so the posting join candidates are
exactly the twins), lifting recall to 1.0 regardless of IVF cell luck
— the planted test is deterministic.

Also pins multi-query BM25 itself against a brute-force Python BM25
(same Lucene-idf formula, 6dp) on the planted corpus.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from agent_data_pipeline_spark.llmdata import retrieval

DIM = 16
N_QUERIES = 10
N_SEM = 3
N_LEX = 3
N_BG = 330


def _rnd6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def _planted_corpus():
    """Deterministic corpus: (doc_id, text, embedding) triples.

    Ids: queries 0..9, semantic twins 10..39, background 40..369,
    lexical twins 370..399 (highest — the tie-order argument above).
    """
    rng = np.random.RandomState(7)
    docs = []

    def spare_unit():
        v = np.zeros(DIM)
        v[10:] = rng.randn(6)
        return v / np.linalg.norm(v)

    # queries: e_q, 12 private tokens each (disjoint 30-token slices)
    for q in range(N_QUERIES):
        v = np.zeros(DIM)
        v[q] = 1.0
        toks = [f"w{30 * q + j:04d}" for j in range(12)]
        docs.append((q, " ".join(toks), v))
    # semantic twins: cosine 0.9 exactly, 4 shared + 8 filler tokens
    nid = N_QUERIES
    for q in range(N_QUERIES):
        for j in range(N_SEM):
            v = 0.9 * docs[q][2] + math.sqrt(1 - 0.81) * spare_unit()
            toks = [f"w{30 * q + i:04d}" for i in range(4)] + [
                f"sem{q}_{j}_{i}" for i in range(8)
            ]
            docs.append((nid, " ".join(toks), v))
            nid += 1
    # background: spare-dim embeddings, disjoint token pool
    for b in range(N_BG):
        toks = [f"bg{b}_{i}" for i in range(12)]
        docs.append((nid, " ".join(toks), spare_unit()))
        nid += 1
    # lexical twins: spare-dim embeddings (cosine 0 with every query),
    # 10 shared + 2 filler tokens, HIGHEST ids
    for q in range(N_QUERIES):
        for j in range(N_LEX):
            toks = [f"w{30 * q + i:04d}" for i in range(10)] + [
                f"lex{q}_{j}_{i}" for i in range(2)
            ]
            docs.append((nid, " ".join(toks), spare_unit()))
            nid += 1
    return docs


@pytest.fixture(scope="module")
def corpus():
    return _planted_corpus()


@pytest.fixture(scope="module")
def frames(spark, corpus):
    docs_df = spark.createDataFrame(
        [(d, txt) for d, txt, _v in corpus], "doc_id long, text string"
    )
    emb_df = spark.createDataFrame(
        [(d, [float(x) for x in v]) for d, _txt, v in corpus],
        "vec_id long, embedding array<float>",
    )
    return docs_df, emb_df


def _exact_blend_top5(corpus):
    """Brute-force exact blended top-5 per query, the engine's rounding
    and tie order (score desc, neighbor_id asc). float32-quantized
    vectors to match the array<float> storage the engine reads."""
    V = np.stack([v for _d, _t, v in corpus]).astype(np.float32).astype(np.float64)
    V = V / np.linalg.norm(V, axis=1, keepdims=True)
    toksets = [set(t.split()) for _d, t, _v in corpus]
    ids = [d for d, _t, _v in corpus]
    exact = {}
    for q in range(N_QUERIES):
        scored = []
        for i, d in enumerate(ids):
            if d == q:
                continue
            cos = _rnd6(float(V[i] @ V[q]))
            jac = _rnd6(
                len(toksets[i] & toksets[q]) / len(toksets[i] | toksets[q])
            )
            scored.append((_rnd6(0.5 * cos + 0.5 * jac), -d))
        scored.sort(reverse=True)
        exact[q] = {-d for _s, d in scored[:5]}
    return exact


def test_corpus_is_as_planted(corpus):
    """The construction invariants the recall argument rests on."""
    by_id = {d: (t, v) for d, t, v in corpus}
    for q in range(N_QUERIES):
        qv = by_id[q][1]
        qt = set(by_id[q][0].split())
        for j in range(N_LEX):
            lid = N_QUERIES + N_SEM * N_QUERIES + N_BG + q * N_LEX + j
            lt, lv = by_id[lid]
            assert float(qv @ lv) == 0.0  # exactly orthogonal
            assert len(qt & set(lt.split())) == 10
        for j in range(N_SEM):
            sid = N_QUERIES + q * N_SEM + j
            st, sv = by_id[sid]
            assert abs(float(qv @ sv) - 0.9) < 1e-9
            assert len(qt & set(st.split())) == 4


def test_bm25_matches_bruteforce(spark, corpus, frames):
    """Multi-query BM25 (posting-list equi-join plan) equals a
    brute-force Python BM25 with the same Lucene idf at 6dp."""
    docs_df, _emb = frames
    qt = retrieval.query_terms_from_docs(docs_df, list(range(N_QUERIES)))
    got = {
        (r["query_id"], r["doc_id"]): r["bm25"]
        for r in retrieval.bm25_scores(docs_df, qt).collect()
    }

    k1, b = 1.2, 0.75
    toks = [t.split() for _d, t, _v in corpus]
    ids = [d for d, _t, _v in corpus]
    n_docs = len(ids)
    avgdl = sum(len(t) for t in toks) / n_docs
    df_map: dict[str, int] = {}
    for t in toks:
        for w in set(t):
            df_map[w] = df_map.get(w, 0) + 1
    expected = {}
    for q in range(N_QUERIES):
        qterms = set(toks[q])
        for i, d in enumerate(ids):
            s = 0.0
            for w in qterms:
                tf = toks[i].count(w)
                if tf == 0:
                    continue
                idf = math.log(
                    1 + (n_docs - df_map[w] + 0.5) / (df_map[w] + 0.5)
                )
                s += idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * len(toks[i]) / avgdl)
                )
            if s > 0.0:
                expected[(q, d)] = _rnd6(s)
    assert set(got) == set(expected)
    bad = {k: (got[k], expected[k]) for k in got if got[k] != expected[k]}
    assert not bad, f"{len(bad)} BM25 scores differ; first: {list(bad.items())[:3]}"


def test_hybrid_recovers_lexical_twins(spark, corpus, frames):
    """The headline claim (VERDICT r9 item 1): on a corpus whose
    lexical twins are invisible to ANY vector shortlist, the hybrid's
    blended-top-5 recall goes to 1.0 while the vector-only two-stage
    pipeline caps at 0.6 by construction — materially above the 0.86
    vector-only saturation crossenc_rerank_topk documents."""
    docs_df, emb_df = frames
    exact = _exact_blend_top5(corpus)

    out = retrieval.hybrid_bm25_ann_rerank(
        emb_df,
        docs_df,
        list(range(N_QUERIES)),
        shortlist_k=50,
        final_k=5,
        n_cells=16,
        n_probe=8,
    ).collect()
    got: dict[int, set[int]] = {}
    lex_only_hits = 0
    for r in out:
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        if r["from_lex"] and not r["from_vec"]:
            lex_only_hits += 1
    assert set(got) == set(range(N_QUERIES))
    hybrid_recall = sum(len(got[q] & exact[q]) / 5 for q in range(N_QUERIES)) / N_QUERIES

    # vector-only simulation: exact-cosine top-50 shortlist (an upper
    # bound on what ANY vector arm — IVF, LSH, brute force — can
    # surface), then the same blend within it
    V = np.stack([v for _d, _t, v in corpus]).astype(np.float32).astype(np.float64)
    V = V / np.linalg.norm(V, axis=1, keepdims=True)
    toksets = [set(t.split()) for _d, t, _v in corpus]
    ids = [d for d, _t, _v in corpus]
    vec_recall = 0.0
    for q in range(N_QUERIES):
        cos = [
            (_rnd6(float(V[i] @ V[q])), -d)
            for i, d in enumerate(ids)
            if d != q
        ]
        cos.sort(reverse=True)
        short = [-d for _c, d in cos[:50]]
        blend = []
        for d in short:
            i = ids.index(d)
            c = _rnd6(float(V[i] @ V[q]))
            j = _rnd6(len(toksets[i] & toksets[q]) / len(toksets[i] | toksets[q]))
            blend.append((_rnd6(0.5 * c + 0.5 * j), -d))
        blend.sort(reverse=True)
        vec_recall += len({-d for _s, d in blend[:5]} & exact[q]) / 5
    vec_recall /= N_QUERIES

    assert vec_recall <= 0.7, f"planting failed: vector-only recall {vec_recall}"
    assert hybrid_recall >= 0.95, f"hybrid recall@5 {hybrid_recall} below floor"
    assert hybrid_recall - vec_recall >= 0.25, (
        f"no material lift: hybrid {hybrid_recall} vs vector-only {vec_recall}"
    )
    # provenance sanity: the recovered lexical twins really came from
    # the lexical arm alone (2 per query in the exact top-5)
    assert lex_only_hits >= 2 * N_QUERIES - 2


def test_prf_fed_hybrid_holds_planted_recall(spark, corpus, frames):
    """Composed PRF → hybrid pipeline (VERDICT r10 item 3): the
    lexical arm consumes RM3-expanded weighted queries instead of raw
    query terms. On this fixture the plain hybrid is already at
    recall 1.0 (every twin is in the candidate union and the
    re-ranker is exact), so the composition has no headroom to BEAT —
    the planted check is that PRF expansion does not POISON the
    candidate set: the expansion terms come from twin filler tokens
    (sem*/lex*), which could flood the lexical shortlist with
    twin-adjacent background; recall must stay at the plain hybrid's
    floor. The sf-fixture comparison (where plain hybrid measures
    0.90) lives in quality.py as hybrid_prf_rerank_recall_at_5."""
    docs_df, emb_df = frames
    exact = _exact_blend_top5(corpus)

    out = retrieval.hybrid_bm25_ann_rerank(
        emb_df,
        docs_df,
        list(range(N_QUERIES)),
        shortlist_k=50,
        final_k=5,
        n_cells=16,
        n_probe=8,
        prf_expand=True,
    ).collect()
    got: dict[int, set[int]] = {}
    for r in out:
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert set(got) == set(range(N_QUERIES))
    prf_recall = (
        sum(len(got[q] & exact[q]) / 5 for q in range(N_QUERIES)) / N_QUERIES
    )
    assert prf_recall >= 0.95, (
        f"PRF-fed hybrid recall@5 {prf_recall} fell below the plain "
        f"hybrid's planted floor — expansion poisoned the shortlist"
    )
