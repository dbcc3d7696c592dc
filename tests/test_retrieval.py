"""Exact-integer BM25 (ops/retrieval.py) vs a scalar reference."""

import math

import ray.data

from logagent_js_ray.ops.retrieval import (bm25_topk, corpus_stats,
                                           doc_freqs, idf_milli)

TEXTS = {
    0: "fast query engine for fast logs",
    1: "slow batch engine for big logs",
    2: "fast fast fast query",
    3: "unrelated words entirely here now",
    4: "query engine",
}


def brute_bm25(texts, queries, k=10):
    nd = len(texts)
    toks = {d: t.split(" ") for d, t in texts.items()}
    sd = sum(len(v) for v in toks.values())
    out = {}
    for qid, ts in queries.items():
        terms = list(dict.fromkeys(ts))
        rows = []
        for d, tk in toks.items():
            s, hit = 0, False
            dl = len(tk)
            for term in terms:
                f = tk.count(term)
                if f:
                    hit = True
                    df = sum(term in set(v) for v in toks.values())
                    idf = round(1000 * math.log((nd - df + 0.5)
                                                / (df + 0.5) + 1))
                    s += (idf * f * 22 * sd) \
                        // (10 * sd * f + 3 * sd + 9 * dl * nd)
            if hit:
                rows.append((d, s))
        rows.sort(key=lambda r: (-r[1], r[0]))
        out[qid] = rows[:k]
    return out


def make_ds():
    return ray.data.from_items(
        [{"doc_id": d, "text": t} for d, t in TEXTS.items()])


def test_corpus_stats_and_df(ray_session):
    ds = make_ds()
    sd, nd = corpus_stats(ds)
    assert nd == 5 and sd == sum(len(t.split(" ")) for t in TEXTS.values())
    dfs = doc_freqs(ds, ["fast", "engine", "nowhere"])
    assert dfs == {"fast": 2, "engine": 3, "nowhere": 0}


def test_bm25_matches_scalar_reference(ray_session):
    queries = {7: ["fast", "query"], 8: ["big", "logs"],
               9: ["nowhere", "words"]}
    got = bm25_topk(make_ds(), queries)
    want = brute_bm25(TEXTS, queries)
    for qid, rows in want.items():
        sub = got[got.qid == qid]
        assert list(zip(sub.doc_id, sub.score)) == rows
    # ranking sanity: tf-heavy doc 2 tops the 'fast query' query
    assert got[got.qid == 7].iloc[0].doc_id == 2
    # no candidates share zero matching terms
    assert 3 not in set(got[got.qid == 7].doc_id)


def test_idf_penalizes_common_terms():
    assert idf_milli(1, 100) > idf_milli(50, 100) > idf_milli(99, 100)
