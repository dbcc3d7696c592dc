"""Exact-integer BM25 keyword retrieval (Robertson & Zaragoza 2009,
"The Probabilistic Relevance Framework: BM25 and Beyond") — the
lexical half of a similarity-search stack (the embedding half lives in
ops/similarity.py).

Determinism contract (what the oracle checks): with k1 = 6/5 and
b = 3/4 held as RATIONALS, each term's score contribution is computed
in pure int64 arithmetic by cross-multiplying the BM25 denominator
with 10 * sum_dl:

    contrib = idf_milli * tf * 22 * sd  //  (10*sd*tf + 3*sd + 9*dl*nd)

where tf = term count in the doc, dl = doc token count (single-space
tokenizer), sd = total corpus tokens, nd = corpus docs. idf_milli =
round(1000 * ln((N - df + 0.5) / (df + 0.5) + 1)) is an integer
computed once per query term (math.log on exact ints — the pinned
fixture reimplementation reproduces it, the DSIR/LM precedent). The
floor happens per term, so document scores are exact integer sums in
any engine; candidates are docs matching >= 1 query term; top-k is
the total order (score DESC, doc_id ASC).

Scale design (100 TB):
  * corpus stats (sd, nd) and per-term document frequencies are
    per-block partials over a key space bounded by the QUERY terms —
    tiny, tree-merged, never a corpus shuffle;
  * scoring is one stateless map_batches pass emitting only matching
    (query, doc, score) rows; per-block partial top-k keeps
    k x blocks x queries rows moving (the brute-force kNN precedent);
  * the classic inverted index is a PRE-BUILT artifact; this operator
    is the scan-side scorer you run when you have a query batch and a
    column of text — the same regime as brute-force kNN vs IVF.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..stages.aggregate import tree_merge

K = 10  # top-k per query


def corpus_stats(ds: "ray.data.Dataset",
                 text_col: str = "text") -> tuple[int, int]:
    """(total tokens, total docs) — two ints from per-block partials."""

    def part(b: pa.Table) -> pa.Table:
        toks = sum(len((t or "").split(" "))
                   for t in b[text_col].to_pylist())
        return pa.table({"sd": pa.array([toks], pa.int64()),
                         "nd": pa.array([b.num_rows], pa.int64())})

    df = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    return int(df["sd"].sum()), int(df["nd"].sum())


def doc_freqs(ds: "ray.data.Dataset", terms: list[str],
              text_col: str = "text") -> dict[str, int]:
    """Documents-containing counts for the query terms only (bounded
    key space -> default tree_merge fan-in)."""
    tset = list(dict.fromkeys(terms))

    def part(b: pa.Table) -> pa.Table:
        counts = dict.fromkeys(tset, 0)
        for t in b[text_col].to_pylist():
            present = set((t or "").split(" "))
            for q in tset:
                if q in present:
                    counts[q] += 1
        return pa.table({"term": pa.array(list(counts), pa.string()),
                         "df": pa.array(list(counts.values()),
                                        pa.int64())})

    out = tree_merge(ds.map_batches(part, batch_format="pyarrow"),
                     ["term"], {"df": "sum"}).to_pandas()
    return dict(zip(out["term"], (int(v) for v in out["df"])))


def idf_milli(df: int, n_docs: int) -> int:
    return round(1000 * math.log((n_docs - df + 0.5) / (df + 0.5) + 1))


def bm25_topk(ds: "ray.data.Dataset", queries: dict[int, list[str]],
              text_col: str = "text", id_col: str = "doc_id",
              k: int = K) -> pd.DataFrame:
    """Exact-integer BM25 top-k per query. Returns a small DataFrame
    (qid, doc_id, score) — k x |queries| rows."""
    sd, nd = corpus_stats(ds, text_col)
    all_terms = [t for ts in queries.values() for t in ts]
    dfs = doc_freqs(ds, all_terms, text_col)
    idf = {t: idf_milli(dfs.get(t, 0), nd) for t in set(all_terms)}
    # distinct terms per query (the qtf=1 convention)
    qterms = {qid: list(dict.fromkeys(ts)) for qid, ts in queries.items()}

    def score_block(b: pa.Table) -> pa.Table:
        qids, dids, scores = [], [], []
        ids = b[id_col].to_pylist()
        for did, t in zip(ids, b[text_col].to_pylist()):
            toks = (t or "").split(" ")
            dl = len(toks)
            tf: dict[str, int] = {}
            for w in toks:
                tf[w] = tf.get(w, 0) + 1
            den_c = 10 * sd
            den_0 = 3 * sd + 9 * dl * nd
            for qid, ts in qterms.items():
                s = 0
                hit = False
                for term in ts:
                    f = tf.get(term)
                    if f:
                        hit = True
                        s += (idf[term] * f * 22 * sd) \
                            // (den_c * f + den_0)
                if hit:
                    qids.append(qid)
                    dids.append(did)
                    scores.append(s)
        out = pa.table({"qid": pa.array(qids, pa.int64()),
                        id_col: pa.array(dids, pa.int64()),
                        "score": pa.array(scores, pa.int64())})
        # per-block partial top-k: only k rows per (block, query) move
        df = out.to_pandas().sort_values(
            ["qid", "score", id_col], ascending=[True, False, True])
        return pa.Table.from_pandas(df.groupby("qid").head(k),
                                    preserve_index=False)

    parts = ds.map_batches(score_block, batch_format="pyarrow") \
        .to_pandas()
    parts = parts.sort_values(["qid", "score", id_col],
                              ascending=[True, False, True])
    return parts.groupby("qid").head(k).reset_index(drop=True)
