"""DSIR-style data selection (Xie et al. 2023, "Data Selection for
Language Models via Importance Resampling"): score every document by
the log importance ratio of a TARGET hashed-n-gram distribution over
the RAW corpus distribution, then keep the top-scoring fraction.

Determinism contract (what the oracle checks):
  * features are unigrams + space-joined bigrams of the single-space
    tokenizer (the repo-wide text contract), hashed to B=4096 buckets
    as ``int(md5(gram)[:3 hex], 16)`` — the same md5 cross-engine
    contract as ops/sampling (DuckDB computes the identical bucket from
    ``md5(g)`` hex arithmetic);
  * per-bucket log weights are milli-nat INTEGERS (round(1000 * ln
    ratio)), so per-document scores are exact int64 dot products — no
    float summation-order hazard between engines;
  * selection is exact top-(n//4) under the total order
    (score DESC, id ASC).

Scale design (100 TB):
  * profiles: per-block ``np.bincount`` partials over the 4096-bucket
    space -> bounded-key tree_merge -> one tiny driver array. Two
    passes (target, raw), no shuffle of text.
  * scoring: stateless ``map_batches`` with the 32 KB weight vector in
    the closure; per-gram md5 is the declared contract (linear,
    parallel; a per-worker lru cache amortizes repeated grams).
  * selection: distributed sort on the integer score + limit — exact
    top-k is inherently a global order; for approximate selection at
    extreme scale compute a score threshold from ops/sketches.
    approx_quantiles and filter instead (documented trade).
"""

from __future__ import annotations

import hashlib
import math
from functools import lru_cache

import numpy as np
import pyarrow as pa

import ray.data

from ..stages.aggregate import tree_merge

BUCKETS = 4096  # exactly 3 hex chars of md5 — SQL-expressible


@lru_cache(maxsize=1 << 20)
def _bucket(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:3], 16)


def _grams(text: str) -> list[str]:
    """Unigrams + bigrams of the single-space tokenizer (repo contract:
    ``.split(" ")``, never bare ``.split()`` — the oracle uses DuckDB
    string_split(text, ' '))."""
    w = (text or "").split(" ")
    return w + [w[i] + " " + w[i + 1] for i in range(len(w) - 1)]


def _bucket_counts_batch(batch: pa.Table, text_col: str) -> pa.Table:
    counts = np.zeros(BUCKETS, np.int64)
    for t in batch[text_col].to_pylist():
        for g in _grams(t):
            counts[_bucket(g)] += 1
    nz = np.flatnonzero(counts)
    return pa.table({"bucket": pa.array(nz.astype(np.int64)),
                     "c": pa.array(counts[nz])})


def hashed_gram_profile(ds: "ray.data.Dataset",
                        text_col: str = "text") -> np.ndarray:
    """Per-bucket gram-instance counts over the dataset (len-4096
    int64 array). Bounded key space -> default tree_merge fan-in."""
    partials = ds.map_batches(_bucket_counts_batch, batch_format="pyarrow",
                              fn_kwargs={"text_col": text_col})
    df = tree_merge(partials, ["bucket"], {"c": "sum"}).to_pandas()
    out = np.zeros(BUCKETS, np.int64)
    out[df["bucket"].to_numpy()] = df["c"].to_numpy()
    return out


def dsir_log_weights(target_counts: np.ndarray,
                     raw_counts: np.ndarray) -> np.ndarray:
    """Integer milli-nat log importance weights per bucket with add-1
    smoothing: w_b = round(1000 * ln(((t_b+1)/(T+B)) / ((r_b+1)/(R+B)))).
    Scalar math.log loop so the pinned fixture reimplementation
    (fixtures/gen.ensure_dsir) reproduces the exact same doubles."""
    t_tot = int(target_counts.sum()) + BUCKETS
    r_tot = int(raw_counts.sum()) + BUCKETS
    return np.array(
        [round(1000 * (math.log(int(t) + 1) - math.log(t_tot)
                       - math.log(int(r) + 1) + math.log(r_tot)))
         for t, r in zip(target_counts, raw_counts)], np.int64)


def add_importance_weight(ds: "ray.data.Dataset", weights: np.ndarray,
                          text_col: str = "text",
                          out_col: str = "dsir_w") -> "ray.data.Dataset":
    """Append the int64 document score: sum of the bucket weight over
    every gram INSTANCE (occurrences count, as in the bag-of-hashed-
    grams generative model)."""
    w = np.asarray(weights, np.int64)

    def score(batch: pa.Table) -> pa.Table:
        out = np.empty(batch.num_rows, np.int64)
        for i, t in enumerate(batch[text_col].to_pylist()):
            s = 0
            for g in _grams(t):
                s += int(w[_bucket(g)])
            out[i] = s
        return batch.append_column(out_col, pa.array(out))

    return ds.map_batches(score, batch_format="pyarrow")


def dsir_select(ds: "ray.data.Dataset", target: "ray.data.Dataset",
                text_col: str = "text", id_col: str = "doc_id",
                keep_denominator: int = 4) -> "ray.data.Dataset":
    """End-to-end DSIR: profile target + raw, score, keep the exact
    top n//keep_denominator documents by (score DESC, id ASC).
    Materializes ``ds`` internally — the raw profile, count and sort
    each consume it, and re-executing a compute-carrying upstream
    chain three times would dwarf one object-store residency."""
    ds = ds.materialize()
    weights = dsir_log_weights(hashed_gram_profile(target, text_col),
                               hashed_gram_profile(ds, text_col))
    scored = add_importance_weight(ds, weights, text_col)
    k = ds.count() // keep_denominator
    return scored.sort(["dsir_w", id_col],
                       descending=[True, False]).limit(k)


def dsir_select_threshold(ds: "ray.data.Dataset",
                          target: "ray.data.Dataset",
                          text_col: str = "text",
                          id_col: str = "doc_id",
                          keep_fraction: float = 0.25,
                          m: int = 4096) -> "ray.data.Dataset":
    """Approximate DSIR selection for extreme scale: instead of the
    exact top-k's global sort, estimate the (1 - keep_fraction) score
    quantile with the mergeable weighted-sample sketch
    (ops/sketches.approx_quantiles, ~n/m rank error) and keep docs
    with score >= that threshold — one extra streaming pass and a tiny
    sketch merge, no all-to-all. The kept count is approximate by the
    sketch's rank error (declared); ordering within the kept set is
    irrelevant to training-data selection."""
    from .sketches import approx_quantiles
    weights = dsir_log_weights(hashed_gram_profile(target, text_col),
                               hashed_gram_profile(ds, text_col))
    scored = add_importance_weight(ds, weights, text_col).materialize()
    q = approx_quantiles(scored, "dsir_w", qs=(1.0 - keep_fraction,),
                         m=m)
    thr = int(q["value"].iloc[0])
    return scored.filter(expr=f"dsir_w >= {thr}")
