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

Hash modes (round-4 verdict item #2): ``hashed="md5"`` is the
SQL-expressible oracle contract above; ``hashed="poly"`` is the scale
mode — the same uint64 polynomial rolling-hash machinery as
ops/substr (vectorized over one concatenated utf-32 codepoint buffer,
zero per-gram Python), bucketed by a Fibonacci mix. Bucket ASSIGNMENT
differs between modes (a declared approximation, the hashed_shingles
precedent); gram EXTRACTION is identical — a token span hash covers
exactly the ``w1 + ' ' + w2`` characters, so equal grams collide
across documents exactly as in md5 mode. Profile and scoring must use
the same mode. Measured A/B in BASELINE.md (~25x on sf0.1 documents).
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


_MIX = np.uint64(0x9E3779B97F4A7C15)  # Fibonacci mix before % BUCKETS


def poly_gram_buckets(texts: list) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized (bucket, doc_index) for every unigram + space-joined
    bigram of every text — the ``hashed="poly"`` gram extractor.

    Same gram DEFINITION as :func:`_grams` (``.split(" ")`` tokens,
    empties included): a token is a maximal possibly-empty span between
    spaces/document edges, and the bigram ``w1 + ' ' + w2`` is exactly
    the contiguous character span from w1's start to w2's end, so one
    position-independent polynomial span hash (the ops/substr formula
    over a shared prefix-sum array) covers both gram kinds with zero
    per-gram Python. Empty tokens hash to 0 consistently (md5 mode
    gives them one shared bucket too — the md5('') bucket)."""
    from .substr import _B, _BINV, _pows
    ndocs = len(texts)
    lens = np.array([len(t or "") for t in texts], np.int64)
    buf = np.frombuffer("".join(t or "" for t in texts)
                        .encode("utf-32-le"), np.uint32).astype(np.uint64)
    n = buf.shape[0]
    doc_of_char = np.repeat(np.arange(ndocs), lens)
    doc_ends = np.cumsum(lens)
    doc_starts = doc_ends - lens
    sp = np.flatnonzero(buf == np.uint64(32))        # space positions
    sp_doc = doc_of_char[sp] if sp.shape[0] else sp
    # token k of doc d: k-th smallest start pairs with k-th smallest
    # end inside d (both lists have spaces_in_doc+1 entries per doc;
    # lexsort by (doc, pos) disambiguates a space that ends one doc
    # flush against the next doc's start)
    starts_all = np.concatenate([doc_starts, sp + 1])
    starts_doc = np.concatenate([np.arange(ndocs), sp_doc])
    ends_all = np.concatenate([sp, doc_ends])
    ends_doc = np.concatenate([sp_doc, np.arange(ndocs)])
    tok_start = starts_all[np.lexsort((starts_all, starts_doc))]
    order_e = np.lexsort((ends_all, ends_doc))
    tok_end = ends_all[order_e]
    tok_doc = ends_doc[order_e]
    # span hash H([s,e)) = (P[e]-P[s]) * B^(e-1)  (ops/substr formula;
    # empty span -> 0 regardless of the power factor)
    p = np.zeros(n + 1, np.uint64)
    np.cumsum(buf * _pows(_BINV, n) if n else buf, out=p[1:])
    bpow = _pows(_B, n + 1)

    def span_hash(s: np.ndarray, e: np.ndarray) -> np.ndarray:
        return (p[e] - p[s]) * bpow[np.maximum(e, 1) - 1]

    uni_h = span_hash(tok_start, tok_end)
    same = tok_doc[:-1] == tok_doc[1:] if tok_doc.shape[0] else \
        np.zeros(0, bool)
    bi_h = span_hash(tok_start[:-1][same], tok_end[1:][same])
    h = np.concatenate([uni_h, bi_h])
    doc_ix = np.concatenate([tok_doc, tok_doc[:-1][same]])
    bucket = (((h * _MIX) >> np.uint64(33))
              % np.uint64(BUCKETS)).astype(np.int64)
    return bucket, doc_ix


def _poly_bucket_counts_batch(batch: pa.Table, text_col: str) -> pa.Table:
    bucket, _ = poly_gram_buckets(batch[text_col].to_pylist())
    counts = np.bincount(bucket, minlength=BUCKETS)
    nz = np.flatnonzero(counts)
    return pa.table({"bucket": pa.array(nz.astype(np.int64)),
                     "c": pa.array(counts[nz].astype(np.int64))})


def hashed_gram_profile(ds: "ray.data.Dataset",
                        text_col: str = "text",
                        hashed: str = "md5") -> np.ndarray:
    """Per-bucket gram-instance counts over the dataset (len-4096
    int64 array). Bounded key space -> default tree_merge fan-in.
    ``hashed``: "md5" (oracle contract) or "poly" (vectorized scale
    mode; see module docstring)."""
    fn = {"md5": _bucket_counts_batch,
          "poly": _poly_bucket_counts_batch}[hashed]
    partials = ds.map_batches(fn, batch_format="pyarrow",
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
                          out_col: str = "dsir_w",
                          hashed: str = "md5") -> "ray.data.Dataset":
    """Append the int64 document score: sum of the bucket weight over
    every gram INSTANCE (occurrences count, as in the bag-of-hashed-
    grams generative model). ``hashed`` must match the mode the
    ``weights`` profiles were built with."""
    w = np.asarray(weights, np.int64)

    def score(batch: pa.Table) -> pa.Table:
        out = np.empty(batch.num_rows, np.int64)
        for i, t in enumerate(batch[text_col].to_pylist()):
            s = 0
            for g in _grams(t):
                s += int(w[_bucket(g)])
            out[i] = s
        return batch.append_column(out_col, pa.array(out))

    def score_poly(batch: pa.Table) -> pa.Table:
        bucket, doc_ix = poly_gram_buckets(batch[text_col].to_pylist())
        # per-doc weight sums: one bincount over float64 weights —
        # |sum| < 2^53 by construction (milli-nat weights x gram count),
        # so the float accumulation is exact
        out = np.bincount(doc_ix, weights=w[bucket].astype(np.float64),
                          minlength=batch.num_rows).astype(np.int64)
        return batch.append_column(out_col, pa.array(out))

    fn = {"md5": score, "poly": score_poly}[hashed]
    return ds.map_batches(fn, batch_format="pyarrow")


def dsir_select(ds: "ray.data.Dataset", target: "ray.data.Dataset",
                text_col: str = "text", id_col: str = "doc_id",
                keep_denominator: int = 4,
                hashed: str = "md5") -> "ray.data.Dataset":
    """End-to-end DSIR: profile target + raw, score, keep the exact
    top n//keep_denominator documents by (score DESC, id ASC).
    Materializes ``ds`` internally — the raw profile, count and sort
    each consume it, and re-executing a compute-carrying upstream
    chain three times would dwarf one object-store residency."""
    ds = ds.materialize()
    weights = dsir_log_weights(
        hashed_gram_profile(target, text_col, hashed=hashed),
        hashed_gram_profile(ds, text_col, hashed=hashed))
    scored = add_importance_weight(ds, weights, text_col, hashed=hashed)
    k = ds.count() // keep_denominator
    return scored.sort(["dsir_w", id_col],
                       descending=[True, False]).limit(k)


def dsir_select_threshold(ds: "ray.data.Dataset",
                          target: "ray.data.Dataset",
                          text_col: str = "text",
                          id_col: str = "doc_id",
                          keep_fraction: float = 0.25,
                          m: int = 4096,
                          hashed: str = "md5") -> "ray.data.Dataset":
    """Approximate DSIR selection for extreme scale: instead of the
    exact top-k's global sort, estimate the (1 - keep_fraction) score
    quantile with the mergeable weighted-sample sketch
    (ops/sketches.approx_quantiles, ~n/m rank error) and keep docs
    with score >= that threshold — one extra streaming pass and a tiny
    sketch merge, no all-to-all. The kept count is approximate by the
    sketch's rank error (declared); ordering within the kept set is
    irrelevant to training-data selection."""
    from .sketches import approx_quantiles
    # the raw profile and the scoring pass both consume ds — hold it
    # in the object store once instead of re-executing any
    # compute-carrying upstream chain (dsir_select's rationale; was
    # missing here, round-4 ADVICE item #2)
    ds = ds.materialize()
    weights = dsir_log_weights(
        hashed_gram_profile(target, text_col, hashed=hashed),
        hashed_gram_profile(ds, text_col, hashed=hashed))
    scored = add_importance_weight(ds, weights, text_col,
                                   hashed=hashed).materialize()
    q = approx_quantiles(scored, "dsir_w", qs=(1.0 - keep_fraction,),
                         m=m)
    thr = int(q["value"].iloc[0])
    return scored.filter(expr=f"dsir_w >= {thr}")
