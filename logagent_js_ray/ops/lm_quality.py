"""CCNet-style language-model quality filtering (Wenzek et al. 2020,
"CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
Data"): score every document by its cross-entropy under an n-gram LM
trained on a trusted reference corpus, then bucket the corpus into
head / middle / tail with FIXED percentile cutoffs computed once from
the reference — CCNet's own design (its KenLM + Wikipedia cutoffs are
constants shipped with the pipeline, not recomputed per crawl).

Sandbox stand-in for KenLM: an add-1-smoothed word-BIGRAM model over
the single-space tokenizer. All quantities are INTEGERS so both
engines agree exactly:
  * cost(w1, w2) = round(1000 * ln((c(w1,.) + V) / (c(w1,w2) + 1)))
    milli-nats (positive); unseen bigram with seen context costs
    round(1000 * ln(c(w1,.) + V)); unseen context costs
    round(1000 * ln(V));
  * doc cross-entropy = floor(total_cost / n_bigrams) milli-nats per
    token (0 for docs with < 2 tokens);
  * bucket = head / middle / tail by two integer cutoffs.

Scale design (100 TB): the LM is a broadcast MODEL ARTIFACT — built
once (distributed bigram counts -> partitioned tree_merge -> driver
tables, bounded by the reference vocabulary, the same regime as
CCNet's .arpa file), shipped via ``ray.put``, resolved once per worker
process (the ops/similarity cached-task pattern). Scoring is a
stateless per-batch dict walk with no shuffle; bucketing is a pure
per-batch CASE. Nothing about corpus size changes the plan.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..stages.aggregate import tree_merge
from . import resolve_broadcast

_BIGRAM_SCHEMA = pa.schema([("w1", pa.string()), ("w2", pa.string()),
                            ("c", pa.int64())])


def _bigram_rows(batch: pa.Table, text_col: str) -> pa.Table:
    w1s, w2s = [], []
    for t in batch[text_col].to_pylist():
        w = (t or "").split(" ")
        w1s.extend(w[:-1])
        w2s.extend(w[1:])
    if not w1s:  # pin the empty schema: an empty pandas groupby would
        return _BIGRAM_SCHEMA.empty_table()  # emit double-typed w1/w2
    df = pd.DataFrame({"w1": w1s, "w2": w2s})
    g = df.groupby(["w1", "w2"], as_index=False).size() \
          .rename(columns={"size": "c"})
    return pa.Table.from_pandas(g, preserve_index=False) \
        .cast(_BIGRAM_SCHEMA)


def train_bigram_lm(ref_ds: "ray.data.Dataset",
                    text_col: str = "text") -> dict:
    """Integer-cost bigram LM from the reference corpus. Returns
    {"bigram": {(w1, w2): cost}, "ctx": {w1: cost}, "oov": cost,
    "v": vocab_size} — a driver-held artifact bounded by the reference
    vocabulary (ship with ray.put; see score_cross_entropy)."""
    partials = ref_ds.map_batches(_bigram_rows, batch_format="pyarrow",
                                  fn_kwargs={"text_col": text_col})
    counts = tree_merge(partials, ["w1", "w2"], {"c": "sum"},
                        partition_by_key=16).to_pandas()
    ctx_tot = counts.groupby("w1")["c"].sum()
    vocab = set(counts["w1"]) | set(counts["w2"])
    v = max(len(vocab), 1)
    ctx = {w1: round(1000 * math.log(int(tot) + v))
           for w1, tot in ctx_tot.items()}
    bigram = {}
    for w1, w2, c in counts.itertuples(index=False):
        tot = int(ctx_tot[w1])
        bigram[(w1, w2)] = round(1000 * (math.log(tot + v)
                                         - math.log(int(c) + 1)))
    return {"bigram": bigram, "ctx": ctx,
            "oov": round(1000 * math.log(v)), "v": v}


def _doc_cost(text: str, lm: dict) -> tuple[int, int]:
    """Scalar reference scorer — the semantics contract the vectorized
    path must reproduce exactly (kept for tests/fixtures)."""
    w = (text or "").split(" ")
    total = 0
    bigram, ctx, oov = lm["bigram"], lm["ctx"], lm["oov"]
    for i in range(len(w) - 1):
        pair = (w[i], w[i + 1])
        c = bigram.get(pair)
        if c is None:
            c = ctx.get(w[i], oov)
        total += c
    return total, len(w) - 1


# per-worker compiled-LM cache keyed by the broadcast ref (the
# _ENC_STATE pattern in ops/bpe): arrays built once per worker process
_LM_STATE: dict = {}


def _compiled_lm(lm_ref):
    """int-coded arrays from the lm dict (round-4 verdict item #7):
    vocab (sorted Arrow array for pc.index_in), per-code context cost
    (ctx.get(word, oov) — words never seen as context fall back to the
    oov cost, matching _doc_cost), and a SORTED int64 bigram key table
    ``code(w1) * V + code(w2)`` with costs for np.searchsorted lookup.
    Bounded by the reference vocabulary."""
    state = _LM_STATE.get(lm_ref)
    if state is not None:
        return state
    if len(_LM_STATE) > 4:
        _LM_STATE.clear()
    lm = resolve_broadcast(lm_ref)
    vocab = sorted({w for pair in lm["bigram"] for w in pair}
                   | set(lm["ctx"]))
    code = {w: i for i, w in enumerate(vocab)}
    v = len(vocab)
    oov = int(lm["oov"])
    ctx_cost = np.full(max(v, 1), oov, np.int64)
    for w, c in lm["ctx"].items():
        ctx_cost[code[w]] = c
    keys = np.empty(len(lm["bigram"]), np.int64)
    costs = np.empty(len(lm["bigram"]), np.int64)
    for i, ((w1, w2), c) in enumerate(lm["bigram"].items()):
        keys[i] = code[w1] * v + code[w2]
        costs[i] = c
    order = np.argsort(keys)
    state = (pa.array(vocab, pa.string()), v, oov, ctx_cost,
             keys[order], costs[order])
    _LM_STATE[lm_ref] = state
    return state


def score_cross_entropy(ds: "ray.data.Dataset", lm_ref,
                        text_col: str = "text",
                        out_col: str = "ce_milli") -> "ray.data.Dataset":
    """Append floor(total_cost / n_bigrams) milli-nats per token (int64;
    0 when the doc has < 2 tokens). ``lm_ref`` = ray.put(lm dict).

    Vectorized (no per-bigram Python): tokens split with the Arrow
    kernel (``pc.split_pattern(text, ' ')`` — byte-identical to the
    repo's single-space contract), int-coded via ``pc.index_in``
    against the compiled vocab, bigram costs looked up by binary search
    on the sorted ``w1*V + w2`` key table, per-doc totals via one
    ``np.bincount``. Costs are < 2^53 so the float64 bincount
    accumulation is exact; output matches _doc_cost bit-for-bit
    (asserted in tests)."""

    def score(batch: pa.Table) -> pa.Table:
        vocab, v, oov, ctx_cost, bkeys, bcosts = _compiled_lm(lm_ref)
        nrows = batch.num_rows
        if nrows == 0:
            return batch.append_column(out_col, pa.array([], pa.int64()))
        texts = pc.fill_null(pc.cast(batch[text_col], pa.string()), "")
        toks = pc.split_pattern(texts, " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = toks.values
        codes = pc.index_in(flat, value_set=vocab)
        codes = pc.fill_null(codes, -1).to_numpy(
            zero_copy_only=False).astype(np.int64)
        # ListArray offsets may start past 0 on sliced inputs
        n_toks = np.diff(offs)
        doc_of_tok = np.repeat(np.arange(nrows), n_toks)
        codes = codes[offs[0]:offs[-1]]
        same = doc_of_tok[:-1] == doc_of_tok[1:] if codes.shape[0] else \
            np.zeros(0, bool)
        w1 = codes[:-1][same]
        w2 = codes[1:][same]
        bd = doc_of_tok[:-1][same]
        key = w1 * v + w2
        if bkeys.shape[0]:
            posc = np.minimum(np.searchsorted(bkeys, key),
                              bkeys.shape[0] - 1)
            hit = (w1 >= 0) & (w2 >= 0) & (bkeys[posc] == key)
            bc = bcosts[posc]
        else:  # LM with no trained bigrams: everything falls back
            hit = np.zeros(key.shape[0], bool)
            bc = np.zeros(key.shape[0], np.int64)
        cost = np.where(hit, bc,
                        np.where(w1 >= 0, ctx_cost[np.maximum(w1, 0)],
                                 oov))
        total = np.bincount(bd, weights=cost.astype(np.float64),
                            minlength=nrows).astype(np.int64)
        nb = n_toks - 1  # bigrams per doc == len(w) - 1 (w never empty)
        out = np.where(nb > 0, total // np.maximum(nb, 1), 0)
        return batch.append_column(out_col,
                                   pa.array(out.astype(np.int64)))

    return ds.map_batches(score, batch_format="pyarrow")


def reference_cutoffs(ref_ds: "ray.data.Dataset", lm: dict,
                      text_col: str = "text") -> tuple[int, int]:
    """CCNet's fixed percentile cutoffs: the 33rd/67th percentile
    cross-entropies of the REFERENCE corpus itself (exact order
    statistics of the integer scores; the reference is the small
    trusted set, so collecting its scores is bounded by design)."""
    scored = score_cross_entropy(ref_ds, ray.put(lm), text_col)
    ces = np.sort(scored.select_columns(["ce_milli"]).to_pandas()
                  ["ce_milli"].to_numpy())
    n = ces.shape[0]
    t1 = int(ces[max(0, math.ceil(n / 3) - 1)])
    t2 = int(ces[max(0, math.ceil(2 * n / 3) - 1)])
    return t1, t2


def add_ppl_bucket(ds: "ray.data.Dataset", t1: int, t2: int,
                   ce_col: str = "ce_milli",
                   out_col: str = "ppl_bucket") -> "ray.data.Dataset":
    """head (ce <= t1) / middle (ce <= t2) / tail — pure per-batch."""

    def bucket(batch: pa.Table) -> pa.Table:
        ce = batch[ce_col].to_numpy(zero_copy_only=False)
        lab = np.where(ce <= t1, "head",
                       np.where(ce <= t2, "middle", "tail"))
        return batch.append_column(out_col, pa.array(lab.tolist(),
                                                     pa.string()))

    return ds.map_batches(bucket, batch_format="pyarrow")
