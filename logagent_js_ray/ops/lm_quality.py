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


def score_cross_entropy(ds: "ray.data.Dataset", lm_ref,
                        text_col: str = "text",
                        out_col: str = "ce_milli") -> "ray.data.Dataset":
    """Append floor(total_cost / n_bigrams) milli-nats per token (int64;
    0 when the doc has < 2 tokens). ``lm_ref`` = ray.put(lm dict)."""

    def score(batch: pa.Table) -> pa.Table:
        lm = resolve_broadcast(lm_ref)
        out = np.empty(batch.num_rows, np.int64)
        for i, t in enumerate(batch[text_col].to_pylist()):
            total, n = _doc_cost(t, lm)
            out[i] = total // n if n > 0 else 0
        return batch.append_column(out_col, pa.array(out))

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
