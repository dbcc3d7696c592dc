"""ExactSubstr deduplication (Lee et al. 2021, "Deduplicating Training
Data Makes Language Models Better"): remove from every document each
maximal character span of length >= ``min_len`` that occurs at least
twice anywhere in the corpus (including twice within one document).

Window formulation (equivalent to the paper's suffix-array semantics):
a duplicated substring of length >= L is exactly a union of duplicated
L-character windows, so
  1. hash every L-char window (stride 1) of every document,
  2. mark windows whose hash occurs >= 2 times corpus-wide,
  3. per document, merge the marked window starts into maximal spans
     (equal-length intervals: same span while next_start - prev_start
     <= L) and cut those spans out of the text.

Scale design (100 TB):
  * the window stream is the honest cost of the algorithm — one
    fixed-width row (8-byte hash + id + int32 offset) per character,
    the same O(total chars) the paper's suffix array pays. Only hashes
    ever move; texts are never exploded.
  * ONE unconditional all-to-all: window rows shuffle once by hash
    coarse bucket and duplicate marking is a vectorized per-group
    count — no global distinct set is ever built.
  * the marked-span set is bounded by the corpus's DUPLICATED content,
    not its size; below ``driver_threshold`` rows the merged spans
    broadcast (``ray.put``) and the cut is a shuffle-free map_batches
    over the documents (the connected_components driver-fast-path
    convention — measured 5.3 s -> ~2 s on the sf0.1 bench row).
    Above it, spans co-partition with the documents by doc bucket
    (the ops/joins.py union pattern); tests assert identical output
    on both paths.
  * hashing is a position-independent uint64 polynomial rolling hash
    over one concatenated per-batch char buffer (utf-32 codepoints, so
    offsets are CHARACTER offsets — the cross-engine contract with the
    oracle's ``substr``), vectorized with cumulative sums/products and
    a doc-boundary validity mask: no per-character Python. Collisions
    are a declared 2^-64-per-pair approximation (the hashed_shingles
    precedent in ops/dedup.py); the DuckDB oracle groups the true
    substrings, so a collision would fail the value hash loudly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..stages.aggregate import coarse_bucket_array
from . import resolve_broadcast

# Odd multiplier (FNV-1a prime) -> invertible mod 2^64, so the rolling
# hash can divide out the position factor and window hashes of equal
# substrings are equal regardless of buffer position.
_B = np.uint64(0x100000001B3)
_BINV = np.uint64(pow(0x100000001B3, -1, 1 << 64))


def _pows(base: np.uint64, n: int) -> np.ndarray:
    """[base^0, base^1, ..., base^(n-1)] mod 2^64, vectorized."""
    out = np.full(n, base, np.uint64)
    out[0] = np.uint64(1)
    return np.multiply.accumulate(out)


def _window_rows(batch: pa.Table, id_col: str, text_col: str,
                 min_len: int, num_buckets: int) -> pa.Table:
    """(hash, id, start, coarse) for every L-char window of the batch."""
    texts = batch[text_col].to_pylist()
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    lens = np.array([len(t or "") for t in texts], np.int64)
    if int(lens.sum()) == 0:
        return pa.table({"h": pa.array([], pa.uint64()),
                         id_col: pa.array([], batch[id_col].type),
                         "s": pa.array([], pa.int32()),
                         "coarse": pa.array([], pa.int32())})
    # one concatenated codepoint buffer; utf-32-le gives one uint32 per
    # CHARACTER so window offsets match the oracle's substr() positions
    buf = np.frombuffer("".join(t or "" for t in texts)
                        .encode("utf-32-le"), np.uint32).astype(np.uint64)
    n = buf.shape[0]
    starts = np.repeat(np.cumsum(lens) - lens, lens)   # doc start offset
    doc_ix = np.repeat(np.arange(lens.shape[0]), lens)
    # H_i = sum_{k=i}^{i+L-1} c[k] * B^(i+L-1-k)  (position-independent)
    #     = (P[i+L] - P[i]) * B^(i+L-1)  with  P = cumsum(c * B^-i)
    binv = _pows(_BINV, n)
    bpow = _pows(_B, n)
    p = np.zeros(n + 1, np.uint64)
    np.cumsum(buf * binv, out=p[1:])
    m = n - min_len + 1
    if m <= 0:
        return pa.table({"h": pa.array([], pa.uint64()),
                         id_col: pa.array([], batch[id_col].type),
                         "s": pa.array([], pa.int32()),
                         "coarse": pa.array([], pa.int32())})
    h = (p[min_len:] - p[:m]) * bpow[min_len - 1:]
    # window [i, i+L) is real only when it stays inside one document
    valid = doc_ix[:m] == doc_ix[min_len - 1:]
    h = h[valid]
    row_ix = doc_ix[:m][valid]
    s = (np.arange(m)[valid] - starts[:m][valid]).astype(np.int32)
    coarse = (((h * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33))
              % np.uint64(num_buckets)).astype(np.int32)
    return pa.table({"h": pa.array(h),
                     id_col: pa.array(ids[row_ix], batch[id_col].type),
                     "s": pa.array(s),
                     "coarse": pa.array(coarse)})


def _merge_spans(s: np.ndarray, min_len: int) -> tuple[np.ndarray,
                                                       np.ndarray]:
    """Merge sorted window starts into maximal [st, en) spans.

    Equal-length intervals: the union stays contiguous while
    next_start - prev_start <= L (overlap or exact adjacency) — the
    same island rule as the oracle's lag() comparison."""
    brk = np.flatnonzero(np.diff(s) > min_len) + 1
    st = s[np.concatenate(([0], brk))]
    en = s[np.concatenate((brk - 1, [s.shape[0] - 1]))] + min_len
    return st, en


def _spans_arrays(ids: np.ndarray, ss: np.ndarray,
                  min_len: int) -> tuple[np.ndarray, np.ndarray,
                                         np.ndarray]:
    """(doc_ids, st, en) merged spans from marked (id, start) rows —
    rows must already be sorted by (id, start)."""
    if ids.shape[0] == 0:
        return (np.empty(0, ids.dtype), np.empty(0, np.int64),
                np.empty(0, np.int64))
    out_id, out_st, out_en = [], [], []
    cutp = np.flatnonzero(ids[1:] != ids[:-1]) + 1
    for did, s in zip(ids[np.concatenate(([0], cutp))],
                      np.split(ss, cutp)):
        st, en = _merge_spans(s, min_len)
        out_id.append(np.full(st.shape[0], did, ids.dtype))
        out_st.append(st)
        out_en.append(en)
    return (np.concatenate(out_id),
            np.concatenate(out_st).astype(np.int64),
            np.concatenate(out_en).astype(np.int64))


def _cut_one(text: str, st: np.ndarray, en: np.ndarray) -> str:
    segs = []
    prev = 0
    for a, b in zip(st.tolist(), en.tolist()):
        if a > prev:
            segs.append(text[prev:a])
        prev = b
    if prev < len(text):
        segs.append(text[prev:])
    return "".join(segs)


def _cut_docs(ids: np.ndarray, texts, spans) -> tuple[list, list, list]:
    """Apply merged spans to each doc: (clean_texts, n_spans,
    removed_chars) — the one implementation both the broadcast and the
    co-partition paths share (tests assert path parity)."""
    sp_id, sp_st, sp_en = spans
    lo = np.searchsorted(sp_id, ids, side="left")
    hi = np.searchsorted(sp_id, ids, side="right")
    out_t, out_n, out_r = [], [], []
    for text, a, z in zip(texts, lo.tolist(), hi.tolist()):
        text = text or ""
        if a == z:
            out_t.append(text)
            out_n.append(0)
            out_r.append(0)
        else:
            st, en = sp_st[a:z], sp_en[a:z]
            out_t.append(_cut_one(text, st, en))
            out_n.append(z - a)
            out_r.append(int((en - st).sum()))
    return out_t, out_n, out_r


def exact_substr_dedup(ds: "ray.data.Dataset", id_col: str = "doc_id",
                       text_col: str = "text", min_len: int = 30,
                       num_buckets: int = 64, doc_buckets: int = 32,
                       driver_threshold: int = 2_000_000
                       ) -> "ray.data.Dataset":
    """Corpus-wide duplicate-substring removal. Returns one row per
    input document: every caller column plus (text_clean, n_spans,
    removed_chars).

    CONSUMES ``ds`` TWICE (the window pass, then the cut pass): a bare
    pruned ``read_parquet`` is re-read — deliberately cheaper at scale
    than holding the corpus in the object store — but pass a
    MATERIALIZED dataset when the upstream chain carries real compute
    (the curate_corpus composition does)."""

    windows = ds.map_batches(
        _window_rows, batch_format="pyarrow",
        fn_kwargs={"id_col": id_col, "text_col": text_col,
                   "min_len": min_len, "num_buckets": num_buckets})

    def dup_positions(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized duplicate detection inside one hash-coarse group:
        # a window survives iff its exact hash occurs >= 2 times
        h = g["h"].to_numpy()
        _, inv, cnt = np.unique(h, return_inverse=True,
                                return_counts=True)
        keep = cnt[inv] >= 2
        return g.loc[keep, [id_col, "s"]]

    marked = windows.groupby("coarse").map_groups(
        dup_positions, batch_format="pandas").materialize()

    if marked.count() <= driver_threshold:
        # spans are bounded by DUPLICATED content: merge on the driver
        # and broadcast — the cut becomes a shuffle-free map_batches
        mk = marked.to_pandas().sort_values([id_col, "s"],
                                            kind="stable")
        spans_ref = ray.put(_spans_arrays(mk[id_col].to_numpy(),
                                          mk["s"].to_numpy(), min_len))

        def cut_broadcast(b: pa.Table) -> pa.Table:
            spans = resolve_broadcast(spans_ref)
            out_t, out_n, out_r = _cut_docs(
                b[id_col].to_numpy(zero_copy_only=False),
                b[text_col].to_pylist(), spans)
            return b.append_column(
                "text_clean", pa.array(out_t, pa.string())) \
                .append_column("n_spans", pa.array(out_n, pa.int64())) \
                .append_column("removed_chars",
                               pa.array(out_r, pa.int64()))

        return ds.map_batches(cut_broadcast, batch_format="pyarrow")

    # distributed path: co-partition marked starts with the documents
    # by id bucket (ops/joins.py union pattern), then per-doc span
    # merge + cut inside each group. Caller columns ride along on the
    # doc rows; mark rows carry nulls for them.
    schema = ds.schema()
    base_cols = list(schema.names)
    base_types = dict(zip(schema.names, schema.types))

    def tag_docs(b: pa.Table) -> pa.Table:
        b = b.select(base_cols)
        return b.append_column(
            "s", pa.array(np.full(b.num_rows, -1, np.int32))) \
            .append_column("_b", pa.array(
                coarse_bucket_array(b[id_col], doc_buckets)))

    def tag_marks(b: pa.Table) -> pa.Table:
        cols = {}
        for c in base_cols:
            cols[c] = (b[id_col] if c == id_col
                       else pa.nulls(b.num_rows, base_types[c]))
        cols["s"] = b["s"]
        cols["_b"] = pa.array(coarse_bucket_array(b[id_col],
                                                  doc_buckets))
        return pa.table(cols)

    both = ds.map_batches(tag_docs, batch_format="pyarrow").union(
        marked.map_batches(tag_marks, batch_format="pyarrow"))

    def cut_spans(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "s"], kind="stable")
        is_doc = g["s"].to_numpy() == -1
        docs = g[is_doc].drop(columns=["s", "_b"]) \
            .reset_index(drop=True)
        ids = docs[id_col].to_numpy()
        texts = docs[text_col].to_numpy()
        mk = g[~is_doc]
        spans = _spans_arrays(mk[id_col].to_numpy(),
                              mk["s"].to_numpy(), min_len)
        out_t, out_n, out_r = _cut_docs(ids, texts, spans)
        docs["text_clean"] = out_t
        docs["n_spans"] = np.array(out_n, np.int64)
        docs["removed_chars"] = np.array(out_r, np.int64)
        return docs

    return both.groupby("_b").map_groups(cut_spans, batch_format="pandas")
