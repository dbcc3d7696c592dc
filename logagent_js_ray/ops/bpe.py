"""Byte-pair-encoding tokenizer (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units") — the real trained
tokenizer behind the corpus token accounting (`ops/text_analysis`
counts whitespace tokens; this counts learned subwords).

Determinism contract: word-internal BPE over the single-space
tokenizer (no end-of-word marker); training picks, each iteration, the
adjacent symbol pair with the highest frequency, ties broken by the
LEXICOGRAPHICALLY SMALLEST pair; encoding applies merges in rank order
(lowest rank first). Both rules are total orders, so the merge table
and every token sequence are reproducible anywhere — the pinned
fixture reimplementation (fixtures/gen.ensure_bpe) must produce the
identical merge list and per-doc token counts.

Scale design (100 TB): tokenizer TRAINING is a model-artifact job over
the reference corpus — but the driver only ever holds the WORD
FREQUENCY table, bounded by the reference vocabulary, never raw texts:
per-block (word, count) partials -> hash-partitioned ``tree_merge``
-> one small driver dict (round-4 verdict item #3; the previous
``take_all()`` of texts materialized the whole reference on the
driver). The merge table ships once via ``ray.put``. ENCODING is the
corpus-scale half: a stateless ``map_batches`` pass with a per-worker
word→tokens cache (zipfian text makes the cache hit rate high; the
MinHasher token-cache precedent), no shuffle anywhere.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray
import ray.data

from . import resolve_broadcast

# encoder state per merges ref: (rank dict, per-worker word cache)
_ENC_STATE: dict = {}

_WORD_SCHEMA = pa.schema([("w", pa.string()), ("c", pa.int64())])


def _word_count_rows(batch: pa.Table, text_col: str) -> pa.Table:
    """Per-block (word, count) partial over the single-space tokenizer
    (empty words dropped — they carry no merge pairs). Pinned empty
    schema: an empty pandas groupby would emit double-typed columns
    (the _bigram_rows precedent in ops/lm_quality)."""
    words = []
    for t in batch[text_col].to_pylist():
        words.extend(w for w in (t or "").split(" ") if w)
    if not words:
        return _WORD_SCHEMA.empty_table()
    g = pd.DataFrame({"w": words}).groupby("w", as_index=False).size() \
        .rename(columns={"size": "c"})
    return pa.Table.from_pandas(g, preserve_index=False) \
        .cast(_WORD_SCHEMA)


def train_bpe(ref, num_merges: int = 64,
              text_col: str = "text") -> list[tuple[str, str]]:
    """Learn ``num_merges`` merge rules from the reference corpus
    (a Dataset or an iterable of strings). Returns the ranked merge
    list — a small driver-held artifact. Dataset input never reaches
    the driver as text: only the merged word-frequency table does
    (bounded by vocabulary, not corpus size)."""
    word_freq: dict[tuple, int] = {}
    if isinstance(ref, ray.data.Dataset):
        from ..stages.aggregate import tree_merge
        partials = ref.map_batches(_word_count_rows,
                                   batch_format="pyarrow",
                                   fn_kwargs={"text_col": text_col})
        wc = tree_merge(partials, ["w"], {"c": "sum"},
                        partition_by_key=16).to_pandas()
        if len(wc):  # a fully-empty reference merges to a bare frame
            for w, c in zip(wc["w"], wc["c"]):
                word_freq[tuple(w)] = int(c)
    else:
        for t in ref:
            for w in (t or "").split(" "):
                if w:
                    word_freq[tuple(w)] = word_freq.get(tuple(w), 0) + 1
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple, int] = {}
        for sym, f in word_freq.items():
            for a, b in zip(sym[:-1], sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + f
        if not pairs:
            break
        # highest count, then lexicographically smallest pair
        best = min(pairs, key=lambda p: (-pairs[p], p))
        if pairs[best] < 2:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        new_freq: dict[tuple, int] = {}
        for sym, f in word_freq.items():
            out = []
            i = 0
            while i < len(sym):
                if (i + 1 < len(sym) and sym[i] == a
                        and sym[i + 1] == b):
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            k = tuple(out)
            new_freq[k] = new_freq.get(k, 0) + f
        word_freq = new_freq
    return merges


def encode_word(word: str, rank: dict[tuple, int]) -> list[str]:
    """Apply merges in rank order (lowest first) until none apply."""
    sym = list(word)
    while len(sym) > 1:
        best_i, best_r = -1, None
        for i in range(len(sym) - 1):
            r = rank.get((sym[i], sym[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def count_tokens_bpe(ds: "ray.data.Dataset", merges_ref,
                     text_col: str = "text",
                     out_col: str = "n_tokens_bpe"
                     ) -> "ray.data.Dataset":
    """Append the learned-subword token count per document.
    ``merges_ref`` = ray.put(merge list). Per-worker word cache."""

    def fn(batch: pa.Table) -> pa.Table:
        state = _ENC_STATE.get(merges_ref)
        if state is None:
            if len(_ENC_STATE) > 4:
                _ENC_STATE.clear()
            merges = resolve_broadcast(merges_ref)
            state = ({p: i for i, p in enumerate(merges)}, {})
            _ENC_STATE[merges_ref] = state
        rank, word_cache = state
        out = []
        for t in batch[text_col].to_pylist():
            n = 0
            for w in (t or "").split(" "):
                if not w:
                    continue
                c = word_cache.get(w)
                if c is None:
                    if len(word_cache) > 1 << 20:
                        word_cache.clear()
                    c = len(encode_word(w, rank))
                    word_cache[w] = c
                n += c
            out.append(n)
        return batch.append_column(out_col, pa.array(out, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow")
