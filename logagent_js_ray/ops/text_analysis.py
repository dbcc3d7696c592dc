"""Text-analysis operators for training-data pipelines over the
``documents`` table: token counting, quality scoring, language ID,
document fingerprinting. All are stateless vectorized ``map_batches``
stages (regexes compiled at module import, once per worker process).

These extend the reference's scope (logagent has no corpus analytics);
they reuse its execution idiom — per-batch vectorized transforms over the
``text`` column, exactly like the parse stage.
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# BPE-ish pre-tokenizer: word pieces, numbers, punctuation runs (the
# GPT-2 pre-tokenize regex family, simplified to RE2-compatible form).
_BPE_RE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]+")
_STOPWORDS = frozenset(
    "the a an and or of to in is are was for on with as at by it this".split())
_PUNCT_RE = re.compile(r"[^\w\s]")


def analyze_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Adds: n_tokens_ws (whitespace split — SQL-checkable), n_tokens_bpe
    (regex pre-tokenizer), stopword_ratio, punct_ratio, avg_token_len,
    quality flag (simple length/punct/stopword heuristic)."""
    text = batch[text_col]
    # whitespace tokens: count single-space separators + 1 (matches
    # DuckDB len(string_split(text, ' ')) exactly)
    n_ws = pc.add(pc.count_substring(text, pattern=" "), 1)
    texts = text.to_numpy(zero_copy_only=False)
    n_bpe = np.zeros(len(texts), np.int64)
    stop_r = np.zeros(len(texts), np.float64)
    punct_r = np.zeros(len(texts), np.float64)
    for i, t in enumerate(texts):
        if not t:
            continue
        toks = _BPE_RE.findall(t)
        n_bpe[i] = len(toks)
        if toks:
            stop_r[i] = sum(1 for w in toks if w.lower() in _STOPWORDS) / len(toks)
        punct_r[i] = len(_PUNCT_RE.findall(t)) / max(1, len(t))
    n_chars = pc.utf8_length(text)
    avg_len = pc.divide(pc.cast(n_chars, pa.float64()),
                        pc.cast(n_ws, pa.float64()))
    quality = pc.and_(pc.greater_equal(n_ws, 5),
                      pc.less(pa.array(punct_r), 0.3))
    out = batch.append_column("n_tokens_ws", pc.cast(n_ws, pa.int64()))
    out = out.append_column("n_tokens_bpe", pa.array(n_bpe))
    out = out.append_column("stopword_ratio", pa.array(stop_r))
    out = out.append_column("punct_ratio", pa.array(punct_r))
    out = out.append_column("avg_token_len", avg_len)
    out = out.append_column("quality_ok", quality)
    return out


# --- language ID: character-n-gram heuristic ---------------------------

_LANG_PROFILES = {
    # tiny trigram profiles; deterministic, illustrative (the real corpus
    # in this sandbox is synthetic English-like for every lang label)
    "en": ("the", "and", "ing", "ion", "ent"),
    "es": ("que", "de ", "la ", "os ", "ión"),
    "de": ("der", "ein", "sch", "ich", "und"),
    "fr": ("les", "ent", "de ", "la ", "ion"),
}


def lang_id_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch[text_col].to_numpy(zero_copy_only=False)
    preds = np.empty(len(texts), dtype=object)
    for i, t in enumerate(texts):
        if not t:
            preds[i] = "und"
            continue
        tl = t.lower()
        scores = {lang: sum(tl.count(g) for g in grams)
                  for lang, grams in _LANG_PROFILES.items()}
        best = max(sorted(scores), key=lambda k: scores[k])
        preds[i] = best if scores[best] > 0 else "und"
    return batch.append_column("pred_lang", pa.array(preds, pa.string()))


# --- fingerprints ------------------------------------------------------

def fingerprint_batch(batch: pa.Table, text_col: str = "text",
                      window: int = 8) -> pa.Table:
    """Adds ``fp_md5`` (full-content hash, SQL-checkable against
    DuckDB's md5()) and ``fp_winnow`` (min-of-rolling-crc32 over
    ``window``-gram shingles — a winnowing-style robust fingerprint)."""
    texts = batch[text_col].to_numpy(zero_copy_only=False)
    md5s = np.empty(len(texts), dtype=object)
    winnows = np.zeros(len(texts), np.int64)
    for i, t in enumerate(texts):
        s = t or ""
        md5s[i] = hashlib.md5(s.encode()).hexdigest()
        toks = s.split()
        if len(toks) >= window:
            hs = [zlib.crc32(" ".join(toks[j:j + window]).encode())
                  for j in range(len(toks) - window + 1)]
        else:
            hs = [zlib.crc32(s.encode())]
        winnows[i] = min(hs)
    out = batch.append_column("fp_md5", pa.array(md5s, pa.string()))
    return out.append_column("fp_winnow", pa.array(winnows))


# --- Gopher-style quality rules -----------------------------------------

_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules_batch(batch: pa.Table, text_col: str = "text",
                       min_words: int = 10, max_words: int = 100_000,
                       min_mean_word_len: float = 3.0,
                       max_mean_word_len: float = 10.0,
                       min_stop_hits: int = 2,
                       max_dup_word_frac: float = 0.5) -> pa.Table:
    """Gopher-style repetition/quality gate (Rae et al. 2021, table A1
    family): word-count bounds, mean-word-length bounds, a minimum
    number of common-stopword hits, and a duplicate-word-fraction cap.
    Adds ``dup_word_frac_e6`` (1 - distinct/total words, micro-scaled
    int for SQL-exact compare), ``stop_hits``, ``mean_word_len`` and
    the combined ``gopher_ok`` flag. Vectorized per batch (one split
    per doc — same cost class as the shingle stages); defaults are
    scaled to the synthetic fixture lengths, real corpora pass the
    paper's (50, 100k, 3, 10, 2, ...) values.

    Tokenizer is SINGLE-SPACE split — the same SQL-exact
    ``string_split(text, ' ')`` convention ``analyze_batch`` commits
    to above (a bare ``.split()`` collapses whitespace runs and would
    silently diverge from the d_quality oracle on any double-spaced
    text)."""
    from . import e6_round_half_away
    texts = batch[text_col].to_numpy(zero_copy_only=False)
    n = len(texts)
    n_words = np.zeros(n, np.int64)
    dup_frac = np.zeros(n, np.float64)
    stop_hits = np.zeros(n, np.int64)
    mean_len = np.zeros(n, np.float64)
    for i, t in enumerate(texts):
        toks = (t or "").split(" ")
        if not toks:
            continue
        n_words[i] = len(toks)
        dup_frac[i] = 1.0 - len(set(toks)) / len(toks)
        stop_hits[i] = sum(1 for w in toks if w in _GOPHER_STOPS)
        mean_len[i] = sum(len(w) for w in toks) / len(toks)
    ok = ((n_words >= min_words) & (n_words <= max_words)
          & (mean_len >= min_mean_word_len)
          & (mean_len <= max_mean_word_len)
          & (stop_hits >= min_stop_hits)
          & (dup_frac <= max_dup_word_frac))
    out = batch.append_column("dup_word_frac_e6",
                              pa.array(e6_round_half_away(dup_frac)))
    out = out.append_column("stop_hits", pa.array(stop_hits))
    out = out.append_column("mean_word_len", pa.array(mean_len))
    return out.append_column("gopher_ok", pa.array(ok))


# --- Gopher/RefinedWeb repetition signals --------------------------------


def repetition_signals_batch(batch: pa.Table, text_col: str = "text",
                             top_ks: tuple = (2, 3, 4),
                             dup_ks: tuple = (5, 6, 7, 8, 9, 10)
                             ) -> pa.Table:
    """The full Gopher repetition-signal suite (Rae et al. 2021 table
    A1; the RefinedWeb/Dolma filters reuse the same family). Per doc,
    all micro-scaled to int64 for SQL-exact compare:

    - ``top{k}gram_char_frac_e6`` for k in ``top_ks``: characters
      covered by the MOST frequent word-k-gram, ``count * len(gram) /
      len(text)`` (Gopher's "fraction of characters contained within
      the most frequently-occurring n-gram"). Ties break
      deterministically to the lexicographically-smallest joined gram
      (codepoint order — the same order DuckDB's binary VARCHAR
      min/ORDER BY uses, so the oracle picks the identical gram).
    - ``dup{k}gram_char_frac_e6`` for k in ``dup_ks``: EXCESS
      characters in repeated k-grams, ``sum over grams with count>=2
      of (count-1)*len(gram) / len(text)``. This is the deterministic
      closed-form variant of Gopher's "fraction of characters inside
      duplicate n-grams": the paper's span-marking coverage is
      scan-order- and overlap-dependent, while the excess-count is a
      pure function of the gram histogram (mergeable, SQL-expressible)
      and upper-bounds it — documented deviation.
    - ``dup_line_frac_e6`` / ``dup_line_char_frac_e6`` /
      ``dup_para_frac_e6``: duplicate-line fraction (1 -
      distinct/total over ``\\n``-split lines), excess characters in
      repeated lines over total text chars, and the same line fraction
      over ``\\n\\n``-split paragraphs.

    Tokenizer is the repo-wide single-space split (see
    gopher_rules_batch). Grams are counted as joined strings (the same
    gram identity as the oracle's ``array_to_string(w[s:s+k-1], ' ')``)
    — one split and O(words * k) hashed chars per doc per k, the same
    cost class as the shingle stages. Docs shorter than k words (or
    empty) score 0 for that k.
    """
    from collections import Counter

    from . import e6_round_half_away
    texts = batch[text_col].to_numpy(zero_copy_only=False)
    n = len(texts)
    top_frac = {k: np.zeros(n, np.float64) for k in top_ks}
    dup_frac = {k: np.zeros(n, np.float64) for k in dup_ks}
    line_frac = np.zeros(n, np.float64)
    line_char_frac = np.zeros(n, np.float64)
    para_frac = np.zeros(n, np.float64)
    for i, t in enumerate(texts):
        if not t:
            continue
        toks = t.split(" ")
        tlen = len(t)
        for k in (*top_ks, *dup_ks):
            if len(toks) < k:
                continue
            # joined-string keys: identical to the oracle's
            # array_to_string(w[s:s+k-1], ' ') gram identity
            cnt = Counter(" ".join(toks[j:j + k])
                          for j in range(len(toks) - k + 1))
            if k in top_frac:
                best = max(cnt.values())
                gram = min(g for g, c in cnt.items() if c == best)
                top_frac[k][i] = best * len(gram) / tlen
            if k in dup_frac:
                excess = sum((c - 1) * len(g)
                             for g, c in cnt.items() if c >= 2)
                dup_frac[k][i] = excess / tlen
        lines = t.split("\n")
        lc = Counter(lines)
        line_frac[i] = 1.0 - len(lc) / len(lines)
        line_char_frac[i] = sum((c - 1) * len(ln)
                                for ln, c in lc.items() if c >= 2) / tlen
        paras = t.split("\n\n")
        para_frac[i] = 1.0 - len(set(paras)) / len(paras)
    out = batch
    for k in top_ks:
        out = out.append_column(f"top{k}gram_char_frac_e6",
                                pa.array(e6_round_half_away(top_frac[k])))
    for k in dup_ks:
        out = out.append_column(f"dup{k}gram_char_frac_e6",
                                pa.array(e6_round_half_away(dup_frac[k])))
    out = out.append_column("dup_line_frac_e6",
                            pa.array(e6_round_half_away(line_frac)))
    out = out.append_column("dup_line_char_frac_e6",
                            pa.array(e6_round_half_away(line_char_frac)))
    return out.append_column("dup_para_frac_e6",
                             pa.array(e6_round_half_away(para_frac)))


# --- benchmark decontamination -----------------------------------------


def _word_kgrams(text: str, k: int) -> set:
    # single-space split: the SQL-exact string_split convention (see
    # gopher_rules_batch docstring)
    toks = (text or "").split(" ")
    return {" ".join(toks[j:j + k]) for j in range(len(toks) - k + 1)}


def collect_benchmark_ngrams(bench: "ray.data.Dataset",
                             text_col: str = "text", k: int = 5,
                             hashed: bool = False):
    """Distinct word-``k``-grams of a BENCHMARK/eval set, collected to
    the driver for broadcast. Per-block distinct runs in map_batches and
    a hash-partitioned tree merge dedups across blocks, so the driver
    only ever receives the final distinct set — benchmark suites are
    small by definition (10^4-10^6 grams), which is what makes the
    broadcast-filter shape of :func:`decontaminate` right at corpus
    scale. ``hashed=True`` returns sorted distinct uint64 md5-prefix
    hashes (8 bytes/gram instead of strings, 2^-64 per-pair collision)
    for big benchmark sets; the string mode is byte-exact against a
    SQL oracle."""
    import ray
    from ..stages.aggregate import tree_merge

    def block_grams(b: pa.Table) -> pa.Table:
        grams: set = set()
        for t in b[text_col].to_pylist():
            grams |= _word_kgrams(t, k)
        return pa.table({"gram": pa.array(sorted(grams), pa.string()),
                         "n": pa.array([1] * len(grams), pa.int64())})

    distinct = tree_merge(bench.map_batches(block_grams,
                                            batch_format="pyarrow"),
                          ["gram"], {"n": "sum"}, partition_by_key=16)
    grams = distinct.to_pandas()["gram"].tolist()
    if hashed:
        # np.unique, not just sort: distinct grams CAN collide, and a
        # duplicate value in either isin() operand breaks membership
        # counting (and full-width md5 prefixes beat crc32's 2^-32
        # per-pair odds at the advertised 10^4-10^6-gram sizes)
        return ray.put(np.unique(_gram_hashes(grams)))
    return ray.put(frozenset(grams))


def _gram_hashes(grams) -> np.ndarray:
    """uint64 md5-prefix hash per gram (shared by collect + filter)."""
    return np.array([int.from_bytes(hashlib.md5(g.encode()).digest()[:8],
                                    "big") for g in grams], np.uint64)


class Decontaminator:
    """Actor-pool stage: flags training docs that share any word-k-gram
    with a broadcast benchmark set — the standard train/test
    decontamination step of LLM corpus pipelines. Adds
    ``contam_ngrams`` (count of DISTINCT shared k-grams) and
    ``contaminated`` (bool). The benchmark set loads once per actor
    from the object store (``collect_benchmark_ngrams`` ref)."""

    def __init__(self, bench_ref, text_col: str = "text", k: int = 5):
        import ray
        pa.set_cpu_count(1)
        self.bench = ray.get(bench_ref)
        self.hashed = isinstance(self.bench, np.ndarray)
        self.text_col = text_col
        self.k = k

    def __call__(self, b: pa.Table) -> pa.Table:
        counts = np.zeros(b.num_rows, np.int64)
        for i, t in enumerate(b[self.text_col].to_pylist()):
            grams = _word_kgrams(t, self.k)
            if not grams:
                continue
            if self.hashed:
                # grams is a set but its HASHES may still collide:
                # no assume_unique (a duplicated value makes numpy's
                # sort-path isin flag false matches)
                counts[i] = int(np.isin(_gram_hashes(grams),
                                        self.bench).sum())
            else:
                counts[i] = sum(1 for g in grams if g in self.bench)
        out = b.append_column("contam_ngrams", pa.array(counts))
        return out.append_column("contaminated",
                                 pa.array(counts > 0))
