"""Corpus-cleaning operators for training-data pipelines: C4-style
line/page filtering, PII redaction, and unicode normalization. All are
stateless ``map_batches`` stages over a text column — the same
execution idiom as the parse stage (and the other ``ops`` text
operators): regexes compile at module import (once per worker
process), the redaction/normalization kernels are pyarrow C++ where a
kernel exists, and nothing here shuffles — at 100 TB these run as pure
streaming transforms.

Oracle parity notes (load-bearing):
- Every regex is RE2-compatible and byte-identical to the one the SQL
  oracle passes to DuckDB's regexp_* functions (both engines are RE2,
  so replace/count semantics match exactly — non-overlapping,
  left-to-right).
- The whitespace class is the EXPLICIT ``[ \\t\\n\\f\\r\\v]`` set, not
  ``\\s``: Python's unicode ``\\s`` is wider than RE2's ASCII ``\\s``
  and would silently diverge on NBSP-bearing text.
- Tokenization is single-space split, the repo-wide
  ``string_split(text, ' ')`` convention (see
  text_analysis.gopher_rules_batch).
"""

from __future__ import annotations

import unicodedata

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# --- C4-style cleaning (Raffel et al. 2020, "Exploring the Limits of
# Transfer Learning", appendix C4 recipe) -------------------------------

_TERMINAL_PUNCT = ('.', '!', '?', '"')
_LINE_BAN_WORDS = ("javascript",)
_PAGE_BAN_SUBSTRINGS = ("lorem ipsum", "{")


def c4_clean_batch(batch: pa.Table, text_col: str = "text",
                   min_line_words: int = 3,
                   min_sentences: int = 5,
                   terminal_punct: tuple = _TERMINAL_PUNCT,
                   line_ban_words: tuple = _LINE_BAN_WORDS,
                   page_ban_substrings: tuple = _PAGE_BAN_SUBSTRINGS
                   ) -> pa.Table:
    """C4 cleaning rules. Line level (kept lines re-joined with \\n into
    ``text_clean``): a line survives iff it ends in a terminal
    punctuation mark, has >= ``min_line_words`` single-space-split
    words, and contains none of ``line_ban_words`` (case-insensitive
    substring, C4's "any line with the word Javascript"). Page level
    (``c4_keep``): the RAW page must contain none of
    ``page_ban_substrings`` (C4's "lorem ipsum" and curly-brace rules,
    case-insensitive) and the CLEANED text must carry at least
    ``min_sentences`` sentences, counted as terminal-punctuation
    occurrences in ``text_clean`` (C4 counts sentences post line
    filter). Adds: ``text_clean``, ``n_lines``, ``n_lines_kept``,
    ``c4_sentences``, ``c4_keep``.

    Per-doc Python over split lines — same cost class as the shingle
    stages (documents are small relative to batches); the stage itself
    is stateless/shuffle-free.
    """
    texts = batch[text_col].to_numpy(zero_copy_only=False)
    n = len(texts)
    clean = np.empty(n, dtype=object)
    n_lines = np.zeros(n, np.int64)
    n_kept = np.zeros(n, np.int64)
    sentences = np.zeros(n, np.int64)
    keep = np.zeros(n, bool)
    sent_marks = tuple(c for c in terminal_punct if c != '"')
    for i, t in enumerate(texts):
        t = t or ""
        lines = t.split("\n") if t else []
        kept = [ln for ln in lines
                if ln.endswith(terminal_punct)
                and len(ln.split(" ")) >= min_line_words
                and not any(b in ln.lower() for b in line_ban_words)]
        clean[i] = "\n".join(kept)
        n_lines[i] = len(lines)
        n_kept[i] = len(kept)
        sentences[i] = sum(clean[i].count(m) for m in sent_marks)
        tl = t.lower()
        keep[i] = (sentences[i] >= min_sentences
                   and not any(b in tl for b in page_ban_substrings))
    out = batch.append_column("text_clean", pa.array(clean, pa.string()))
    out = out.append_column("n_lines", pa.array(n_lines))
    out = out.append_column("n_lines_kept", pa.array(n_kept))
    out = out.append_column("c4_sentences", pa.array(sentences))
    return out.append_column("c4_keep", pa.array(keep))


# --- PII redaction -------------------------------------------------------

# (name, RE2 pattern, replacement token) — applied IN ORDER, each
# pattern counted against the text as left by the previous replacement
# (emails are redacted before their digits can look like phones, IPs
# before their digit runs can look like phones). Patterns are shared
# verbatim with the SQL oracle (DuckDB regexp_replace/extract_all are
# RE2 too), so counts and redacted bytes match exactly.
PII_PATTERNS: tuple = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d-]{6,}\d", "<PHONE>"),
)


def pii_redact_batch(batch: pa.Table, text_col: str = "text",
                     out_col: str = "text_redacted") -> pa.Table:
    """Redacts emails, IPv4 addresses and phone numbers (in that
    order) with typed tokens; adds per-type match counts
    (``n_email``/``n_ipv4``/``n_phone``) and the total ``n_pii``.
    Fully vectorized: pyarrow's C++ RE2 count/replace kernels, no
    Python loop."""
    s = batch[text_col]
    total = np.zeros(batch.num_rows, np.int64)
    out = batch
    for name, pat, tok in PII_PATTERNS:
        cnt = pc.fill_null(
            pc.count_substring_regex(s, pattern=pat), 0)
        out = out.append_column(f"n_{name}", pc.cast(cnt, pa.int64()))
        total += cnt.to_numpy(zero_copy_only=False).astype(np.int64)
        s = pc.replace_substring_regex(s, pattern=pat, replacement=tok)
    out = out.append_column(out_col, s)
    return out.append_column("n_pii", pa.array(total))


# --- unicode normalization ----------------------------------------------

# EXPLICIT ASCII whitespace class — see module docstring.
_WS_RUN = r"[ \t\n\f\r\v]+"


def normalize_text_batch(batch: pa.Table, text_col: str = "text",
                         form: str = "NFC",
                         out_col: str = "text_norm") -> pa.Table:
    """Canonical text normalization: unicode ``form`` (NFC by default —
    DuckDB's ``nfc_normalize`` mirrors it exactly; NFKC is available
    for pipelines that want compatibility folding and is
    pytest-verified), then ASCII-whitespace-run collapse to single
    spaces, then space trim. Adds ``out_col`` and ``n_chars_norm``
    (post-normalization character count). The unicode step is a Python
    comprehension (no Arrow kernel exists); collapse/trim/length are
    pyarrow C++ kernels."""
    texts = batch[text_col].to_numpy(zero_copy_only=False)
    normed = pa.array(
        [unicodedata.normalize(form, t) if t is not None else None
         for t in texts], pa.string())
    collapsed = pc.replace_substring_regex(normed, pattern=_WS_RUN,
                                           replacement=" ")
    trimmed = pc.utf8_trim(collapsed, characters=" ")
    out = batch.append_column(out_col, trimmed)
    return out.append_column(
        "n_chars_norm",
        pc.cast(pc.fill_null(pc.utf8_length(trimmed), 0), pa.int64()))


# --- bad-words blocklist filter (the C4 recipe's "List of Dirty,
# Naughty, Obscene..." gate, Raffel et al. 2020 appendix) --------------

DEFAULT_BLOCKLIST = ("slow", "spark")  # fixture-vocab stand-in for the
# real published blocklist (config-injectable, same mechanics)


def badwords_pattern(words=DEFAULT_BLOCKLIST) -> str:
    """One RE2 alternation with word boundaries, shared VERBATIM with
    the DuckDB oracle (both engines are RE2, so non-overlapping match
    counts agree exactly). Word-boundary semantics match the corpus's
    single-space tokenization for alphanumeric blocklist entries."""
    import re
    return r"\b(?:" + "|".join(re.escape(w) for w in words) + r")\b"


def badwords_filter_batch(batch: pa.Table, text_col: str = "text",
                          words=DEFAULT_BLOCKLIST) -> pa.Table:
    """Append ``n_badwords`` (total blocklist hits) and ``badwords_ok``
    (True iff zero hits — C4 drops any page with a single hit). Pure
    vectorized kernel pass, no shuffle."""
    pat = badwords_pattern(words)
    n = pc.count_substring_regex(batch[text_col], pat)
    n = pc.cast(pc.fill_null(n, 0), pa.int64())
    return batch.append_column("n_badwords", n) \
        .append_column("badwords_ok", pc.equal(n, 0))
