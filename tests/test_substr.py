"""ExactSubstr dedup (ops/substr.py) vs a brute-force reference that
collects the true substrings (no hashing) and cuts the same spans."""

import random

import numpy as np
import pandas as pd
import pytest

import ray.data

from logagent_js_ray.ops.substr import (_merge_spans, _window_rows,
                                        exact_substr_dedup)


def brute_force(texts: dict[int, str], L: int) -> dict[int, tuple]:
    """(clean, n_spans, removed) per doc from exact substring counts."""
    counts = {}
    for t in texts.values():
        for i in range(len(t) - L + 1):
            w = t[i:i + L]
            counts[w] = counts.get(w, 0) + 1
    out = {}
    for did, t in texts.items():
        starts = [i for i in range(len(t) - L + 1)
                  if counts[t[i:i + L]] >= 2]
        if not starts:
            out[did] = (t, 0, 0)
            continue
        spans = []
        st, en = starts[0], starts[0] + L
        for s in starts[1:]:
            if s - (en - L) <= L:
                en = s + L
            else:
                spans.append((st, en))
                st, en = s, s + L
        spans.append((st, en))
        clean = ""
        prev = 0
        for a, b in spans:
            clean += t[prev:a]
            prev = b
        clean += t[prev:]
        out[did] = (clean, len(spans),
                    sum(b - a for a, b in spans))
    return out


def run_op(texts: dict[int, str], L: int, **kw) -> dict[int, tuple]:
    ds = ray.data.from_items(
        [{"doc_id": k, "text": v} for k, v in texts.items()])
    df = exact_substr_dedup(ds, min_len=L, **kw).to_pandas()
    return {r.doc_id: (r.text_clean, r.n_spans, r.removed_chars)
            for r in df.itertuples()}


def test_window_hash_position_independent():
    import pyarrow as pa
    b = pa.table({"doc_id": [1, 2], "text": ["xxabcdefgh", "abcdefghyy"]})
    w = _window_rows(b, "doc_id", "text", 8, 16)
    df = w.to_pandas()
    h1 = df[(df.doc_id == 1) & (df.s == 2)]["h"].iloc[0]
    h2 = df[(df.doc_id == 2) & (df.s == 0)]["h"].iloc[0]
    assert h1 == h2  # same substring, different buffer positions
    # all other windows differ
    assert df["h"].nunique() == len(df) - 1


def test_merge_spans_adjacency():
    st, en = _merge_spans(np.array([0, 5, 10, 25]), 5)
    # gaps of exactly L merge (adjacent coverage), larger gaps split
    assert st.tolist() == [0, 25] and en.tolist() == [15, 30]


def test_exact_substr_planted(ray_session):
    dup = "the quick brown fox jumps over the lazy dog once"
    texts = {
        0: "prefix one " + dup + " suffix alpha",
        1: "other head " + dup + " tail omega",
        2: "no duplicated content in this one at all whatsoever",
        3: "short",
        4: "selfrepeat " + dup + " middle " + dup + " done",
        5: "",
    }
    L = 30
    got = run_op(texts, L)
    want = brute_force(texts, L)
    assert got == want
    assert got[2][1] == 0 and got[3] == ("short", 0, 0)
    assert got[0][2] >= len(dup) - 0  # the planted span got cut


def test_exact_substr_randomized(ray_session):
    rng = random.Random(7)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    texts = {}
    for did in range(40):
        words = [rng.choice(vocab) for _ in range(rng.randrange(0, 30))]
        texts[did] = " ".join(words)
    L = 12
    got = run_op(texts, L, num_buckets=8, doc_buckets=4)
    want = brute_force(texts, L)
    assert got == want
    # the distributed co-partition path (threshold 0 forces it past
    # the broadcast fast path) must produce the identical output
    dist = run_op(texts, L, num_buckets=8, doc_buckets=4,
                  driver_threshold=0)
    assert dist == want


def test_exact_substr_unicode_chars(ray_session):
    # multi-byte chars: offsets are CHARACTER offsets, not bytes
    dup = "ünïcödé—" * 4
    texts = {0: "aaa " + dup + " bbb", 1: "ccc " + dup + " ddd",
             2: "plain ascii filler with no duplicates here"}
    L = 16
    got = run_op(texts, L)
    want = brute_force(texts, L)
    assert got == want
    assert got[0][2] > 0
