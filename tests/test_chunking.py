"""Overlapping text chunking (ops/chunking)."""

import pyarrow as pa

import ray.data


def _ds(texts):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}))


def test_chunk_text_layout(ray_session):
    from logagent_js_ray.ops.chunking import chunk_text
    t = "abcdefghij" * 3  # 30 chars
    out = chunk_text(_ds([t]), window=10, overlap=4).to_pandas() \
        .sort_values("chunk_idx")
    # stride 6: starts 0,6,12,18,24
    assert out["char_start"].tolist() == [0, 6, 12, 18, 24]
    assert out["chunk"].tolist()[0] == t[0:10]
    assert out["chunk"].tolist()[-1] == t[24:34]  # short tail kept
    assert out["chunk_idx"].tolist() == [0, 1, 2, 3, 4]


def test_chunk_text_empty_and_short(ray_session):
    from logagent_js_ray.ops.chunking import chunk_text
    out = chunk_text(_ds(["", "ab"]), window=10, overlap=4).to_pandas()
    # empty doc -> no chunks; short doc -> one whole chunk
    assert out["doc_id"].tolist() == [1]
    assert out["chunk"].tolist() == ["ab"]


def test_chunk_text_snap_to_space(ray_session):
    from logagent_js_ray.ops.chunking import chunk_text
    t = "aaaa bbbb cccc dddd eeee"
    out = chunk_text(_ds([t]), window=10, overlap=4,
                     snap_to_space=True).to_pandas() \
        .sort_values("chunk_idx")
    # every non-first chunk starts right after a space when one exists
    # in the uncovered span
    for s in out["char_start"].tolist()[1:]:
        assert t[s - 1] == " "


def test_chunk_text_snap_lossless(ray_session):
    """Snap mode must never leave a character uncovered (review
    regression: forward snapping skipped spans between windows)."""
    from logagent_js_ray.ops.chunking import chunk_text
    cases = [
        "aaaaaaaaaaaaaa bbbb",          # long first word
        "aaaa " + "b" * 30,             # no space after the first
        "x" * 35,                       # no spaces at all
        "a b c d e f g h i j k l m n",  # space-dense
    ]
    out = chunk_text(_ds(cases), window=10, overlap=4,
                     snap_to_space=True).to_pandas()
    for doc_id, t in enumerate(cases):
        g = out[out["doc_id"] == doc_id].sort_values("chunk_idx")
        covered = set()
        for s, c in zip(g["char_start"], g["chunk"]):
            covered |= set(range(s, s + len(c)))
        assert covered == set(range(len(t))), t


def test_chunk_text_snap_lossless_zero_overlap(ray_session):
    """Round-3 advice regression: with overlap=0 and a space exactly
    at a grid position ('abcde fghij', window 5), the old inclusive
    rfind bound snapped start past the grid and dropped position 5."""
    from logagent_js_ray.ops.chunking import chunk_text
    cases = ["abcde fghij", "abcd efgh ijkl", "a" * 12]
    out = chunk_text(_ds(cases), window=5, overlap=0,
                     snap_to_space=True).to_pandas()
    for doc_id, t in enumerate(cases):
        g = out[out["doc_id"] == doc_id]
        covered = set()
        for s, c in zip(g["char_start"], g["chunk"]):
            covered |= set(range(s, s + len(c)))
        assert covered == set(range(len(t))), t


def test_chunk_text_overlap_validation(ray_session):
    import pytest
    from logagent_js_ray.ops.chunking import chunk_text
    with pytest.raises(ValueError):
        chunk_text(_ds(["x"]), window=5, overlap=5)
