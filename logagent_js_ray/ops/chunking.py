"""Overlapping text chunking — the RAG/embedding-prep step that splits
documents into fixed-size windows with overlap before embedding or
indexing.

Pure per-batch ``flat_map`` shape: each doc expands to its windows
independently (no state, no shuffle), so the operator streams at any
corpus size and the chunk layout is a deterministic function of
(text length, window, stride) — reproducible across reruns and cluster
sizes, and exactly mirrorable in SQL via ``generate_series`` +
``substr`` (which is how the oracle checks it).

Character windows by default (byte-safe for the synthetic corpus and
SQL-exact); a token-boundary mode snaps each window start forward to
the next space so words aren't split — the standard fixed-size/overlap
chunker, not a semantic splitter.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def chunk_text(ds: "ray.data.Dataset", id_col: str = "doc_id",
               text_col: str = "text", window: int = 200,
               overlap: int = 50,
               snap_to_space: bool = False) -> "ray.data.Dataset":
    """Explode each doc into overlapping windows: starts at
    0, stride, 2·stride, … (stride = window - overlap) while start <
    len(text); empty texts produce no chunks. Adds ``chunk_idx`` and
    ``char_start`` beside the chunk text (column ``chunk``).

    ``snap_to_space`` snaps each non-first start BACKWARD to the
    character after the last space before the grid start (falling back
    to the grid start when none exists in the uncovered span) — the
    backward direction is what makes the mode lossless: a snapped
    start is never later than its grid start, so consecutive windows
    always overlap and every character lands in at least one chunk (a
    forward snap can jump past the previous window's end and silently
    drop the gap)."""
    if overlap >= window:
        raise ValueError(f"overlap {overlap} must be < window {window}")
    stride = window - overlap

    def explode(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_pylist()
        texts = b[text_col].to_pylist()
        out_id, out_idx, out_start, out_chunk = [], [], [], []
        for i, t in zip(ids, texts):
            if not t:
                continue
            idx, grid, prev = 0, 0, -1
            while grid < len(t):
                start = grid
                if snap_to_space and grid:
                    # last space in (prev, grid): snapped start stays
                    # > prev (progress) and <= grid (coverage) — the
                    # upper bound must EXCLUDE grid itself, else a
                    # space exactly at grid yields start = grid + 1
                    # and position grid lands in no chunk when
                    # overlap == 0 (round-3 advice)
                    sp = t.rfind(" ", prev + 1, grid)
                    if sp > prev:
                        start = sp + 1
                out_id.append(i)
                out_idx.append(idx)
                out_start.append(start)
                out_chunk.append(t[start:start + window])
                idx += 1
                prev = start
                # advance from the EMITTED start: the next start is
                # then <= prev + stride <= prev + window, so windows
                # always overlap and no span is skipped
                grid = start + stride
        return pa.table({
            id_col: pa.array(out_id, type=b[id_col].type),
            "chunk_idx": pa.array(out_idx, pa.int64()),
            "char_start": pa.array(out_start, pa.int64()),
            "chunk": pa.array(out_chunk, pa.string()),
        })

    return ds.map_batches(explode, batch_format="pyarrow")
