"""Multiline merge — rebuild of logagent-js's MultiLine reader
(/root/reference/lib/parser/multiLine.js:53-71): lines are buffered until
the next ``blockStart`` match and emitted as one joined block.

Batch semantics: the reference's 250 ms timeout flush
(multiLine.js:21-24,45-51) is a processing-time artifact of tailing; in a
batch engine every source's lines are fully present, so a group flushes
at its last row — same blocks, deterministic.

Ordering/partitioning & scale design (per SURVEY.md §2.1): sources
(``conv_id``) are grouped by a COARSE bucket ``hash(conv_id) % N``
(bounded group count — Ray's per-group dispatch is Python-priced), and
the whole bucket is merged in ONE vectorized pass: sort by (source,
order), head mask = blockStart match OR source change, block id =
cumsum(head), merged text = per-block string join, output = head rows.
No per-row iteration, no per-source Python dispatch. Merged rows keep
the FIRST line's turn_idx/ts and join continuation lines with ``\\n``
(multiLine.js:58 joins with newline).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data

from .aggregate import coarse_bucket_array

DEFAULT_BLOCK_START = r"^\S"  # continuation lines start with whitespace
                              # (patterns.yml:30-31 default convention)


def merge_bucket(g: pd.DataFrame, block_start: str, source_col: str,
                 text_col: str, order_col: str) -> pd.DataFrame:
    """Vectorized multiline merge of every source in one bucket (the
    cumsum-block-id + string-join shape)."""
    g = g.sort_values([source_col, order_col], kind="mergesort")
    txt = g[text_col].fillna("")
    # a block head is a blockStart match (reference: .search semantics)
    # or the first line of a source (multiLine.js:53: empty buffer
    # always starts a block)
    is_head = (txt.str.contains(block_start, regex=True)
               | g[source_col].ne(g[source_col].shift()))
    blk = is_head.cumsum()
    joined = txt.groupby(blk.values, sort=True).agg("\n".join)
    out = g[is_head].copy()
    out[text_col] = joined.values
    return out.reset_index(drop=True)


def multiline_merge(ds: "ray.data.Dataset",
                    block_start: str | None = None,
                    source_col: str = "conv_id",
                    text_col: str = "text",
                    order_col: str = "turn_idx",
                    num_buckets: int = 64) -> "ray.data.Dataset":
    if block_start is None:
        # MULTILINE_DEFAULT_SEPARATOR overrides the stock default when
        # the caller names no blockStart (parser.js:222-224; read on
        # the DRIVER so workers inherit the decision via the closure,
        # not their own environment)
        import os
        block_start = os.environ.get("MULTILINE_DEFAULT_SEPARATOR") \
            or DEFAULT_BLOCK_START

    def add_bucket(b: pa.Table) -> pa.Table:
        arr = b[source_col].combine_chunks() if isinstance(
            b[source_col], pa.ChunkedArray) else b[source_col]
        return b.append_column(
            "_b", pa.array(coarse_bucket_array(arr, num_buckets)))

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        return merge_bucket(g, block_start, source_col, text_col,
                            order_col).drop(columns=["_b"])

    ds = ds.map_batches(add_bucket, batch_format="pyarrow")
    return ds.groupby("_b").map_groups(_merge, batch_format="pandas")
