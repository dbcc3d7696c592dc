"""Multiline merge — rebuild of logagent-js's MultiLine reader
(/root/reference/lib/parser/multiLine.js:53-71): lines are buffered until
the next ``blockStart`` match and emitted as one joined block.

Batch semantics: the reference's 250 ms timeout flush
(multiLine.js:21-24,45-51) is a processing-time artifact of tailing; in a
batch engine every source's lines are fully present, so a group flushes
at its last row — same blocks, deterministic.

Ordering/partitioning assumption (documented per SURVEY.md §2.1): all
rows of one source (``conv_id``) are grouped by
``groupby(conv_id).map_groups`` and ordered by ``turn_idx`` within the
group — the analogue of logagent's per-source FIFO. Merged rows keep the
FIRST line's turn_idx/ts and join continuation lines with ``\\n``
(multiLine.js:58 joins with newline).
"""

from __future__ import annotations

import re

import pandas as pd

import ray.data

DEFAULT_BLOCK_START = r"^\S"  # continuation lines start with whitespace
                              # (patterns.yml:30-31 default convention)


def merge_group(g: pd.DataFrame, block_start: re.Pattern,
                text_col: str, order_col: str) -> pd.DataFrame:
    g = g.sort_values(order_col)
    rows = []
    cur = None
    for _, row in g.iterrows():
        text = row[text_col] if row[text_col] is not None else ""
        if cur is None or block_start.search(text):
            if cur is not None:
                rows.append(cur)
            cur = row.copy()
        else:
            cur[text_col] = f"{cur[text_col]}\n{text}"
    if cur is not None:
        rows.append(cur)
    return pd.DataFrame(rows).reset_index(drop=True)


def multiline_merge(ds: "ray.data.Dataset",
                    block_start: str = DEFAULT_BLOCK_START,
                    source_col: str = "conv_id",
                    text_col: str = "text",
                    order_col: str = "turn_idx") -> "ray.data.Dataset":
    pat_src = block_start

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        return merge_group(g, re.compile(pat_src), text_col, order_col)

    return ds.groupby(source_col).map_groups(_merge, batch_format="pandas")
