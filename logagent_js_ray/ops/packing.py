"""Sequence packing for context-window training — the bookkeeping step
that maps each document to its (shard, window, offset) slot when a
corpus is concatenated and chunked into fixed token budgets (the
standard GPT-style pretraining pack).

Shape: documents are sharded by a DETERMINISTIC bucket key, each shard
is packed independently in stable ``id`` order (an exclusive running
token sum; window = cum // budget, offset = cum % budget), and shards
never talk to each other — so the layout is a pure function of
(ids, token counts, budget, bucketing) and reruns/cluster sizes produce
byte-identical packs, the same property :mod:`.sampling` provides for
subsets. Cross-shard global concatenation order is deliberately NOT
promised (it would serialize the corpus through one cumsum); per-shard
order is what distributed packers actually guarantee.

The default bucketing is ``id % num_buckets`` — SQL-reproducible (the
oracle mirrors it with a window function) and fine for dense synthetic
ids; production corpora with skewed id spaces should pass a hash
``bucket_fn`` instead (any deterministic int mapping works).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def pack_concat_chunk(ds: "ray.data.Dataset", id_col: str = "doc_id",
                      tokens_col: str = "n_tokens_ws",
                      budget: int = 512, num_buckets: int = 16,
                      bucket_fn=None) -> "ray.data.Dataset":
    """Per-doc pack assignment: adds ``bucket``, ``window`` (the
    budget-sized chunk index the doc STARTS in) and ``offset`` (token
    position within that window). A doc may straddle a window boundary
    — concat-and-chunk splits it, exactly like the flat-token pack."""
    if budget <= 0:
        raise ValueError("budget must be positive")

    def add_bucket(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        bk = (bucket_fn(ids) if bucket_fn
              else ids.astype(np.int64) % num_buckets)
        return b.append_column("bucket",
                               pa.array(bk.astype(np.int64)))

    def pack_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort")
        toks = g[tokens_col].to_numpy(dtype=np.int64)
        cum_excl = np.concatenate([[0], np.cumsum(toks)[:-1]])
        g["window"] = cum_excl // budget
        g["offset"] = cum_excl % budget
        return g

    return ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(pack_bucket, batch_format="pandas")


def window_stats(packed: "ray.data.Dataset",
                 tokens_col: str = "n_tokens_ws") -> "ray.data.Dataset":
    """Per-(bucket, window) fill stats: doc count + tokens STARTING in
    the window — the pack-efficiency summary (a window's start-token
    total can exceed the budget only via its last, straddling doc)."""
    from ..stages.aggregate import agg_counts
    return agg_counts(packed, ["bucket", "window"],
                      sum_cols=[tokens_col])
