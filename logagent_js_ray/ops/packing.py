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
        return _assign_pack(g, id_col, tokens_col, budget)

    return ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(pack_bucket, batch_format="pandas")


def _assign_pack(g: pd.DataFrame, id_col: str, tokens_col: str,
                 budget: int) -> pd.DataFrame:
    """The per-bucket pack arithmetic, shared by pack_concat_chunk and
    the fused stats path so the two can't drift."""
    g = g.sort_values(id_col, kind="mergesort")
    toks = g[tokens_col].to_numpy(dtype=np.int64)
    cum_excl = np.concatenate([[0], np.cumsum(toks)[:-1]])
    g["window"] = cum_excl // budget
    g["offset"] = cum_excl % budget
    return g


def pack_and_group_stats(ds: "ray.data.Dataset", id_col: str = "doc_id",
                         tokens_col: str = "n_tokens_ws",
                         budget: int = 512, num_buckets: int = 16,
                         bucket_fn=None,
                         extra_key: str | None = "lang"
                         ) -> "ray.data.Dataset":
    """Fused pack-fill + per-``extra_key`` token summary in ONE bucket
    shuffle and ONE partial merge (round-3 verdict item #8: the
    unfused shape ran the same small table through two separate
    aggregation chains — materialize, agg_counts, pack groupby, window
    agg_counts — and at fixed input size those per-operator fixed
    costs dominate). Each bucket group emits BOTH its per-window pack
    partials and its per-key partials, harmonized to
    ``(which, key, n, sum_<tokens_col>)``; a single tree merge sums
    them. 'pack' keys are ``"bucket:window"``, extra-key rows carry
    ``which=extra_key``."""
    from ..stages.aggregate import tree_merge
    if budget <= 0:
        raise ValueError("budget must be positive")
    sum_col = f"sum_{tokens_col}"

    def add_bucket(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        bk = (bucket_fn(ids) if bucket_fn
              else ids.astype(np.int64) % num_buckets)
        return b.append_column("bucket",
                               pa.array(bk.astype(np.int64)))

    def both_stats(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "which": pd.Series([], dtype=object),
            "key": pd.Series([], dtype=object),
            "n": pd.Series([], dtype=np.int64),
            sum_col: pd.Series([], dtype=np.int64)})
        if not len(g):
            return empty
        g = _assign_pack(g, id_col, tokens_col, budget)
        bk = int(g["bucket"].iloc[0])
        pw = g.groupby("window", as_index=False).agg(
            n=(id_col, "size"), **{sum_col: (tokens_col, "sum")})
        parts = [pd.DataFrame({
            "which": "pack",
            "key": [f"{bk}:{w}" for w in pw["window"]],
            "n": pw["n"].astype(np.int64),
            sum_col: pw[sum_col].astype(np.int64)})]
        if extra_key is not None:
            pk = g.groupby(extra_key, as_index=False).agg(
                n=(id_col, "size"), **{sum_col: (tokens_col, "sum")})
            parts.append(pd.DataFrame({
                "which": extra_key,
                "key": pk[extra_key].astype(str),
                "n": pk["n"].astype(np.int64),
                sum_col: pk[sum_col].astype(np.int64)}))
        return pd.concat(parts, ignore_index=True)

    partials = ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(both_stats, batch_format="pandas")
    return tree_merge(partials, ["which", "key"],
                      {"n": "sum", sum_col: "sum"})


def window_stats(packed: "ray.data.Dataset",
                 tokens_col: str = "n_tokens_ws") -> "ray.data.Dataset":
    """Per-(bucket, window) fill stats: doc count + tokens STARTING in
    the window — the pack-efficiency summary (a window's start-token
    total can exceed the budget only via its last, straddling doc)."""
    from ..stages.aggregate import agg_counts
    return agg_counts(packed, ["bucket", "window"],
                      sum_cols=[tokens_col])
