"""Event-time windowing over a keyed stream — the generalization of
logagent's processing-time sql windows (SURVEY.md §2.6) to deterministic
EVENT-time semantics, per the Ray Data streaming-shaped pattern: treat
the table as an ordered, partitioned log, partition by key, order by ts
inside ``map_groups``, and window with vectorized pandas.

Partitioning assumption (documented per SURVEY.md §2.x contract): all
rows of one key land in one group. Grouping is by a COARSE bucket
``hash(key) % num_buckets`` (Ray's per-group dispatch is Python-priced,
so group count — not key cardinality — is the cost driver; same pattern
as ops/dedup.py and ops/joins.py); inside a bucket every key is
sessionized in one vectorized pandas pass over the (key, ts)-sorted
frame. Hot keys: a key whose rows exceed one task's memory would need
chunked sessionization (carry last-event watermark between chunks).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def _session_blocks(g: pd.DataFrame, key: str,
                    gap: pd.Timedelta,
                    t_start_col: str, t_end_col: str):
    """One sort + one cumsum sessionizes EVERY key in the frame.

    Null keys: pandas ne()/groupby treat NaN as never-equal / droppable,
    which would crash the ordinal cast and split every null row into its
    own session — SQL groups nulls together. Grouping is on the explicit
    (is_null, filled_key) PAIR, not a value sentinel: a genuine key that
    happens to equal any fill value can never merge with null-key
    sessions (round-2 ADVICE fix).

    Rows may themselves be intervals (sub-sessions): a break compares
    this row's ``t_start_col`` against the previous row's ``t_end_col``.
    Returns (sorted frame, isnull series, block ids)."""
    isnull = g[key].isna()
    g = g.assign(_key_isnull=isnull)
    if isnull.any():
        g[key] = g[key].fillna(
            -1 if pd.api.types.is_numeric_dtype(g[key]) else "\0null")
    g = g.sort_values(["_key_isnull", key, t_start_col], kind="mergesort")
    new_key = (g[key].ne(g[key].shift())
               | g["_key_isnull"].ne(g["_key_isnull"].shift()))
    brk = new_key | (g[t_start_col] - g[t_end_col].shift()).gt(gap)
    return g, g["_key_isnull"], brk.cumsum()


def _finish_sessions(g: pd.DataFrame, blk, key: str,
                     t_start_col: str, t_end_col: str,
                     n_col: str | None, sum_col: str | None
                     ) -> pd.DataFrame:
    """Collapse session blocks to one row per (key, session) with the
    0-based per-key session_id ordinal (blocks arrive in key, ts order).
    ``n_col``/``sum_col`` name pre-aggregated per-row counts/sums to SUM
    (None = count rows / no sum)."""
    gg = g.groupby(blk.values, sort=True)
    out = pd.DataFrame({
        key: gg[key].first(),
        "n_events": gg[n_col].sum().astype(np.int64) if n_col
        else gg.size(),
        "t_start": gg[t_start_col].min(),
        "t_end": gg[t_end_col].max(),
    })
    out.insert(1, "session_id",
               out.groupby([key, gg["_key_isnull"].first()],
                           sort=False).cumcount().astype(np.int64))
    if sum_col is not None:
        # SQL SUM semantics: nulls skipped, all-null group -> NULL
        # (nullable Int64 round-trips to int64-with-nulls in Arrow)
        out["sum_value_cents"] = (
            g[sum_col].groupby(blk.values).sum(min_count=1).astype("Int64"))
    restored = gg["_key_isnull"].first()
    if restored.any():
        out.loc[restored.values, key] = None
    cols = [key, "session_id", "n_events", "t_start", "t_end"]
    if sum_col is not None:
        cols.append("sum_value_cents")
    return out[cols].reset_index(drop=True)


def sessionize(ds: "ray.data.Dataset", key: str = "user_id",
               ts_col: str = "ts", gap_minutes: float = 30.0,
               value_col: str | None = "value",
               num_buckets: int = 64,
               hot_key_chunk_minutes: float | None = None
               ) -> "ray.data.Dataset":
    """Session windows: a new session starts when the gap since the
    previous event of the same key exceeds ``gap_minutes``. Returns one
    row per (key, session) with n_events, start/end, optional sum;
    session_id is the 0-based per-key ordinal in time order.

    ``hot_key_chunk_minutes`` is the hot-key escape hatch: when set, the
    first pass groups on (key bucket, time chunk) so no task ever holds
    more than one chunk of a hot key's rows; each chunk emits SUB-session
    rows (a session split at chunk boundaries), and a second, tiny pass
    merges adjacent sub-sessions whose boundary gap is within threshold
    (per-key watermark carried as the sub-session t_end). Output is
    identical to the unchunked path (asserted in tests); cost is one
    extra pass over #sub-session rows (~#sessions + #chunks per key)."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def add_bucket(b: pa.Table) -> pa.Table:
        from .joins import coarse_bucket_array
        b = b.append_column(
            "_b", pa.array(coarse_bucket_array(b[key], num_buckets)))
        if hot_key_chunk_minutes is not None:
            import pyarrow.compute as pc
            span_us = int(hot_key_chunk_minutes * 60 * 1_000_000)
            t = pc.cast(pc.cast(b[ts_col], pa.timestamp("us")),
                        pa.int64()).to_numpy(zero_copy_only=False)
            b = b.append_column(
                "_chunk", pa.array((t // span_us).astype(np.int64)))
        return b

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if value_col and value_col in g.columns:
            g = g.assign(_cents=(g[value_col] * 100).round())
        g, _, blk = _session_blocks(g, key, gap, ts_col, ts_col)
        return _finish_sessions(
            g, blk, key, ts_col, ts_col, None,
            "_cents" if value_col and "_cents" in g.columns else None)

    ds = ds.map_batches(add_bucket, batch_format="pyarrow")
    if hot_key_chunk_minutes is None:
        return ds.groupby("_b").map_groups(per_bucket, batch_format="pandas")

    def per_chunk(g: pd.DataFrame) -> pd.DataFrame:
        """Sub-sessions within one (bucket, chunk): sessions split at
        chunk boundaries, to be re-joined by merge_adjacent."""
        if value_col and value_col in g.columns:
            g = g.assign(_cents=(g[value_col] * 100).round())
        has_sum = "_cents" in g.columns
        g, _, blk = _session_blocks(g, key, gap, ts_col, ts_col)
        gg = g.groupby(blk.values, sort=True)
        out = pd.DataFrame({
            "_b": gg["_b"].first(),
            key: gg[key].first(),
            "_key_isnull": gg["_key_isnull"].first(),
            "_n": gg.size().astype(np.int64),
            "_ts": gg[ts_col].min(),
            "_te": gg[ts_col].max(),
        })
        if has_sum:
            out["_sum"] = g["_cents"].groupby(blk.values).sum(min_count=1)
        return out.reset_index(drop=True)

    def merge_adjacent(g: pd.DataFrame) -> pd.DataFrame:
        # rows are sub-sessions; interval-aware break check (t_start vs
        # previous t_end = the per-key watermark across chunk boundaries)
        g = g.sort_values(["_key_isnull", key, "_ts"], kind="mergesort")
        new_key = (g[key].ne(g[key].shift())
                   | g["_key_isnull"].ne(g["_key_isnull"].shift()))
        brk = new_key | (g["_ts"] - g["_te"].shift()).gt(gap)
        blk = brk.cumsum()
        return _finish_sessions(g, blk, key, "_ts", "_te", "_n",
                                "_sum" if "_sum" in g.columns else None)

    subs = ds.groupby(["_b", "_chunk"]).map_groups(
        per_chunk, batch_format="pandas")
    return subs.groupby("_b").map_groups(
        merge_adjacent, batch_format="pandas")


def tumbling(ds: "ray.data.Dataset", key: str, ts_col: str = "ts",
             minutes: int = 60,
             value_col: str | None = None) -> "ray.data.Dataset":
    """Tumbling event-time window counts per key — the direct analogue
    of the sql output filter's interval group-by, on event time. Uses
    the partial+tree-merge path (no per-key grouping needed)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ..stages.aggregate import agg_counts

    def bucket(b: pa.Table) -> pa.Table:
        unit_us = minutes * 60 * 1_000_000
        ts = pc.cast(pc.cast(b[ts_col], pa.timestamp("us")), pa.int64())
        # numpy // is FLOOR division — pc.divide truncates toward zero,
        # which would put pre-epoch events in a window AFTER themselves
        t = ts.to_numpy(zero_copy_only=False)
        if t.dtype.kind == "f":  # nulls forced a float conversion
            w = np.floor(t / unit_us) * unit_us
            win = pa.array([None if x != x else int(x) for x in w],
                           pa.int64())
        else:
            win = pa.array((t // unit_us) * unit_us, pa.int64())
        return b.append_column("window", pc.cast(win, pa.timestamp("us")))

    ds = ds.map_batches(bucket, batch_format="pyarrow", batch_size=None)
    return agg_counts(ds, [key, "window"],
                      sum_cols=[value_col] if value_col else None)
