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


def sessionize(ds: "ray.data.Dataset", key: str = "user_id",
               ts_col: str = "ts", gap_minutes: float = 30.0,
               value_col: str | None = "value",
               num_buckets: int = 64) -> "ray.data.Dataset":
    """Session windows: a new session starts when the gap since the
    previous event of the same key exceeds ``gap_minutes``. Returns one
    row per (key, session) with n_events, start/end, optional sum;
    session_id is the 0-based per-key ordinal in time order."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def add_bucket(b: pa.Table) -> pa.Table:
        from .joins import coarse_bucket_array
        return b.append_column(
            "_b", pa.array(coarse_bucket_array(b[key], num_buckets)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # null keys: pandas ne()/groupby treat NaN as never-equal /
        # droppable, which would crash the ordinal cast and split every
        # null row into its own session — SQL groups nulls together, so
        # mask them through one sentinel and restore on output
        null_key = g[key].isna()
        if null_key.any():
            g = g.copy()
            g["_key_isnull"] = null_key
            g[key] = g[key].fillna(
                -1 if pd.api.types.is_numeric_dtype(g[key]) else "\0null")
        # one sort + one cumsum sessionizes EVERY key in the bucket:
        # a session break is a key change or a gap > threshold
        g = g.sort_values([key, ts_col], kind="mergesort")
        new_key = g[key].ne(g[key].shift())
        brk = new_key | g[ts_col].diff().gt(gap)
        blk = brk.cumsum()  # globally increasing session block id
        gg = g.groupby(blk.values, sort=True)
        out = pd.DataFrame({
            key: gg[key].first(),
            "n_events": gg.size(),
            "t_start": gg[ts_col].min(),
            "t_end": gg[ts_col].max(),
        })
        # per-key 0-based ordinal: blocks are emitted in (key, ts) order
        out.insert(1, "session_id",
                   out.groupby(key, sort=False).cumcount().astype(np.int64))
        if value_col and value_col in g.columns:
            # SQL SUM semantics: nulls skipped, all-null group -> NULL
            # (nullable Int64 round-trips to int64-with-nulls in Arrow)
            cents = (g[value_col] * 100).round()
            out["sum_value_cents"] = (
                cents.groupby(blk.values).sum(min_count=1)
                .astype("Int64"))
        if null_key.any():
            restored = gg["_key_isnull"].first()
            out.loc[restored.values, key] = None
        return out.reset_index(drop=True)

    ds = ds.map_batches(add_bucket, batch_format="pyarrow")
    return ds.groupby("_b").map_groups(per_bucket, batch_format="pandas")


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
