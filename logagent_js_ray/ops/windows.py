"""Event-time windowing over a keyed stream — the generalization of
logagent's processing-time sql windows (SURVEY.md §2.6) to deterministic
EVENT-time semantics, per the Ray Data streaming-shaped pattern: treat
the table as an ordered, partitioned log, partition by key, order by ts
inside ``map_groups``, and window with vectorized pandas.

Partitioning assumption (documented per SURVEY.md §2.x contract): all
rows of one key land in one group; order within the group is established
by sorting on ``ts`` inside the group fn — arrival order is NOT assumed.
Hot keys: a session computation is per-key sequential by nature; a key
whose rows exceed one task's memory would need chunked sessionization
(carry last-event watermark between chunks).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data


def sessionize(ds: "ray.data.Dataset", key: str = "user_id",
               ts_col: str = "ts", gap_minutes: float = 30.0,
               value_col: str | None = "value") -> "ray.data.Dataset":
    """Session windows: a new session starts when the gap since the
    previous event of the same key exceeds ``gap_minutes``. Returns one
    row per (key, session) with n_events, start/end, optional sum."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col)
        new_session = g[ts_col].diff().gt(gap) | g[ts_col].diff().isna()
        sid = new_session.cumsum().astype(np.int64) - 1
        gg = g.groupby(sid)
        out = pd.DataFrame({
            key: g[key].iloc[0],
            "session_id": gg[ts_col].first().index.astype(np.int64),
            "n_events": gg.size(),
            "t_start": gg[ts_col].min(),
            "t_end": gg[ts_col].max(),
        })
        if value_col and value_col in g.columns:
            out["sum_value_cents"] = (
                (g[value_col] * 100).round().astype("int64")
                .groupby(sid).sum())
        return out.reset_index(drop=True)

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")


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
        win = pc.multiply(pc.divide(ts, unit_us), unit_us)
        return b.append_column("window", pc.cast(win, pa.timestamp("us")))

    ds = ds.map_batches(bucket, batch_format="pyarrow", batch_size=None)
    return agg_counts(ds, [key, "window"],
                      sum_cols=[value_col] if value_col else None)
