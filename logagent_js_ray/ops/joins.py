"""Join operators Ray Data lacks, composed from union + groupby +
per-group vectorized logic (the SURVEY.md §2 'custom operators' recipe:
map_batches + groupby().map_groups + sort where semantics allow).

The reference has NO hash/merge/as-of joins (SURVEY.md §2.8 — every
enrichment is a broadcast lookup, stages/enrich.py); these exist for the
training-data side of the engine (align events to transcript turns,
sessionize against side streams, point-in-time feature joins).

Partitioning assumption (documented per the §2 contract): both sides are
co-partitioned by the join ``key`` via one ``groupby(key)`` — a single
all-to-all shuffle; within a group rows are sorted by time and matched
vectorized (pandas ``merge_asof``). A hot key concentrates one group;
salt by a coarse time-range column (split the right side's history per
salt bucket) if a single key's rows exceed one worker's heap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def asof_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
              key: str, ts_col: str = "ts",
              right_cols: list[str] | None = None,
              rsuffix: str = "_r",
              tolerance_us: int | None = None) -> "ray.data.Dataset":
    """INNER as-of join: each left row matches the right row with the
    greatest ``right.ts <= left.ts`` for the same ``key`` (DuckDB
    ``ASOF JOIN ... ON l.key = r.key AND l.ts >= r.ts`` semantics; ties
    on right ts must be pre-deduplicated by the caller for determinism).
    ``tolerance_us`` optionally bounds the lookback window.

    Output: every left column + ``<right_col><rsuffix>`` columns +
    ``<ts_col><rsuffix>`` (the matched right timestamp).
    """
    ls = left.schema()
    l_types = dict(zip(ls.names, ls.types))
    left_cols = list(ls.names)
    rs = right.schema()
    r_types = dict(zip(rs.names, rs.types))
    right_cols = right_cols or [c for c in rs.names
                                if c not in (key, ts_col)]
    out_r = [f"{c}{rsuffix}" for c in right_cols] + [f"{ts_col}{rsuffix}"]

    # one combined schema so the two sides union into one shuffle
    def tag_left(b: pa.Table) -> pa.Table:
        b = b.append_column("_side", pa.array(
            np.zeros(b.num_rows, dtype=np.int8)))
        for c in right_cols:
            b = b.append_column(
                f"_r_{c}", pa.nulls(b.num_rows, r_types[c]))
        return b

    def tag_right(b: pa.Table) -> pa.Table:
        out = {key: b[key], ts_col: b[ts_col],
               "_side": pa.array(np.ones(b.num_rows, dtype=np.int8))}
        for c in left_cols:
            if c not in out:
                out[c] = pa.nulls(b.num_rows, l_types[c])
        for c in right_cols:
            out[f"_r_{c}"] = b[c]
        order = left_cols + ["_side"] + [f"_r_{c}" for c in right_cols]
        return pa.table({c: out[c] for c in order})

    combined = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow"))

    empty_cols = {c: pd.Series([], dtype=object)
                  for c in left_cols + out_r}

    def group_asof(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["_side"] == 0]
        rg = g[g["_side"] == 1]
        if lg.empty or rg.empty:
            return pd.DataFrame(empty_cols)
        lg = lg.sort_values(ts_col)[left_cols]
        rg = rg.sort_values(ts_col)
        rsel = rg[[ts_col] + [f"_r_{c}" for c in right_cols]].rename(
            columns={f"_r_{c}": f"{c}{rsuffix}" for c in right_cols})
        rsel[f"{ts_col}{rsuffix}"] = rsel[ts_col]
        tol = pd.Timedelta(microseconds=tolerance_us) \
            if tolerance_us is not None else None
        out = pd.merge_asof(lg, rsel, on=ts_col, direction="backward",
                            tolerance=tol)
        return out.dropna(subset=[f"{ts_col}{rsuffix}"])

    return combined.groupby(key).map_groups(group_asof,
                                            batch_format="pandas")


def range_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
               key: str, ts_col: str = "ts",
               start_col: str = "t_start", end_col: str = "t_end",
               right_cols: list[str] | None = None,
               rsuffix: str = "_r") -> "ray.data.Dataset":
    """INNER interval-containment join: left rows match the right
    interval with ``start <= left.ts <= end`` for the same ``key``.
    ASSUMPTION (documented per §2 custom-operator contract): intervals
    are NON-OVERLAPPING per key (e.g. session windows) — each left row
    matches at most one interval, located by one searchsorted per group.
    Same co-partitioning shape as asof_join: one groupby(key) shuffle.
    """
    ls = left.schema()
    l_types = dict(zip(ls.names, ls.types))
    left_cols = list(ls.names)
    rs = right.schema()
    r_types = dict(zip(rs.names, rs.types))
    right_cols = right_cols or [c for c in rs.names
                                if c not in (key, start_col, end_col)]

    def tag_left(b: pa.Table) -> pa.Table:
        b = b.append_column("_side", pa.array(
            np.zeros(b.num_rows, dtype=np.int8)))
        for c in right_cols:
            b = b.append_column(f"_r_{c}", pa.nulls(b.num_rows,
                                                    r_types[c]))
        b = b.append_column("_r_start", pa.nulls(b.num_rows,
                                                 r_types[start_col]))
        return b.append_column("_r_end", pa.nulls(b.num_rows,
                                                  r_types[end_col]))

    def tag_right(b: pa.Table) -> pa.Table:
        out = {key: b[key], "_side": pa.array(
            np.ones(b.num_rows, dtype=np.int8))}
        for c in left_cols:
            if c not in out:
                out[c] = pa.nulls(b.num_rows, l_types[c])
        for c in right_cols:
            out[f"_r_{c}"] = b[c]
        out["_r_start"] = b[start_col]
        out["_r_end"] = b[end_col]
        order = (left_cols + ["_side"] + [f"_r_{c}" for c in right_cols]
                 + ["_r_start", "_r_end"])
        return pa.table({c: out[c] for c in order})

    combined = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow"))
    out_r = [f"{c}{rsuffix}" for c in right_cols]
    empty_cols = {c: pd.Series([], dtype=object)
                  for c in left_cols + out_r}

    def group_range(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["_side"] == 0]
        rg = g[g["_side"] == 1].sort_values("_r_start")
        if lg.empty or rg.empty:
            return pd.DataFrame(empty_cols)
        starts = rg["_r_start"].to_numpy()
        ends = rg["_r_end"].to_numpy()
        ts = lg[ts_col].to_numpy()
        idx = np.searchsorted(starts, ts, side="right") - 1
        ok = (idx >= 0) & (ts <= ends[np.clip(idx, 0, None)])
        out = lg.loc[ok, left_cols].reset_index(drop=True)
        sel = rg.iloc[idx[ok]]
        for c in right_cols:
            out[f"{c}{rsuffix}"] = sel[f"_r_{c}"].to_numpy()
        return out

    return combined.groupby(key).map_groups(group_range,
                                            batch_format="pandas")
