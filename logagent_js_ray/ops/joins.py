"""Join operators Ray Data lacks, composed from union + groupby +
per-group vectorized logic (the SURVEY.md §2 'custom operators' recipe:
map_batches + groupby().map_groups + sort where semantics allow).

The reference has NO hash/merge/as-of joins (SURVEY.md §2.8 — every
enrichment is a broadcast lookup, stages/enrich.py); these exist for the
training-data side of the engine (align events to transcript turns,
sessionize against side streams, point-in-time feature joins).

Partitioning / scale design (per the §2 custom-operator contract):
both sides are co-partitioned by a COARSE key bucket ``hash(key) %
num_buckets`` via one ``groupby`` — a single all-to-all shuffle with a
BOUNDED group count (Ray's per-group dispatch is Python-priced, so group
count, not raw key cardinality, is the cost driver; same pattern as
ops/dedup.py). Inside each bucket all keys are matched in ONE vectorized
``pandas.merge_asof(..., by=key)`` — C-speed across every key in the
bucket, no per-key Python. A hot key concentrates one bucket; raise
``num_buckets`` or salt by a coarse time-range column if a single
bucket's rows exceed one worker's heap.

Determinism: right-side ties on (key, ts) are deduplicated INSIDE the
operator keeping the row with the lexicographically greatest
``right_cols`` tuple (== SQL ``max(col)`` per (key, ts) for a single
right column), so results are stable under any shuffle arrival order.
Output dtypes are restored to the input schemas (the tagged union
carries nulls, which pandas would otherwise promote int64 -> float64).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..stages.aggregate import coarse_bucket_array  # noqa: F401  (re-export)


def _pd_dtype(t: pa.DataType):
    """Pandas dtype to restore a non-null column to its Arrow type."""
    if pa.types.is_integer(t):
        return t.to_pandas_dtype()
    if pa.types.is_floating(t):
        return t.to_pandas_dtype()
    if pa.types.is_timestamp(t):
        if t.tz is not None:
            return pd.DatetimeTZDtype(t.unit, t.tz)
        return f"datetime64[{t.unit}]"
    return None


def _empty_frame(cols: list[tuple[str, pa.DataType]]) -> pd.DataFrame:
    out = {}
    for name, t in cols:
        dt = _pd_dtype(t)
        out[name] = pd.Series([], dtype=dt if dt is not None else object)
    return pd.DataFrame(out)


def _restore_dtypes(df: pd.DataFrame,
                    cols: list[tuple[str, pa.DataType]]) -> pd.DataFrame:
    for name, t in cols:
        dt = _pd_dtype(t)
        if dt is None or str(df[name].dtype) == str(dt):
            continue
        if pa.types.is_integer(t) and df[name].isna().any():
            # genuine NULLs in an int column: numpy int64 cannot hold
            # them and astype would raise — use pandas' nullable Int64
            # (Arrow round-trips it back to int64-with-nulls)
            df[name] = df[name].astype("Int64")
        else:
            df[name] = df[name].astype(dt)
    return df


def asof_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
              key: str, ts_col: str = "ts",
              right_cols: list[str] | None = None,
              rsuffix: str = "_r",
              tolerance_us: int | None = None,
              num_buckets: int = 64) -> "ray.data.Dataset":
    """INNER as-of join: each left row matches the right row with the
    greatest ``right.ts <= left.ts`` for the same ``key`` (DuckDB
    ``ASOF JOIN ... ON l.key = r.key AND l.ts >= r.ts`` semantics).
    Ties on right (key, ts) are broken deterministically by keeping the
    greatest ``right_cols`` tuple. ``tolerance_us`` optionally bounds
    the lookback window.

    Output: every left column + ``<right_col><rsuffix>`` columns +
    ``<ts_col><rsuffix>`` (the matched right timestamp), with input
    dtypes preserved, sorted by the left columns.
    """
    ls = left.schema()
    l_types = dict(zip(ls.names, ls.types))
    left_cols = list(ls.names)
    rs = right.schema()
    r_types = dict(zip(rs.names, rs.types))
    right_cols = right_cols or [c for c in rs.names
                                if c not in (key, ts_col)]
    out_spec = ([(c, l_types[c]) for c in left_cols]
                + [(f"{c}{rsuffix}", r_types[c]) for c in right_cols]
                + [(f"{ts_col}{rsuffix}", r_types[ts_col])])

    # one combined schema so the two sides union into one shuffle
    def tag_left(b: pa.Table) -> pa.Table:
        b = b.append_column("_side", pa.array(
            np.zeros(b.num_rows, dtype=np.int8)))
        for c in right_cols:
            b = b.append_column(
                f"_r_{c}", pa.nulls(b.num_rows, r_types[c]))
        return b.append_column(
            "_b", pa.array(coarse_bucket_array(b[key], num_buckets)))

    def tag_right(b: pa.Table) -> pa.Table:
        out = {key: b[key], ts_col: b[ts_col],
               "_side": pa.array(np.ones(b.num_rows, dtype=np.int8))}
        for c in left_cols:
            if c not in out:
                out[c] = pa.nulls(b.num_rows, l_types[c])
        for c in right_cols:
            out[f"_r_{c}"] = b[c]
        out["_b"] = pa.array(coarse_bucket_array(b[key], num_buckets))
        order = (left_cols + ["_side"]
                 + [f"_r_{c}" for c in right_cols] + ["_b"])
        return pa.table({c: out[c] for c in order})

    combined = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow"))
    tagged_r = [f"_r_{c}" for c in right_cols]

    def bucket_asof(g: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc
        # per-SIDE pandas conversion: converting the whole tagged union
        # at once injects nulls into the other side's int columns, and
        # pandas' int64->float64 promotion silently corrupts ids above
        # 2^53 before any dtype restore can run
        lmask = pc.equal(g["_side"], 0)
        lg = g.filter(lmask).select(left_cols).to_pandas()
        rg = g.filter(pc.invert(lmask)) \
              .select([key, ts_col] + tagged_r).to_pandas()
        # SQL semantics for null join/on keys: no match, never a crash
        # (pandas merge_asof raises on null on-key values)
        lg = lg.dropna(subset=[key, ts_col])
        rg = rg.dropna(subset=[key, ts_col])
        if lg.empty or rg.empty:
            return _empty_frame(out_spec)
        # deterministic right tie-break: keep max right_cols per (key,
        # ts); NaN sorts FIRST so keep="last" prefers real values
        rg = rg.sort_values([key, ts_col] + tagged_r, kind="mergesort",
                            na_position="first")
        rg = rg.drop_duplicates([key, ts_col], keep="last")
        rsel = rg.rename(
            columns={f"_r_{c}": f"{c}{rsuffix}" for c in right_cols})
        rsel[f"{ts_col}{rsuffix}"] = rsel[ts_col]
        # merge_asof(by=key): both frames sorted by ts only; every key in
        # the bucket is matched in one C-level pass
        lg = lg.sort_values(ts_col, kind="mergesort")
        rsel = rsel.sort_values(ts_col, kind="mergesort")
        tol = pd.Timedelta(microseconds=tolerance_us) \
            if tolerance_us is not None else None
        out = pd.merge_asof(lg, rsel, on=ts_col, by=key,
                            direction="backward", tolerance=tol)
        out = out.dropna(subset=[f"{ts_col}{rsuffix}"])
        out = _restore_dtypes(out, out_spec)
        return out.sort_values(left_cols, kind="mergesort") \
                  .reset_index(drop=True)

    return combined.groupby("_b").map_groups(bucket_asof,
                                             batch_format="pyarrow")


def range_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
               key: str, ts_col: str = "ts",
               start_col: str = "t_start", end_col: str = "t_end",
               right_cols: list[str] | None = None,
               rsuffix: str = "_r",
               num_buckets: int = 64) -> "ray.data.Dataset":
    """INNER interval-containment join: left rows match the right
    interval with ``start <= left.ts <= end`` for the same ``key``.
    ASSUMPTION (documented per §2 custom-operator contract): intervals
    are NON-OVERLAPPING per key (e.g. session windows) — each left row
    matches at most one interval, located by one backward
    ``merge_asof(by=key)`` on the interval start then bounds-checked
    against the end. Same coarse-bucket co-partitioning as asof_join.
    """
    ls = left.schema()
    l_types = dict(zip(ls.names, ls.types))
    left_cols = list(ls.names)
    rs = right.schema()
    r_types = dict(zip(rs.names, rs.types))
    right_cols = right_cols or [c for c in rs.names
                                if c not in (key, start_col, end_col)]
    out_spec = ([(c, l_types[c]) for c in left_cols]
                + [(f"{c}{rsuffix}", r_types[c]) for c in right_cols])

    def tag_left(b: pa.Table) -> pa.Table:
        b = b.append_column("_side", pa.array(
            np.zeros(b.num_rows, dtype=np.int8)))
        for c in right_cols:
            b = b.append_column(f"_r_{c}", pa.nulls(b.num_rows,
                                                    r_types[c]))
        b = b.append_column("_r_start", pa.nulls(b.num_rows,
                                                 r_types[start_col]))
        b = b.append_column("_r_end", pa.nulls(b.num_rows,
                                               r_types[end_col]))
        return b.append_column(
            "_b", pa.array(coarse_bucket_array(b[key], num_buckets)))

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
        out["_b"] = pa.array(coarse_bucket_array(b[key], num_buckets))
        order = (left_cols + ["_side"] + [f"_r_{c}" for c in right_cols]
                 + ["_r_start", "_r_end", "_b"])
        return pa.table({c: out[c] for c in order})

    combined = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow"))
    tagged_r = [f"_r_{c}" for c in right_cols]

    def bucket_range(g: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc
        # per-SIDE conversion: see bucket_asof — avoids null-driven
        # float64 promotion of int columns above 2^53
        lmask = pc.equal(g["_side"], 0)
        lg = g.filter(lmask).select(left_cols).to_pandas()
        rg = g.filter(pc.invert(lmask)) \
              .select([key, "_r_start", "_r_end"] + tagged_r).to_pandas()
        lg = lg.dropna(subset=[key, ts_col])
        rg = rg.dropna(subset=[key, "_r_start"])
        if lg.empty or rg.empty:
            return _empty_frame(out_spec)
        rsel = rg.sort_values("_r_start", kind="mergesort")
        lg = lg.sort_values(ts_col, kind="mergesort")
        out = pd.merge_asof(lg, rsel, left_on=ts_col, right_on="_r_start",
                            by=key, direction="backward")
        out = out[out[ts_col] <= out["_r_end"]]
        out = out.drop(columns=["_r_start", "_r_end"]).rename(
            columns={f"_r_{c}": f"{c}{rsuffix}" for c in right_cols})
        out = _restore_dtypes(out, out_spec)
        return out.sort_values(left_cols, kind="mergesort") \
                  .reset_index(drop=True)

    return combined.groupby("_b").map_groups(bucket_range,
                                             batch_format="pyarrow")
