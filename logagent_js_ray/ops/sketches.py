"""Mergeable sketches — the 'novel sketch' class of custom operators
(SURVEY.md §2.8: the reference has none; a 100 TB pipeline needs them).

heavy_hitters: EXACT frequent-items via the classic two-pass scheme:

  pass 1  per-block Misra-Gries summaries (k counters), merged through
          an associative compress tree — the mergeable-summaries result
          (Agarwal et al., PODS'12): the merged sketch underestimates
          any item's count by at most n/k, so every item with frequency
          >= n/k survives as a candidate. Only O(k) rows per block move.
  pass 2  broadcast the candidate set (ray.put), exact-count ONLY the
          candidates per block (partial + tree merge), keep those at or
          above the threshold. Output is exact — the sketch bounds the
          shuffle, it never touches correctness.

At 10^12 rows this is the only sane shape: a groupby over the full key
column shuffles every distinct key; this moves k rows per block, then
|candidates| rows per block.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..stages.aggregate import agg_counts, fan_in


def _mg_compress(items: np.ndarray, counts: np.ndarray,
                 k: int) -> tuple[np.ndarray, np.ndarray]:
    """Compress a counter set to <= k entries, Misra-Gries style: drop
    the tail and subtract the (k+1)-th largest count from the survivors
    (keeps the <= n/k undercount guarantee associative under merge)."""
    if len(counts) <= k:
        return items, counts
    order = np.argsort(-counts, kind="stable")
    s = counts[order[k]]
    keep = order[:k]
    newc = counts[keep] - s
    m = newc > 0
    return items[keep][m], newc[m]


def heavy_hitters(ds: "ray.data.Dataset", col: str,
                  threshold_num: int = 1, threshold_den: int = 100,
                  k: int | None = None) -> pd.DataFrame:
    """Items of ``col`` occurring in >= threshold_num/threshold_den of
    all rows, with EXACT counts. Integer threshold arithmetic so the
    result is reproducible bit-for-bit against SQL."""
    if k is None:
        # guarantee: undercount <= n/k, so k = den/num keeps every item
        # at the threshold in the candidate set (2x margin for comfort)
        k = 2 * max(2, threshold_den // max(1, threshold_num))

    def partial_sketch(b: pa.Table) -> pa.Table:
        vc = b.group_by(col).aggregate([([], "count_all")])
        items = np.asarray(vc[col].to_pylist(), dtype=object)
        counts = np.asarray(vc["count_all"].to_pylist(), dtype=np.int64)
        items, counts = _mg_compress(items, counts, k)
        # the block total travels on its OWN sentinel row (_is_total) so
        # n_total survives even when compress zeroes out every counter —
        # piggybacking it on item rows undercounted n_total whenever a
        # block's sketch came back empty (uniform-tail data), silently
        # lowering the threshold and breaking the EXACT guarantee
        return pa.table({col: pa.array(list(items) + [None]),
                         "mg_count": pa.array(list(counts) + [0],
                                              pa.int64()),
                         "rows_seen": pa.array(
                             [0] * len(items) + [b.num_rows], pa.int64()),
                         "_is_total": pa.array(
                             [False] * len(items) + [True])})

    def merge_sketch(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        total = int(df.loc[df["_is_total"], "rows_seen"].sum())
        d = df[~df["_is_total"]]
        g = d.groupby(col, as_index=False, dropna=False).agg(
            mg_count=("mg_count", "sum"))
        items, counts = _mg_compress(
            g[col].to_numpy(dtype=object), g["mg_count"].to_numpy(), k)
        kept = pd.DataFrame({col: items, "mg_count": counts})
        kept["rows_seen"] = 0
        kept["_is_total"] = False
        kept.loc[len(kept)] = [None, 0, total, True]
        return kept

    sketches = ds.map_batches(partial_sketch, batch_format="pyarrow",
                              batch_size=None)
    root = fan_in(sketches, merge_sketch).to_pandas()
    n_total = int(root.loc[root["_is_total"], "rows_seen"].sum())
    cand_series = root.loc[~root["_is_total"], col]
    # pandas renders a null candidate as NaN; 'v in {nan}' is False for
    # None, so a null value that IS a heavy hitter would silently vanish
    # from the EXACT output — track null candidacy explicitly
    null_candidate = bool(cand_series.isna().any())
    candidates = set(cand_series.dropna())
    if not candidates and not null_candidate:
        return pd.DataFrame({col: pd.Series([], dtype=object),
                             "n": pd.Series([], dtype=np.int64)})

    # pass 2: exact counts of the candidate set only
    cand_ref = ray.put(candidates)

    def keep_candidates(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        cands = ray.get(cand_ref)
        # vectorized C++ membership, not a per-row Python loop
        mask = pc.is_in(b[col], value_set=pa.array(list(cands)),
                        skip_nulls=True) if cands else \
            pa.array([False] * b.num_rows)
        if null_candidate:
            mask = pc.or_(mask, pc.is_null(b[col]))
        return b.filter(pc.fill_null(mask, null_candidate))

    exact = agg_counts(ds.map_batches(keep_candidates,
                                      batch_format="pyarrow",
                                      batch_size=None), [col]).to_pandas()
    out = exact[exact["n"] * threshold_den >= n_total * threshold_num]
    return out.reset_index(drop=True)


# ---------------------------------------------------------------- KMV

_KMV_PRIME = np.uint64((1 << 61) - 1)
_KMV_A = np.uint64(0x9E3779B97F4A7C15)


def _kmv_hashes(values: np.ndarray) -> np.ndarray:
    import zlib
    h = np.fromiter((zlib.crc32(str(v).encode()) ^
                     (zlib.crc32(str(v)[::-1].encode()) << 31)
                     for v in values), dtype=np.uint64, count=len(values))
    return (h * _KMV_A) % _KMV_PRIME


def distinct_count_kmv(ds: "ray.data.Dataset", col: str,
                       k: int = 1024) -> dict:
    """Approximate COUNT DISTINCT via the k-minimum-values sketch:
    each block keeps its k smallest value-hashes (mergeable by union +
    re-truncate), the estimator is (k-1) / kth_min_normalized
    (Bar-Yossef et al. 2002). Only k uint64s per block move; relative
    error ~ 1/sqrt(k) (~3% at k=1024). Returns {"estimate", "k",
    "exact_if_small"} — when fewer than k distinct hashes exist the
    sketch IS the exact distinct set."""

    def partial(b: pa.Table) -> pa.Table:
        vals = b[col].to_numpy(zero_copy_only=False)
        h = np.unique(_kmv_hashes(vals))
        return pa.table({"kmv": pa.array(h[:k].astype(np.uint64))})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        h = np.unique(df["kmv"].to_numpy())
        return pd.DataFrame({"kmv": h[:k]})

    root = fan_in(ds.map_batches(partial, batch_format="pyarrow",
                                 batch_size=None), merge).to_pandas()
    h = np.sort(root["kmv"].to_numpy())
    if len(h) < k:
        return {"estimate": float(len(h)), "k": k, "exact_if_small": True}
    kth = float(h[k - 1]) / float(_KMV_PRIME)
    return {"estimate": (k - 1) / kth, "k": k, "exact_if_small": False}


# ----------------------------------------------------------- quantiles

def approx_quantiles(ds: "ray.data.Dataset", col: str,
                     qs: tuple = (0.5, 0.9, 0.99),
                     m: int = 2048) -> pd.DataFrame:
    """Mergeable weighted-sample quantile sketch: each block contributes
    an m-point equi-depth summary (sorted sample with per-point weight =
    block_rows/m); merges weighted-sort and re-compress to m points.
    Memory per block/merge is O(m); accuracy ~ 1/m of rank. Quantile =
    weighted lower-rank lookup over the final summary."""

    def partial(b: pa.Table) -> pa.Table:
        v = np.sort(b[col].to_numpy(zero_copy_only=False).astype(
            np.float64))
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return pa.table({"q_val": pa.array([], pa.float64()),
                             "q_w": pa.array([], pa.float64())})
        if len(v) <= m:
            return pa.table({"q_val": pa.array(v),
                             "q_w": pa.array(np.ones(len(v)))})
        # equi-depth m-point summary (midpoints of m rank buckets)
        idx = ((np.arange(m) + 0.5) * len(v) / m).astype(np.int64)
        return pa.table({"q_val": pa.array(v[idx]),
                         "q_w": pa.array(
                             np.full(m, len(v) / m, np.float64))})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) <= m:
            return df
        df = df.sort_values("q_val")
        w = df["q_w"].to_numpy()
        v = df["q_val"].to_numpy()
        cum = np.cumsum(w)
        total = cum[-1]
        targets = (np.arange(m) + 0.5) * total / m
        pos = np.searchsorted(cum, targets)
        return pd.DataFrame({"q_val": v[np.clip(pos, 0, len(v) - 1)],
                             "q_w": np.full(m, total / m)})

    root = fan_in(ds.map_batches(partial, batch_format="pyarrow",
                                 batch_size=None), merge).to_pandas()
    if len(root) == 0:  # empty / all-null input: NaN per quantile
        return pd.DataFrame({"quantile": list(qs),
                             "value": [np.nan] * len(qs)})
    root = root.sort_values("q_val")
    v = root["q_val"].to_numpy()
    cum = np.cumsum(root["q_w"].to_numpy())
    total = cum[-1]
    out = [v[min(np.searchsorted(cum, q * total), len(v) - 1)]
           for q in qs]
    return pd.DataFrame({"quantile": list(qs), "value": out})
