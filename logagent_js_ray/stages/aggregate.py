"""Aggregate stage — rebuild of logagent-js's ``sql`` output filter
(/root/reference/lib/plugins/output-filter/sql.js:10-97), its only
aggregation operator: a tumbling window group-by over buffered events
(``SELECT SUM(size), path FROM ? GROUP BY path`` every N seconds).

Deterministic deviation (SURVEY.md §7.5): the reference windows on
PROCESSING time (setInterval, sql.js:13); the rebuild buckets on EVENT
time derived from the input ``ts``/``@timestamp`` column
(``pc.floor_temporal``), which makes results reproducible and
SQL-checkable.

Scale design: a bare ``groupby().aggregate()`` shuffles every row.
``agg_counts`` pre-aggregates INSIDE ``map_batches`` (one row per key per
batch) and only merges the partials — the combiner pattern. This is
also the skew answer for counting: a hot ``conv_id``/sink key contributes
at most one partial row per block, so no salting is needed for the
aggregate path (hot keys still matter for ``map_groups``; see
``salt_column`` for that).

The partial MERGE is a fan-in TREE (``tree_merge``), not
``Dataset.groupby().aggregate()``: Ray's built-in aggregate does per-row
Python accumulation and costs ~20 s even on a few thousand partial rows
(measured in this environment; see BASELINE.md), while an associative
pandas merge of partials is milliseconds. The tree keeps every merge
task bounded: level 1 combines ``fanout`` blocks at a time, the root
merges the survivors. Use ``Dataset.groupby`` only when per-group
LOGIC (map_groups) is needed, or when unique keys outnumber what one
root task can hold (then partition by key hash first).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_KNUTH = np.uint64(0x9E3779B97F4A7C15)


_NULL_CRC = zlib.crc32(b"None")  # str(None) — matches the historical loop


def _dict_crc32(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Dictionary-encode ``arr`` and crc32 only its UNIQUE values (corpus
    key columns repeat heavily; the round-2 per-row Python crc32 loop was
    the last O(rows) Python in the shared bucketing path). Returns
    (codes int64 with -1 for null, lut uint64 of per-unique crc32)."""
    enc = arr.dictionary_encode() if not pa.types.is_dictionary(arr.type) \
        else arr
    uniq = enc.dictionary.to_pylist()
    lut = np.fromiter((zlib.crc32(str(v).encode()) for v in uniq),
                      dtype=np.uint64, count=len(uniq))
    codes = pc.fill_null(enc.indices, -1).to_numpy(
        zero_copy_only=False).astype(np.int64)
    return codes, lut


def coarse_bucket_array(arr, num_buckets: int) -> np.ndarray:
    """Deterministic ``hash(key) % num_buckets`` over an Arrow array.
    Integer keys hash vectorized (Fibonacci/Knuth multiplicative);
    other types dictionary-encode and crc32 only the unique values
    (identical per-value results to the historical ``str(v)`` loop).
    Shared by the coarse-group pattern everywhere (ops/joins,
    ops/windows, partitioned tree_merge): group on the bucket, segment
    exact keys inside."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_integer(arr.type):
        # fill nulls BEFORE to_numpy: a block with any null converts to
        # float64, and ids above 2^53 then lose low bits — the same key
        # would land in different buckets depending on which block it
        # shared with a null (null itself gets bucket of 0; co-locating
        # all nulls anywhere is fine, splitting a real key is not)
        v = pc.fill_null(arr, 0).to_numpy(
            zero_copy_only=False).astype(np.uint64)
        return ((v * _KNUTH) >> np.uint64(33)).astype(np.int64) % num_buckets
    codes, lut = _dict_crc32(arr)
    if len(lut) == 0:  # all-null column
        return np.full(len(codes), _NULL_CRC % num_buckets, dtype=np.int64)
    h = np.where(codes >= 0, lut[np.maximum(codes, 0)],
                 np.uint64(_NULL_CRC))
    return (h % np.uint64(num_buckets)).astype(np.int64)


def add_time_bucket(batch: pa.Table, ts_col: str = "@timestamp",
                    unit: str = "hour",
                    out_col: str = "time_bucket") -> pa.Table:
    bucket = pc.floor_temporal(batch[ts_col], unit=unit)
    return batch.append_column(out_col, bucket)


def make_time_bucket_fn(ts_col: str = "@timestamp", unit: str = "hour",
                        out_col: str = "time_bucket"):
    def _bucket(batch: pa.Table) -> pa.Table:
        return add_time_bucket(batch, ts_col, unit, out_col)
    return _bucket


def _partial_fn(keys: list[str], sum_cols: list[str]):
    """Per-block partial aggregation via pyarrow's C++ hash-aggregate
    (null keys form their own group; sums skip nulls with min_count=1
    semantics, matching the pandas tree-merge above it)."""
    def _partial(batch: pa.Table) -> pa.Table:
        aggs = [([], "count_all")] + [(c, "sum") for c in sum_cols]
        g = batch.group_by(keys).aggregate(aggs)
        names = {"count_all": "n"}
        names.update({f"{c}_sum": f"sum_{c}" for c in sum_cols})
        g = g.rename_columns([names.get(c, c) for c in g.column_names])
        # defragment: the multithreaded hash-aggregate can emit sliced /
        # multi-chunk columns; contiguous buffers serialize predictably
        # across the object store, and partials are tiny, so this is free
        return g.combine_chunks()
    return _partial


# merge spec: output column -> reducer over partial columns
MERGE_HOW = {"sum", "min", "max"}


def _merge_fn(keys: list[str], spec: dict[str, str]):
    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        if not keys:
            # global aggregate (SELECT with no GROUP BY): the whole
            # frame reduces to one row — same reducers, no grouper
            parts = {}
            for col, how in spec.items():
                if how == "sum":
                    parts[col] = [df[col].sum(min_count=1)]
                elif how == "min":
                    parts[col] = [df[col].min()]
                elif how == "max":
                    parts[col] = [df[col].max()]
                else:  # pragma: no cover
                    raise ValueError(how)
            return pd.DataFrame(parts)
        g = df.groupby(keys, dropna=False, sort=False)
        parts = {}
        for col, how in spec.items():
            if how == "sum":
                # KNOWN dtype caveat: if some block's partial holds an
                # all-null int sum, the arrow->pandas conversion flips
                # that column to float64 for this merge and the output
                # dtype follows. Restoring would need type provenance
                # the merged frame doesn't carry (guessing from integral
                # values mis-types genuinely-float sums — tried and
                # reverted); callers needing a hard dtype contract cast
                # in their own finishing map_batches.
                parts[col] = g[col].sum(min_count=1)
            elif how == "min":
                parts[col] = g[col].min()
            elif how == "max":
                parts[col] = g[col].max()
            else:  # pragma: no cover
                raise ValueError(how)
        return pd.concat(parts, axis=1).reset_index()
    return _merge


# Fan-in geometry for the default tree_merge path: level-1 tasks each
# coalesce ~LEVEL_ROWS of partial rows (bounded pandas groupby per
# task); the root coalesces every level-1 output into ONE batch (total
# level-1 output is #level1-tasks x |key space|, bounded by
# construction). Row counts, not partition counts — see tree_merge.
_LEVEL_ROWS = 1 << 18
_ROOT_ROWS = 1 << 31


def fan_in(parts: "ray.data.Dataset", merge_fn,
           level_rows: int = _LEVEL_ROWS) -> "ray.data.Dataset":
    """Two-level associative fan-in over small per-block partials as
    plain STREAMING map operators: ``batch_size`` makes each level-1
    task coalesce ~level_rows of consecutive partial rows, and the root
    task coalesce every level-1 output into one batch/block.
    ``merge_fn`` must be associative and idempotent on merged output
    (true for groupby-reduce partials and mergeable sketches).

    Replaces ``repartition(8) ... repartition(1)``: Repartition is an
    AllToAllOperator, and a task-based upstream map gets FUSED into its
    split stage, executing under the all-to-all's throttled resource
    budget (measured: 32-task parse stage ran at parallelism ~1, 8.4 s
    wall for 7.5 s UDF on 8 CPUs). The fractional num_cpus values are
    fusion breakers, not resource tuning — map->map fusion adopts the
    downstream batch_size for bundling, so letting the producer fuse
    with the root (batch_size=_ROOT_ROWS) would bundle the whole input
    into ONE task (also observed); distinct ray_remote_args keep the
    operators separate at the cost of nothing (merge tasks are few and
    short)."""
    lvl = parts.map_batches(merge_fn, batch_format="pandas",
                            batch_size=level_rows, num_cpus=0.01)
    # root: _ROOT_ROWS exceeds any bounded key space, so every level-1
    # block lands in ONE bundle -> one task -> one merged output block
    return lvl.map_batches(merge_fn, batch_format="pandas",
                           batch_size=_ROOT_ROWS, num_cpus=0.02)


def tree_merge(partials: "ray.data.Dataset", keys: list[str],
               spec: dict[str, str], fanout: int = 8,
               partition_by_key: int | None = None) -> "ray.data.Dataset":
    """Associative fan-in merge of per-block partial aggregates.

    Default (bounded key space — e.g. the flagship's (sink, role, tool,
    hour) cube): a streaming ``fan_in`` (see above) with NO all-to-all.
    ``fanout`` is kept for signature compatibility; the level-1 task
    granularity is row-based (_LEVEL_ROWS) because partial row counts,
    not block counts, bound the merge cost.

    ``partition_by_key=P`` (UNBOUNDED key space — content digests,
    fingerprints, conv ids): partials are hash-partitioned on the
    first key into P groups and merged per partition, so no single
    task ever holds every distinct key — the single-batch root of the
    default shape would funnel the whole key space through one
    process. Output arrives as P merged blocks (same rows, no global
    root)."""
    merge = _merge_fn(keys, spec)
    if partition_by_key:
        pcol = f"_p_{keys[0]}"

        def add_p(b: pa.Table) -> pa.Table:
            arr = b[keys[0]].combine_chunks() if isinstance(
                b[keys[0]], pa.ChunkedArray) else b[keys[0]]
            return b.append_column(
                pcol, pa.array(coarse_bucket_array(arr, partition_by_key)))

        def merge_drop_p(df: pd.DataFrame) -> pd.DataFrame:
            return merge(df.drop(columns=[pcol]))

        return partials.map_batches(add_p, batch_format="pyarrow") \
            .groupby(pcol).map_groups(merge_drop_p, batch_format="pandas")
    return fan_in(partials, merge)


def agg_counts(ds: "ray.data.Dataset", keys: list[str],
               sum_cols: list[str] | None = None,
               batch_size: int | None = None) -> "ray.data.Dataset":
    """count(*) (+ optional sums) by ``keys``: per-block partial combine
    inside map_batches, then a tree merge of the partials."""
    sum_cols = sum_cols or []
    partials = ds.map_batches(_partial_fn(keys, sum_cols),
                              batch_format="pyarrow", batch_size=batch_size)
    spec = {"n": "sum"}
    for c in sum_cols:
        spec[f"sum_{c}"] = "sum"
    return tree_merge(partials, keys, spec)


def _distinct_counts(ds: "ray.data.Dataset", keys: list[str],
                     d: str) -> dict[tuple, int]:
    """Exact per-group distinct count of column ``d``: per-block
    distinct (keys, d) pairs -> tree merge (dedup across blocks) ->
    driver count over the bounded pair table. Returns {group key tuple
    (NaN/NaT -> None): count}; groups absent from the dict have no
    non-null ``d`` (SQL COUNT(DISTINCT) = 0)."""
    pair_keys = list(keys) + [d]

    def _pairs(batch: pa.Table) -> pa.Table:
        g = batch.group_by(pair_keys).aggregate([([], "count_all")])
        return g.rename_columns(
            [{"count_all": "__n"}.get(c, c) for c in g.column_names]) \
            .combine_chunks()

    merged = tree_merge(ds.map_batches(_pairs, batch_format="pyarrow"),
                        pair_keys, {"__n": "sum"})
    pairs = merged.to_pandas()
    pairs = pairs[pairs[d].notna()]
    if not keys:
        return {(): int(pairs[d].nunique())}
    cnt = pairs.groupby(keys, dropna=False).size()
    out: dict[tuple, int] = {}
    for kv, v in cnt.items():
        kt = kv if isinstance(kv, tuple) else (kv,)
        out[tuple(None if pd.isna(x) else x for x in kt)] = int(v)
    return out


def _distinct_counts_kmv(ds: "ray.data.Dataset", keys: list[str],
                         d: str, k: int = 1024) -> dict[tuple, int]:
    """Approximate per-group distinct count — the 100-TB path for
    COUNT(DISTINCT) over high-cardinality columns, where the exact
    pair table (|groups| x |distinct d|) stops being 'bounded'. Each
    block contributes at most k value-hashes PER GROUP (the k-minimum-
    values sketch, Bar-Yossef et al. 2002 — same estimator as
    ops/sketches.distinct_count_kmv, here grouped); merges union +
    re-truncate per group, so exchange volume is |groups| x k uint64s
    regardless of column cardinality. Exact whenever a group holds
    fewer than k distinct hashes; relative error ~1/sqrt(k) otherwise
    (~3% at k=1024). Same return shape as _distinct_counts."""
    from ..ops.sketches import _KMV_PRIME, _kmv_hashes

    def _truncate(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()
        df = df.sort_values("__kmv", kind="stable")
        if keys:
            return df.groupby(keys, dropna=False, sort=False).head(k)
        return df.head(k)

    def _pairs(batch: pa.Table) -> pa.Table:
        schema = pa.schema([(kc, batch.schema.field(kc).type)
                            for kc in keys] + [("__kmv", pa.uint64())])
        arr = batch[d]
        if arr.null_count:
            batch = batch.filter(pc.is_valid(arr))
        if batch.num_rows == 0:  # pinned empty schema (round-4 ADVICE)
            return schema.empty_table()
        vals = batch[d].to_numpy(zero_copy_only=False)
        df = (batch.select(keys).to_pandas() if keys
              else pd.DataFrame(index=pd.RangeIndex(batch.num_rows)))
        df["__kmv"] = _kmv_hashes(vals)
        return pa.Table.from_pandas(_truncate(df), schema=schema,
                                    preserve_index=False) \
            .replace_schema_metadata(None)

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        return _truncate(df)

    root = fan_in(ds.map_batches(_pairs, batch_format="pyarrow"),
                  _merge).to_pandas()
    out: dict[tuple, int] = {}
    if not keys:
        groups = [((), root)] if len(root) else []
    else:
        groups = [(kv if isinstance(kv, tuple) else (kv,), g)
                  for kv, g in root.groupby(keys, dropna=False)]
    for kt, g in groups:
        h = np.sort(g["__kmv"].to_numpy())
        est = (len(h) if len(h) < k
               else int(round((k - 1) / (float(h[k - 1]) /
                                         float(_KMV_PRIME)))))
        out[tuple(None if pd.isna(x) else x for x in kt)] = est
    return out


def sql_select(ds: "ray.data.Dataset", keys: list[str],
               aggs: dict[str, tuple],
               where: str | None = None,
               having: str | None = None,
               approx_distinct: int | None = None) -> "ray.data.Dataset":
    """General sql-output-filter SELECT (round-4 verdict item #5 —
    the reference's alasql accepts arbitrary aggregate queries over
    the window buffer, lib/plugins/output-filter/sql.js:29-53; the
    fixed count/sum cube covered only its test query).

    ``aggs``: {out_col: (how, col)} with how in {"count", "sum",
    "min", "max", "avg", "count_distinct"}; ("count", None) is
    count(*), ("count", c) counts non-null. ``where`` is a Ray filter
    expression applied UPSTREAM of the per-block partials (predicate
    pushdown: filtered rows never enter the exchange). ``avg`` stays
    mergeable as (sum, non-null count) partials and divides at the
    finish (SQL null semantics — float64 output; callers needing the
    oracle's integer contract derive from sum/count themselves).
    ``count_distinct`` is EXACT by default: per-block distinct (keys,
    col) pairs -> tree merge over keys+[col] (bounded by |groups| x
    |distinct col|) -> one root count per group, nulls excluded per
    SQL; the input is materialized internally because each distinct
    column re-consumes it. ``approx_distinct=k`` switches every
    count_distinct to the per-group KMV sketch (_distinct_counts_kmv
    — exchange bounded by |groups| x k regardless of cardinality,
    ~1/sqrt(k) relative error, exact below k distinct): the declared
    approximation for high-cardinality columns at scale; the exact
    mode stays the oracle contract. ``having`` filters the tiny
    merged result. One partial pass + tree merge — the same
    no-groupby-aggregate shape as agg_counts."""
    if where:
        ds = ds.filter(expr=where)
    sum_cols = sorted({c for h, c in aggs.values()
                       if h in ("sum", "avg") and c})
    cnt_cols = sorted({c for h, c in aggs.values()
                       if h in ("avg", "count") and c})
    min_cols = sorted({c for h, c in aggs.values() if h == "min"})
    max_cols = sorted({c for h, c in aggs.values() if h == "max"})
    dist_cols = sorted({c for h, c in aggs.values()
                        if h == "count_distinct"})
    for h, _ in aggs.values():
        if h not in ("count", "sum", "min", "max", "avg",
                     "count_distinct"):
            raise ValueError(f"unsupported aggregate {h!r}")
    dist_lookup: dict[str, dict[tuple, int]] = {}
    if dist_cols:
        # the main partial pass plus one distinct-pair pass per column
        # each consume ds — hold it in the object store once (the
        # dsir_select rationale)
        ds = ds.materialize()
        for d in dist_cols:
            dist_lookup[d] = (
                _distinct_counts_kmv(ds, keys, d, k=approx_distinct)
                if approx_distinct else _distinct_counts(ds, keys, d))

    def _partial(batch: pa.Table) -> pa.Table:
        specs = [([], "count_all")]
        specs += [(c, "sum") for c in sum_cols]
        specs += [(c, "count") for c in cnt_cols]
        specs += [(c, "min") for c in min_cols]
        specs += [(c, "max") for c in max_cols]
        g = batch.group_by(keys).aggregate(specs)
        names = {"count_all": "__n"}
        names.update({f"{c}_sum": f"__sum_{c}" for c in sum_cols})
        names.update({f"{c}_count": f"__cnt_{c}" for c in cnt_cols})
        names.update({f"{c}_min": f"__min_{c}" for c in min_cols})
        names.update({f"{c}_max": f"__max_{c}" for c in max_cols})
        return g.rename_columns([names.get(c, c)
                                 for c in g.column_names]) \
            .combine_chunks()

    spec: dict[str, str] = {"__n": "sum"}
    spec.update({f"__sum_{c}": "sum" for c in sum_cols})
    spec.update({f"__cnt_{c}": "sum" for c in cnt_cols})
    spec.update({f"__min_{c}": "min" for c in min_cols})
    spec.update({f"__max_{c}": "max" for c in max_cols})
    merged = tree_merge(ds.map_batches(_partial, batch_format="pyarrow"),
                        keys, spec)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:  # empty root block can arrive schema-less
            return pd.DataFrame({c: [] for c in
                                 list(keys) + list(aggs)})
        out = df[keys].copy()
        for out_col, (how, c) in aggs.items():
            if how == "count":
                src = df["__n"] if c is None else df[f"__cnt_{c}"]
                out[out_col] = src.astype("int64")
            elif how == "sum":
                out[out_col] = df[f"__sum_{c}"]
            elif how == "avg":
                out[out_col] = (df[f"__sum_{c}"].astype("float64")
                                / df[f"__cnt_{c}"])
            elif how == "count_distinct":
                lk = dist_lookup[c]
                if keys:
                    vals = [lk.get(tuple(None if pd.isna(x) else x
                                         for x in row), 0)
                            for row in df[keys].itertuples(index=False,
                                                           name=None)]
                else:
                    vals = [lk.get((), 0)] * len(df)
                out[out_col] = pd.Series(vals, index=df.index,
                                         dtype="int64")
            elif how == "min":
                out[out_col] = df[f"__min_{c}"]
            else:
                out[out_col] = df[f"__max_{c}"]
        return out

    res = merged.map_batches(finish, batch_format="pandas",
                             batch_size=None)
    if not keys:
        # SQL: a global aggregate always yields exactly one row, even
        # over zero input rows (COUNT -> 0, SUM/MIN/MAX/AVG -> NULL).
        # Zero input blocks never reach `finish`, so pin here — the
        # global result is one row, materializing it is free.
        res = res.materialize()
        if res.count() == 0:
            row = {}
            for out_col, (how, _c) in aggs.items():
                if how in ("count", "count_distinct"):
                    row[out_col] = pd.Series([0], dtype="int64")
                else:
                    row[out_col] = pd.Series([None], dtype="float64")
            res = ray.data.from_pandas(pd.DataFrame(row))
    if having:
        res = res.filter(expr=having)
    return res


def salt_column(batch: pa.Table, key_col: str, buckets: int = 16,
                salt_col: str = "_salt") -> pa.Table:
    """Append ``(hash(key) + row_position) % buckets`` — the row-position
    mix is the point: it SPLITS a hot key's rows round-robin across
    ``buckets`` sub-groups (pure ``hash(key)`` would put the whole hot
    key back in one group) before a ``map_groups``/shuffle; a second,
    tiny aggregate merges the sub-results (north_rule's skew-aware
    salting). Salt values therefore depend on batch row order — only
    aggregations whose merge is order-independent may use this."""
    arr = batch[key_col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    codes, lut = _dict_crc32(arr)
    if len(lut) == 0:
        h = np.full(len(codes), _NULL_CRC, dtype=np.uint64)
    else:
        h = np.where(codes >= 0, lut[np.maximum(codes, 0)],
                     np.uint64(_NULL_CRC))
    salts = ((h + np.arange(len(codes), dtype=np.uint64))
             % np.uint64(buckets)).astype(np.int32)
    return batch.append_column(salt_col, pa.array(salts, pa.int32()))
