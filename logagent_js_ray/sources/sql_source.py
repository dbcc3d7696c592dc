"""Periodic-SQL-query source — rebuild of logagent-js's mysql/mssql/
postgresql/command inputs (/root/reference/lib/plugins/input/mysql.js:14-68,
command.js:16-60): a query with a ``$QUERY_TIME`` watermark placeholder
runs against a SQL engine, new rows become events, and the watermark
advances so the next run is incremental.

Batch mapping: DuckDB stands in for the database (the only SQL engine in
this environment); the watermark is a file, the analogue of logagent's
``lastQueryTime`` file (command.js:21-43). Results enter Ray as an Arrow
table (``ray.data.from_arrow``) — at cluster scale you'd swap the duckdb
call for ``ray.data.read_sql`` with the same watermark contract.
"""

from __future__ import annotations

import os

import pyarrow as pa

import ray.data


class Watermark:
    """File-backed high-water mark (lastQueryTime analogue)."""

    def __init__(self, path: str, initial: str = "1970-01-01 00:00:00"):
        self.path = path
        self.initial = initial

    def read(self) -> str:
        if os.path.exists(self.path):
            with open(self.path) as f:
                return f.read().strip() or self.initial
        return self.initial

    def write(self, value: str) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(self.path)),
                    exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(value))
        os.replace(tmp, self.path)  # atomic, crash-safe


def read_sql_incremental_distributed(
        query: str, watermark: Watermark, db_path: str,
        ts_col: str = "ts", shard_keys: list[str] | None = None,
        num_blocks: int | None = None,
        advance: str = "on_build") -> "ray.data.Dataset":
    """The cluster-scale variant of :func:`read_sql_incremental`: the
    watermark-substituted query runs through ``ray.data.read_sql`` so
    row fetching happens in WORKER tasks (optionally sharded by
    ``shard_keys`` into ``num_blocks`` hash-partitioned sub-queries),
    never on the driver. DuckDB file databases stand in for the
    reference's mysql/mssql/postgresql servers
    (/root/reference/lib/plugins/input/mysql.js:14-68) — the factory is
    the only thing a real deployment swaps.

    Window semantics: the high bound ``hi = max(ts)`` is probed FIRST
    (one scalar over the wire) and every sub-query is bounded
    ``ts <= hi``, so all shards read the same snapshot window even
    though the lazy reads execute later while rows keep arriving.
    ``advance="on_build"`` (default) then moves the watermark to ``hi``
    immediately — the reference's own order of operations
    (command.js:80-81 stamps lastRun before the output is consumed),
    at-most-once across a crash between build and consumption. Pass
    ``advance="manual"`` for at-least-once: the caller commits
    ``watermark.write(str(ds.watermark_hi))`` only after the pipeline
    has durably consumed the window.

    Sharding note: Ray's built-in ``shard_keys`` emits
    ``MOD(ABS(MD5(col)), N)`` which several dialects (DuckDB included)
    reject for non-VARCHAR keys, so sharding is done here instead — N
    ``hash(key) % N = i`` sub-queries, each read as its own block and
    unioned. Same union of rows, every fragment fetched by a worker
    task.
    """
    import duckdb
    q = query.replace("$QUERY_TIME", f"'{watermark.read()}'")

    con = duckdb.connect(db_path, read_only=True)
    hi = con.sql(f"SELECT max({ts_col}) FROM ({q})").fetchone()[0]
    con.close()
    if hi is not None:
        q = f"SELECT * FROM ({q}) _w WHERE {ts_col} <= '{hi}'"

    def factory():
        return duckdb.connect(db_path, read_only=True)

    if shard_keys:
        n = num_blocks or 8
        key = ", ".join(shard_keys)
        key = shard_keys[0] if len(shard_keys) == 1 else f"({key})"
        subs = [f"SELECT * FROM ({q}) _t WHERE hash({key}) % {n} = {i}"
                for i in range(n)]
        parts = [ray.data.read_sql(s, factory) for s in subs]
        ds = parts[0].union(*parts[1:])
    else:
        ds = ray.data.read_sql(q, factory)
    if hi is not None and advance == "on_build":
        watermark.write(str(hi))
    ds.watermark_hi = hi
    return ds


def read_sql_incremental(query: str, watermark: Watermark,
                         ts_col: str = "ts",
                         connect=None) -> "ray.data.Dataset":
    """Run ``query`` with ``$QUERY_TIME`` replaced by the stored
    watermark; advance the watermark to max(ts_col) of the result.
    Re-running after everything is consumed yields an empty dataset —
    the incremental/idempotent contract of the reference's inputs."""
    import duckdb
    con = connect() if connect else duckdb.connect()
    q = query.replace("$QUERY_TIME", f"'{watermark.read()}'")
    tbl = con.sql(q).arrow()
    if tbl.num_rows and ts_col in tbl.column_names:
        import pyarrow.compute as pc
        hi = pc.max(tbl[ts_col]).as_py()
        watermark.write(str(hi))
    return ray.data.from_arrow(tbl)
