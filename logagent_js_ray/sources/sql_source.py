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
        num_blocks: int | None = None) -> "ray.data.Dataset":
    """The cluster-scale variant of :func:`read_sql_incremental`: the
    watermark-substituted query runs through ``ray.data.read_sql`` so
    row fetching happens in WORKER tasks (optionally sharded by
    ``shard_keys`` into ``num_blocks`` hash-partitioned sub-queries),
    never on the driver. DuckDB file databases stand in for the
    reference's mysql/mssql/postgresql servers
    (/root/reference/lib/plugins/input/mysql.js:14-68) — the factory is
    the only thing a real deployment swaps.

    Watermark advance stays driver-side as ``SELECT max(ts)`` pushed to
    the database (one scalar over the wire), so the Dataset itself is
    still lazy/streaming when this returns.

    Sharding note: Ray's built-in ``shard_keys`` emits
    ``MOD(ABS(MD5(col)), N)`` which several dialects (DuckDB included)
    reject for non-VARCHAR keys, so sharding is done here instead — N
    ``hash(key) % N = i`` sub-queries, each read as its own block and
    unioned. Same union of rows, every fragment fetched by a worker
    task.
    """
    import duckdb
    q = query.replace("$QUERY_TIME", f"'{watermark.read()}'")

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
    con = duckdb.connect(db_path, read_only=True)
    hi = con.sql(f"SELECT max({ts_col}) FROM ({q})").fetchone()[0]
    con.close()
    if hi is not None:
        watermark.write(str(hi))
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
