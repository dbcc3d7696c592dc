"""Sinks — rebuild of logagent-js output plugins that write files
(SURVEY.md §2.7).

``write_template_sink`` is the output-files plugin
(/root/reference/lib/plugins/output/files.js:32-68): its per-event
``fileName`` template (``{fieldname}`` substitution) becomes a derived
partition COLUMN, and the rotating-stream behavior becomes partitioned
Parquet — one directory per distinct rendered name, written in a single
streaming pass. ``sourceName``/``typeName`` regex gates map to a
vectorized row filter, exactly like the plugin's gate.

``show`` is the stdout plugin (/root/reference/lib/plugins/output/stdout.js:9-20):
ldjson / yaml / pretty renderings of a small head of the dataset.
"""

from __future__ import annotations

import json
import re
import string

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_FIELD_RE = re.compile(r"\{(\w+)\}")


def render_template_column(batch: pa.Table, template: str,
                           out_col: str = "file_name") -> pa.Table:
    """Vectorized {field} substitution over the batch's columns."""
    fields = _FIELD_RE.findall(template)
    parts = _FIELD_RE.split(template)  # literal, field, literal, ...
    n = batch.num_rows
    result = pa.array([parts[0]] * n, pa.string())
    for i, f in enumerate(fields):
        col = (pc.cast(batch[f], pa.string()) if f in batch.column_names
               else pa.array(["unknown"] * n, pa.string()))
        col = pc.fill_null(col, "null")
        result = pc.binary_join_element_wise(result, col, "")
        lit = parts[2 * i + 2]
        if lit:
            result = pc.binary_join_element_wise(
                result, pa.array([lit] * n, pa.string()), "")
    return batch.append_column(out_col, result)


def write_template_sink(ds: "ray.data.Dataset", out_dir: str,
                        template: str = "{sink}",
                        source_match: str | None = None,
                        type_match: str | None = None,
                        source_col: str = "logSource",
                        type_col: str = "_type") -> None:
    """files.js semantics: optional sourceName/typeName regex gates, then
    fan-out by the rendered file name (one hive partition per name)."""
    def gate_and_render(batch: pa.Table) -> pa.Table:
        keep = pa.array([True] * batch.num_rows, pa.bool_())
        if source_match and source_col in batch.column_names:
            keep = pc.and_(keep, pc.fill_null(pc.match_substring_regex(
                batch[source_col], source_match), False))
        if type_match and type_col in batch.column_names:
            keep = pc.and_(keep, pc.fill_null(pc.match_substring_regex(
                batch[type_col], type_match), False))
        return render_template_column(batch.filter(keep), template)

    from . import PARQUET_WRITE_OPTS
    ds.map_batches(gate_and_render, batch_format="pyarrow") \
      .write_parquet(out_dir, partition_cols=["file_name"],
                     **PARQUET_WRITE_OPTS)


def render_row(row: dict, fmt: str = "ldjson") -> str:
    """One event -> its stdout rendering (stdout.js:9-20): ``ldjson``
    (one compact sorted-key JSON object), ``pretty`` (indent=2), or
    ``yaml`` (flat ``key: value`` lines). The per-row unit matches the
    plugin's one-``eventHandler``-call-per-event contract, so the same
    function serves both the driver-side ``show`` head and a vectorized
    whole-dataset render column (``render_lines``)."""
    if fmt == "ldjson":
        return json.dumps(row, sort_keys=True, default=str)
    if fmt == "pretty":
        return json.dumps(row, sort_keys=True, indent=2, default=str)
    if fmt == "yaml":
        import yaml
        return yaml.safe_dump({k: (str(v) if not isinstance(
            v, (int, float, str, bool, type(None))) else v)
            for k, v in row.items()}, sort_keys=True)
    raise ValueError(fmt)


def render_lines(batch: pa.Table, fmt: str = "ldjson",
                 out_col: str = "line") -> pa.Table:
    """Whole-batch stdout rendering as a string column — the
    map_batches form of the stdout plugin for pipelines that ship the
    rendered line itself (ldjson files, syslog forwarders)."""
    lines = [render_row(r, fmt) for r in batch.to_pylist()]
    return batch.append_column(out_col, pa.array(lines, pa.string()))


def show(ds: "ray.data.Dataset", n: int = 10, fmt: str = "ldjson") -> str:
    """stdout plugin: ldjson (default) / pretty / yaml rendering of the
    first ``n`` rows; returns the rendered string."""
    rows = ds.take(n)
    if fmt == "yaml":
        import yaml
        return yaml.safe_dump([{k: (str(v) if not isinstance(
            v, (int, float, str, bool, type(None))) else v)
            for k, v in r.items()} for r in rows], sort_keys=True)
    return "\n".join(render_row(r, fmt) for r in rows)


def clickhouse_record(batch: pa.Table, fields: dict[str, str],
                      table: str | None = None) -> pa.Table:
    """ClickHouse output record shaping
    (/root/reference/lib/plugins/output/clickhouse.js:43-59): the
    ``fields`` config maps destination column -> source field, columns
    emitted in declared order (the reference builds a positional INSERT
    row from ``Object.keys(this.fields)``); a source field of
    ``@timestamp`` becomes epoch MILLISECONDS (``getTime()``, js:47-48),
    every other value goes through JS's ``data[field] || null`` — i.e.
    falsy values (0, '', false, null, undefined) insert as NULL
    (js:50). ``table`` adds the INSERT target as a constant column so a
    multi-table config can partition the write."""
    n = batch.num_rows
    cols: dict[str, pa.Array] = {}
    for dest, src in fields.items():
        if src == "@timestamp":
            ts = batch[src] if src in batch.column_names else \
                pa.nulls(n, pa.timestamp("us"))
            # normalize the STORAGE unit to epoch-ms (round-3 advice:
            # the old `/1000` assumed us storage and integer-divide
            # truncated pre-epoch values toward zero). FLOOR division
            # matches getTime(); float64 floor is exact here (epoch
            # micros < 2^53 through year 2255).
            unit = ts.type.unit
            i = pc.cast(ts, pa.int64())
            if unit == "s":
                cols[dest] = pc.multiply(i, pa.scalar(1000, pa.int64()))
            elif unit == "ms":
                cols[dest] = i
            else:
                div = 1_000.0 if unit == "us" else 1_000_000.0
                cols[dest] = pc.cast(
                    pc.floor(pc.divide(pc.cast(i, pa.float64()), div)),
                    pa.int64())
            continue
        if src not in batch.column_names:
            cols[dest] = pa.nulls(n, pa.string())
            continue
        col = batch[src]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # JS `|| null`: 0 / "" / false -> null
        t = col.type
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            falsy = pc.equal(col, "")
        elif pa.types.is_boolean(t):
            falsy = pc.equal(col, False)
        elif pa.types.is_integer(t) or pa.types.is_floating(t):
            falsy = pc.equal(col, 0)
        else:
            falsy = pa.array([False] * n, pa.bool_())
        cols[dest] = pc.if_else(pc.fill_null(falsy, False),
                                pa.nulls(n, t), col)
    out = pa.table(cols)
    if table is not None:
        out = out.append_column("_ch_table",
                                pa.array([table] * n, pa.string()))
    return out
