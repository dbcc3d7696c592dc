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


def show(ds: "ray.data.Dataset", n: int = 10, fmt: str = "ldjson") -> str:
    """stdout plugin: ldjson (default) / pretty / yaml rendering of the
    first ``n`` rows; returns the rendered string."""
    rows = ds.take(n)
    if fmt == "ldjson":
        return "\n".join(json.dumps(r, sort_keys=True, default=str)
                         for r in rows)
    if fmt == "pretty":
        return "\n".join(json.dumps(r, sort_keys=True, indent=2,
                                    default=str) for r in rows)
    if fmt == "yaml":
        import yaml
        return yaml.safe_dump([{k: (str(v) if not isinstance(
            v, (int, float, str, bool, type(None))) else v)
            for k, v in r.items()} for r in rows], sort_keys=True)
    raise ValueError(fmt)
