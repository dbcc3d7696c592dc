"""Callable config values — the rebuild of logagent-js's
config-as-code: in the reference ANY config value may be a JS function
evaluated per event (`reduceConfigValue`,
/root/reference/lib/util/config-reducer.js:3-20, used e.g. for the
elasticsearch ``index`` at lib/plugins/output/elasticsearch.js:180).

The rebuild keeps its no-eval YAML rule (SURVEY.md §2.9): instead of
embedding code in config, a value may be a NAMED REFERENCE to a
function registered here — the string ``"$fn:name"`` or the mapping
``{"$fn": "name"}``. Config loaders pass such values through
:func:`resolve_config_value`, which swaps the reference for the
registered callable; stages that support callable values (route sink
names, default sink) evaluate it VECTORIZED per batch — the per-event
semantics of config-reducer.js at batch cost.

A registered function takes the pyarrow batch and returns either a
scalar or a per-row array (string values for sink/index slots).
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc

CONFIG_FNS: dict[str, Callable] = {}


def register_config_fn(name: str):
    """Decorator: register a callable config value under ``name``."""
    def deco(fn):
        CONFIG_FNS[name] = fn
        return fn
    return deco


def is_fn_ref(v) -> bool:
    return (isinstance(v, str) and v.startswith("$fn:")) or \
        (isinstance(v, dict) and "$fn" in v)


def resolve_config_value(v):
    """``"$fn:name"`` / ``{"$fn": "name"}`` -> the registered callable;
    anything else passes through unchanged. Unknown names fail LOUDLY at
    config-load time, not mid-pipeline."""
    if not is_fn_ref(v):
        return v
    name = v[4:] if isinstance(v, str) else v["$fn"]
    fn = CONFIG_FNS.get(name)
    if fn is not None:
        return fn
    # third-party fallback: "$fn:pkg.mod:callable" dynamic import
    # (bin/logagent.js:226-277 require-by-module-name; functions/dynamic)
    from .dynamic import is_dotted_path, load_callable
    if is_dotted_path(name):
        return load_callable(name)
    raise KeyError(
        f"config function {name!r} is not registered; known: "
        f"{sorted(CONFIG_FNS)}")


def fn_values(fn: Callable, batch: pa.Table) -> pa.Array:
    """Evaluate a callable config value over a batch into a per-row
    string array (scalars broadcast)."""
    out = fn(batch)
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    if isinstance(out, pa.Array):
        return pc.cast(out, pa.string())
    if isinstance(out, str) or out is None:
        return pa.array([out] * batch.num_rows, pa.string())
    return pc.cast(pa.array(out), pa.string())


# ---------------------------------------------------------- built-ins
# the shapes the reference's example configs use functions for
# (elasticsearch.js:180 index-as-function-of-event)

@register_config_fn("index_by_severity")
def index_by_severity(batch: pa.Table) -> pa.Array:
    """Per-event index: errors to 'logs-error', everything else to
    'logs-std' — the canonical config-reducer example (route by a
    parsed field, not by logSource)."""
    if "severity" not in batch.column_names:
        return pa.array(["logs-std"] * batch.num_rows, pa.string())
    sev = pc.cast(batch["severity"], pa.string())
    is_err = pc.is_in(sev, value_set=pa.array(["error", "fatal", "crit"]))
    return pc.if_else(pc.fill_null(is_err, False),
                      pa.scalar("logs-error", pa.string()),
                      pa.scalar("logs-std", pa.string()))


@register_config_fn("index_by_source_basename")
def index_by_source_basename(batch: pa.Table) -> pa.Array:
    """Per-event index from the tail path component of logSource."""
    src = pc.cast(batch["logSource"], pa.string())
    # last path segment, lowercased — RE2 replace keeps it vectorized
    base = pc.replace_substring_regex(src, r"^.*/", "")
    return pc.utf8_lower(base)
