"""systemd journald-upload export-format stream parser.

Mirrors the reference's line-level Parser state machine
(/root/reference/lib/plugins/input/journald-upload.js:14-120): regular
``KEY=value`` fields (key lowercased, JS ``Number()`` coercion when the
value ``!isNaN``), ``__CURSOR=`` lines force-close any open multiline
field, a non-``key=value`` non-empty line STARTS a multiline field
whose name keeps its original case, subsequent non-empty lines append
``line + "\\n"``, a blank line ends the multiline field only once the
accumulated value exceeds 3 chars, and a blank line outside multiline
mode emits the journal entry. End-of-stream flushes the committed
fields of a trailing entry WITHOUT closing an open multiline field
(``Parser.end``, js:66-73 — the partial multiline value is dropped),
exactly like the reference's HTTP ``end`` handler (js:275-283).

Per-entry emission mirrors ``emitEvent``/``addTags`` (js:172-203):
optional ``_systemd_unit`` include/exclude filters, ``source_name =
_systemd_unit || syslog_identifier || 'journald'``, config tags added
only for absent keys, empty entries swallowed.

Ray shape: one export-stream BODY per input row (the HTTP upload
payload), bodies parse independently inside ``map_batches``. The
per-line regex classification and the numeric coercion are vectorized
over the whole batch (one RE2 pass + one ``pd.to_numeric`` pass); the
sequential state machine then only dispatches on precomputed booleans
and dict-assigns precomputed (key, value) pairs.
"""

from __future__ import annotations

import json
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_KV_RE = r"^\S+=.+$"  # keyValueFieldRegex (js:11)
_CURSOR_PREFIX = "__CURSOR="
_HEX_RE = re.compile(r"^0[xX][0-9a-fA-F]+$|^0[oO][0-7]+$|^0[bB][01]+$")


def _js_number_fallback(t: str):
    """The JS ``Number()`` cases ``pd.to_numeric`` misses: '' -> 0,
    whitespace-only -> 0, unsigned hex/octal/binary literals. Returns
    None for NaN (the value stays a string, js:46-48)."""
    s = t.strip()
    if s == "":
        return 0
    if _HEX_RE.match(s):
        return int(s, 0)
    return None


def _intify(v: float):
    """JS numbers are doubles but JSON.stringify renders integral ones
    without a fraction — match that rendering for the JSON column."""
    if isinstance(v, float) and v.is_integer() and abs(v) < 2 ** 53:
        return int(v)
    return v


def journald_export_parse(batch: pa.Table, body_col: str = "body",
                          remove_fields: list[str] | None = None,
                          unit_include: str | None = None,
                          unit_exclude: str | None = None,
                          tags: dict | None = None) -> pa.Table:
    """Parse journald export-format stream bodies into one row per
    journal entry: ``(<passthrough cols>, entry_idx, source_name,
    fields_json)`` — ``fields_json`` is the full parsed field dict as
    sorted-key compact JSON, so a value hash covers every field, the
    lowercase/coercion rules and the multiline reassembly."""
    removed = {f.lower(): True for f in (remove_fields or [])}
    inc = re.compile(unit_include) if unit_include else None
    exc = re.compile(unit_exclude) if unit_exclude else None
    bodies = batch[body_col].to_pylist()
    lines_per_body = [(b or "").split("\n") for b in bodies]
    flat = [ln for lns in lines_per_body for ln in lns]

    # vectorized classification: ONE RE2 pass for key=value, one
    # prefix pass for cursor lines
    arr = pa.array(flat, pa.string())
    kv_mask = pc.match_substring_regex(arr, _KV_RE).to_numpy(
        zero_copy_only=False)
    cursor_mask = pc.starts_with(arr, _CURSOR_PREFIX).to_numpy(
        zero_copy_only=False)

    # vectorized key/value split + JS-Number coercion for ALL kv lines
    kv_idx = np.flatnonzero(kv_mask)
    kv_pairs: dict[int, tuple] = {}
    if len(kv_idx):
        s = pd.Series([flat[i] for i in kv_idx])
        split = s.str.split("=", n=1, expand=True)
        keys = split[0].str.lower()
        vals = split[1]
        nums = pd.to_numeric(vals, errors="coerce")
        out_vals: list = [None] * len(kv_idx)
        nums_np = nums.to_numpy()
        vals_np = vals.to_numpy()
        for j in range(len(kv_idx)):
            v = nums_np[j]
            if v == v:  # parsed by to_numeric
                out_vals[j] = _intify(float(v))
            else:
                fb = _js_number_fallback(vals_np[j])
                out_vals[j] = vals_np[j] if fb is None else fb
        keys_np = keys.to_numpy()
        for j, i in enumerate(kv_idx):
            kv_pairs[int(i)] = (keys_np[j], out_vals[j])

    out_rows: list[tuple[int, int, str, str]] = []  # (row, idx, src, json)

    def emit(row_i: int, entry_i: int, log: dict) -> bool:
        unit = log.get("_systemd_unit")
        if unit is not None:
            u = str(unit)
            if inc is not None and not inc.search(u):
                return False
            if exc is not None and exc.search(u):
                return False
        if not log:
            return False
        if tags:
            for k, v in tags.items():
                log.setdefault(k, v)
        src = log.get("_systemd_unit") or log.get("syslog_identifier") \
            or "journald"
        out_rows.append((row_i, entry_i,
                         str(src), json.dumps(log, sort_keys=True,
                                              separators=(",", ":"))))
        return True

    pos = 0
    for row_i, lns in enumerate(lines_per_body):
        log: dict = {}
        ml_mode = False
        ml_name: str | None = None
        ml_val = ""
        entry_i = 0
        for k in range(len(lns)):
            i = pos + k
            data = lns[k]
            if cursor_mask[i]:  # endMultiLineField (js:82-84)
                if ml_mode and ml_name is not None:
                    log[ml_name] = ml_val
                ml_mode, ml_name, ml_val = False, None, ""
            if kv_mask[i] and not ml_mode:
                key, val = kv_pairs[i]
                if key and key not in removed:
                    log[key] = val
                continue
            if data and not ml_mode:  # multiline field start
                ml_mode, ml_name, ml_val = True, data, ""
                continue
            if ml_mode and data:
                ml_val += data + "\n"
                continue
            if ml_mode and not data and len(ml_val) > 3:
                if ml_name is not None:
                    log[ml_name] = ml_val
                ml_mode, ml_name, ml_val = False, None, ""
                continue
            if not data and not ml_mode:  # end of entry
                if emit(row_i, entry_i, log):
                    entry_i += 1
                log = {}
        # end-of-stream: Parser.end() drops an OPEN multiline value but
        # flushes committed fields (js:66-73, 275-283)
        emit(row_i, entry_i, log)
        pos += len(lns)

    keep = [c for c in batch.column_names if c != body_col]
    cols = {
        "entry_idx": pa.array([r[1] for r in out_rows], pa.int64()),
        "source_name": pa.array([r[2] for r in out_rows], pa.string()),
        "fields_json": pa.array([r[3] for r in out_rows], pa.string()),
    }
    if not keep:
        return pa.table(cols)
    base = batch.select(keep).take(
        pa.array([r[0] for r in out_rows], pa.int64()))
    for name, col in cols.items():
        base = base.append_column(name, col)
    return base
