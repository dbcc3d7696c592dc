"""Parse stage — the rebuild of logagent-js's parser core
(/root/reference/lib/parser/parser.js:469-565) as a STATELESS, vectorized
``map_batches`` transform over zero-copy Arrow batches.

Semantics preserved:
  * JSON fast path first (parser.js:474-483,390-468) with bunyan field
    normalization ``msg->message``, ``level->severity``,
    ``time->@timestamp`` (parser.js:424-439);
  * source->pattern routing by ``logSource`` regex (parser.js:170-196) —
    here ``logSource`` is the transcript ``role`` (SURVEY.md §1.4);
  * ordered FIRST-MATCH-WINS regex extraction (parser.js:527-556,
    patterns.yml:77-79) — each pattern is applied vectorized
    (``pc.extract_regex``) to the still-unmatched subset, so earlier
    patterns shadow later ones exactly;
  * field typing (parser.js:264-299), date parsing with the consumed
    ``ts`` capture deleted (parser.js:236-263,322-332), named transforms
    (parser.js:333-338), ``inputDrop`` filters (parser.js:303-316);
  * fallback record ``{message, @timestamp, logSource}`` with ``_type``
    null for unmatched lines (parser.js:559-564).

Deterministic deviation (SURVEY.md §7.5): where the reference stamps
``@timestamp = now`` (fallback / unparseable dates, parser.js:260,520,559),
we use the row's input ``ts`` column so reruns are reproducible.

The registry is compiled once per worker process via the module-level
cache in registry.py — the per-process state analogue of logagent's
LogParser instance, with no actor needed because it is deterministic,
cheap, and read-only (SURVEY.md §7.3).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.transforms import BUNYAN_LEVELS, get_filter, get_transform
from ..registry import JSON_PROMOTED, PatternRegistry, load_registry

_STRPTIME_ISO = "%Y-%m-%dT%H:%M:%S"
_STRPTIME_CLF = "%d/%b/%Y:%H:%M:%S"


def _strptime(arr: pa.Array, fmt: str) -> pa.Array:
    opts = pc.StrptimeOptions(fmt, unit="us", error_is_null=True)
    return pc.strptime(arr, options=opts)


def _apply_utc_offset(naive: pa.Array, ts_str: pa.Array) -> pa.Array:
    """Normalize a naive timestamp parsed from a string with a trailing
    numeric UTC offset (``+05:30``/``-0800``) to UTC, vectorized: the
    offset is extracted with ``pc.extract_regex`` and SUBTRACTED (local
    = UTC + offset). Strings without an offset (or with Z/+0000) adjust
    by 0. The reference normalizes zones via date-fns
    (/root/reference/lib/parser/parser.js:236-263); silently treating
    +05:30 as UTC would be hours wrong."""
    off = pc.extract_regex(
        ts_str, r"(?P<sign>[+-])(?P<oh>\d{2}):?(?P<om>\d{2})$")
    oh = pc.cast(pc.struct_field(off, "oh"), pa.int64())
    om = pc.cast(pc.struct_field(off, "om"), pa.int64())
    secs = pc.add(pc.multiply(oh, 3600), pc.multiply(om, 60))
    secs = pc.if_else(pc.equal(pc.struct_field(off, "sign"), "-"),
                      pc.negate_checked(secs), secs)
    us = pc.coalesce(pc.multiply(secs, 1_000_000),
                     pa.scalar(0, pa.int64()))
    return pc.cast(pc.subtract(pc.cast(naive, pa.int64()), us),
                   pa.timestamp("us"))


def _parse_dates(ts_str: pa.Array, dateformat: str | None) -> pa.Array:
    """ts capture string -> timestamp[us]; unparseable -> null (caller
    coalesces to the row ts — the deterministic stand-in for the
    reference's invalid->now, parser.js:260). Formats cover the
    dateFormats the reference's pattern library uses
    (/root/reference/patterns.yml:1150-1176):

      clf        dd/Mon/yyyy:HH:mm:ss +0000     (web access logs)
      java       yyyy-MM-dd HH:mm:ss[,SSS|.SSS][+ZZZZ]  (JVM loggers)
      slash      yyyy/MM/dd HH:mm:ss            (nginx error, nsq)
      dotted     yyyy.MM.dd HH:mm:ss.SSS        (clickhouse)
      apache_err Day Mon dd HH:mm:ss yyyy       (apache error log)
      us_text    Mon dd, yyyy h:mm:ss AM        (java.util.logging)
      none       no deterministic parse (year-less formats like redis's
                 'dd MMM HH:mm:ss' — always falls back to the row ts)
      iso        default; trailing Z / frac / ±ZZZZ offsets trimmed
    """
    if dateformat == "clf":
        s = pc.replace_substring_regex(ts_str, r" [+-]\d{4}$", "")
        return _strptime(s, _STRPTIME_CLF)
    if dateformat == "java":
        s = pc.replace_substring_regex(
            ts_str, r"([,.]\d+)?\s?([+-]\d{2}:?\d{2}|Z)?$", "")
        s = pc.replace_substring_regex(
            s, r"^(\d{4}-\d{2}-\d{2})T", r"\1 ")  # ES logs use a T sep
        return _apply_utc_offset(_strptime(s, "%Y-%m-%d %H:%M:%S"),
                                 ts_str)
    if dateformat == "slash":
        return _strptime(ts_str, "%Y/%m/%d %H:%M:%S")
    if dateformat == "dotted":
        s = pc.replace_substring_regex(ts_str, r"\.\d+$", "")
        return _strptime(s, "%Y.%m.%d %H:%M:%S")
    if dateformat == "apache_err":
        s = pc.replace_substring_regex(ts_str, r"\.\d+", "")
        return _strptime(s, "%a %b %d %H:%M:%S %Y")
    if dateformat == "us_text":
        # java.util.logging SimpleFormatter: 'Jul 22, 2015 1:58:28 PM'
        # (reference dateFormat 'MMM dd, yyyy H:mm:ss', patterns.yml:652)
        return _strptime(ts_str, "%b %d, %Y %I:%M:%S %p")
    if dateformat == "none":
        return pa.nulls(len(ts_str), pa.timestamp("us"))
    # iso: accept trailing Z / fractional seconds / numeric offsets
    # (offsets are APPLIED, not discarded — see _apply_utc_offset)
    s = pc.replace_substring_regex(ts_str,
                                   r"(\.\d+)?(Z|[+-]\d{2}:?\d{2})?$", "")
    return _apply_utc_offset(_strptime(s, _STRPTIME_ISO), ts_str)


class _Acc:
    """Per-batch output accumulators, merged mask-wise per pattern."""

    def __init__(self, n: int, schema_fields: list[tuple[str, pa.DataType]]):
        self.n = n
        self.cols: dict[str, pa.Array] = {
            name: pa.nulls(n, type=typ) for name, typ in schema_fields}

    def merge(self, mask: pa.Array, name: str, values: pa.Array) -> None:
        target = self.cols[name].type
        if values.type != target:
            values = pc.cast(values, target)
        self.cols[name] = pc.if_else(mask, values, self.cols[name])


def json_enrichment_disabled() -> bool:
    """JSON_ENRICHMENT_ENABLED=false (parser.js:41). Call on the
    DRIVER and pass the result down (make_parse_fn / FlagshipStage do)
    so workers inherit the decision through the closure, not their own
    environment — the same driver-read rule MULTILINE_DEFAULT_SEPARATOR
    follows, and what keeps the checkpoint lineage hash (driver env)
    consistent with what actually executed."""
    return os.environ.get(
        "JSON_ENRICHMENT_ENABLED", "").strip().lower() == "false"


def parse_batch(batch: pa.Table, registry: PatternRegistry,
                text_col: str = "text", source_col: str = "role",
                ts_col: str = "ts", json_transform=None,
                json_raw: bool | None = None) -> pa.Table:
    n = batch.num_rows
    schema_fields = registry.output_schema_fields()
    acc = _Acc(n, schema_fields)
    # fill nulls up front: pc.and_ is non-Kleene here, and a single null
    # text/role row would otherwise poison the boolean mask accumulation
    # (null -> object-dtype numpy -> `drop |= dm` raises)
    text = pc.fill_null(pc.cast(batch[text_col], pa.string()), "")
    role = pc.fill_null(pc.cast(batch[source_col], pa.string()), "")
    row_ts = batch[ts_col]

    matched = pa.array(np.zeros(n, dtype=bool))
    drop = np.zeros(n, dtype=bool)

    # ---- JSON fast path (parser.js:474-483,390-468) ------------------
    # json_raw (JSON_ENRICHMENT_ENABLED=false, parser.js:41,397-399):
    # parse the object but return it RAW — no bunyan msg/level/time
    # remap, no severity mapping, no timestamp promotion ('v' kept).
    # Column promotion still applies (schema mapping, not enrichment).
    # None = direct driver call: read the env here.
    if json_raw is None:
        json_raw = json_enrichment_disabled()
    stripped = pc.utf8_trim_whitespace(text)
    maybe_json = pc.and_(pc.starts_with(stripped, pattern="{"),
                         pc.ends_with(stripped, pattern="}"))
    jm = maybe_json.to_numpy(zero_copy_only=False)
    if jm.any():
        texts_np = text.to_numpy(zero_copy_only=False)
        roles_np = role.to_numpy(zero_copy_only=False) \
            if json_transform is not None else None
        json_ok = np.zeros(n, dtype=bool)
        msg = np.full(n, None, dtype=object)
        sev = np.full(n, None, dtype=object)
        ts_str = np.full(n, None, dtype=object)  # batch-parsed after loop
        extras = np.full(n, None, dtype=object)
        promoted = {k: np.full(n, None, dtype=object) for k in JSON_PROMOTED}
        for i in np.flatnonzero(jm):
            try:
                obj = json.loads(texts_np[i])
            except (ValueError, TypeError):
                continue  # falls through to pattern matching
            if not isinstance(obj, dict):
                continue
            json_ok[i] = True
            if not json_raw:
                # bunyan normalization (parser.js:424-439)
                if "msg" in obj and "message" not in obj:
                    obj["message"] = obj.pop("msg")
                if "level" in obj and isinstance(obj["level"],
                                                 (int, float)):
                    sev[i] = BUNYAN_LEVELS.get(int(obj.pop("level")))
                if "time" in obj:
                    ts_str[i] = str(obj.pop("time"))
            if json_transform is not None:
                # cfg.json.transform hook (parser.js:440-452): a user
                # callable over (source, parsed-object); errors are
                # swallowed like the reference's try/catch
                try:
                    obj = json_transform(roles_np[i], obj) or obj
                except Exception:
                    pass
            m = obj.pop("message", None)
            if m is not None and not isinstance(m, str):
                # numeric / nested message values must not kill the
                # batch's pa.array(..., string()) build (parser.js keeps
                # whatever JSON.stringify renders)
                m = json.dumps(m, sort_keys=True) \
                    if isinstance(m, (dict, list)) else str(m)
            msg[i] = m
            rest = {}
            for k, v in obj.items():
                if k in promoted:
                    promoted[k][i] = v
                elif k != "v" or json_raw:  # bunyan 'v' drop is
                    rest[k] = v             # enrichment too
            if rest:
                extras[i] = json.dumps(rest, sort_keys=True, separators=(",", ":"))
        jmask = pa.array(json_ok)
        acc.merge(jmask, "message", pa.array(msg, pa.string()))
        acc.merge(jmask, "severity", pa.array(sev, pa.string()))
        acc.merge(jmask, "_type", pa.array(
            np.where(json_ok, "json", None), pa.string()))
        # one vectorized date parse over every collected time string
        # (per-row kernel calls here dominated the whole stage before)
        json_ts = _parse_dates(pa.array(ts_str, pa.string()), "iso")
        acc.merge(pc.and_(jmask, pc.is_valid(json_ts)), "@timestamp", json_ts)
        acc.merge(jmask, "fields_json", pa.array(extras, pa.string()))
        for k in promoted:
            acc.merge(jmask, k, pa.array(
                [str(v) if v is not None else None for v in promoted[k]], pa.string()))
        matched = pc.or_(matched, jmask)

    # ---- ordered pattern loop over the shrinking unmatched subset ----
    # Each regex runs on text.take(unmatched) ONLY: with first-match-wins
    # most rows match early, so tail patterns would otherwise re-scan
    # nearly the whole batch for nothing. Extracted subset columns are
    # scattered back to batch length with one null-index take per column.
    entry_source = {}  # entry -> its group's source gate, built once
    for g in registry.groups:
        for m in g.match:
            entry_source.setdefault(id(m), g.source)
    matched_np = matched.to_numpy(zero_copy_only=False).copy()
    for entry in registry.all_entries():
        if matched_np.all():
            break
        idx = np.flatnonzero(~matched_np)
        take_idx = pa.array(idx)
        sub_text = pc.take(text, take_idx)
        ext = pc.extract_regex(sub_text, entry.regex)
        valid_sub = pc.is_valid(ext)
        # sourceName routing gate (parser.js:170-196);
        # SCAN_ALL_PATTERNS disables the gate (parser.js:31-38) — the
        # registry flag must gate HERE, not only in entries_for_source
        # (which the pure-Python oracle uses), or pipeline and oracle
        # diverge whenever the env switch is set
        src = ".*" if registry.scan_all \
            else entry_source.get(id(entry), ".*")
        if src not in (".*", ""):
            valid_sub = pc.and_(valid_sub, pc.match_substring_regex(
                pc.take(role, take_idx), src))
        vs = valid_sub.to_numpy(zero_copy_only=False)
        if not vs.any():
            continue
        valid_np = np.zeros(n, dtype=bool)
        valid_np[idx[vs]] = True
        valid = pa.array(valid_np)
        # scatter map: full row -> its subset position (null elsewhere);
        # pc.take with null indices nulls the gaps in one C++ pass
        pos = np.zeros(n, dtype=np.int64)
        pos[idx] = np.arange(len(idx))
        pos_pa = pa.array(pos, mask=~valid_np)

        def scatter(sub_arr):
            return pc.take(sub_arr, pos_pa)

        cols: dict[str, pa.Array] = {f: pc.struct_field(ext, f)
                                     for f in entry.fields}
        cols["message"] = sub_text  # default: whole line (parser.js:514)
        if entry.transform:
            get_transform(entry.transform)(cols)
        pattern_ts = None
        if entry.datefield and entry.datefield in cols:
            pattern_ts = scatter(_parse_dates(cols.pop(entry.datefield),
                                              entry.dateformat))
        for fname, ftype in entry.types.items():
            if ftype == "number" and fname in cols:
                # tolerant typing (parser.js:264-299 Number() semantics):
                # a non-numeric capture ('-', 'N/A') nulls the FIELD, it
                # must not crash the batch's cast
                sv = pc.cast(cols[fname], pa.string())
                ok = pc.match_substring_regex(
                    pc.fill_null(sv, ""),
                    r"^-?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")
                cols[fname] = pc.cast(
                    pc.if_else(ok, sv, pa.scalar(None, pa.string())),
                    pa.float64())
        for fname, arr in cols.items():
            if fname in acc.cols:
                acc.merge(valid, fname, scatter(arr))
        if pattern_ts is not None:
            acc.merge(pc.and_(valid, pc.is_valid(pattern_ts)),
                      "@timestamp", pattern_ts)
        acc.merge(valid, "_type", pa.array([entry.type] * n, pa.string()))
        if entry.input_drop:
            dm = pc.fill_null(pc.and_(valid_sub, pc.match_substring_regex(
                sub_text, entry.input_drop)), False) \
                .to_numpy(zero_copy_only=False)
            dfull = np.zeros(n, dtype=bool)
            dfull[idx[dm]] = True
            drop |= dfull
        if entry.filter_name:
            # post-parse per-pattern drop predicate (parser.js:339-357):
            # keep-mask UDF over the extracted columns; False (not null)
            # on a matched row drops it, like logagentDropMessage
            keep = get_filter(entry.filter_name)(cols)
            bad = pc.fill_null(pc.and_(valid_sub, pc.invert(pc.fill_null(
                pc.cast(keep, pa.bool_()), True))), False) \
                .to_numpy(zero_copy_only=False)
            bfull = np.zeros(n, dtype=bool)
            bfull[idx[bad]] = True
            drop |= bfull
        matched_np |= valid_np
    matched = pa.array(matched_np)

    # ---- fallback record (parser.js:559-564) -------------------------
    unmatched = pc.invert(matched)
    acc.merge(unmatched, "message", text)
    acc.cols["logSource"] = pc.cast(role, pa.string())
    # deterministic 'now' stand-in: the row's own event time
    acc.cols["@timestamp"] = pc.coalesce(acc.cols["@timestamp"],
                                         pc.cast(row_ts, pa.timestamp("us")))

    # ---- autohash: PII mask at parse time (parser.js:231-235,270-272:
    # field NAMES matching the autohash regex get their values hashed)
    if registry.autohash:
        import hashlib
        import re as _re
        ah = _re.compile(registry.autohash)
        for name in list(acc.cols):
            if acc.cols[name].type == pa.string() and ah.search(name) \
                    and name not in ("message", "logSource", "_type"):
                vals = acc.cols[name].to_numpy(zero_copy_only=False)
                hashed = [hashlib.sha256(v.encode()).hexdigest()
                          if v is not None else None for v in vals]
                acc.cols[name] = pa.array(hashed, pa.string())

    out = batch
    for name, _ in schema_fields:
        out = out.append_column(name, acc.cols[name])
    if drop.any():
        out = out.filter(pa.array(~drop))
    return out


def make_parse_fn(pattern_paths: list[str] | None = None,
                  text_col: str = "text", source_col: str = "role",
                  ts_col: str = "ts", json_transform=None):
    """Factory for the map_batches callable. The returned closure loads
    the registry lazily per worker (module cache), so shipping it to Ray
    serializes only the path list, never compiled regexes.
    ``json_transform``: optional ``fn(source, obj) -> obj|None`` applied
    to every JSON-fast-path record (cfg.json.transform,
    parser.js:440-452) — cloudpickled to workers with the closure."""
    paths = list(pattern_paths) if pattern_paths else None
    json_raw = json_enrichment_disabled()  # driver-time env read

    def _parse(batch: pa.Table) -> pa.Table:
        return parse_batch(batch, load_registry(paths), text_col=text_col,
                           source_col=source_col, ts_col=ts_col,
                           json_transform=json_transform,
                           json_raw=json_raw)

    return _parse


def make_global_transform_fn(fn):
    """globalTransform rebuild (parser.js:491-504; config hook
    patterns.yml:68-75): a named user UDF applied to every parsed batch
    regardless of pattern — a trailing vectorized map_batches stage, a
    registered Python callable instead of YAML-embedded JS."""
    def _gt(batch: pa.Table) -> pa.Table:
        out = fn(batch)
        return out if out is not None else batch
    return _gt
