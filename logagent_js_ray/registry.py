"""Compiled pattern registry — rebuild of logagent-js's LogAnalyzer
pattern machinery (/root/reference/lib/parser/parser.js:43-196 and
patterns.yml loading via /root/reference/lib/parser/mergePatternFiles.js).

The registry is built ONCE per worker process (module-level cache keyed by
file path + mtime — the Ray-side analogue of logagent's per-process
LogParser instance) and holds:

  * ordered pattern groups, each gated by a ``source`` regex over the
    event's ``logSource`` (parser.js:170-196 routing), containing ordered
    match entries (first-match-wins, patterns.yml:77-79);
  * per-entry compiled regex (RE2 via pyarrow at batch time, ``re`` for
    the pure-Python oracle), type map, date field/format, transform name;
  * the union OUTPUT SCHEMA of all extracted fields — the rebuild of
    logagent's dynamic per-pattern schema as a fixed, nullable Arrow
    schema (SURVEY.md §1.4).

User pattern files are merged BEFORE the defaults, mirroring
mergePatternFiles.js:48 (user patterns prepended).

Environment switches (same names as the reference,
parser.js:31-57 + bin/logagent.js:131-185):

  * ``DISABLE_DEFAULT_PATTERNS`` — don't load the bundled patterns.yml;
  * ``PATTERN_MATCHING_ENABLED=false`` — regex pattern matching off
    entirely (JSON fast path + fallback records still run);
  * ``SCAN_ALL_PATTERNS`` — try every pattern group regardless of its
    ``source`` gate (the reference's match-all scan mode);
  * ``PATTERNS_URL`` — extra pattern file merged first. The reference
    downloads this over HTTP; this sandbox has no network, so a
    ``file://`` URL or plain path is accepted and http(s) raises with
    instructions to download the file and point PATTERNS_URL at it.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

import pyarrow as pa
import yaml

DEFAULT_PATTERNS = os.path.join(os.path.dirname(__file__), "patterns.yml")

# The broad source library (30 source groups of the reference
# patterns.yml re-expressed with named groups) ships as a SEPARATE file:
# the default registry stays lean for the transcript payload (smaller
# union schema = cheaper sink writes), and users opt in per pipeline via
# ``make_parse_fn(pattern_paths=[LIBRARY_PATTERNS])`` — the analogue of
# logagent's extra `--patternFiles` (merged before defaults).
LIBRARY_PATTERNS = os.path.join(os.path.dirname(__file__),
                                "patterns_library.yml")

# Common-schema columns added by the parse stage to every row
# (SURVEY.md §1.4; fallback record parser.js:559-564).
COMMON_FIELDS: list[tuple[str, pa.DataType]] = [
    ("message", pa.string()),
    ("@timestamp", pa.timestamp("us")),
    ("logSource", pa.string()),
    ("_type", pa.string()),
    ("severity", pa.string()),
]

# Fields the JSON fast path may promote to top-level columns
# (parser.js:390-468 + bunyan mapping :424-439). Extra JSON keys land in
# the ``fields_json`` overflow column.
JSON_PROMOTED: dict[str, pa.DataType] = {
    "counter": pa.float64(),
    "service": pa.string(),
    "pid": pa.float64(),
}


@dataclass
class MatchEntry:
    type: str
    regex: str
    fields: list[str]
    types: dict[str, str]
    datefield: str | None
    dateformat: str | None
    transform: str | None
    input_drop: str | None = None
    input_filter: str | None = None
    # named post-parse predicate (parser.js:339-357 p.filter hook)
    filter_name: str | None = None
    compiled: re.Pattern = field(init=False, repr=False)

    def __post_init__(self) -> None:
        self.compiled = re.compile(self.regex)


@dataclass
class PatternGroup:
    source: str
    match: list[MatchEntry]
    compiled_source: re.Pattern = field(init=False, repr=False)

    def __post_init__(self) -> None:
        self.compiled_source = re.compile(self.source)


def _env_true(name: str) -> bool:
    return os.environ.get(name, "").strip().lower() in (
        "1", "true", "yes", "on")


def _patterns_url_path() -> str | None:
    """PATTERNS_URL as a local file (no network in this sandbox)."""
    url = os.environ.get("PATTERNS_URL", "").strip()
    if not url:
        return None
    if url.startswith("file://"):
        return url[len("file://"):]
    if url.startswith(("http://", "https://")):
        raise RuntimeError(
            "PATTERNS_URL: this environment has no network access; "
            "download the pattern file and set PATTERNS_URL to its "
            "local path (or file:// URL)")
    return url


class PatternRegistry:
    def __init__(self, paths: list[str] | None = None):
        paths = list(paths or [])  # user files first
        url_p = _patterns_url_path()
        if url_p:
            paths = [url_p] + paths  # remote-equivalent merges first,
            # like the reference's downloaded-patterns precedence
        if not _env_true("DISABLE_DEFAULT_PATTERNS"):
            paths = paths + [DEFAULT_PATTERNS]
        self.scan_all = _env_true("SCAN_ALL_PATTERNS")
        self.groups: list[PatternGroup] = []
        self.autohash: str | None = None
        pm = os.environ.get("PATTERN_MATCHING_ENABLED", "").strip().lower()
        if pm in ("false", "0", "no", "off"):
            return  # parser.js:31-41: regex matching disabled entirely —
            # the parse stage still runs the JSON fast path + fallback
        for p in paths:
            with open(p) as f:
                doc = yaml.safe_load(f) or {}
            if doc.get("autohash") and not self.autohash:
                self.autohash = doc["autohash"]
            for g in doc.get("patterns", []):
                entries = []
                for m in g.get("match", []):
                    rx = m["regex"]
                    names = list(re.compile(rx).groupindex.keys())
                    entries.append(MatchEntry(
                        type=m["type"], regex=rx, fields=names,
                        types=m.get("types") or {},
                        datefield=m.get("datefield"),
                        dateformat=m.get("dateformat"),
                        transform=m.get("transform"),
                        input_drop=m.get("inputDrop"),
                        input_filter=m.get("inputFilter"),
                        filter_name=m.get("filter"),
                    ))
                self.groups.append(PatternGroup(source=g.get("source", ".*"),
                                                match=entries))

    def entries_for_source(self, log_source: str) -> list[MatchEntry]:
        """Pattern subset whose source regex matches (parser.js:170-196);
        SCAN_ALL_PATTERNS ignores the source gate (parser.js:31-38)."""
        if self.scan_all:
            return self.all_entries()
        out: list[MatchEntry] = []
        for g in self.groups:
            if g.compiled_source.search(log_source):
                out.extend(g.match)
        return out

    def all_entries(self) -> list[MatchEntry]:
        return [m for g in self.groups for m in g.match]

    def extracted_field_types(self) -> dict[str, pa.DataType]:
        """Union of every pattern's extracted fields (minus consumed ts
        fields, deleted after date parse per parser.js:322-332), plus the
        JSON-promoted fields — the fixed nullable output schema."""
        common = {n for n, _ in COMMON_FIELDS}
        out: dict[str, pa.DataType] = {}
        for e in self.all_entries():
            for name in e.fields:
                if name == e.datefield:
                    continue  # raw ts field is deleted after parsing
                if name in common:
                    continue  # severity/message captures merge into the
                    # common columns, not duplicate ones
                t = e.types.get(name)
                out[name] = pa.float64() if t == "number" else pa.string()
            # transforms may add derived fields: read the generic
            # ``derived`` declaration off the registered callable so
            # user transforms registered via register_transform extend
            # the output schema the same way the builtins do
            if e.transform:
                from .functions.transforms import get_transform
                try:
                    fn = get_transform(e.transform)
                except KeyError:
                    fn = None
                for dname, dtype in getattr(fn, "derived", {}).items():
                    out[dname] = dtype
        for name, t in JSON_PROMOTED.items():
            out.setdefault(name, t)
        return out

    def output_schema_fields(self) -> list[tuple[str, pa.DataType]]:
        skip = {"msg_text"}  # consumed by transforms into `message`
        extracted = [(k, v) for k, v in sorted(self.extracted_field_types().items())
                     if k not in skip]
        return COMMON_FIELDS + extracted + [("fields_json", pa.string())]


_CACHE: dict[tuple, PatternRegistry] = {}


def load_registry(paths: list[str] | None = None) -> PatternRegistry:
    """Per-process cached registry (the analogue of logagent's single
    LogParser instance; parser.js:48-49), keyed by (path, mtime) so an
    edited pattern file is recompiled instead of served stale."""
    import os as _os

    def _mt(p):
        try:
            return _os.stat(p).st_mtime_ns
        except OSError:
            return 0

    env_key = (
        _os.environ.get("DISABLE_DEFAULT_PATTERNS", ""),
        _os.environ.get("PATTERN_MATCHING_ENABLED", ""),
        _os.environ.get("SCAN_ALL_PATTERNS", ""),
        _os.environ.get("PATTERNS_URL", ""),
    )
    key = (tuple((p, _mt(p)) for p in (paths or [])), env_key)
    if key not in _CACHE:
        _CACHE[key] = PatternRegistry(list(paths or []) or None)
    return _CACHE[key]
