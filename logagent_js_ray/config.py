"""YAML pipeline configuration — rebuild of logagent-js's config loader
(/root/reference/lib/core/configLoader.js:25-138 + plugin assembly
bin/logagent.js:307-541). The same four sections drive the rebuild:

  input:         parquet: {path}  |  lines: {path}
  inputFilter:   - grep: {include, exclude, matchSource}
  options:       patterns: [files...], multiline: bool, maxLogSize: int
  outputFilter:  - hashFields / ipTruncateFields / removeFields /
                   renameFields / lowercaseFields / aesEncryptFields
                 - enrich: {catalog, key, detectSeverity}
  output:        sinks: {dir, routes: [{name, match}], defaultSink,
                 dropUnmatched}  |  template: {dir, fileName, ...}

Unlike the reference, NO code is eval'd from YAML (SURVEY.md §2.9):
transforms and filters are named references into the registry.

Example (config/examples/flagship.yml mirrors logagent's
config/examples/ directory).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import yaml

from .stages.mask import MaskConfig


@dataclass
class PipelineConfig:
    input_kind: str = "parquet"            # parquet | lines
    input_path: str = ""
    pattern_files: list[str] = field(default_factory=list)
    grep: list[dict] = field(default_factory=list)
    mask: MaskConfig | None = None
    catalog: str | None = None
    detect_severity: bool = False
    routes: list[tuple[str, str]] = field(default_factory=list)
    default_sink: str | None = "sink_default"
    drop_unmatched: bool = False
    out_dir: str | None = None
    multiline: bool = False
    drop_events: dict = field(default_factory=dict)
    max_log_size: int | None = None
    geoip: dict | None = None
    # (query string, approx_distinct k or None) per sql output filter
    sql: list[tuple] = field(default_factory=list)


def load_config(path: str) -> PipelineConfig:
    with open(path) as f:
        doc = yaml.safe_load(f) or {}
    cfg = PipelineConfig()
    base = os.path.dirname(os.path.abspath(path))

    def resolve(p):
        if p == "library":  # the bundled 30-source stock library
            from .registry import LIBRARY_PATTERNS
            return LIBRARY_PATTERNS
        return p if os.path.isabs(p) else os.path.join(base, p)

    inp = doc.get("input", {})
    if "parquet" in inp:
        cfg.input_kind, cfg.input_path = "parquet", resolve(
            inp["parquet"]["path"])
    elif "lines" in inp:
        cfg.input_kind, cfg.input_path = "lines", resolve(
            inp["lines"]["path"])

    opts = doc.get("options", {})
    cfg.pattern_files = [resolve(p) for p in opts.get("patterns", [])]
    cfg.multiline = bool(opts.get("multiline", False))
    cfg.max_log_size = int(opts.get("maxLogSize", 0)) or None

    for f_ in doc.get("inputFilter", []) or []:
        if "grep" in f_:
            g = f_["grep"]
            cfg.grep.append({"include": g.get("include"),
                             "exclude": g.get("exclude"),
                             "match_source": g.get("matchSource")})

    mask_kwargs: dict = {}
    for f_ in doc.get("outputFilter", []) or []:
        if "hashFields" in f_:
            mask_kwargs["hash_fields"] = f_["hashFields"].get("fields", [])
            if f_["hashFields"].get("algorithm"):
                mask_kwargs["algo"] = f_["hashFields"]["algorithm"]
        if "aesEncryptFields" in f_:
            mask_kwargs["aes_fields"] = f_["aesEncryptFields"].get("fields", [])
            mask_kwargs["aes_key"] = f_["aesEncryptFields"].get("password", "")
        if "ipTruncateFields" in f_:
            mask_kwargs["ip_fields"] = f_["ipTruncateFields"].get("fields", [])
        if "removeFields" in f_:
            mask_kwargs["remove_fields"] = f_["removeFields"].get("fields", [])
        if "renameFields" in f_:
            mask_kwargs["rename_fields"] = f_["renameFields"]
        if "lowercaseFields" in f_:
            lf = f_["lowercaseFields"] or {}
            fields = [d.get("fieldName", d) if isinstance(d, dict) else d
                      for d in lf.get("fields", [])]
            # allFields / no list -> global; else only the named fields
            mask_kwargs["lowercase"] = (True if lf.get("allFields")
                                        or not fields else fields)
        if "enrich" in f_:
            cfg.catalog = resolve(f_["enrich"]["catalog"]) \
                if f_["enrich"].get("catalog") else None
            cfg.detect_severity = bool(f_["enrich"].get("detectSeverity"))
        if "dropEvents" in f_:
            cfg.drop_events = f_["dropEvents"]
        if "sql" in f_:
            # the reference's sql output filter takes a literal query
            # string in config (sql.js:10-27: {sql: 'SELECT ...',
            # interval}); interval is a processing-time flush knob with
            # no batch analogue (the documented event-time deviation)
            q = f_["sql"]
            if isinstance(q, dict):
                # approxDistinct: k opts COUNT(DISTINCT) into the KMV
                # sketch scale mode (see stages/sqlparse.run_sql)
                cfg.sql.append((q["query"], q.get("approxDistinct")))
            else:
                cfg.sql.append((q, None))
        if "geoip" in f_:
            # geoip output filter (geoip.js:20-53): point at the binary
            # mmdb artifact (maxmindDbDir analogue) OR a GeoLite2 CSV
            # snapshot pair; `field` names the IP column
            g = f_["geoip"] or {}
            geo: dict = {"field": g.get("field", "client_ip")}
            if g.get("mmdb"):
                geo["mmdb"] = resolve(g["mmdb"])
            elif g.get("blocksCsv"):
                if not g.get("locationsCsv"):
                    raise ValueError(
                        "geoip: blocksCsv requires locationsCsv "
                        "(the GeoLite2 CSV snapshot is a file pair)")
                geo["blocksCsv"] = resolve(g["blocksCsv"])
                geo["locationsCsv"] = resolve(g["locationsCsv"])
            else:
                # fail at config-load time, not mid-pipeline
                raise ValueError(
                    "geoip needs either mmdb: <GeoLite2-City.mmdb> or "
                    "the blocksCsv/locationsCsv snapshot pair")
            cfg.geoip = geo
    if mask_kwargs:
        cfg.mask = MaskConfig(**mask_kwargs)

    out = doc.get("output", {})
    sinks = out.get("sinks", {})
    cfg.routes = [(r["name"], r["match"]) for r in sinks.get("routes", [])]
    cfg.default_sink = sinks.get("defaultSink", "sink_default")
    cfg.drop_unmatched = bool(sinks.get("dropUnmatched", False))
    if sinks.get("dir"):
        cfg.out_dir = resolve(sinks["dir"])
    return cfg
