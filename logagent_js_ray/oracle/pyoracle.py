"""Pure-Python single-process oracle (SURVEY.md §5): a row-at-a-time
reimplementation of parse -> mask -> enrich -> route -> aggregate,
deliberately written in the reference's style (one event at a time,
``re`` module, plain dicts) so it shares NO vectorized code with the Ray
pipeline it checks. pytest asserts the two implementations agree exactly.
"""

from __future__ import annotations

import hashlib
import json
import re
from collections import Counter, defaultdict
from datetime import datetime, timedelta, timezone

from ..functions.transforms import BUNYAN_LEVELS
from ..registry import JSON_PROMOTED, PatternRegistry, load_registry

SYSLOG_SEV = ["emerg", "alert", "crit", "err", "warning", "notice",
              "info", "debug"]


def _parse_date(s: str, fmt: str | None):
    try:
        if fmt == "clf":
            s2 = re.sub(r" [+-]\d{4}$", "", s)
            return datetime.strptime(s2, "%d/%b/%Y:%H:%M:%S")
        # numeric UTC offset: strip AND subtract, mirroring the
        # pipeline's _apply_utc_offset (local = UTC + offset)
        m = re.search(r"([+-])(\d{2}):?(\d{2})$", s)
        off = timedelta(0)
        if m:
            off = timedelta(hours=int(m.group(2)),
                            minutes=int(m.group(3)))
            if m.group(1) == "-":
                off = -off
            s = s[:m.start()]
        s2 = re.sub(r"(\.\d+)?Z?$", "", s)
        return datetime.strptime(s2, "%Y-%m-%dT%H:%M:%S") - off
    except ValueError:
        return None


def parse_row(row: dict, registry: PatternRegistry | None = None) -> dict:
    """One transcript row -> parsed event dict (parser.js:505-565)."""
    registry = registry or load_registry()
    text, role = row["text"], row["role"]
    ts = row["ts"]  # datetime
    ev = dict(row)
    ev.update({"message": text, "@timestamp": ts, "logSource": role,
               "_type": None, "severity": None, "fields_json": None})

    stripped = text.strip()
    if stripped.startswith("{") and stripped.endswith("}"):
        try:
            obj = json.loads(text)
        except ValueError:
            obj = None
        if isinstance(obj, dict):
            ev["_type"] = "json"
            if "msg" in obj and "message" not in obj:
                obj["message"] = obj.pop("msg")
            if isinstance(obj.get("level"), (int, float)):
                ev["severity"] = BUNYAN_LEVELS.get(int(obj.pop("level")))
            if "time" in obj:
                t = _parse_date(str(obj.pop("time")), "iso")
                if t is not None:
                    ev["@timestamp"] = t
            m2 = obj.pop("message", None)
            if m2 is not None and not isinstance(m2, str):
                # mirror the pipeline: non-string messages stringify
                m2 = (json.dumps(m2, sort_keys=True)
                      if isinstance(m2, (dict, list)) else str(m2))
            ev["message"] = m2
            rest = {}
            for k, v in obj.items():
                if k in JSON_PROMOTED:
                    ev[k] = float(v) if k in ("counter", "pid") else str(v)
                elif k != "v":
                    rest[k] = v
            if rest:
                ev["fields_json"] = json.dumps(rest, sort_keys=True,
                                               separators=(",", ":"))
            return ev

    for entry in registry.entries_for_source(role):
        m = entry.compiled.search(text)
        if not m:
            continue
        ev["_type"] = entry.type
        fields = m.groupdict()
        if entry.datefield:
            t = _parse_date(fields.pop(entry.datefield, ""), entry.dateformat)
            if t is not None:
                ev["@timestamp"] = t
        # transforms, row-at-a-time
        if entry.transform == "access_log":
            ev["message"] = f"{fields['method']} {fields['path']}"
            for f in ("status_code", "size"):
                if fields.get(f) == "-":
                    fields[f] = "0"
        elif entry.transform == "syslog_pri":
            prio = int(fields["prio"])
            fields["facility"] = prio // 8
            ev["severity"] = SYSLOG_SEV[prio % 8]
            ev["message"] = fields.pop("msg_text")
        for f, v in fields.items():
            if entry.types.get(f) == "number" or f == "facility":
                ev[f] = float(v)
            else:
                ev[f] = v
        return ev
    return ev  # fallback record


def mask_row(ev: dict, hash_fields=("user_email", "token"),
             ip_fields=("client_ip",), algo: str = "sha256") -> dict:
    for f in hash_fields:
        v = ev.get(f)
        if v is not None:
            h = hashlib.new(algo, str(v).encode()).hexdigest()
            ev[f] = h
            for mc in ("message", "text"):
                if isinstance(ev.get(mc), str) and str(v) in ev[mc]:
                    ev[mc] = ev[mc].replace(str(v), h, 1)
    for f in ip_fields:
        v = ev.get(f)
        if v is not None:
            s = str(v)
            if s.count(".") == 3:
                t = s.rsplit(".", 1)[0] + ".0"
            elif ":" in s:
                t = s.rsplit(":", 1)[0] + ":0"
            else:
                t = s
            ev[f] = t
            for mc in ("message", "text"):
                if isinstance(ev.get(mc), str) and s in ev[mc]:
                    ev[mc] = ev[mc].replace(s, t, 1)
    return ev


def _expand_sink_template(name: str | None, ev: dict) -> str | None:
    """YYYY/MM/DD expansion mirroring stages/route._expand_date_templates
    (bare-substring tokens = reference parity; null ts keeps the
    literal)."""
    if name is None or not re.search(r"YYYY|MM|DD", name):
        return name
    ts = ev.get("@timestamp")
    if ts is None:
        return name
    return (name.replace("YYYY", f"{ts.year:04d}")
            .replace("MM", f"{ts.month:02d}")
            .replace("DD", f"{ts.day:02d}"))


def route_row(ev: dict, routes, default_sink="sink_default",
              drop_unmatched=False) -> str | None:
    if ev.get("_index") is not None:
        return _expand_sink_template(ev["_index"], ev)
    for name, rx in routes:
        if ev.get("logSource") is not None and \
                re.search(rx, ev["logSource"]):
            return _expand_sink_template(name, ev)
    return None if drop_unmatched else \
        _expand_sink_template(default_sink, ev)


def enrich_row(ev: dict, catalog: dict[str, dict]) -> dict:
    hit = catalog.get(ev.get("tool"))
    if hit:
        ev.update(hit)
    else:
        ev["tool_family"] = ev["cost_tier"] = None
    return ev


def run_oracle(rows: list[dict], routes, registry=None,
               catalog: dict[str, dict] | None = None) -> dict:
    """Full oracle run: returns per-row events (sorted by conv_id,
    turn_idx) and the aggregate marginals."""
    registry = registry or load_registry()
    events = []
    for row in rows:
        ev = parse_row(row, registry)
        ev = mask_row(ev)
        if catalog is not None:
            ev = enrich_row(ev, catalog)
        sink = route_row(ev, routes)
        if sink is None:
            continue
        ev["sink"] = sink
        events.append(ev)
    events.sort(key=lambda e: (e["conv_id"], e["turn_idx"]))
    by_role = Counter((e["sink"], e["role"]) for e in events)
    by_tool = Counter((e["sink"], e["tool"]) for e in events)
    by_bucket = Counter(
        (e["sink"], e["@timestamp"].replace(minute=0, second=0,
                                            microsecond=0))
        for e in events)
    sum_size = defaultdict(float)
    for e in events:
        if e.get("size") is not None:
            sum_size[e["sink"]] += e["size"]
    return {"events": events, "by_role": by_role, "by_tool": by_tool,
            "by_bucket": by_bucket, "sum_size": dict(sum_size)}
