"""Format-normalization enrichers — rebuild of logagent-js's
protocol-format output filters (SURVEY.md §2.5) as vectorized projection
stages. Each maps a foreign field layout onto the common schema.

  * journald_format — /root/reference/lib/plugins/output-filter/journald-format.js:19-146
    ``_hostname -> os.host`` (flattened to ``os_host``), µs-epoch
    ``__REALTIME_TIMESTAMP -> @timestamp``, PRIORITY/SYSLOG_FACILITY
    decode, ``MESSAGE -> message``, process fields.
  * heroku_format — /root/reference/lib/plugins/output-filter/heroku-format.js:20-60
    fixed field set + ``key=value`` router-line extraction + embedded
    JSON detection in ``message``.
  * device_detector — /root/reference/lib/plugins/output-filter/httpDeviceDetector.js:1-21
    stateful user-agent parser -> structured browser/os/device columns;
    the reference holds a DeviceDetector instance per process, here an
    actor-pool class compiling its regex set once per actor.
"""

from __future__ import annotations

import json
import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.transforms import SYSLOG_SEVERITY


SYSLOG_FACILITY = pa.array(
    ["kern", "user", "mail", "daemon", "auth", "syslog", "lpr", "news",
     "uucp", "cron", "authpriv", "ftp", "ntp", "logaudit", "logalert",
     "clock", "local0", "local1", "local2", "local3", "local4", "local5",
     "local6", "local7"], pa.string())

_SYSLOG_3164_RE = (r"^<(?P<pri>\d{1,3})>(?P<ts>[A-Z][a-z]{2} [ \d]\d "
                   r"\d{2}:\d{2}:\d{2}) (?P<host>\S+) "
                   r"(?P<tag>[^\s\[:]+)(?:\[(?P<pid>\d+)\])?: ?"
                   r"(?P<msg>.*)$")
_SYSLOG_5424_RE = (r"^<(?P<pri>\d{1,3})>1 (?P<ts>\S+) (?P<host>\S+) "
                   r"(?P<tag>\S+) (?P<pid>\S+) \S+ \S+ (?P<msg>.*)$")


def syslog_frame_parse(batch: pa.Table,
                       line_col: str = "text") -> pa.Table:
    """Syslog datagram framing — the parse half of the reference's UDP
    receiver (/root/reference/lib/plugins/input/syslog.js:22-90, whose
    ``syslogd`` lib does this split before the emit): RFC3164
    (``<pri>Mmm dd hh:mm:ss host tag[pid]: msg``) with an RFC5424
    (``<pri>1 ...``) fallback, both vectorized ``pc.extract_regex``.
    Emits the receiver's enrichment fields — ``severity`` /
    ``facility`` NAMES from the pri value (SEVERITY/FACILITY tables,
    syslog.js:22-56), ``syslog_tag`` (the reference's ``syslog-tag``,
    also its per-event sourceName) — plus ``syslog_host``,
    ``syslog_pid`` and the free-text ``message``. Non-syslog lines pass
    through with null fields.
    """
    import pyarrow.compute as pc
    lines = pc.cast(batch[line_col], pa.string())
    m31 = pc.extract_regex(lines, _SYSLOG_3164_RE)
    m54 = pc.extract_regex(lines, _SYSLOG_5424_RE)
    use54 = pc.and_(pc.is_null(m31), pc.is_valid(m54))

    def field(name):
        return pc.if_else(use54, pc.struct_field(m54, name),
                          pc.struct_field(m31, name))

    pri = pc.cast(field("pri"), pa.int64())
    sev_idx = pc.bit_wise_and(pri, 7)
    fac_idx = pc.shift_right(pri, 3)
    fac_idx = pc.if_else(pc.less(fac_idx, 24), fac_idx,
                         pa.scalar(None, pa.int64()))
    out = batch.append_column("severity", SYSLOG_SEVERITY.take(sev_idx))
    out = out.append_column("facility", SYSLOG_FACILITY.take(fac_idx))
    out = out.append_column("syslog_host", field("host"))
    out = out.append_column("syslog_tag", field("tag"))
    out = out.append_column(
        "syslog_pid", pc.cast(pc.if_else(
            pc.match_substring_regex(
                pc.fill_null(field("pid"), ""), r"^\d+$"),
            field("pid"), pa.scalar(None, pa.string())), pa.int64()))
    out = out.append_column("syslog_ts_raw", field("ts"))
    return out.append_column("message", field("msg"))


def journald_format(batch: pa.Table) -> pa.Table:
    """Columns expected: MESSAGE, __REALTIME_TIMESTAMP (µs epoch string
    or int), PRIORITY, SYSLOG_FACILITY, _HOSTNAME, _PID, _COMM."""
    import pyarrow.compute as pc
    n = batch.num_rows

    def col(name):
        return batch[name] if name in batch.column_names else pa.nulls(n)

    out_cols = {
        "message": pc.cast(col("MESSAGE"), pa.string()),
        "os_host": pc.cast(col("_HOSTNAME"), pa.string()),
        "process_pid": pc.cast(col("_PID"), pa.float64()),
        "process_name": pc.cast(col("_COMM"), pa.string()),
    }
    rt = pc.cast(col("__REALTIME_TIMESTAMP"), pa.int64())
    out_cols["@timestamp"] = pc.cast(rt, pa.timestamp("us"))
    prio = pc.cast(col("PRIORITY"), pa.int64())
    sev_idx = pc.bit_wise_and(prio, 7)
    out_cols["severity"] = SYSLOG_SEVERITY.take(sev_idx)
    out_cols["facility"] = pc.cast(col("SYSLOG_FACILITY"), pa.float64())
    keep = [c for c in batch.column_names
            if not (c.startswith("_") or c.isupper())]
    res = batch.select(keep)  # select([]) keeps num_rows; appends align
    for name, arr in out_cols.items():
        res = res.append_column(name, arr)
    return res


def make_cloudfoundry_format_fn(tag_keys: list[str],
                                tags_col: str = "tags",
                                index: str | None = None):
    """cloudfoundry-format output filter
    (/root/reference/lib/plugins/output-filter/cloudfoundry-format.js:20-82):
    explode the CF syslog structured-data tag list ('k1="v1" k2="v2"',
    quotes stripped exactly like the reference's per-token replace) into
    one column per DECLARED key — a fixed Arrow schema instead of the
    reference's dynamic object spread — strip the receiver-index suffix
    from _type/logSource, and surface a message that is itself a JSON
    object as a ``cf_json`` overflow column (the spread-into-record of
    extractJson, kept nested for schema stability). Vectorized: one
    extract_regex per declared tag key."""
    import pyarrow.compute as pc
    key_res = [(k, rf'(?:^|\s)"?{re.escape(k)}"?="?(?P<v>[^\s"]*)')
               for k in tag_keys]

    def _cf(batch: pa.Table) -> pa.Table:
        tags = pc.cast(batch[tags_col], pa.string()) \
            if tags_col in batch.column_names \
            else pa.nulls(batch.num_rows, pa.string())
        for key, rx in key_res:
            ext = pc.extract_regex(tags, rx)
            batch = batch.append_column(f"tag_{key}",
                                        pc.struct_field(ext, "v"))
        if index:
            suffix = re.escape("_" + index)
            for name in ("_type", "logSource"):
                if name in batch.column_names:
                    i = batch.schema.get_field_index(name)
                    batch = batch.set_column(
                        i, name, pc.replace_substring_regex(
                            batch[name], suffix + "$", ""))
        if "message" in batch.column_names:
            msg = pc.cast(batch["message"], pa.string())
            s = pc.utf8_trim_whitespace(pc.coalesce(msg, pa.scalar("")))
            is_json = pc.match_substring_regex(s, r"(?s)^\[?\{.*\}\]?$")
            batch = batch.append_column(
                "cf_json", pc.if_else(is_json, msg,
                                      pa.scalar(None, pa.string())))
        return batch
    return _cf


_KV_RE = re.compile(r"(\w+)=(\"[^\"]*\"|\S+)")


def heroku_router_parse(batch: pa.Table,
                        text_col: str = "message") -> pa.Table:
    """Extract ``key=value`` pairs from router lines into a JSON overflow
    column (+ promoted path/status/bytes), and detect embedded JSON
    messages (heroku-format.js:40-56)."""
    texts = batch[text_col].to_numpy(zero_copy_only=False)
    n = len(texts)
    kv_json = np.full(n, None, dtype=object)
    path = np.full(n, None, dtype=object)
    status = np.full(n, np.nan)
    nbytes = np.full(n, np.nan)
    json_body = np.full(n, None, dtype=object)
    for i, t in enumerate(texts):
        if not t:
            continue
        s = t.strip()
        if s.startswith("{") and s.endswith("}"):
            try:
                json.loads(s)
                json_body[i] = s
                continue
            except ValueError:
                pass
        kvs = dict(_KV_RE.findall(t))
        if kvs:
            kv_json[i] = json.dumps(kvs, sort_keys=True,
                                    separators=(",", ":"))
            path[i] = kvs.get("path", "").strip('"') or None
            if kvs.get("status", "").isdigit():
                status[i] = float(kvs["status"])
            b = kvs.get("bytes", "")
            if b.isdigit():
                nbytes[i] = float(b)
    out = batch.append_column("router_kv", pa.array(kv_json, pa.string()))
    out = out.append_column("router_path", pa.array(path, pa.string()))
    out = out.append_column("router_status", pa.array(status, pa.float64()))
    out = out.append_column("router_bytes", pa.array(nbytes, pa.float64()))
    return out.append_column("json_body", pa.array(json_body, pa.string()))


def vercel_verify_signature(body, signature, secrets) -> bool | None:
    """Vercel webhook HMAC-SHA1 signature verification
    (/root/reference/lib/plugins/input/vercel.js:117-128, spec-tested
    in the reference's test/vercel/vercelSignature.spec.js): the hex
    HMAC-SHA1 of the raw body under ANY configured client secret must
    equal the ``x-zeit-signature`` header. Returns None when
    ``secrets`` is not a list (the reference returns undefined), else
    the any-secret-matches boolean."""
    import hashlib
    import hmac as _hmac
    if not isinstance(secrets, list):
        return None
    raw = body.encode() if isinstance(body, str) else (body or b"")
    return any(
        _hmac.new((s.encode() if isinstance(s, str) else s), raw,
                  hashlib.sha1).hexdigest() == signature
        for s in secrets)


def vercel_signature_batch(batch: pa.Table, secrets,
                           body_col: str = "body",
                           sig_col: str = "x_zeit_signature",
                           out_col: str = "sig_verified") -> pa.Table:
    """Per-row signature gate column over webhook (body, signature)
    pairs; None secrets-config yields an all-null column."""
    bodies = batch[body_col].to_pylist()
    sigs = batch[sig_col].to_pylist()
    flags = [vercel_verify_signature(b, s, secrets)
             for b, s in zip(bodies, sigs)]
    return batch.append_column(out_col, pa.array(flags, pa.bool_()))


_VERCEL_REPORT_RE = re.compile(
    r"Duration: (?P<dur>[\d.]+) ms\s+Billed Duration: (?P<billed>[\d.]+) ms"
    r"\s+Memory Size: (?P<mem>\d+) MB\s+Max Memory Used: (?P<used>\d+) MB"
    r"(?P<cold>.*Init Duration)?")


def vercel_format(batch: pa.Table, text_col: str = "message") -> pa.Table:
    """Lambda REPORT metric extraction (duration, billed, memory, cold
    start) — /root/reference/lib/plugins/output-filter/vercel-format.js:1-60."""
    texts = batch[text_col].to_numpy(zero_copy_only=False)
    n = len(texts)
    dur = np.full(n, np.nan)
    billed = np.full(n, np.nan)
    mem = np.full(n, np.nan)
    used = np.full(n, np.nan)
    cold = np.zeros(n, dtype=bool)
    for i, t in enumerate(texts):
        if not t or "REPORT" not in t:
            continue
        m = _VERCEL_REPORT_RE.search(t)
        if m:
            dur[i] = float(m.group("dur"))
            billed[i] = float(m.group("billed"))
            mem[i] = float(m.group("mem"))
            used[i] = float(m.group("used"))
            cold[i] = bool(m.group("cold"))
    out = batch.append_column("lambda_duration_ms", pa.array(dur))
    out = out.append_column("lambda_billed_ms", pa.array(billed))
    out = out.append_column("lambda_memory_mb", pa.array(mem))
    out = out.append_column("lambda_memory_used_mb", pa.array(used))
    return out.append_column("lambda_cold_start", pa.array(cold))


def aws_ecs_format(batch: pa.Table,
                   stream_col: str = "logSource") -> pa.Table:
    """severity derived from the log-stream name
    (/root/reference/lib/plugins/output-filter/aws-ecs-format.js:43-62)."""
    import pyarrow.compute as pc
    stream = pc.cast(batch[stream_col], pa.string())
    sev = pc.if_else(
        pc.match_substring_regex(stream, "(?i)error"),
        pa.scalar("error", pa.string()),
        pc.if_else(pc.match_substring_regex(stream, "(?i)warn"),
                   pa.scalar("warning", pa.string()),
                   pa.scalar(None, pa.string())))
    if "severity" in batch.column_names:
        i = batch.schema.get_field_index("severity")
        merged = pc.coalesce(pc.cast(batch["severity"], pa.string()), sev)
        return batch.set_column(i, "severity", merged)
    return batch.append_column("severity", sev)


def influx_projection(batch: pa.Table,
                      exclude: tuple = ("text", "message")) -> pa.Table:
    """InfluxDB line-protocol style type partitioning: NUMERIC columns
    become 'fields', STRING columns become 'tags'
    (/root/reference/lib/plugins/output/influxdb.js:209-241), serialized
    as two JSON columns beside a ns timestamp."""
    import json as _json
    num_cols = [c for c in batch.column_names
                if pa.types.is_floating(batch[c].type)
                or pa.types.is_integer(batch[c].type)]
    str_cols = [c for c in batch.column_names
                if pa.types.is_string(batch[c].type) and c not in exclude]
    n = batch.num_rows
    fields = np.empty(n, dtype=object)
    tags = np.empty(n, dtype=object)
    # to_pylist: plain Python ints/floats — numpy 2 scalars are not
    # JSON-serializable
    num_py = {c: batch[c].to_pylist() for c in num_cols}
    str_py = {c: batch[c].to_pylist() for c in str_cols}
    for i in range(n):
        fields[i] = _json.dumps(
            {c: v[i] for c, v in num_py.items()
             if v[i] is not None and v[i] == v[i]}, sort_keys=True)
        tags[i] = _json.dumps(
            {c: v[i] for c, v in str_py.items() if v[i] is not None},
            sort_keys=True)
    out = pa.table({"tags": pa.array(tags, pa.string()),
                    "fields": pa.array(fields, pa.string())})
    if "@timestamp" in batch.column_names:
        ns = pc_cast_ns(batch["@timestamp"])
        out = out.append_column("time_ns", ns)
    return out


def pc_cast_ns(arr):
    import pyarrow.compute as pc
    return pc.multiply(pc.cast(pc.cast(arr, pa.timestamp("us")),
                               pa.int64()), 1000)


def gelf_projection(batch: pa.Table,
                    source_name: str = "batch") -> pa.Table:
    """GELF field mapping — the format half of the gelf UDP sink
    (/root/reference/lib/plugins/output/gelfout.js:27-38): timestamp,
    level (severity, 'INFO' default), full_message, short_message with
    the ``src:logagent-`` prefix. The chunked-UDP transport itself is a
    live service and out of scope."""
    import pyarrow.compute as pc
    n = batch.num_rows

    def col(name):
        return batch[name] if name in batch.column_names else pa.nulls(n)

    level = pc.coalesce(pc.cast(col("severity"), pa.string()),
                        pa.scalar("INFO", pa.string()))
    return pa.table({
        "timestamp": pc.cast(col("@timestamp"), pa.timestamp("us")),
        "level": level,
        "full_message": pc.cast(col("message"), pa.string()),
        "short_message": pa.array([f"src:logagent-{source_name}"] * n,
                                  pa.string()),
    })


class GeoPrefixEnricher:
    """GeoIP-style enrichment — actor-pool stage holding a RANGE lookup
    loaded once per actor (/root/reference/lib/plugins/output-filter/
    geoip.js:20-53 with the MaxMind DB swapped for an ip-range table;
    the DB files aren't available in this environment, so the bundled
    table is a deterministic synthetic region map — the lookup dataflow,
    numpy searchsorted over range starts, is the real thing)."""

    REGIONS = ["na", "eu", "apac", "latam", "emea", "sa", "af", "oc"]

    def __init__(self, ip_col: str = "client_ip"):
        pa.set_cpu_count(1)  # actor-pool rule: no Arrow thread fan-out
        self.ip_col = ip_col
        # range table: starts at every /5 of the v4 space
        self.starts = np.arange(0, 1 << 32, (1 << 32) // 64, dtype=np.int64)
        self.labels = np.array(
            [self.REGIONS[i % len(self.REGIONS)] for i in range(64)],
            dtype=object)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # shared, validated vectorized converter (octet > 255 -> -1);
        # the old per-row int() loop mapped '999.1.1.1' to a bogus region
        from ..sources.geolite import _ips_to_int
        vals = _ips_to_int(batch[self.ip_col])
        idx = np.searchsorted(self.starts, vals, side="right") - 1
        geo = np.where(vals >= 0, self.labels[np.clip(idx, 0, 63)], None)
        return batch.append_column("geo_region",
                                   pa.array(geo.tolist(), pa.string()))


class DeviceDetector:
    """Actor-pool user-agent parser (regex set compiled once per actor —
    the DeviceDetector-instance analogue)."""

    RULES = [
        # (browser, regex) — ordered, first match wins
        ("Edge", re.compile(r"Edg(e|A|iOS)?/(?P<v>[\d.]+)")),
        ("Chrome", re.compile(r"Chrome/(?P<v>[\d.]+)")),
        ("Firefox", re.compile(r"Firefox/(?P<v>[\d.]+)")),
        ("Safari", re.compile(r"Version/(?P<v>[\d.]+).*Safari/")),
        ("curl", re.compile(r"curl/(?P<v>[\d.]+)")),
        ("bot", re.compile(r"(?i)(bot|crawler|spider)")),
    ]
    # iOS MUST precede macOS: every iPhone/iPad UA contains
    # 'like Mac OS X', so first-match-wins would otherwise classify all
    # mobile Apple traffic as macOS
    OS_RULES = [
        ("Windows", re.compile(r"Windows NT")),
        ("iOS", re.compile(r"(iPhone|iPad) OS|iPhone|iPad")),
        ("macOS", re.compile(r"Mac OS X")),
        ("Android", re.compile(r"Android")),
        ("Linux", re.compile(r"Linux")),
    ]

    def __init__(self, ua_col: str = "user_agent"):
        pa.set_cpu_count(1)  # actor-pool rule: no Arrow thread fan-out
        self.ua_col = ua_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        uas = batch[self.ua_col].to_numpy(zero_copy_only=False)
        browser = np.full(len(uas), None, dtype=object)
        version = np.full(len(uas), None, dtype=object)
        os_name = np.full(len(uas), None, dtype=object)
        for i, ua in enumerate(uas):
            if not ua:
                continue
            for name, rx in self.RULES:
                m = rx.search(ua)
                if m:
                    browser[i] = name
                    version[i] = (m.groupdict() or {}).get("v")
                    break
            for name, rx in self.OS_RULES:
                if rx.search(ua):
                    os_name[i] = name
                    break
        out = batch.append_column("ua_browser", pa.array(browser, pa.string()))
        out = out.append_column("ua_version", pa.array(version, pa.string()))
        return out.append_column("ua_os", pa.array(os_name, pa.string()))
