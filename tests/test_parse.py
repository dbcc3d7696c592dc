"""Parser unit tests mirroring the reference's mocha suite
(/root/reference/test/test.js:5-121) — no Ray needed; parse_batch is a
pure Arrow-table transform."""

import datetime as dt

import pyarrow as pa
import pytest

from logagent_js_ray.registry import load_registry
from logagent_js_ray.stages.parse import parse_batch

TS = dt.datetime(2025, 1, 1, 0, 0, 0)


def batch_of(texts, role="user"):
    n = len(texts)
    return pa.table({
        "conv_id": ["c0"] * n,
        "turn_idx": pa.array(range(n), pa.int32()),
        "role": [role] * n,
        "text": texts,
        "tool": ["none"] * n,
        "ts": pa.array([TS] * n, pa.timestamp("us")),
    })


def parse_one(text, role="user"):
    out = parse_batch(batch_of([text], role), load_registry())
    return {c: out[c][0].as_py() for c in out.column_names}


def test_json_fast_path():
    # test/test.js:5-32
    ev = parse_one('{"message": "hello world", "counter": 1}')
    assert ev["message"] == "hello world"
    assert ev["counter"] == 1.0
    assert ev["_type"] == "json"
    assert ev["@timestamp"] == TS  # no time field -> row ts (det. 'now')


def test_bunyan_normalization():
    # test/test.js:34-65 — msg->message, level 30->info, time->@timestamp
    ev = parse_one('{"pid":6023,"level":30,"msg":"hello world",'
                   '"time":"2017-02-08T21:13:49.515Z","v":0}')
    assert ev["message"] == "hello world"
    assert ev["severity"] == "info"
    assert ev["pid"] == 6023.0
    assert ev["@timestamp"] == dt.datetime(2017, 2, 8, 21, 13, 49)


def test_access_log():
    # test/test.js:67-97 — extraction + typing + transform
    line = ('91.67.80.14 - - [03/Apr/2016:06:25:38 +0000] '
            '"GET /about/ HTTP/1.1" 200 14243 "-" "Mozilla/5.0"')
    ev = parse_one(line)
    assert ev["client_ip"] == "91.67.80.14"
    assert ev["status_code"] == 200.0  # typed number
    assert ev["size"] == 14243.0
    assert ev["message"] == "GET /about/"  # transform patterns.yml:559
    assert ev["_type"] == "access_log_combined"
    assert ev["@timestamp"] == dt.datetime(2016, 4, 3, 6, 25, 38)
    assert "ts" not in [c for c in ev if ev[c] == "03/Apr/2016:06:25:38 +0000"]


def test_access_log_dash_to_zero():
    # patterns.yml:562-567 '- -> 0' transform
    line = ('1.2.3.4 - - [03/Apr/2016:06:25:38 +0000] '
            '"GET /x HTTP/1.1" - - "-" "ua"')
    ev = parse_one(line)
    assert ev["status_code"] == 0.0
    assert ev["size"] == 0.0


def test_fallback_record():
    # test/test.js:99-121 — unmatched line -> 3-field fallback
    ev = parse_one("a simple log line matching no patterns")
    assert ev["message"] == "a simple log line matching no patterns"
    assert ev["_type"] is None
    assert ev["@timestamp"] == TS
    assert ev["logSource"] == "user"


def test_syslog_priority_decode():
    ev = parse_one("<13>1 2026-01-02T03:04:05Z host1 app2 - - - all good")
    assert ev["severity"] == "notice"  # 13 & 7 = 5
    assert ev["facility"] == 1.0       # 13 >> 3
    assert ev["message"] == "all good"
    assert ev["@timestamp"] == dt.datetime(2026, 1, 2, 3, 4, 5)


def test_first_match_wins_order():
    """An access-log line also containing 'login user=...' must match the
    earlier access-log pattern (patterns.yml:77-79 ordering contract)."""
    line = ('1.2.3.4 - - [03/Apr/2016:06:25:38 +0000] '
            '"GET /login HTTP/1.1" 200 1 "-" "ua"')
    ev = parse_one(line)
    assert ev["_type"] == "access_log_combined"


def test_json_overflow_fields():
    ev = parse_one('{"message":"m","region":"r1","zone":2}')
    assert ev["fields_json"] == '{"region":"r1","zone":2}'


def test_invalid_json_falls_to_patterns():
    ev = parse_one("{not actually json}")
    assert ev["_type"] is None
    assert ev["message"] == "{not actually json}"


def test_oracle_agreement_on_mixed_batch():
    """Vectorized parse == row-at-a-time oracle on every fixture kind."""
    from logagent_js_ray.fixtures.gen import generate_transcripts
    from logagent_js_ray.oracle.pyoracle import parse_row
    tbl = generate_transcripts(500)
    out = parse_batch(tbl, load_registry())
    rows = tbl.to_pylist()
    got = out.to_pylist()
    for row, g in zip(rows, got):
        ev = parse_row(row)
        for k in ("message", "_type", "severity", "@timestamp"):
            assert g[k] == ev[k], (k, row["text"], g[k], ev[k])
        for k in ("client_ip", "status_code", "size", "user_email",
                  "facility", "counter", "service"):
            assert g.get(k) == ev.get(k), (k, row["text"])


def test_numeric_utc_offsets_applied():
    """+05:30 / -0800 offsets normalize to UTC instead of being
    silently dropped (reference: date-fns zone handling,
    parser.js:236-263)."""
    import datetime as dt

    import pyarrow as pa

    from logagent_js_ray.stages.parse import _parse_dates

    iso = _parse_dates(pa.array([
        "2024-01-02T03:04:05+05:30",
        "2024-01-02T03:04:05.123-0800",
        "2024-01-02T03:04:05Z",
        "2024-01-02T03:04:05+00:00",
    ]), None).to_pylist()
    assert iso[0] == dt.datetime(2024, 1, 1, 21, 34, 5)
    assert iso[1] == dt.datetime(2024, 1, 2, 11, 4, 5)
    assert iso[2] == dt.datetime(2024, 1, 2, 3, 4, 5)
    assert iso[3] == dt.datetime(2024, 1, 2, 3, 4, 5)
    java = _parse_dates(pa.array([
        "2024-01-02 03:04:05,980",
        "2024-01-02 03:04:05+0100",
    ]), "java").to_pylist()
    assert java[0] == dt.datetime(2024, 1, 2, 3, 4, 5)
    assert java[1] == dt.datetime(2024, 1, 2, 2, 4, 5)


def test_per_pattern_filter_hook(tmp_path):
    # parser.js:339-357 — a pattern's `filter` names a registered
    # predicate; matched rows where it returns False are dropped
    import pyarrow.compute as pc

    from logagent_js_ray.functions.transforms import register_filter
    from logagent_js_ray.registry import PatternRegistry

    register_filter("keep_5xx", lambda cols: pc.greater_equal(
        pc.cast(cols["code"], pa.float64()), 500))
    yml = tmp_path / "p.yml"
    yml.write_text(
        "patterns:\n"
        "  - source: .*\n"
        "    match:\n"
        "      - type: kv_test\n"
        "        regex: 'level=(?P<lvl>\\w+) code=(?P<code>\\d+)'\n"
        "        types: {code: number}\n"
        "        filter: keep_5xx\n")
    reg = PatternRegistry([str(yml)])
    out = parse_batch(batch_of([
        "level=info code=200",      # matched, filter False -> dropped
        "level=error code=503",     # matched, filter True -> kept
        "totally unstructured",     # unmatched -> fallback, filter n/a
    ]), reg)
    rows = {out["message"][i].as_py(): out["_type"][i].as_py()
            for i in range(out.num_rows)}
    assert out.num_rows == 2
    assert rows["level=error code=503"] == "kv_test"
    assert "totally unstructured" in rows  # fallback survives


def test_json_transform_hook():
    # parser.js:440-452 — cfg.json.transform mutates the parsed object;
    # exceptions are swallowed like the reference's try/catch
    def xf(source, obj):
        if obj.get("user") == "bob":
            raise RuntimeError("swallowed")
        obj["message"] = obj.get("message", "").upper()
        return obj

    out = parse_batch(batch_of([
        '{"message": "hello", "user": "alice"}',
        '{"message": "kept as-is", "user": "bob"}',
    ]), load_registry(), json_transform=xf)
    assert out["message"].to_pylist() == ["HELLO", "kept as-is"]
    assert out["_type"].to_pylist() == ["json", "json"]
