"""Multiline merge + format-projection enrichers + severity autodetect
(SURVEY.md §2.1, §2.5)."""

import datetime as dt

import pandas as pd
import pyarrow as pa
import pytest


def test_multiline_merge(ray_session):
    import ray.data
    from logagent_js_ray.stages.multiline import multiline_merge
    rows = [
        {"conv_id": "a", "turn_idx": 0, "text": "Traceback:", "role": "u"},
        {"conv_id": "a", "turn_idx": 1, "text": "  File x.py", "role": "u"},
        {"conv_id": "a", "turn_idx": 2, "text": "  Error: boom", "role": "u"},
        {"conv_id": "a", "turn_idx": 3, "text": "next line", "role": "u"},
        {"conv_id": "b", "turn_idx": 0, "text": "solo", "role": "u"},
        # written out of order: merge must sort by turn_idx within group
        {"conv_id": "c", "turn_idx": 1, "text": "  cont", "role": "u"},
        {"conv_id": "c", "turn_idx": 0, "text": "head", "role": "u"},
    ]
    out = multiline_merge(ray.data.from_items(rows)).to_pandas()
    out = out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    a = out[out.conv_id == "a"]
    assert a["text"].tolist() == [
        "Traceback:\n  File x.py\n  Error: boom", "next line"]
    assert a["turn_idx"].tolist() == [0, 3]  # first line's identity kept
    assert out[out.conv_id == "b"]["text"].tolist() == ["solo"]
    assert out[out.conv_id == "c"]["text"].tolist() == ["head\n  cont"]


def test_journald_format():
    from logagent_js_ray.stages.formats import journald_format
    t = pa.table({
        "MESSAGE": ["disk failing"],
        "__REALTIME_TIMESTAMP": [1735689600000000],
        "PRIORITY": [3],
        "SYSLOG_FACILITY": [4],
        "_HOSTNAME": ["web1"],
        "_PID": [123],
        "_COMM": ["sshd"],
        "keep_me": ["x"],
    })
    out = journald_format(t)
    row = {c: out[c][0].as_py() for c in out.column_names}
    assert row["message"] == "disk failing"
    assert row["@timestamp"] == dt.datetime(2025, 1, 1)
    assert row["severity"] == "err"
    assert row["facility"] == 4.0
    assert row["os_host"] == "web1"
    assert row["process_pid"] == 123.0
    assert row["process_name"] == "sshd"
    assert row["keep_me"] == "x"
    assert "MESSAGE" not in out.column_names


def test_heroku_router_parse():
    from logagent_js_ray.stages.formats import heroku_router_parse
    t = pa.table({"message": [
        'at=info method=GET path="/users" status=200 bytes=1234',
        '{"already": "json"}',
        "plain words",
    ]})
    out = heroku_router_parse(t)
    assert out["router_path"][0].as_py() == "/users"
    assert out["router_status"][0].as_py() == 200.0
    assert out["router_bytes"][0].as_py() == 1234.0
    assert out["json_body"][1].as_py() == '{"already": "json"}'
    assert out["router_kv"][2].as_py() is None


def test_device_detector(ray_session):
    import ray.data
    from logagent_js_ray.stages.formats import DeviceDetector
    uas = [
        "Mozilla/5.0 (Windows NT 10.0) AppleWebKit/537.36 Chrome/120.0.0.0",
        "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15) Gecko/20100101 Firefox/115.0",
        "curl/8.4.0",
        "Googlebot/2.1 (+http://www.google.com/bot.html)",
        None,
    ]
    ds = ray.data.from_items([{"user_agent": u} for u in uas])
    out = ds.map_batches(DeviceDetector, batch_format="pyarrow",
                         concurrency=2).to_pandas()
    got = list(zip(out["ua_browser"], out["ua_os"]))
    assert ("Chrome", "Windows") in got
    assert ("Firefox", "macOS") in got
    assert ("curl", None) in got
    assert ("bot", None) in got


def test_severity_autodetect(ray_session):
    """docker-enrichment's error/warning regex over the message head
    (docker-log-enrichment.js:127-142), exposed via Enricher."""
    import ray
    import ray.data
    from logagent_js_ray.stages.enrich import Enricher
    lookup = pa.table({"tool": ["none"], "tool_family": ["chat"],
                       "cost_tier": ["free"]})
    ref = ray.put(lookup)
    t = [{"tool": "none", "severity": None,
          "message": "ERROR: something broke"},
         {"tool": "none", "severity": None,
          "message": "warning: look out"},
         {"tool": "none", "severity": "info",
          "message": "error but already set"},
         {"tool": "none", "severity": None, "message": "all fine"}]
    out = ray.data.from_items(t).map_batches(
        Enricher, fn_constructor_kwargs={
            "lookup_ref": ref, "key": "tool", "detect_severity": True},
        batch_format="pyarrow", concurrency=2).to_pandas()
    sev = dict(zip(out["message"], out["severity"]))
    assert sev["ERROR: something broke"] == "error"
    assert sev["warning: look out"] == "warning"
    assert sev["error but already set"] == "info"  # existing wins
    assert sev["all fine"] is None
