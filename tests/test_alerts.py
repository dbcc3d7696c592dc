import json

import pyarrow as pa


def test_render_template_missing_empty():
    from logagent_js_ray.stages.alerts import render_template
    assert render_template("sev={severity} on {host}!",
                           {"severity": "err"}) == "sev=err on !"


def test_slack_payload_text_and_attachment():
    from logagent_js_ray.stages.alerts import make_slack_payload_fn
    b = pa.table({"severity": ["error"], "message": ["disk full"]})
    plain = make_slack_payload_fn({"channel": "#ops"},
                                  template="{severity}: {message}")(b)
    p = json.loads(plain["slack_payload"][0].as_py())
    assert p["text"] == "error: disk full"
    assert p["channel"] == "#ops"

    att = make_slack_payload_fn(
        {"attachments": [{"color": "danger"}]}, fmt="ld-json")(b)
    a = json.loads(att["slack_payload"][0].as_py())
    assert json.loads(a["attachments"][0]["text"]) == {
        "severity": "error", "message": "disk full"}
    assert a["attachments"][0]["color"] == "danger"


def test_slack_payload_base_not_mutated():
    from logagent_js_ray.stages.alerts import make_slack_payload_fn
    base = {"attachments": [{"color": "warn"}]}
    fn = make_slack_payload_fn(base, fmt="ld-json")
    b = pa.table({"m": ["x"]})
    fn(b)
    fn(b)
    assert "text" not in base["attachments"][0]


def test_prometheus_alert_build():
    from logagent_js_ray.stages.alerts import make_prometheus_alerts_fn
    fn = make_prometheus_alerts_fn({
        "labels": {"alertname": "HighErrorRate", "severity": "{severity}"},
        "annotations": {"summary": "{message}"},
        "generatorURL": "https://g/{host}"})
    out = fn(pa.table({"severity": ["critical"], "message": ["boom"],
                       "host": ["n1"]}))
    a = json.loads(out["alert_json"][0].as_py())
    assert a["labels"] == {"alertname": "HighErrorRate",
                           "severity": "critical"}
    assert a["annotations"] == {"summary": "boom"}
    assert a["generatorURL"] == "https://g/n1"
