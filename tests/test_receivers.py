import json

import pyarrow as pa


def test_azure_eventhub_records_explode():
    from logagent_js_ray.stages.receivers import azure_eventhub_format
    body = json.dumps({"records": [{"op": "Write", "n": 1},
                                   {"op": "Read", "n": 2}]})
    plain = json.dumps({"msg": "solo"})
    out = azure_eventhub_format(pa.table({
        "body": [body, plain, "not json"],
        "enqueuedTimeUtc": ["2024-01-01T00:00:00Z"] * 3}))
    assert out.num_rows == 4  # 2 records + 1 whole + 1 unparseable-whole
    first = json.loads(out["source_json"][0].as_py())
    assert first["op"] == "Write"
    assert first["@timestamp"] == "2024-01-01T00:00:00Z"
    whole = json.loads(out["source_json"][2].as_py())
    assert whole["body"] == {"msg": "solo"}
    assert json.loads(out["source_json"][3].as_py())["body"] is None


def test_k8s_audit_items_and_tags():
    from logagent_js_ray.stages.receivers import k8s_audit_parse
    body = json.dumps({"items": [
        {"verb": "create", "timestamp": "2024-02-02T10:00:00Z"},
        {"verb": "delete", "timestamp": "2024-02-02T11:00:00Z",
         "cluster": "already-set"}]})
    unknown = json.dumps({"kind": "Weird"})
    out = k8s_audit_parse(
        pa.table({"body": [body, unknown, ""],
                  "tok": ["idx-a", None, None]}),
        tags={"cluster": "prod"}, index_col="tok")
    assert out.num_rows == 3
    d0 = json.loads(out["source_json"][0].as_py())
    assert d0["cluster"] == "prod"  # tag fills missing
    assert d0["@timestamp"] == "2024-02-02T10:00:00Z"
    d1 = json.loads(out["source_json"][1].as_py())
    assert d1["cluster"] == "already-set"  # tag does NOT overwrite
    assert out["_index"].to_pylist()[:2] == ["idx-a", "idx-a"]
    assert json.loads(out["source_json"][2].as_py())["kind"] == "Weird"


def test_k8s_events_format():
    from logagent_js_ray.stages.receivers import k8s_events_format
    ev = json.dumps({"reason": "Pulled", "firstTimestamp": "2024-03-03T09:00:00Z",
                     "cluster": "will-be-overwritten"})
    out = k8s_events_format(pa.table({"body": [ev]}),
                            tags={"cluster": "prod"})
    d = json.loads(out["source_json"][0].as_py())
    assert d["cluster"] == "prod"  # events tags overwrite, unlike audit
    assert out["@timestamp"].to_pylist() == ["2024-03-03T09:00:00Z"]
