"""Influx line-protocol and ES _bulk wire-format parsers (SURVEY.md
§2.2: influxHttp.js:137-186, elasticsearchHttp.js:35-42,158-198)."""

import json

import pyarrow as pa


def test_influx_line_parse_full():
    from logagent_js_ray.sources.wire_formats import influx_line_parse
    t = pa.table({"row_id": [0, 1, 2, 3, 4], "text": [
        'cpu,host=web1,dc=eu usage=0.5,idle=99i 1700000000000000000',
        'mem free=1024i',                     # no tags, no ts
        'weird\\ name,t\\=ag=v\\,1 value="a b",ok=t 1700000000000000001',
        'not a valid line',
        None,
    ]})
    out = influx_line_parse(t, db="metrics")
    assert out["measurement"].to_pylist() == [
        "cpu", "mem", "weird name", None, None]
    assert out["timestamp"][0].as_py() == 1700000000000000000
    # ns -> µs division (influxHttp.js:145-147)
    assert out["@timestamp"][0].as_py().year == 2023
    assert json.loads(out["tags_json"][0].as_py()) == {
        "host": "web1", "dc": "eu"}
    # fields flattened under measurement_ prefix (js:153-159)
    assert json.loads(out["fields_json"][0].as_py()) == {
        "cpu_usage": 0.5, "cpu_idle": 99}
    assert out["@timestamp"][1].as_py() is None  # deterministic: no "now"
    assert json.loads(out["tags_json"][2].as_py()) == {"t=ag": "v,1"}
    assert json.loads(out["fields_json"][2].as_py()) == {
        "weird name_value": "a b", "weird name_ok": True}
    assert out["fields_json"][3].as_py() is None
    assert out["influxDbName"].to_pylist() == ["metrics"] * 5


def test_es_bulk_parse_pairs_defaults_and_skips():
    from logagent_js_ray.sources.wire_formats import es_bulk_parse
    body1 = "\n".join([
        json.dumps({"index": {"_index": "logs-a", "_id": "1"}}),
        json.dumps({"message": "m1"}),
        json.dumps({"delete": {"_index": "x"}}),       # unsupported: skip
        json.dumps({"index": {}}),                     # defaults apply
        json.dumps({"message": "m2"}),
        "not-json",                                    # skipped
    ])
    body2 = "\n".join([
        json.dumps({"index": {"_type": "evt"}}),
        json.dumps({"message": "m3", "n": 7}),
    ])
    t = pa.table({"req_id": [10, 20], "body": [body1, body2]})
    out = es_bulk_parse(t, default_index="def-idx", default_type="_doc",
                        passthrough=("req_id",))
    assert out.num_rows == 3
    assert out["_index"].to_pylist() == ["logs-a", "def-idx", "def-idx"]
    assert out["_type"].to_pylist() == ["_doc", "_doc", "evt"]
    assert out["_id"].to_pylist() == ["1", None, None]
    assert out["req_id"].to_pylist() == [10, 10, 20]
    assert json.loads(out["source_json"][2].as_py()) == {
        "message": "m3", "n": 7}


def test_es_bulk_parse_in_ray_flatmap(ray_session):
    import ray.data
    from logagent_js_ray.sources.wire_formats import es_bulk_parse
    bodies = [
        "\n".join([json.dumps({"index": {"_index": f"i{k}"}}),
                   json.dumps({"k": k})]) for k in range(8)
    ]
    ds = ray.data.from_arrow(pa.table({"body": bodies}))
    ds = ds.map_batches(es_bulk_parse, batch_format="pyarrow")
    rows = sorted(ds.take_all(), key=lambda r: r["_index"])
    assert len(rows) == 8
    assert rows[0]["_index"] == "i0"
    assert json.loads(rows[0]["source_json"]) == {"k": 0}
