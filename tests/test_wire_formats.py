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


def test_syslog_frame_parse():
    from logagent_js_ray.stages.formats import syslog_frame_parse
    lines = [
        "<34>Oct 11 22:14:15 mymachine su[123]: 'su root' failed",
        "<13>Feb  5 17:32:18 10.0.0.99 myapp: Use the BFG!",
        "<165>1 2003-10-11T22:14:15.003Z host.example app 1234 ID47 - boom",
        "not syslog at all",
    ]
    out = syslog_frame_parse(pa.table({"text": lines}))
    assert out["severity"].to_pylist() == ["crit", "notice", "notice", None]
    assert out["facility"].to_pylist() == ["auth", "user", "local4", None]
    assert out["syslog_host"].to_pylist() == [
        "mymachine", "10.0.0.99", "host.example", None]
    assert out["syslog_tag"].to_pylist() == ["su", "myapp", "app", None]
    assert out["syslog_pid"].to_pylist() == [123, None, 1234, None]
    assert out["message"].to_pylist() == [
        "'su root' failed", "Use the BFG!", "boom", None]


def _gelf_chunks(msg_id: int, payload: bytes, size: int) -> list[bytes]:
    parts = [payload[i:i + size] for i in range(0, len(payload), size)]
    mid = msg_id.to_bytes(8, "little", signed=True)
    return [b"\x1e\x0f" + mid + bytes([i, len(parts)]) + p
            for i, p in enumerate(parts)]


def test_gelf_chunk_roundtrip(ray_session):
    import json

    import ray.data

    from logagent_js_ray.sources.wire_formats import (gelf_chunk_split,
                                                      gelf_reassemble)
    docs = {7: json.dumps({"short_message": "x" * 300, "host": "a"}),
            9: json.dumps({"short_message": "hé" * 99, "host": "b"})}
    datagrams = []
    for mid, doc in docs.items():
        datagrams += _gelf_chunks(mid, doc.encode(), 64)
    # an unchunked datagram + an incomplete message (one chunk missing)
    datagrams.append(b'{"short_message":"whole","host":"c"}')
    datagrams += _gelf_chunks(11, b'{"short_message":"lost"}', 8)[:-1]
    ds = ray.data.from_arrow(pa.table({"datagram": datagrams}))
    ds = ds.map_batches(gelf_chunk_split, batch_format="pyarrow")
    out = {r["gelf_msg_id"]: r["message"]
           for r in gelf_reassemble(ds, num_buckets=8).take_all()}
    assert json.loads(out[7])["short_message"] == "x" * 300
    assert json.loads(out[9])["short_message"] == "hé" * 99
    assert json.loads(out[-1])["short_message"] == "whole"
    assert 11 not in out  # incomplete: dropped like a reassembly timeout


def test_gelf_msg_id_all_ff_still_reassembles(ray_session):
    # 0xFF..FF wraps to int64 -1; the explicit gelf_chunked flag (not a
    # sentinel) must keep it a normal chunked message
    import ray.data

    from logagent_js_ray.sources.wire_formats import (gelf_chunk_split,
                                                      gelf_reassemble)
    payload = b'{"short_message":"edge"}'
    mid = b"\xff" * 8
    parts = [payload[:12], payload[12:]]
    dgs = [b"\x1e\x0f" + mid + bytes([i, 2]) + p
           for i, p in enumerate(parts)]
    ds = ray.data.from_arrow(pa.table({"datagram": dgs}))
    out = gelf_reassemble(ds.map_batches(gelf_chunk_split,
                                         batch_format="pyarrow"),
                          num_buckets=4).take_all()
    assert len(out) == 1
    assert out[0]["message"] == payload.decode()
