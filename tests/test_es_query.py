import datetime
import json

import pyarrow as pa


def test_render_index_template():
    from logagent_js_ray.sources.es_query import render_index_template
    now = datetime.datetime(2024, 3, 7)
    assert render_index_template("logs-YYYY.MM.DD", now) == "logs-2024.03.07"
    assert render_index_template("static", now) == "static"


def test_es_hits_parse_unwrap_and_fallback():
    from logagent_js_ray.sources.es_query import es_hits_parse
    page = {
        "hits": {"hits": [
            {"_id": "a1", "_type": "_doc", "_index": "logs-1",
             "_source": {"msg": "x", "n": 1}},
            # stored-fields hit without _source: whole-hit fallback
            {"_id": "a2", "_index": "logs-1", "_score": 1.0,
             "fields": {"msg": ["y"]}},
        ]}
    }
    empty = {"took": 3}  # no hits key -> skipped (js:93-95)
    bad = "not json"
    out = es_hits_parse(pa.table({"bytes": pa.array(
        [json.dumps(page).encode(), json.dumps(empty).encode(),
         bad.encode()], pa.binary())}))
    assert out.num_rows == 2
    assert out["_id"].to_pylist() == ["a1", "a2"]
    assert json.loads(out["source_json"][0].as_py()) == {"msg": "x", "n": 1}
    # fallback serializes the WHOLE hit minus the three promoted meta
    # keys — _score stays (reference `var data = result`, round-3 advice)
    assert json.loads(out["source_json"][1].as_py()) == {
        "_score": 1.0, "fields": {"msg": ["y"]}}


def test_read_es_query_pages(ray_session, tmp_path):
    from logagent_js_ray.sources.es_query import read_es_query
    paths = []
    for p in range(3):
        page = {"hits": {"hits": [
            {"_id": f"p{p}h{i}", "_type": "_doc", "_index": "logs",
             "_source": {"k": p * 10 + i}} for i in range(4)]}}
        f = tmp_path / f"page{p}.json"
        f.write_text(json.dumps(page))
        paths.append(str(f))
    ds = read_es_query(paths)
    rows = sorted(ds.take_all(), key=lambda r: r["_id"])
    assert len(rows) == 12
    assert json.loads(rows[0]["source_json"]) == {"k": 0}
    assert rows[-1]["_id"] == "p2h3"
