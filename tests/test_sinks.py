"""Template file sink + stdout renderer (SURVEY.md §2.7)."""

import glob
import json

import pyarrow as pa
import pyarrow.dataset as pads


def test_render_template_column():
    from logagent_js_ray.sinks.files import render_template_column
    t = pa.table({"sink": ["a", "b"], "role": ["user", None]})
    out = render_template_column(t, "logs-{sink}-{role}.out")
    assert out["file_name"].to_pylist() == ["logs-a-user.out", "logs-b-null.out"]


def test_write_template_sink(ray_session, tmp_path):
    import ray.data
    from logagent_js_ray.sinks.files import write_template_sink
    rows = [
        {"logSource": "user", "_type": "json", "sink": "s1", "x": 1},
        {"logSource": "tool", "_type": "json", "sink": "s2", "x": 2},
        {"logSource": "user", "_type": None, "sink": "s1", "x": 3},
    ]
    out = str(tmp_path / "sink")
    write_template_sink(ray.data.from_items(rows), out,
                        template="{sink}-{logSource}",
                        source_match="^user$")
    dirs = sorted(p.split("file_name=")[-1]
                  for p in glob.glob(f"{out}/file_name=*"))
    assert dirs == ["s1-user"]  # tool row gated out
    ds = pads.dataset(out, partitioning="hive")
    assert ds.count_rows() == 2


def test_show_formats(ray_session):
    import ray.data
    from logagent_js_ray.sinks.files import show
    ds = ray.data.from_items([{"a": 1, "b": "x"}])
    ld = show(ds, fmt="ldjson")
    assert json.loads(ld) == {"a": 1, "b": "x"}
    assert '"a": 1' in show(ds, fmt="pretty")
    assert "a: 1" in show(ds, fmt="yaml")


def test_render_lines_column():
    from logagent_js_ray.sinks.files import render_lines
    t = pa.table({"a": [1, 2], "b": ["x", "y"]})
    out = render_lines(t, "ldjson")
    assert out["line"].to_pylist() == ['{"a": 1, "b": "x"}',
                                       '{"a": 2, "b": "y"}']
    ym = render_lines(t, "yaml")["line"].to_pylist()
    assert ym[0] == "a: 1\nb: x\n"


def test_clickhouse_record_mapping():
    """clickhouse.js:43-59 — positional column order, @timestamp ->
    epoch ms (getTime()), JS `|| null` falsy coercion."""
    from logagent_js_ray.sinks.files import clickhouse_record
    t = pa.table({
        "@timestamp": pa.array([1_700_000_000_123_456, None],
                               pa.timestamp("us")),
        "status": pa.array([0, 404], pa.int64()),
        "msg": pa.array(["", "boom"], pa.string()),
        "flag": pa.array([False, True], pa.bool_()),
    })
    out = clickhouse_record(t, fields={
        "t": "@timestamp", "code": "status", "m": "msg",
        "f": "flag", "missing": "nope"}, table="logs")
    assert out.column_names == ["t", "code", "m", "f", "missing",
                                "_ch_table"]
    assert out["t"].to_pylist() == [1_700_000_000_123, None]
    assert out["code"].to_pylist() == [None, 404]  # 0 -> null (JS falsy)
    assert out["m"].to_pylist() == [None, "boom"]  # '' -> null
    assert out["f"].to_pylist() == [None, True]    # false -> null
    assert out["missing"].to_pylist() == [None, None]
    assert out["_ch_table"].to_pylist() == ["logs", "logs"]


def test_clickhouse_record_timestamp_units():
    """Round-3 advice: @timestamp must normalize ANY storage unit to
    epoch-ms and FLOOR pre-epoch values (getTime()), not truncate."""
    from logagent_js_ray.sinks.files import clickhouse_record
    for unit, vals, want in [
            ("us", [-1_500_999, 1_500_999], [-1501, 1500]),
            ("ms", [-1501, 1500], [-1501, 1500]),
            ("s", [-2, 3], [-2000, 3000]),
            ("ns", [-1_500_999_001, 1_500_999_001], [-1501, 1500])]:
        t = pa.table({"@timestamp": pa.array(vals, pa.timestamp(unit))})
        out = clickhouse_record(t, fields={"t": "@timestamp"})
        assert out["t"].to_pylist() == want, unit
