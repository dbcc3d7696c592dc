"""journald-upload export-format parser
(sources/journald_upload.py, mirroring journald-upload.js:14-120)."""

import json

import pyarrow as pa

from logagent_js_ray.sources.journald_upload import journald_export_parse


def _parse(body, **kw):
    return journald_export_parse(
        pa.table({"body": pa.array([body], pa.string())}), **kw)


def test_basic_entries_and_coercion():
    body = ("__CURSOR=s=abc1\n"
            "MESSAGE=hello world\n"
            "PRIORITY=6\n"
            "_PID=42\n"
            "METRIC=1e2\n"
            "TXT=abc123\n"
            "\n"
            "__CURSOR=s=abc2\n"
            "MESSAGE=second\n"
            "\n")
    out = _parse(body)
    assert out["entry_idx"].to_pylist() == [0, 1]
    f0 = json.loads(out["fields_json"][0].as_py())
    # keys lowercased, numeric strings -> JS Number()
    assert f0 == {"__cursor": "s=abc1", "message": "hello world",
                  "priority": 6, "_pid": 42, "metric": 100,
                  "txt": "abc123"}
    f1 = json.loads(out["fields_json"][1].as_py())
    assert f1 == {"__cursor": "s=abc2", "message": "second"}
    assert out["source_name"].to_pylist() == ["journald", "journald"]


def test_multiline_field_and_cursor_close():
    # a non key=value line starts a multiline field whose NAME keeps
    # case; lines append with trailing \n; blank line ends it (>3 chars)
    body = ("__CURSOR=c1\n"
            "SS_DATA\n"
            "line one\n"
            "line two\n"
            "\n"
            "MESSAGE=after\n"
            "\n")
    f = json.loads(_parse(body)["fields_json"][0].as_py())
    assert f["SS_DATA"] == "line one\nline two\n"
    assert f["message"] == "after"
    # a __CURSOR line force-closes an OPEN multiline field (js:82-84)
    body2 = ("__CURSOR=c1\n"
             "BLOB\n"
             "payload data\n"
             "__CURSOR=c2\n"
             "MESSAGE=next\n"
             "\n")
    out2 = _parse(body2)
    assert out2.num_rows == 1  # first entry merged into second: no
    # blank line ever ended entry 1 before cursor 2 began
    f2 = json.loads(out2["fields_json"][0].as_py())
    assert f2["BLOB"] == "payload data\n"
    assert f2["__cursor"] == "c2"  # last write wins
    assert f2["message"] == "next"


def test_short_multiline_not_closed_by_blank():
    # blank line does NOT end a multiline value of <= 3 chars (js:100-106)
    body = ("NAME\n"
            "ab\n"
            "\n"
            "cd\n"
            "\n"
            "\n")
    f = json.loads(_parse(body)["fields_json"][0].as_py())
    # first blank swallowed (value 'ab\n' is 3 chars), 'cd' appended
    assert f["NAME"] == "ab\ncd\n"


def test_end_of_stream_flush_drops_open_multiline():
    # trailing entry without blank line IS emitted, but an open
    # multiline field's partial value is dropped (Parser.end, js:66-73)
    body = ("MESSAGE=tail\n"
            "OPENFIELD\n"
            "partial")
    f = json.loads(_parse(body)["fields_json"][0].as_py())
    assert f == {"message": "tail"}


def test_remove_fields_tags_filter_and_source():
    body = ("__CURSOR=c\n"
            "__MONOTONIC_TIMESTAMP=123\n"
            "_SYSTEMD_UNIT=nginx.service\n"
            "MESSAGE=m\n"
            "\n"
            "__CURSOR=c2\n"
            "_SYSTEMD_UNIT=skipme.timer\n"
            "MESSAGE=m2\n"
            "\n"
            "__CURSOR=c3\n"
            "SYSLOG_IDENTIFIER=crond\n"
            "MESSAGE=m3\n"
            "\n")
    out = journald_export_parse(
        pa.table({"sid": pa.array([7], pa.int64()),
                  "body": pa.array([body], pa.string())}),
        remove_fields=["__MONOTONIC_TIMESTAMP"],
        unit_exclude=r"\.timer$", tags={"logtype": "journald",
                                        "message": "never-overwrites"})
    assert out.num_rows == 2  # the .timer entry filtered out
    assert out["sid"].to_pylist() == [7, 7]  # passthrough column
    f0 = json.loads(out["fields_json"][0].as_py())
    assert "__monotonic_timestamp" not in f0
    assert f0["logtype"] == "journald"      # tag added when absent
    assert f0["message"] == "m"             # tag never overwrites
    assert out["source_name"].to_pylist() == ["nginx.service", "crond"]


def test_js_number_edges():
    body = ("A= \n"          # whitespace value -> Number(' ') == 0
            "B=0x1A\n"       # unsigned hex -> 26
            "C=NaN\n"        # isNaN -> stays the string 'NaN'
            "D=007\n"        # 7
            "E=-2.5\n"
            "\n")
    f = json.loads(_parse(body)["fields_json"][0].as_py())
    assert f == {"a": 0, "b": 26, "c": "NaN", "d": 7, "e": -2.5}
