"""grep / drop-events / prep / route unit tests (SURVEY.md §2.3, §2.6,
routing §2.7)."""

import pyarrow as pa

from logagent_js_ray.stages.filters import (make_drop_events_fn, make_grep_fn,
                                            make_prep_fn)
from logagent_js_ray.stages.route import RouteConfig, route_batch


def tbl(**cols):
    return pa.table({k: pa.array(v) for k, v in cols.items()})


def test_grep_include_exclude():
    # grep.js:7-27
    t = tbl(text=["keep this", "drop this", "keep too"],
            role=["u", "u", "u"])
    out = make_grep_fn(include="keep", exclude="too")(t)
    assert out["text"].to_pylist() == ["keep this"]


def test_grep_source_gate_passes_unmatched_sources():
    t = tbl(text=["nomatch", "nomatch"], role=["a", "b"])
    out = make_grep_fn(include="keep", match_source="^a$")(t)
    assert out["text"].to_pylist() == ["nomatch"]  # role b untouched
    assert out["role"].to_pylist() == ["b"]


def test_drop_events():
    # dropEventsFilter.js:23-76 — any failing condition drops
    t = tbl(severity=["error", "info", None], text=["x", "y", "z"])
    out = make_drop_events_fn(exclude={"severity": "^error$"})(t)
    assert out["text"].to_pylist() == ["y", "z"]
    out = make_drop_events_fn(include={"severity": "info"})(t)
    assert out["text"].to_pylist() == ["y"]


def test_prep_ansi_and_truncate():
    t = tbl(text=["\x1b[31mred\x1b[0m tail"], role=["u"])
    out = make_prep_fn(max_size=8)(t)
    assert out["text"][0].as_py() == "red tail"


def test_route_first_match_and_default():
    # logSourceToIndexMapper.js:24-49 first-match + default index
    t = tbl(logSource=["user", "assistant", "tool", "weird"])
    cfg = RouteConfig([("s_u", "^user$"), ("s_a", "^(assistant|system)$"),
                       ("s_t", "^tool$")], default_sink="s_d")
    out = route_batch(t, cfg)
    assert out["sink"].to_pylist() == ["s_u", "s_a", "s_t", "s_d"]


def test_route_drop_unmatched_and_index_override():
    # elasticsearch.js:181-186 (_index precedence), :193-195 (drop)
    t = tbl(logSource=["user", "weird"], _index=[None, None])
    cfg = RouteConfig([("s_u", "^user$")], drop_unmatched=True)
    out = route_batch(t, cfg)
    assert out["sink"].to_pylist() == ["s_u"]
    t2 = tbl(logSource=["user"], _index=["forced"])
    out2 = route_batch(t2, RouteConfig([("s_u", "^user$")]))
    assert out2["sink"].to_pylist() == ["forced"]


def _ts(*days):
    import datetime as dt
    return pa.array([dt.datetime(2024, 1, d, 10, 0, 0) for d in days],
                    pa.timestamp("us"))


def test_route_date_templated_index_names():
    # applyDateFormatToIndex (elasticsearch.js:227-241): YYYY/MM/DD in
    # the index name expand per row from the event time; applies to
    # routed names, the default, and _index overrides alike
    t = pa.table({"logSource": pa.array(["user", "user", "weird"]),
                  "@timestamp": _ts(5, 6, 7)})
    cfg = RouteConfig([("logs-YYYY.MM.DD", "^user$")],
                      default_sink="other-YYYY.MM")
    out = route_batch(t, cfg)
    assert out["sink"].to_pylist() == [
        "logs-2024.01.05", "logs-2024.01.06", "other-2024.01"]
    t2 = pa.table({"logSource": pa.array(["user"]),
                   "_index": pa.array(["forced-YYYY"]),
                   "@timestamp": _ts(5)})
    out2 = route_batch(t2, RouteConfig([("s_u", "^user$")]))
    assert out2["sink"].to_pylist() == ["forced-2024"]


def test_route_fanout_receivers():
    # multi-receiver fan-out (elasticsearch.js:210-224): each row goes
    # to its routed sink AND once per receiver index
    from logagent_js_ray.stages.route import make_fanout_fn
    t = pa.table({"logSource": pa.array(["user", "tool"]),
                  "@timestamp": _ts(5, 6)})
    routed = route_batch(t, RouteConfig([("s_u", "^user$")],
                                        default_sink="s_d"))
    out = make_fanout_fn(["audit-YYYY.MM", "mirror"])(routed)
    assert out.num_rows == 6
    assert sorted(out["sink"].to_pylist()) == sorted(
        ["s_u", "s_d", "audit-2024.01", "audit-2024.01",
         "mirror", "mirror"])


def test_route_null_logsource_keeps_index_override():
    import pyarrow as pa
    from logagent_js_ray.stages.route import RouteConfig, route_batch
    b = pa.table({"logSource": pa.array([None, "web"], pa.string()),
                  "_index": pa.array(["my-index", None], pa.string())})
    out = route_batch(b, RouteConfig([("s_web", "web")]))
    # null logSource must not erase the precedence-1 override (regression:
    # non-Kleene and_ propagated null through if_else)
    assert out["sink"].to_pylist() == ["my-index", "s_web"]


def test_route_date_template_null_ts_keeps_literal():
    import pyarrow as pa
    from logagent_js_ray.stages.route import RouteConfig, route_batch
    import datetime
    b = pa.table({
        "logSource": pa.array(["web", "web"], pa.string()),
        "@timestamp": pa.array([datetime.datetime(2024, 3, 7), None],
                               pa.timestamp("us"))})
    cfg = RouteConfig([("logs-YYYY.MM.DD", "web")], drop_unmatched=True)
    out = route_batch(b, cfg)
    # matched rows with null ts keep the literal template, never dropped
    assert out["sink"].to_pylist() == ["logs-2024.03.07", "logs-YYYY.MM.DD"]


def test_grep_null_text_and_source_pass():
    import pyarrow as pa
    from logagent_js_ray.stages.filters import make_grep_fn
    b = pa.table({"role": pa.array(["app", None, "app"], pa.string()),
                  "text": pa.array(["keep this", "ungated row", None],
                                   pa.string())})
    out = make_grep_fn(include="keep", match_source="app")(b)
    # null source = not gated -> passes; null text in gated source = no
    # match -> dropped; matching row kept
    assert out["text"].to_pylist() == ["keep this", "ungated row"]


def test_grep_and_drop_handle_empty_batch():
    import pyarrow as pa
    from logagent_js_ray.stages.filters import (make_drop_events_fn,
                                                make_grep_fn)
    empty = pa.table({"role": pa.array([], pa.string()),
                      "text": pa.array([], pa.string())})
    assert make_grep_fn(include="x")(empty).num_rows == 0
    assert make_drop_events_fn(include={"text": "x"})(empty).num_rows == 0


def test_parse_receiver_list():
    """parser.js:8-29 rebuild: comma-separated url/index entries;
    non-matching entries map to None exactly like the reference."""
    from logagent_js_ray.stages.route import parse_receiver_list
    assert parse_receiver_list(None) is None
    assert parse_receiver_list("") is None
    got = parse_receiver_list(
        "http://host-a:9200/logs-a,https://host-b/audit-YYYY.MM,garbage")
    assert got == [{"url": "http://host-a:9200", "index": "logs-a"},
                   {"url": "https://host-b", "index": "audit-YYYY.MM"},
                   None]


def test_route_fanout_dict_receivers_carry_url():
    import datetime

    import pyarrow as pa
    from logagent_js_ray.stages.route import make_fanout_fn
    b = pa.table({
        "sink": pa.array(["primary", "primary"], pa.string()),
        "@timestamp": pa.array([datetime.datetime(2024, 3, 7)] * 2,
                               pa.timestamp("us"))})
    fan = make_fanout_fn([{"url": "http://h1", "index": "logs-a"},
                          {"url": "http://h2", "index": "audit-YYYY.MM"}])
    out = fan(b)
    assert out.num_rows == 6  # primary + 2 receivers per row
    assert out["sink"].to_pylist() == (
        ["primary"] * 2 + ["logs-a"] * 2 + ["audit-2024.03"] * 2)
    # the receiver url rides along per row; primary rows carry null
    assert out["receiver_url"].to_pylist() == (
        [None] * 2 + ["http://h1"] * 2 + ["http://h2"] * 2)
