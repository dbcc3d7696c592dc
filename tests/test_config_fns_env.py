"""Callable config values ($fn: registry) and the reference's pattern
environment switches (SCAN_ALL_PATTERNS / PATTERN_MATCHING_ENABLED /
DISABLE_DEFAULT_PATTERNS / PATTERNS_URL) — round-2 verdict missing
items #2 and #3."""

import pyarrow as pa
import pytest


def _batch():
    return pa.table({
        "logSource": pa.array(["app.log", "db.log", "APP.log", None]),
        "severity": pa.array(["error", None, "info", "fatal"]),
        "text": pa.array(["a", "b", "c", "d"]),
    })


def test_fn_ref_resolution_and_errors():
    from logagent_js_ray.functions.config_fns import (
        CONFIG_FNS, is_fn_ref, resolve_config_value)
    assert is_fn_ref("$fn:index_by_severity")
    assert is_fn_ref({"$fn": "index_by_severity"})
    assert not is_fn_ref("plain-sink")
    fn = resolve_config_value("$fn:index_by_severity")
    assert fn is CONFIG_FNS["index_by_severity"]
    assert resolve_config_value("logs-x") == "logs-x"
    with pytest.raises(KeyError, match="not registered"):
        resolve_config_value("$fn:nope_missing")


def test_route_with_callable_sink_name():
    """A route's sink name as a per-event function — the no-eval
    analogue of elasticsearch.js:180's index-as-function."""
    from logagent_js_ray.stages.route import RouteConfig, route_batch
    cfg = RouteConfig([("$fn:index_by_severity", r"\.log$")],
                      default_sink="other")
    out = route_batch(_batch(), cfg)
    assert out["sink"].to_pylist() == [
        "logs-error", "logs-std", "logs-std", "other"]


def test_route_with_callable_default_sink():
    from logagent_js_ray.stages.route import RouteConfig, route_batch
    cfg = RouteConfig([("named", r"^db\.")],
                      default_sink="$fn:index_by_source_basename")
    out = route_batch(_batch(), cfg)
    assert out["sink"].to_pylist() == ["app.log", "named", "app.log", None]


def test_custom_registered_fn_roundtrip():
    from logagent_js_ray.functions.config_fns import (CONFIG_FNS,
                                                      register_config_fn)
    from logagent_js_ray.stages.route import RouteConfig, route_batch

    @register_config_fn("test_upper_source")
    def _upper(batch):
        import pyarrow.compute as pc
        return pc.utf8_upper(pc.cast(batch["logSource"], pa.string()))

    try:
        cfg = RouteConfig([("$fn:test_upper_source", "(?i)app")],
                          default_sink="d")
        out = route_batch(_batch(), cfg)
        assert out["sink"].to_pylist() == ["APP.LOG", "d", "APP.LOG", "d"]
    finally:
        CONFIG_FNS.pop("test_upper_source", None)


# ------------------------------------------------------ env switches

def test_pattern_matching_enabled_false(monkeypatch):
    from logagent_js_ray.registry import load_registry
    from logagent_js_ray.stages.parse import parse_batch
    monkeypatch.setenv("PATTERN_MATCHING_ENABLED", "false")
    reg = load_registry()
    assert reg.all_entries() == []
    b = pa.table({
        "conv_id": pa.array(["c"] * 2), "turn_idx": pa.array([0, 1]),
        "role": pa.array(["user", "user"]),
        "tool": pa.array(["none", "none"]),
        "ts": pa.array([0, 0], pa.timestamp("us")),
        "text": pa.array(['{"msg": "hi", "counter": 2}', "plain line"]),
    })
    out = parse_batch(b, reg)
    types = out["_type"].to_pylist()
    # JSON fast path still runs; everything else is the fallback record
    assert "json" in types[0] or types[0] is not None
    assert out.num_rows == 2


def test_scan_all_patterns(monkeypatch):
    from logagent_js_ray.registry import load_registry
    base = load_registry()
    gated = base.entries_for_source("no-such-source-xyz")
    monkeypatch.setenv("SCAN_ALL_PATTERNS", "1")
    reg = load_registry()
    assert reg.scan_all
    assert len(reg.entries_for_source("no-such-source-xyz")) == \
        len(reg.all_entries()) >= len(gated)


def test_disable_default_patterns(monkeypatch):
    from logagent_js_ray.registry import load_registry
    monkeypatch.setenv("DISABLE_DEFAULT_PATTERNS", "true")
    reg = load_registry()
    assert reg.all_entries() == []


def test_patterns_url_local_file(monkeypatch, tmp_path):
    from logagent_js_ray.registry import load_registry
    p = tmp_path / "extra.yml"
    p.write_text(
        "patterns:\n"
        "  - source: envsrc\n"
        "    match:\n"
        "      - type: env_extra\n"
        "        regex: '^X (?P<xval>\\d+)$'\n")
    monkeypatch.setenv("PATTERNS_URL", f"file://{p}")
    reg = load_registry()
    assert any(e.type == "env_extra" for e in reg.all_entries())
    # merged FIRST (user/remote precedence, mergePatternFiles.js:48)
    assert reg.groups[0].match[0].type == "env_extra"


def test_patterns_url_http_refused(monkeypatch):
    from logagent_js_ray.registry import load_registry
    monkeypatch.setenv("PATTERNS_URL", "https://example.com/p.yml")
    with pytest.raises(RuntimeError, match="no network"):
        load_registry()


def test_scan_all_patterns_affects_parse_batch(monkeypatch, tmp_path):
    """SCAN_ALL_PATTERNS must disable the source gate in the PIPELINE
    parse loop, not only in entries_for_source (review regression)."""
    from logagent_js_ray.registry import PatternRegistry
    from logagent_js_ray.stages.parse import parse_batch
    yml = tmp_path / "p.yml"
    yml.write_text(
        "patterns:\n"
        "  - source: only-this-source\n"
        "    match:\n"
        "      - type: gated\n"
        "        regex: '^HIT (?P<val>\\d+)$'\n")
    b = pa.table({
        "conv_id": pa.array(["c"]), "turn_idx": pa.array([0]),
        "role": pa.array(["other-source"]),
        "tool": pa.array(["none"]),
        "ts": pa.array([0], pa.timestamp("us")),
        "text": pa.array(["HIT 42"])})
    gated = parse_batch(b, PatternRegistry([str(yml)]))
    assert gated["_type"][0].as_py() != "gated"  # gate holds
    monkeypatch.setenv("SCAN_ALL_PATTERNS", "1")
    open_reg = PatternRegistry([str(yml)])
    out = parse_batch(b, open_reg)
    assert out["_type"][0].as_py() == "gated"  # gate bypassed


def test_registry_version_env_sensitive(monkeypatch):
    from logagent_js_ray.state.manifest import registry_version
    base = registry_version()
    monkeypatch.setenv("PATTERN_MATCHING_ENABLED", "false")
    assert registry_version() != base
    monkeypatch.delenv("PATTERN_MATCHING_ENABLED")
    monkeypatch.setenv("DISABLE_DEFAULT_PATTERNS", "1")
    assert registry_version() != base


def test_config_geoip_validation_errors(tmp_path):
    import yaml

    from logagent_js_ray.config import load_config
    cfgf = tmp_path / "bad.yml"
    cfgf.write_text(yaml.safe_dump({
        "input": {"parquet": {"path": "/x"}},
        "outputFilter": [{"geoip": {"field": "ip"}}]}))
    with pytest.raises(ValueError, match="geoip needs either"):
        load_config(str(cfgf))
    cfgf.write_text(yaml.safe_dump({
        "input": {"parquet": {"path": "/x"}},
        "outputFilter": [{"geoip": {"blocksCsv": "/b.csv"}}]}))
    with pytest.raises(ValueError, match="locationsCsv"):
        load_config(str(cfgf))


def test_json_enrichment_disabled(monkeypatch):
    """JSON_ENRICHMENT_ENABLED=false (parser.js:41,397-399): the JSON
    fast path returns the RAW object — no bunyan msg/level/time remap,
    no severity, 'v' kept in the extras."""
    import json as _json

    from logagent_js_ray.registry import PatternRegistry
    from logagent_js_ray.stages.parse import parse_batch
    line = _json.dumps({"msg": "boom", "level": 50,
                        "time": "2024-01-05T10:00:00Z", "v": 0})
    b = pa.table({
        "conv_id": pa.array(["c"]), "turn_idx": pa.array([0]),
        "role": pa.array(["user"]), "tool": pa.array(["none"]),
        "ts": pa.array([0], pa.timestamp("us")),
        "text": pa.array([line])})
    reg = PatternRegistry()
    enriched = parse_batch(b, reg)
    assert enriched["message"][0].as_py() == "boom"
    assert enriched["severity"][0].as_py() == "error"  # bunyan 50
    monkeypatch.setenv("JSON_ENRICHMENT_ENABLED", "false")
    raw = parse_batch(b, reg)
    assert raw["message"][0].as_py() is None  # no msg remap
    assert raw["severity"][0].as_py() is None
    extras = _json.loads(raw["fields_json"][0].as_py())
    assert extras["msg"] == "boom" and extras["level"] == 50
    assert extras["v"] == 0  # bunyan 'v' drop is enrichment too
    assert raw["_type"][0].as_py() == "json"


def test_multiline_default_separator_env(monkeypatch, ray_session):
    import ray.data
    from logagent_js_ray.stages.multiline import multiline_merge
    rows = pa.table({
        "conv_id": pa.array(["a"] * 3),
        "turn_idx": pa.array([0, 1, 2], pa.int32()),
        "text": pa.array(["BLK one", "cont line", "BLK two"])})
    # default ^\S: every line starts a block (none start with space)
    out = multiline_merge(ray.data.from_arrow(rows)).to_pandas()
    assert len(out) == 3
    monkeypatch.setenv("MULTILINE_DEFAULT_SEPARATOR", "^BLK ")
    out2 = multiline_merge(ray.data.from_arrow(rows)).to_pandas() \
        .sort_values("turn_idx")
    assert out2["text"].tolist() == ["BLK one\ncont line", "BLK two"]


def test_registry_version_new_env_switches(monkeypatch):
    from logagent_js_ray.state.manifest import registry_version
    base = registry_version()
    monkeypatch.setenv("JSON_ENRICHMENT_ENABLED", "false")
    assert registry_version() != base
    monkeypatch.delenv("JSON_ENRICHMENT_ENABLED")
    monkeypatch.setenv("MULTILINE_DEFAULT_SEPARATOR", "^BLK ")
    assert registry_version() != base
