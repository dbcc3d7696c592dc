"""YAML config loader + CLI + event-time windows."""

import json
import subprocess
import sys

import pandas as pd
import pytest

REPO = "/root/repo"


def test_load_config(tmp_path):
    from logagent_js_ray.config import load_config
    cfgf = tmp_path / "p.yml"
    cfgf.write_text("""
input:
  parquet: {path: /data/in}
options:
  patterns: [/abs/extra.yml]
inputFilter:
  - grep: {include: foo, matchSource: '^user$'}
outputFilter:
  - hashFields: {fields: [email], algorithm: md5}
  - ipTruncateFields: {fields: [ip]}
  - removeFields: {fields: [secret]}
  - enrich: {catalog: /abs/cat.parquet, detectSeverity: true}
output:
  sinks:
    dir: /out
    dropUnmatched: true
    routes:
      - {name: s1, match: '^a$'}
""")
    cfg = load_config(str(cfgf))
    assert cfg.input_path == "/data/in"
    assert cfg.pattern_files == ["/abs/extra.yml"]
    assert cfg.grep[0]["include"] == "foo"
    assert cfg.mask.hash_fields == ["email"] and cfg.mask.algo == "md5"
    assert cfg.mask.ip_fields == ["ip"]
    assert cfg.mask.remove_fields == ["secret"]
    assert cfg.catalog == "/abs/cat.parquet" and cfg.detect_severity
    assert cfg.routes == [("s1", "^a$")] and cfg.drop_unmatched
    assert cfg.out_dir == "/out"


def test_load_config_library_alias(tmp_path):
    from logagent_js_ray.config import load_config
    from logagent_js_ray.registry import LIBRARY_PATTERNS
    cfgf = tmp_path / "p.yml"
    cfgf.write_text("input:\n  parquet: {path: /d}\n"
                    "options:\n  patterns: [library]\n")
    assert load_config(str(cfgf)).pattern_files == [LIBRARY_PATTERNS]


def test_cli_end_to_end(sf_small, tmp_path):
    """Full CLI run in a subprocess (owns its own Ray session)."""
    out = subprocess.run(
        [sys.executable, "-m", "logagent_js_ray", "--glob", sf_small,
         "--out", str(tmp_path / "sinks"), "--num-cpus", "4"],
        capture_output=True, text=True, env={"PYTHONPATH": REPO,
                                             "PATH": "/usr/bin:/bin",
                                             "HOME": "/root"},
        cwd=REPO, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    assert sum(stats["sinks"].values()) == 5000


def test_sessionize(ray_session):
    import ray.data
    from logagent_js_ray.ops.windows import sessionize
    rows = []
    base = pd.Timestamp("2025-01-01")
    # user 1: two sessions (40-min gap); user 2: one session
    for mins, v in [(0, 1.0), (10, 2.0), (50, 3.0)]:
        rows.append({"user_id": 1, "ts": base + pd.Timedelta(minutes=mins),
                     "value": v})
    rows.append({"user_id": 2, "ts": base, "value": 9.0})
    out = sessionize(ray.data.from_items(rows)).to_pandas() \
        .sort_values(["user_id", "session_id"]).reset_index(drop=True)
    assert out["n_events"].tolist() == [2, 1, 1]
    assert out["session_id"].tolist() == [0, 1, 0]
    assert out["sum_value_cents"].tolist() == [300, 300, 900]


def test_tumbling(ray_session):
    import ray.data
    from logagent_js_ray.ops.windows import tumbling
    base = pd.Timestamp("2025-01-01")
    rows = [{"k": "a", "ts": base + pd.Timedelta(minutes=m)} for m in
            (0, 5, 20, 65)]
    out = tumbling(ray.data.from_items(rows), key="k", minutes=15) \
        .to_pandas().sort_values("window").reset_index(drop=True)
    assert out["n"].tolist() == [2, 1, 1]


def test_config_full_wiring(ray_session, tmp_path):
    """Every parsed config option must actually act on the pipeline:
    lines input, inputFilter grep, defaultSink, dropEvents, per-field
    lowercase (regression: these were parsed but silently ignored)."""
    import yaml

    from logagent_js_ray.config import load_config
    from logagent_js_ray.pipelines.flagship import build_routed
    from logagent_js_ray.sources.transcripts import read_lines
    log = tmp_path / "app.log"
    log.write_text("keep info one\ndiscard me\nkeep ERROR two\n")
    cfgf = tmp_path / "pipe.yml"
    cfgf.write_text(yaml.safe_dump({
        "input": {"lines": {"path": str(log)}},
        "inputFilter": [{"grep": {"exclude": "discard"}}],
        "outputFilter": [
            {"lowercaseFields": {"fields": [{"fieldName": "_type"}]}},
        ],
        "output": {"sinks": {
            "routes": [],
            "defaultSink": "my_default",
        }},
    }))
    cfg = load_config(cfgf)
    assert cfg.input_kind == "lines"
    assert cfg.default_sink == "my_default"
    assert cfg.grep == [{"include": None, "exclude": "discard",
                         "match_source": None}]
    assert cfg.mask.lowercase == ["_type"]
    ds = build_routed(read_lines(cfg.input_path), mask=cfg.mask,
                      routes=cfg.routes or [("never", "^zzz$")],
                      default_sink=cfg.default_sink,
                      input_grep=cfg.grep, concurrency=(1, 2))
    rows = ds.take_all()
    texts = sorted(r["text"] for r in rows)
    assert texts == ["keep ERROR two", "keep info one"]  # grep applied
    assert all(r["sink"] == "my_default" for r in rows)  # defaultSink

    # dropEvents post-filter
    ds2 = build_routed(read_lines(str(log)),
                       routes=[("s", ".*")], concurrency=(1, 2),
                       drop_events={"exclude": {"text": "ERROR"}})
    assert sorted(r["text"] for r in ds2.take_all()) == \
        ["discard me", "keep info one"]


def test_config_geoip_block(tmp_path):
    """outputFilter geoip: {mmdb | blocksCsv/locationsCsv, field} parses
    with config-relative path resolution."""
    import yaml

    from logagent_js_ray.config import load_config
    cfgf = tmp_path / "g.yml"
    cfgf.write_text(yaml.safe_dump({
        "input": {"parquet": {"path": "/data/in"}},
        "outputFilter": [
            {"geoip": {"mmdb": "GeoLite2-City.mmdb", "field": "ip"}},
        ],
    }))
    cfg = load_config(str(cfgf))
    assert cfg.geoip == {"field": "ip",
                         "mmdb": str(tmp_path / "GeoLite2-City.mmdb")}
    cfgf.write_text(yaml.safe_dump({
        "input": {"parquet": {"path": "/data/in"}},
        "outputFilter": [{"geoip": {
            "blocksCsv": "/abs/blocks.csv",
            "locationsCsv": "/abs/locs.csv"}}],
    }))
    cfg = load_config(str(cfgf))
    assert cfg.geoip == {"field": "client_ip",
                         "blocksCsv": "/abs/blocks.csv",
                         "locationsCsv": "/abs/locs.csv"}


def test_config_geoip_end_to_end(ray_session, sf_small,
                                 tool_catalog_path):
    """build_routed(geoip=...) appends geo_* columns from the snapshot:
    parsed access-log rows (client_ip present) resolve, others null."""
    from logagent_js_ray.pipelines.flagship import build_routed
    from logagent_js_ray.sources.geolite import ensure_geolite_fixture
    blocks, locs = ensure_geolite_fixture()
    ds = build_routed(sf_small, tool_catalog=tool_catalog_path,
                      concurrency=(1, 2),
                      geoip={"field": "client_ip",
                             "blocksCsv": blocks, "locationsCsv": locs})
    df = ds.take_batch(4096, batch_format="pandas")
    assert "geo_country" in df.columns and "geo_lat" in df.columns
    with_ip = df[df["client_ip"].notna()]
    assert len(with_ip) > 0
    # fixture snapshot covers the full IPv4 space -> every IP resolves
    assert with_ip["geo_country"].notna().all()
    assert df.loc[df["client_ip"].isna(), "geo_country"].isna().all()


def test_cli_sql_filter(sf_small, tmp_path):
    """The reference's literal sql output-filter config line drives the
    distributed sql_select plan from the CLI (sql.js:10-53)."""
    cfgp = tmp_path / "sql.yml"
    cfgp.write_text(
        "input:\n"
        f"  parquet: {{path: {sf_small}}}\n"
        "outputFilter:\n"
        "  - sql:\n"
        "      query: \"SELECT sink, COUNT(*) AS n FROM ? GROUP BY sink\"\n"
        "  - sql: \"SELECT sink, SUM(size) AS s FROM ? "
        "WHERE size > 40 GROUP BY sink HAVING s > 0\"\n"
        "output:\n"
        f"  sinks: {{dir: {tmp_path / 'sinks'}}}\n")
    out = subprocess.run(
        [sys.executable, "-m", "logagent_js_ray", "--config", str(cfgp),
         "--num-cpus", "4"],
        capture_output=True, text=True, env={"PYTHONPATH": REPO,
                                             "PATH": "/usr/bin:/bin",
                                             "HOME": "/root"},
        cwd=REPO, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    counts = stats["sql"]["SELECT sink, COUNT(*) AS n FROM ? GROUP BY sink"]
    assert sum(r["n"] for r in counts) == 5000
    assert stats["sinks"] == {r["sink"]: r["n"] for r in counts}
    sums = next(v for k, v in stats["sql"].items() if "SUM" in k)
    assert all(r["s"] > 0 for r in sums)
