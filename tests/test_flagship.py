"""End-to-end flagship pipeline vs. the pure-Python oracle on the
sf0.001 transcript fixture (FIXTURES.md §4 assertions): per-turn text
equality under (conv_id, turn_idx) ordering, routed-row counts per sink,
and per-sink aggregate equality."""

import pyarrow.parquet as pq
import pytest

from logagent_js_ray.pipelines.flagship import (DEFAULT_ROUTES, build_routed,
                                                aggregate_cube,
                                                marginals_from_cube,
                                                run_flagship)


@pytest.fixture(scope="module")
def oracle_result(sf_small, tool_catalog_path):
    from logagent_js_ray.oracle.pyoracle import run_oracle
    from logagent_js_ray.sources.transcripts import list_fragments
    rows = []
    for f in list_fragments(sf_small):
        rows.extend(pq.read_table(f).to_pylist())
    cat_tbl = pq.read_table(tool_catalog_path).to_pylist()
    catalog = {r["tool"]: {"tool_family": r["tool_family"],
                           "cost_tier": r["cost_tier"]} for r in cat_tbl}
    return run_oracle(rows, DEFAULT_ROUTES, catalog=catalog)


@pytest.fixture(scope="module")
def routed_df(ray_session, sf_small, tool_catalog_path):
    ds = build_routed(sf_small, tool_catalog=tool_catalog_path)
    return ds.sort(["conv_id", "turn_idx"]).to_pandas()


def test_row_counts_and_order(routed_df, oracle_result):
    ev = oracle_result["events"]
    assert len(routed_df) == len(ev)
    # per-turn text + message equality under stable ordering
    for i in (0, 1, len(ev) // 2, len(ev) - 1):
        assert routed_df.iloc[i]["conv_id"] == ev[i]["conv_id"]
        assert routed_df.iloc[i]["turn_idx"] == ev[i]["turn_idx"]


def test_per_turn_text_equality(routed_df, oracle_result):
    ev = oracle_result["events"]
    got_text = routed_df["text"].tolist()
    got_msg = routed_df["message"].tolist()
    for i, e in enumerate(ev):
        assert got_text[i] == e["text"], (i, e["conv_id"], e["turn_idx"])
        assert got_msg[i] == e["message"]


def test_routed_counts_per_sink(routed_df, oracle_result):
    got = routed_df.groupby("sink").size().to_dict()
    want = {}
    for e in oracle_result["events"]:
        want[e["sink"]] = want.get(e["sink"], 0) + 1
    assert got == want


def test_enrichment_columns(routed_df):
    tools = routed_df[routed_df["tool"] == "python"]
    assert (tools["tool_family"] == "code").all()
    assert (routed_df[routed_df["tool"] == "none"]["cost_tier"] == "free").all()


def test_masking_applied_e2e(routed_df, oracle_result):
    import hashlib
    piis = routed_df[routed_df["_type"] == "login_event"]
    assert len(piis) > 0
    for v in piis["user_email"]:
        assert "@" not in v and len(v) == 64  # sha256 hex
    for v in piis["client_ip"]:
        assert v.endswith(".0")


def test_aggregates_match_oracle(ray_session, sf_small, tool_catalog_path,
                                 oracle_result):
    ds = build_routed(sf_small, tool_catalog=tool_catalog_path)
    cube = aggregate_cube(ds)
    marg = marginals_from_cube(cube)
    by_role = {(r["sink"], r["role"]): r["n"]
               for r in marg["by_role"].to_dict("records")}
    assert by_role == dict(oracle_result["by_role"])
    by_tool = {(r["sink"], r["tool"]): r["n"]
               for r in marg["by_tool"].to_dict("records")}
    assert by_tool == dict(oracle_result["by_tool"])
    by_bucket = {(r["sink"], r["time_bucket"].to_pydatetime()): r["n"]
                 for r in marg["by_bucket"].to_dict("records")}
    assert by_bucket == dict(oracle_result["by_bucket"])
    sum_size = {r["sink"]: r["sum_size"]
                for r in marg["sum_size"].to_dict("records")
                if r["sum_size"] is not None and r["sum_size"] == r["sum_size"]}
    want = {k: v for k, v in oracle_result["sum_size"].items()}
    assert sum_size == pytest.approx(want)


def test_run_flagship_writes_sinks(ray_session, sf_small, tool_catalog_path,
                                   tmp_path, oracle_result):
    res = run_flagship(sf_small, out_dir=str(tmp_path / "sinks"),
                       tool_catalog=tool_catalog_path)
    import glob
    sink_dirs = sorted(glob.glob(str(tmp_path / "sinks" / "sink=*")))
    want_sinks = sorted({e["sink"] for e in oracle_result["events"]})
    assert [d.split("sink=")[-1] for d in sink_dirs] == want_sinks
    total = sum(pq.read_table(f).num_rows
                for f in glob.glob(str(tmp_path / "sinks" / "**" / "*.parquet"),
                                   recursive=True))
    assert total == len(oracle_result["events"])


def test_enricher_duplicate_keys_last_wins(ray_session):
    """A catalog with duplicate keys must enrich with the LAST row (the
    historical dict-build semantics), not index_in's first match."""
    import pyarrow as pa
    from logagent_js_ray.stages.enrich import Enricher
    lookup = pa.table({
        "tool": pa.array(["bash", "bash", "sql"]),
        "cost": pa.array(["stale", "fresh", "x"])})
    e = Enricher(lookup, key="tool")
    out = e(pa.table({"tool": pa.array(["bash", "sql", "nope"])}))
    assert out["cost"].to_pylist() == ["fresh", "x", None]


def test_watch_patterns_hot_reload(ray_session, tool_catalog_path,
                                   tmp_path):
    """Pattern hot-reload (mergePatternFiles.js:57-71 fs.watch rebuild):
    with watch_patterns=True an edited pattern file is recompiled at the
    actor's next batch; without it the __init__ registry stays pinned
    (one registry version per run — the checkpoint-lineage default)."""
    import os
    import time

    import pyarrow as pa
    from logagent_js_ray.pipelines.fused import FlagshipStage
    from logagent_js_ray.stages.enrich import put_lookup

    def pattern(tname):
        return ("patterns:\n"
                "  - source: user\n"
                "    match:\n"
                f"      - type: {tname}\n"
                "        regex: '^EV (?P<val>\\d+)$'\n")

    yml = tmp_path / "watch.yml"
    yml.write_text(pattern("v1_event"))
    b = pa.table({
        "conv_id": pa.array(["c"]), "turn_idx": pa.array([0], pa.int32()),
        "role": pa.array(["user"]), "text": pa.array(["EV 42"]),
        "tool": pa.array(["none"]),
        "ts": pa.array([0], pa.timestamp("us"))})
    kwargs = dict(mask_cfg=None, routes=[("s", ".*")],
                  pattern_paths=[str(yml)])
    ref = put_lookup(tool_catalog_path)
    watched = FlagshipStage(ref, watch_patterns=True, **kwargs)
    pinned = FlagshipStage(ref, **kwargs)
    assert watched(b)["_type"][0].as_py() == "v1_event"
    assert pinned(b)["_type"][0].as_py() == "v1_event"
    time.sleep(0.02)  # ensure a distinct mtime_ns
    yml.write_text(pattern("v2_event"))
    os.utime(yml)
    assert watched(b)["_type"][0].as_py() == "v2_event"  # reloaded
    assert pinned(b)["_type"][0].as_py() == "v1_event"   # stays pinned
