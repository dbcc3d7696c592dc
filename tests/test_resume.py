"""Resume-from-checkpoint equivalence (FIXTURES.md §6): an interrupted
run resumed must produce the same sink contents + aggregates as an
uninterrupted run, without re-executing completed partitions."""

import json
import os

import pyarrow.dataset as pads
import pytest


def sorted_rows(out_dir):
    ds = pads.dataset(out_dir, partitioning="hive",
                      ignore_prefixes=[".", "_", "manifest"])
    df = ds.to_table().to_pandas()
    df["sink"] = df["sink"].astype(str)
    df["partition"] = df["partition"].astype(str)
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def test_checkpointed_run_and_resume(ray_session, sf_small,
                                     tool_catalog_path, tmp_path):
    from logagent_js_ray.sources.transcripts import list_fragments
    from logagent_js_ray.state.manifest import Manifest, run_checkpointed

    frags = list_fragments(sf_small)
    assert len(frags) >= 3

    # uninterrupted reference run
    full_dir = str(tmp_path / "full")
    ref = run_checkpointed(sf_small, full_dir,
                           tool_catalog=tool_catalog_path)
    assert ref["ran"] == len(frags) and ref["skipped"] == 0
    assert ref["rows_in"] == ref["rows_out"] > 0

    # interrupted run: only the first 2 fragments completed
    resume_dir = str(tmp_path / "resume")
    first_two = os.path.dirname(frags[0])
    run_checkpointed(frags[:2], resume_dir, tool_catalog=tool_catalog_path)
    man = Manifest(os.path.join(resume_dir, "manifest.jsonl"))
    assert len(man.load()) == 2

    # record completed-partition file mtimes, then resume the full input
    pre = {}
    for pid in list(man.load()):
        pdir = os.path.join(resume_dir, f"partition={pid}")
        pre[pid] = {f: os.path.getmtime(os.path.join(r, f))
                    for r, _, fs in os.walk(pdir) for f in fs}
    res = run_checkpointed(sf_small, resume_dir,
                           tool_catalog=tool_catalog_path)
    assert res["skipped"] == 2
    assert res["ran"] == len(frags) - 2

    # completed partitions were NOT rewritten
    for pid, files in pre.items():
        pdir = os.path.join(resume_dir, f"partition={pid}")
        now = {f: os.path.getmtime(os.path.join(r, f))
               for r, _, fs in os.walk(pdir) for f in fs}
        assert now == files

    # identical content + identical aggregate counters
    a, b = sorted_rows(full_dir), sorted_rows(resume_dir)
    assert a.equals(b)
    assert res["sinks"] == ref["sinks"]
    assert res["rows_out"] == ref["rows_out"]


def test_registry_change_invalidates_checkpoint(ray_session, sf_small,
                                                tool_catalog_path, tmp_path):
    """A manifest line from a different pattern-registry version must not
    be treated as complete (lineage includes the registry)."""
    from logagent_js_ray.state.manifest import Manifest, run_checkpointed
    out = str(tmp_path / "out")
    run_checkpointed(sf_small, out, tool_catalog=tool_catalog_path)
    man = Manifest(os.path.join(out, "manifest.jsonl"))
    recs = man.load()
    # forge stale registry versions
    with open(man.path, "w") as f:
        for rec in recs.values():
            rec["registry_version"] = "stale000"
            f.write(json.dumps(rec) + "\n")
    res = run_checkpointed(sf_small, out, tool_catalog=tool_catalog_path)
    assert res["skipped"] == 0 and res["ran"] == len(recs)


def test_read_lines_per_file_offsets(ray_session, tmp_path):
    # line numbers must be true per-file offsets even for files longer
    # than one read batch (regression: per-batch range() restarted them)
    from logagent_js_ray.sources.transcripts import read_lines
    f = tmp_path / "big.log"
    f.write_text("\n".join(f"line-{i}" for i in range(3000)))
    rows = read_lines(str(f)).take_all()
    assert len(rows) == 3000
    by_idx = {r["turn_idx"]: r["text"] for r in rows}
    assert len(by_idx) == 3000  # no duplicate turn_idx
    assert by_idx[0] == "line-0" and by_idx[2999] == "line-2999"
    assert rows[0]["conv_id"] == "big.log"


def test_coalesced_passes_match_single_fragment_passes(
        ray_session, sf_small, tool_catalog_path, tmp_path):
    """frags_per_pass>1 (coalesced Dataset passes; round-2 verdict item)
    must write byte-identical partition contents and manifest rows to
    the one-fragment-per-pass path, and resume must still skip at
    FRAGMENT granularity mid-group."""
    from logagent_js_ray.sources.transcripts import list_fragments
    from logagent_js_ray.state.manifest import Manifest, run_checkpointed

    frags = list_fragments(sf_small)
    a_dir, b_dir = str(tmp_path / "one"), str(tmp_path / "many")
    ra = run_checkpointed(sf_small, a_dir, frags_per_pass=1,
                          tool_catalog=tool_catalog_path)
    rb = run_checkpointed(sf_small, b_dir, frags_per_pass=3,
                          tool_catalog=tool_catalog_path)
    assert ra["sinks"] == rb["sinks"]
    assert ra["rows_out"] == rb["rows_out"]
    assert sorted_rows(a_dir).equals(sorted_rows(b_dir))
    man_a = Manifest(os.path.join(a_dir, "manifest.jsonl")).load()
    man_b = Manifest(os.path.join(b_dir, "manifest.jsonl")).load()
    assert set(man_a) == set(man_b) == {
        os.path.splitext(os.path.basename(f))[0] for f in frags}
    for pid in man_a:
        assert man_a[pid]["sinks"] == man_b[pid]["sinks"]
        assert man_a[pid]["rows_in"] == man_b[pid]["rows_in"]

    # mid-group resume: complete ONE fragment, then run coalesced —
    # the completed fragment must be skipped, the rest grouped
    c_dir = str(tmp_path / "mid")
    run_checkpointed(frags[:1], c_dir, tool_catalog=tool_catalog_path)
    res = run_checkpointed(sf_small, c_dir, frags_per_pass=3,
                           tool_catalog=tool_catalog_path)
    assert res["skipped"] == 1 and res["ran"] == len(frags) - 1
    assert sorted_rows(c_dir).equals(sorted_rows(a_dir))


def test_checkpointed_relative_path_and_escaped_fragment(
        ray_session, sf_small, tool_catalog_path, tmp_path, monkeypatch):
    """Two review regressions: (a) a RELATIVE input path must work even
    though Ray include_paths resolves to absolute paths; (b) a fragment
    whose basename needs hive escaping (space) must keep its rows — the
    old rename-by-constructed-name would silently ship an empty dir."""
    import shutil

    import pyarrow.parquet as pq

    from logagent_js_ray.sources.transcripts import list_fragments
    from logagent_js_ray.state.manifest import run_checkpointed

    frags = list_fragments(sf_small)
    src_dir = tmp_path / "in dir"
    src_dir.mkdir()
    shutil.copy(frags[0], src_dir / "part with space.parquet")
    out = tmp_path / "out"
    monkeypatch.chdir(tmp_path)
    res = run_checkpointed(os.path.join("in dir"), str(out),
                           tool_catalog=tool_catalog_path)
    want = pq.read_metadata(frags[0]).num_rows
    assert res["ran"] == 1
    assert res["rows_in"] == res["rows_out"] == want
    assert sorted_rows(str(out)).shape[0] == want
