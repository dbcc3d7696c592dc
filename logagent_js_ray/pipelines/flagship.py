"""Flagship pipeline: parse -> mask -> enrich -> route -> aggregate over
the transcript table — the rebuild of logagent-js's end-to-end dataflow
(input -> input-filter -> parser -> output-filter -> output plugins,
/root/reference/bin/logagent.js:653-713) as ONE lazy, streaming
``ray.data.Dataset`` chain:

  read_parquet (blocks ~ 4x CPUs)          | input plugin
  -> map_batches(FlagshipStage, actors)    | the whole filter chain,
       prep|parse|mask|enrich|route          fused; state per actor
  -> write_parquet(partition_cols=[sink])  | output plugins fan-out
  +  cube from column-pruned read-back     | sql output filter windows

The per-stage functions remain importable individually (stages/*);
pipelines/fused.py explains why the flagship fuses them into one
actor-pool operator. Aggregation: per-block partial "cube" over
(sink, role, tool, time_bucket) merged through a fan-in tree — a hot
conv_id never concentrates shuffle load because partials collapse each
block to at most one row per key (stages/aggregate.py).
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa

import ray.data

from ..fixtures import gen as fixgen
from ..sources.transcripts import read_transcripts
from ..stages.aggregate import agg_counts, make_time_bucket_fn
from ..stages.enrich import put_lookup
from ..stages.mask import MaskConfig
from ..stages.parse import json_enrichment_disabled as \
    _json_enrichment_disabled

# Default routing table — the analogue of the ES output's ``indices:``
# map over logSource (FIXTURES.md §3).
DEFAULT_ROUTES = [
    ("sink_user", "^user$"),
    ("sink_agent", "^(assistant|system)$"),
    ("sink_tools", "^tool$"),
]

DEFAULT_MASK = MaskConfig(
    hash_fields=["user_email", "token"],
    ip_fields=["client_ip"],
)

PARSE_BATCH_SIZE = 16384  # wide text rows: keep blocks well under 2 GB offsets


def build_routed(input_path,
                 pattern_paths: list[str] | None = None,
                 mask: MaskConfig | None = DEFAULT_MASK,
                 routes: list[tuple[str, str]] | None = None,
                 drop_unmatched: bool = False,
                 tool_catalog: str | None = None,
                 concurrency=None, acc=None,
                 conv_buckets: int | None = None,
                 default_sink: str = "sink_default",
                 detect_severity: bool = False,
                 input_grep: list[dict] | None = None,
                 drop_events: dict | None = None,
                 multiline: bool = False,
                 max_log_size: int | None = None,
                 geoip: dict | None = None,
                 emit: str = "rows",
                 watch_patterns: bool = False,
                 use_tasks: bool | None = None) -> "ray.data.Dataset":
    """The lazy parse->mask->enrich->route dataset (no consumption).

    One FUSED actor-pool operator carries every stage (state loaded once
    per actor; see pipelines/fused.py for why), sized to the session's
    CPUs. ``acc`` optionally wires in the cube-accumulator actor so a
    consuming write also yields the aggregates in the same pass.

    Block/batch geometry (measured in BASELINE.md): one batch per BLOCK
    (``batch_size=None``) and ~4 blocks per CPU. Ray's per-batch
    machinery costs far more than our vectorized per-row work, so fewer,
    larger batches win; 4 blocks/CPU keeps the pool load-balanced
    against stragglers without re-entering the overhead regime."""
    from .fused import FlagshipStage, pool_size
    import ray as _ray
    cpus = int(_ray.cluster_resources().get("CPU", 8)) if \
        _ray.is_initialized() else 8
    import ray.data as _rd
    if isinstance(input_path, _rd.Dataset):
        ds = input_path  # pre-built source (e.g. read_lines)
    else:
        ds = read_transcripts(input_path, override_num_blocks=cpus * 4)
    if input_grep:
        # inputFilter grep stages run over the RAW lines, pre-parse
        # (grep.js position in the reference chain)
        from ..stages.filters import make_grep_fn
        for g in input_grep:
            ds = ds.map_batches(make_grep_fn(**g), batch_format="pyarrow")
    if multiline:
        from ..stages.multiline import multiline_merge
        ds = multiline_merge(ds)
    if tool_catalog is None:
        tool_catalog = fixgen.ensure_tool_catalog()
    ref = put_lookup(tool_catalog)
    stage_kwargs = {
        "lookup_ref": ref, "mask_cfg": mask,
        "routes": routes or DEFAULT_ROUTES,
        "pattern_paths": pattern_paths,
        "drop_unmatched": drop_unmatched, "acc": acc,
        "conv_buckets": conv_buckets, "emit": emit,
        "default_sink": default_sink,
        "detect_severity": detect_severity,
        "max_log_size": max_log_size,
        "watch_patterns": watch_patterns,
        "json_raw": _json_enrichment_disabled(),  # driver env read
    }
    if use_tasks is None:
        use_tasks = os.environ.get("GRAFT_FLAGSHIP_TASKS", "1") != "0"
    if use_tasks:
        # cached-task mode (default; see fused.make_flagship_task_fn):
        # identical per-batch semantics, no fixed-pool spin-up. A tuple
        # concurrency (autoscaling-pool shape) maps to its cap.
        from .fused import make_flagship_task_fn
        import uuid
        cc = max(concurrency) if isinstance(concurrency, tuple) \
            else concurrency
        ds = ds.map_batches(
            make_flagship_task_fn(uuid.uuid4().hex, stage_kwargs),
            batch_format="pyarrow", batch_size=None, concurrency=cc)
    else:
        ds = ds.map_batches(
            FlagshipStage, fn_constructor_kwargs=stage_kwargs,
            batch_format="pyarrow", batch_size=None,
            concurrency=concurrency or pool_size())
    if drop_events:
        from ..stages.filters import make_drop_events_fn
        ds = ds.map_batches(make_drop_events_fn(
            include=drop_events.get("include"),
            exclude=drop_events.get("exclude")), batch_format="pyarrow")
    if geoip:
        # config-driven geoip output-filter (geoip.js:20-53): its own
        # actor pool AFTER the fused stage — the range table is large
        # (real snapshots ~200 MB compiled) and opt-in, so it must not
        # bloat every flagship actor. Compile ONCE on the driver and
        # broadcast via ray.put: one object-store copy per node instead
        # of up to 8 actors independently parsing the full snapshot.
        # Autoscaling pool so it coexists with the fused pool at any
        # session size.
        import ray as _ray2

        from ..sources.geolite import (GeoCityEnricher,
                                       load_geolite_city_csv)
        if geoip.get("mmdb"):
            from ..sources.mmdb import load_maxmind_mmdb
            table = load_maxmind_mmdb(geoip["mmdb"])
        else:
            table = load_geolite_city_csv(geoip["blocksCsv"],
                                          geoip["locationsCsv"])
        ds = ds.map_batches(GeoCityEnricher,
                            fn_constructor_kwargs={
                                "table_ref": _ray2.put(table),
                                "ip_col": geoip.get("field",
                                                    "client_ip")},
                            batch_format="pyarrow", batch_size=None,
                            concurrency=(1, 8))
    return ds


def aggregate_cube(routed: "ray.data.Dataset") -> "ray.data.Dataset":
    """One-pass partial cube over (sink, role, tool, hour bucket) with
    sum(size) — everything the reference's sql filter windows need."""
    ds = routed.map_batches(make_time_bucket_fn(), batch_format="pyarrow",
                            batch_size=None)
    return agg_counts(ds, ["sink", "role", "tool", "time_bucket"],
                      sum_cols=["size"])


def marginals_from_cube(cube) -> dict:
    """Derive the per-sink marginal aggregates from the (tiny) cube —
    driver-side pandas: the cube is |sinks|x|roles|x|tools|x|buckets|
    rows by construction, so a distributed pass would be pure overhead."""
    df = cube.to_pandas() if not isinstance(cube, pd.DataFrame) else cube
    def m(keys, col="n"):
        return (df.groupby(keys, dropna=False, as_index=False)
                  .agg(**{col: (col, lambda s: s.sum(min_count=1))}))
    return {
        "by_role": m(["sink", "role"]),
        "by_tool": m(["sink", "tool"]),
        "by_bucket": m(["sink", "time_bucket"]),
        "sum_size": m(["sink"], col="sum_size"),
    }


def run_flagship(input_path: str, out_dir: str | None = None,
                 write_concurrency: int | None = None,
                 conv_buckets: int | None = None,
                 sort_output: bool = False,
                 **kwargs) -> dict:
    """Consume the pipeline: fan out sinks to partitioned Parquet, then
    compute the aggregate cube from a COLUMN-PRUNED read-back of the
    written sinks (5 of ~30 columns leave disk; partial-per-block +
    tree merge, all parallel). Read-back beats funneling per-block
    partials through an accumulator actor: at 8M turns the cube has
    ~60k keys, so partials are large and a single actor serializes
    ~hundreds of MB (measured +14 s), while read-back costs ~3 s and
    scales with CPUs. Returns small pandas results + the output dir."""
    import time as _time
    _dbg = os.environ.get("GRAFT_TIMING") == "1"
    _t0 = _time.time()
    # cube source for sink mode: "readback" (default; column-pruned
    # second scan of the written sinks) or "acc" (sharded zero-CPU
    # CubeAccumulator pool fed inside the write pass — one scan total).
    # Read-back won the 8M-turn A/B against the then-single accumulator
    # (+14 s serializing partials through one mailbox); the sharded pool
    # removes that funnel, so keep both behind a switch and measure.
    cube_from = os.environ.get("GRAFT_CUBE_FROM", "readback")
    if out_dir:
        accs = None
        if cube_from == "acc" and "acc" not in kwargs:
            from .fused import cube_pool
            accs = cube_pool(8)
            kwargs = dict(kwargs, acc=accs)
        routed = build_routed(input_path, conv_buckets=conv_buckets,
                              **kwargs)
        if sort_output:
            # north-rule stable ordering before the final write; a full
            # range-partitioned sort — only ask for it when the sink
            # layout must be globally ordered (equality checks sort on
            # the comparison side instead)
            routed = routed.sort(["conv_id", "turn_idx"])
        # a rerun must not append to a previous run's sink files — the
        # aggregates would double-count (resumable runs go through
        # state/manifest.run_checkpointed, which is atomic per-partition
        # instead of wipe-and-rewrite)
        import shutil
        shutil.rmtree(out_dir, ignore_errors=True)
        os.makedirs(out_dir, exist_ok=True)
        # on a lone local disk cap writers (~8/node measured best);
        # on tmpfs / distributed FS unlimited writers scale with CPUs
        pcols = ["sink"] + (["conv_bucket"] if conv_buckets else [])
        from ..sinks import PARQUET_WRITE_OPTS
        routed.write_parquet(out_dir, partition_cols=pcols,
                             concurrency=write_concurrency,
                             **PARQUET_WRITE_OPTS)
        if _dbg:
            print(f"[timing] write: {_time.time() - _t0:.1f}s", flush=True)
            _t0 = _time.time()
        if accs is not None:
            from .fused import merged_cube
            cube = merged_cube(accs)
        else:
            cols = ["sink", "role", "tool", "@timestamp", "size"]
            back = ray.data.read_parquet(out_dir, columns=cols)
            cube = agg_counts(
                back.map_batches(make_time_bucket_fn(),
                                 batch_format="pyarrow", batch_size=None),
                ["sink", "role", "tool", "time_bucket"],
                sum_cols=["size"])
    else:
        # aggregate-only consumption: the fused stage emits per-block
        # partial cubes directly (emit="cube"), so no row data crosses
        # the object store — only key-bounded partials reach the merge;
        # every stage still runs per row
        from ..stages.aggregate import tree_merge
        partials = build_routed(input_path, conv_buckets=conv_buckets,
                                emit="cube", **kwargs)
        cube = tree_merge(partials, ["sink", "role", "tool", "time_bucket"],
                          {"n": "sum", "sum_size": "sum"})
    cube_df = cube if isinstance(cube, pd.DataFrame) else cube.to_pandas()
    if _dbg:
        print(f"[timing] cube: {_time.time() - _t0:.1f}s", flush=True)
    return {
        "out_dir": out_dir,
        "cube": cube_df,
        "aggregates": marginals_from_cube(cube_df),
    }
