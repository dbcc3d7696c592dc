"""Flagship pipeline: parse -> mask -> enrich -> route -> aggregate over
the transcript table — the rebuild of logagent-js's end-to-end dataflow
(input -> input-filter -> parser -> output-filter -> output plugins,
/root/reference/bin/logagent.js:653-713) as ONE lazy, streaming
``ray.data.Dataset`` chain.

Stage order matches the reference's chain order exactly:

  read_parquet (column-pruned)            | input plugin
  -> map_batches(prep)                    | ANSI strip + maxLogSize truncate
  -> map_batches(parse)                   | LogParser (stateless tasks)
  -> map_batches(mask)                    | output-filter masking chain
  -> map_batches(Enricher, actor pool)    | lookup enrichment (stateful)
  -> map_batches(route)                   | ES-output index routing
  -> write_parquet(partition_cols=[sink]) | output plugins fan-out
  +  agg cube -> marginals                | sql output filter windows

Aggregation strategy (scale): ONE pass computes a per-batch partial
"cube" over (sink, role, tool, time_bucket); only the tiny cube
shuffles, and the per-role / per-tool / per-bucket marginals the
reference's sql filter would emit are derived from the cube with
driver-cheap second aggregates. A hot conv_id never concentrates
shuffle load because partials collapse each block to one row per key
(see stages/aggregate.py).
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa

import ray.data

from ..fixtures import gen as fixgen
from ..sources.transcripts import read_transcripts
from ..stages.aggregate import agg_counts, make_time_bucket_fn
from ..stages.enrich import Enricher, put_lookup
from ..stages.filters import make_prep_fn
from ..stages.mask import MaskConfig, make_mask_fn
from ..stages.parse import make_parse_fn
from ..stages.route import RouteConfig, make_route_fn

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


def build_routed(input_path: str | list[str],
                 pattern_paths: list[str] | None = None,
                 mask: MaskConfig | None = DEFAULT_MASK,
                 routes: list[tuple[str, str]] | None = None,
                 drop_unmatched: bool = False,
                 tool_catalog: str | None = None,
                 enrich_concurrency=(2, 8)) -> "ray.data.Dataset":
    """The lazy parse->mask->enrich->route dataset (no consumption)."""
    ds = read_transcripts(input_path)
    ds = ds.map_batches(make_prep_fn(), batch_format="pyarrow",
                        batch_size=PARSE_BATCH_SIZE)
    ds = ds.map_batches(make_parse_fn(pattern_paths), batch_format="pyarrow",
                        batch_size=PARSE_BATCH_SIZE)
    if mask is not None:
        ds = ds.map_batches(make_mask_fn(mask), batch_format="pyarrow",
                            batch_size=PARSE_BATCH_SIZE)
    if tool_catalog is None:
        tool_catalog = fixgen.ensure_tool_catalog()
    ref = put_lookup(tool_catalog)
    ds = ds.map_batches(
        Enricher, fn_constructor_kwargs={"lookup_ref": ref, "key": "tool"},
        batch_format="pyarrow", batch_size=PARSE_BATCH_SIZE,
        concurrency=enrich_concurrency)
    cfg = RouteConfig(routes or DEFAULT_ROUTES, default_sink="sink_default",
                      drop_unmatched=drop_unmatched)
    ds = ds.map_batches(make_route_fn(cfg), batch_format="pyarrow",
                        batch_size=PARSE_BATCH_SIZE)
    return ds


def aggregate_cube(routed: "ray.data.Dataset") -> "ray.data.Dataset":
    """One-pass partial cube over (sink, role, tool, hour bucket) with
    sum(size) — everything the reference's sql filter windows need."""
    ds = routed.map_batches(make_time_bucket_fn(), batch_format="pyarrow",
                            batch_size=PARSE_BATCH_SIZE)
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
                 **kwargs) -> dict:
    """Consume the pipeline: fan out sinks to partitioned Parquet and
    compute the aggregate marginals. Returns small pandas results plus
    the output directory."""
    routed = build_routed(input_path, **kwargs)
    if out_dir:
        # a rerun must not append to a previous run's sink files — the
        # read-back aggregate would double-count (resumable runs go
        # through state/manifest.run_checkpointed, which is atomic
        # per-partition instead of wipe-and-rewrite)
        import shutil
        shutil.rmtree(out_dir, ignore_errors=True)
        os.makedirs(out_dir, exist_ok=True)
        routed.write_parquet(out_dir, partition_cols=["sink"])
        # aggregates read back ONLY the cube columns from the written
        # sinks (column-pruned) instead of recomputing the full parse
        cols = ["sink", "role", "tool", "@timestamp", "size"]
        back = ray.data.read_parquet(out_dir, columns=cols)
        cube = agg_counts(
            back.map_batches(make_time_bucket_fn(), batch_format="pyarrow"),
            ["sink", "role", "tool", "time_bucket"], sum_cols=["size"])
    else:
        cube = aggregate_cube(routed)
    cube_df = cube.to_pandas()  # tiny: |sinks|x|roles|x|tools|x|hours| rows
    return {
        "out_dir": out_dir,
        "cube": cube_df,
        "aggregates": marginals_from_cube(cube_df),
    }
