"""Fused flagship stage: prep -> parse -> mask -> enrich -> route in ONE
actor-pool ``map_batches`` operator, plus a cube-accumulator actor so the
sink write and the aggregate cube come out of a SINGLE pass over the
data.

Why fused: each Ray Data operator boundary costs serialization +
scheduling regardless of CPU count; at fixed input size those costs are
the serial fraction that caps scaling efficiency. All five stages are
per-batch transforms with per-actor state (compiled registry, lookup
table, mask keys) — exactly logagent's single-process chain
(/root/reference/bin/logagent.js:653-713), so one actor pool holding all
stage state is the faithful AND fastest mapping. The pool is sized to
the session's CPUs at build time.

Why an accumulator actor: Ray Data datasets are single-consumer; writing
sinks AND aggregating otherwise needs a second pass (recompute or
read-back). The CubeAccumulator is the printStats counters rebuild
(/root/reference/lib/core/printStats.js:22-83): each batch fires its
partial cube at the actor keyed by a content fingerprint, so task
RETRIES cannot double-count (last write wins per batch key). This is the
documented "raw actor where the Dataset API can't express it" escape
hatch — a shared mutable aggregate fed from inside a streaming pass.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ..stages.aggregate import add_time_bucket
from ..stages.enrich import Enricher
from ..stages.filters import make_prep_fn
from ..stages.mask import MaskConfig, mask_batch
from ..stages.parse import parse_batch
from ..registry import load_registry
from ..stages.route import RouteConfig, route_batch

CUBE_KEYS = ["sink", "role", "tool", "time_bucket"]


@ray.remote(num_cpus=0)
class CubeAccumulator:
    """Keyed partial-cube sink; retry-safe via last-write-wins."""

    def __init__(self):
        self.parts: dict[int, pd.DataFrame] = {}

    def add(self, key: int, df: pd.DataFrame) -> None:
        self.parts[key] = df

    def merged(self) -> pd.DataFrame:
        if not self.parts:
            return pd.DataFrame(columns=CUBE_KEYS + ["n", "sum_size"])
        allp = pd.concat(self.parts.values(), ignore_index=True)
        g = allp.groupby(CUBE_KEYS, dropna=False, sort=False)
        out = pd.DataFrame({
            "n": g["n"].sum(),
            "sum_size": g["sum_size"].sum(min_count=1),
        }).reset_index()
        return out

    def n_batches(self) -> int:
        return len(self.parts)


def cube_pool(n: int = 4) -> list:
    """N zero-CPU CubeAccumulator shards (round-4 verdict item #6):
    batches route by crc32(batch key) so no single actor mailbox is on
    every batch's critical path at scale; a batch key always lands on
    the same shard, so retry dedup (last-write-wins per key) holds."""
    return [CubeAccumulator.remote() for _ in range(n)]


def merged_cube(accs) -> pd.DataFrame:
    """Merged cube across accumulator shards (or one plain actor)."""
    accs = accs if isinstance(accs, list) else [accs]
    parts = [p for p in ray.get([a.merged.remote() for a in accs])
             if len(p)]
    if not parts:
        return pd.DataFrame(columns=CUBE_KEYS + ["n", "sum_size"])
    allp = pd.concat(parts, ignore_index=True)
    g = allp.groupby(CUBE_KEYS, dropna=False, sort=False)
    return pd.DataFrame({
        "n": g["n"].sum(),
        "sum_size": g["sum_size"].sum(min_count=1),
    }).reset_index()


def _batch_key(batch: pa.Table) -> str:
    """Content fingerprint of a batch (stable across task retries).

    128-bit md5 over the FULL key columns, not a crc32 of boundary rows:
    with thousands of batches a 32-bit boundary fingerprint collides at
    birthday rates (and deterministically when boundary rows repeat),
    and a collision makes the accumulator's last-write-wins dedup drop a
    whole batch partial — a silent cube undercount.

    Serialized via Arrow IPC, NOT raw ``arr.buffers()``: zero-copy
    slices share their parent's buffers (offset/length live on the
    array, not the buffer), so two different slices of one block would
    hash identically under raw-buffer hashing and last-write-wins would
    silently drop a partial. IPC framing writes the offset-adjusted
    values, one memcpy + md5 pass (~GB/s), negligible next to parse."""
    h = hashlib.md5()
    sink = pa.BufferOutputStream()
    key_tbl = batch.select(["conv_id", "turn_idx"])
    with pa.ipc.new_stream(sink, key_tbl.schema) as w:
        w.write_table(key_tbl)
    h.update(sink.getvalue())
    h.update(str(batch.num_rows).encode())
    return h.hexdigest()


class FlagshipStage:
    """The whole per-row chain as one actor; all state built in
    ``__init__`` (once per actor): compiled pattern registry, broadcast
    lookup table, mask config, compiled routes."""

    def __init__(self, lookup_ref, mask_cfg: MaskConfig | None,
                 routes: list[tuple[str, str]], pattern_paths=None,
                 drop_unmatched: bool = False, acc=None,
                 detect_severity: bool = False,
                 conv_buckets: int | None = None,
                 default_sink: str = "sink_default",
                 max_log_size: int | None = None,
                 emit: str = "rows",
                 json_raw: bool | None = None,
                 watch_patterns: bool = False):
        # emit="cube": the stage OUTPUTS per-batch partial cubes instead
        # of parsed rows — the aggregate-only pipeline then never ships
        # row data through the object store (tens of GB at 48M turns);
        # every stage still executes per row.
        self.emit = emit
        # each actor owns ONE cpu; Arrow's default per-process thread
        # pool is sized to the MACHINE, so a 30-actor pool spawns ~30x32
        # kernel threads that thrash each other. Pin to 1.
        pa.set_cpu_count(1)
        pa.set_io_thread_count(2)
        self.conv_buckets = conv_buckets
        from ..stages.filters import MAX_LOG_SIZE
        self.prep = make_prep_fn(max_size=max_log_size or MAX_LOG_SIZE)
        self._pattern_paths = list(pattern_paths) if pattern_paths \
            else None
        self.registry = load_registry(self._pattern_paths)
        # pattern hot-reload — the fs.watch re-merge of the reference
        # (lib/parser/mergePatternFiles.js:57-71): load_registry is
        # mtime-keyed, so re-calling it per batch is one os.stat per
        # file when nothing changed and a recompile when a pattern
        # file was edited mid-run; every actor picks the change up at
        # its next batch. Off by default (a long batch job usually
        # wants one registry version per run — the version is part of
        # the checkpoint lineage hash).
        self.watch_patterns = watch_patterns
        self.mask_cfg = mask_cfg
        self.enricher = Enricher(lookup_ref, key="tool",
                                 detect_severity=detect_severity)
        self.route_cfg = RouteConfig(routes, default_sink=default_sink,
                                     drop_unmatched=drop_unmatched)
        # single handle or a cube_pool list (shard by batch-key hash)
        self.acc = (acc if acc is None or isinstance(acc, list)
                    else [acc])
        # driver-read flag shipped via constructor kwargs (see
        # parse.json_enrichment_disabled); None = legacy caller, fall
        # back to this worker's env
        self.json_raw = json_raw

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.watch_patterns:
            self.registry = load_registry(self._pattern_paths)
        b = self.prep(batch)
        b = parse_batch(b, self.registry, json_raw=self.json_raw)
        if self.mask_cfg is not None:
            b = mask_batch(b, self.mask_cfg)
        b = self.enricher(b)
        b = route_batch(b, self.route_cfg)
        if self.conv_buckets:
            # hash-routing key of the north rule: hash(conv_id) % B as a
            # partition column co-locates a conversation's rows within
            # each sink (one directory per bucket; resume/order-read at
            # bucket granularity)
            from ..stages.aggregate import coarse_bucket_array
            bk = coarse_bucket_array(
                b["conv_id"], self.conv_buckets).astype(np.int32)
            b = b.append_column("conv_bucket", pa.array(bk))
        if self.acc is not None and b.num_rows:
            wb = add_time_bucket(b)
            pdf = wb.select(CUBE_KEYS + ["size"]).to_pandas()
            g = pdf.groupby(CUBE_KEYS, dropna=False, sort=False)
            part = pd.DataFrame({
                "n": g.size(),
                "sum_size": g["size"].sum(min_count=1),
            }).reset_index()
            # BLOCKING add: write_parquet returning must imply every
            # partial has landed (fire-and-forget would race the
            # driver's merged() read). The accumulator is SHARDED by
            # batch-key hash (cube_pool), so at scale the ~ms roundtrip
            # spreads across N mailboxes instead of funneling every
            # batch through one actor (round-4 verdict item #6).
            key = _batch_key(batch)
            shard = self.acc[zlib.crc32(key.encode()) % len(self.acc)]
            ray.get(shard.add.remote(key, part))
        if self.emit == "cube":
            import pyarrow.compute as pc
            wb = add_time_bucket(b)
            g = wb.select(CUBE_KEYS + ["size"]).group_by(CUBE_KEYS) \
                .aggregate([([], "count_all"), ("size", "sum")])
            return g.rename_columns(
                [{"count_all": "n", "size_sum": "sum_size"}.get(c, c)
                 for c in g.column_names])
        return b


_TASK_STAGE_CACHE: dict[str, FlagshipStage] = {}


def make_flagship_task_fn(token: str, fn_kwargs: dict):
    """Stateless-TASK variant of the fused stage (same semantics).

    The per-actor state is microseconds to build (registry load is
    mtime-cached ~6 ms, prep/mask/route configs are plain objects), so a
    fixed actor pool pays its ~1-2 s spin-up for nothing on every run —
    the round-4 scorer lesson (BASELINE.md: pool 3.3 s vs tasks 0.4 s)
    applied to the flagship itself. Tasks reuse the session's warm
    worker processes; the first batch on a worker builds a FlagshipStage
    into a small per-process cache (keyed by a per-pipeline token so two
    configs in one session never share state), every later batch hits
    the cache. Also removes the fixed-pool union deadlock class entirely
    (CLAUDE.md round-3 note) and lets sink-write tasks share CPUs with
    parse tasks instead of a static 24/8 split."""
    def fn(batch: pa.Table) -> pa.Table:
        st = _TASK_STAGE_CACHE.get(token)
        if st is None:
            if len(_TASK_STAGE_CACHE) >= 8:  # bound per-worker state
                _TASK_STAGE_CACHE.clear()
            st = FlagshipStage(**fn_kwargs)
            _TASK_STAGE_CACHE[token] = st
        return st(batch)
    return fn


def write_concurrency() -> int:
    """Parquet-encode writers: more than ~8 concurrent writers contend
    on the disk (measured: 32 unlimited writers are 2x slower than 8),
    and unlimited write tasks steal CPUs from the flagship pool."""
    cpus = int(ray.cluster_resources().get("CPU", 8))
    return max(2, min(8, cpus // 4))


def pool_size() -> int:
    cpus = int(ray.cluster_resources().get("CPU", 8))
    return max(2, cpus - write_concurrency())
