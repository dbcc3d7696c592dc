"""Checkpoint manifest + resumable partition runner — the rebuild of
logagent-js's durable progress state (tail pointers
/root/reference/lib/plugins/input/files.js:210-255, query watermarks
command.js:21-43, printStats counters printStats.js:22-83) for a batch
engine.

Model: the INPUT FRAGMENT (one parquet file of the transcript table) is
the checkpoint unit. Each fragment is processed into its own hive
partition directory ``partition=<pid>/`` via temp-write + atomic rename,
and a JSON line is appended to ``manifest.jsonl`` recording lineage
(fragment path, registry version) and per-stage metrics (rows in/out,
parse type counts, per-sink routed counts). A resumed run skips every
completed partition; because outputs are renamed atomically and the
manifest line is written only after the rename, a crash anywhere leaves
either a complete partition + manifest line or neither — never a
double-count.

The runner executes ONE fragment per Dataset pass (checkpoint
granularity = fragment). At cluster scale, pass multi-file fragments
(each ``frag`` may be a LIST of paths) so the streaming executor sees
enough blocks per pass to fill every core while the checkpoint unit
stays a fragment.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

import pyarrow.dataset as pads

from ..registry import DEFAULT_PATTERNS
from ..sources.transcripts import list_fragments


def registry_version(paths: list[str] | None = None) -> str:
    """Lineage key for checkpoint skips: pattern-file CONTENT plus the
    environment switches that alter parse/merge output (registry gates,
    JSON enrichment, the multiline default separator) — a fragment
    parsed under a different env must not be treated as complete (the
    same reason load_registry env-keys its cache)."""
    h = hashlib.sha256()
    for p in list(paths or []) + [DEFAULT_PATTERNS]:
        with open(p, "rb") as f:
            h.update(f.read())
    for var in ("DISABLE_DEFAULT_PATTERNS", "PATTERN_MATCHING_ENABLED",
                "SCAN_ALL_PATTERNS", "JSON_ENRICHMENT_ENABLED",
                "MULTILINE_DEFAULT_SEPARATOR"):
        h.update(f"{var}={os.environ.get(var, '')};".encode())
    url = os.environ.get("PATTERNS_URL", "")
    h.update(f"PATTERNS_URL={url};".encode())
    if url:  # content, not just the path: the merged patterns changed
        from ..registry import _patterns_url_path
        try:
            with open(_patterns_url_path(), "rb") as f:
                h.update(f.read())
        except OSError:
            pass  # unreadable now -> registry build will fail loudly
    return h.hexdigest()[:16]


class Manifest:
    def __init__(self, path: str):
        self.path = path

    def load(self) -> dict[str, dict]:
        out: dict[str, dict] = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        rec = json.loads(line)
                        out[rec["partition"]] = rec
        return out

    def append(self, rec: dict) -> None:
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        with open(self.path, "a") as f:
            f.write(json.dumps(rec, sort_keys=True) + "\n")
            f.flush()
            os.fsync(f.fileno())


def _partition_metrics(part_dir: str, sink_col: str = "sink",
                       type_col: str = "_type") -> dict:
    """Per-sink routed-row and parse-type counts read back from the
    partition's own output (column-pruned) — the rebuild of logagent's
    interval stats counters (events received / shipped per sink and
    parse type); column names are configurable so non-flagship sinks
    (e.g. the output-files {field} fan-out) count on their own keys."""
    ds = pads.dataset(part_dir, partitioning="hive")
    if not ds.files:  # fragment whose rows were all filtered/dropped
        return {"rows_out": 0, "sinks": {}, "types": {}}
    tbl = ds.to_table(columns=[sink_col, type_col])
    import collections
    # None stays None (json.dumps renders it "null" — the key format
    # existing manifests already carry for unrouted rows); str() only
    # normalizes non-string partition values from hive read-back
    sinks = collections.Counter(
        s if s is None or isinstance(s, str) else str(s)
        for s in tbl[sink_col].to_pylist())
    types = collections.Counter(t if t is not None else "_fallback"
                                for t in tbl[type_col].to_pylist())
    return {"rows_out": tbl.num_rows, "sinks": dict(sinks),
            "types": dict(types)}


def _pid_of(frag: str) -> str:
    return os.path.splitext(os.path.basename(frag))[0]


def run_checkpointed(input_path: str, out_dir: str,
                     pattern_paths: list[str] | None = None,
                     frags_per_pass: int = 8,
                     **pipeline_kwargs) -> dict:
    """Resumable flagship run: per-fragment atomic sink outputs +
    manifest lines. Returns summary counters (the printStats analogue)
    including how many partitions were skipped.

    PASSES ARE COALESCED: up to ``frags_per_pass`` pending fragments
    execute in ONE Dataset pass (with many small fragments, one pass per
    fragment left the cluster idling between passes — round-2 verdict
    item). The fragment stays the CHECKPOINT unit: the pass writes
    hive-partitioned by ``_ckpt_pid`` (derived from each row's source
    file), each fragment's directory is renamed atomically after the
    pass, and one manifest line is appended per fragment — so a resumed
    run still skips at fragment granularity. A crash mid-pass re-runs
    only that pass's fragments (none were renamed yet). rows_in comes
    from parquet metadata (free); rows_out/sink counts from a
    column-pruned read of the partition's own output — the pipeline
    executes exactly once per fragment."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray as _ray
    import ray.data as _rd

    from ..pipelines.flagship import build_routed

    frags = list_fragments(input_path)
    man = Manifest(os.path.join(out_dir, "manifest.jsonl"))
    done = man.load()
    rv = registry_version(pattern_paths)
    t0 = time.time()

    pending = []
    skipped = 0
    for frag in frags:
        rec = done.get(_pid_of(frag))
        if rec is not None and rec.get("registry_version") == rv:
            skipped += 1
        else:
            pending.append(frag)
    ran = len(pending)

    cpus = int(_ray.cluster_resources().get("CPU", 8)) if \
        _ray.is_initialized() else 8
    from ..pipelines.fused import write_concurrency
    from ..sinks import PARQUET_WRITE_OPTS

    for g0 in range(0, len(pending), max(1, frags_per_pass)):
        group = pending[g0:g0 + max(1, frags_per_pass)]

        def add_pid(b: pa.Table) -> pa.Table:
            # path -> pid via dictionary indices (few uniques per batch).
            # Derive the pid from the path column ITSELF (basename sans
            # extension): Ray normalizes include_paths to resolved
            # absolute paths, so a caller-supplied relative fragment
            # path would never key a {caller_path: pid} map
            enc = b["path"].combine_chunks().dictionary_encode()
            lut = [_pid_of(p) for p in enc.dictionary.to_pylist()]
            pids = pa.DictionaryArray.from_arrays(
                enc.indices, pa.array(lut, pa.string())).cast(pa.string())
            return b.drop_columns(["path"]).append_column(
                "_ckpt_pid", pids)

        # absolutize before the distributed read: Ray WORKERS resolve
        # relative paths against their own cwd (not the driver's) and
        # the read retries forever on the resulting miss
        src = _rd.read_parquet([os.path.abspath(f) for f in group],
                               include_paths=True,
                               override_num_blocks=cpus * 4) \
            .map_batches(add_pid, batch_format="pyarrow")
        ds = build_routed(src, pattern_paths=pattern_paths,
                          **pipeline_kwargs)
        pass_tmp = os.path.join(out_dir, f".tmp-pass-{g0}")
        shutil.rmtree(pass_tmp, ignore_errors=True)
        ds.write_parquet(pass_tmp, partition_cols=["_ckpt_pid", "sink"],
                         concurrency=write_concurrency(),
                         **PARQUET_WRITE_OPTS)
        # map written partition dirs back to pids through hive
        # UNESCAPING: the partition writer percent-encodes special
        # characters in values, so constructing the dir name from the
        # raw pid could rename a just-created EMPTY dir while the real
        # rows get deleted with pass_tmp — silent data loss
        from urllib.parse import unquote
        written = {}
        if os.path.isdir(pass_tmp):
            for d in os.listdir(pass_tmp):
                if d.startswith("_ckpt_pid="):
                    written[unquote(d.split("=", 1)[1])] = d
        for frag in group:
            pid = _pid_of(frag)
            part_tmp = os.path.join(pass_tmp,
                                    written.get(pid, f"_ckpt_pid={pid}"))
            part_final = os.path.join(out_dir, f"partition={pid}")
            os.makedirs(part_tmp, exist_ok=True)  # all-rows-dropped frag
            if os.path.exists(part_final):
                shutil.rmtree(part_final)
            os.rename(part_tmp, part_final)
            metrics = _partition_metrics(part_final)
            man.append({
                "partition": pid, "fragment": frag,
                "registry_version": rv,
                "rows_in": pq.read_metadata(frag).num_rows,
                **metrics,
            })
        shutil.rmtree(pass_tmp, ignore_errors=True)

    done = man.load()
    total = {
        "partitions": len(frags), "ran": ran, "skipped": skipped,
        "rows_in": sum(r["rows_in"] for r in done.values()),
        "rows_out": sum(r["rows_out"] for r in done.values()),
        "wall_sec": round(time.time() - t0, 3),
        "out_dir": out_dir,
    }
    sinks: dict[str, int] = {}
    for r in done.values():
        for s, n in r.get("sinks", {}).items():
            sinks[s] = sinks.get(s, 0) + n
    total["sinks"] = sinks
    return total
