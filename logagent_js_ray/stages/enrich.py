"""Enrich stage — rebuild of logagent-js's lookup-join output filters
(SURVEY.md §2.5: kubernetes-enrichment, docker-enrichment, geoip, …).

Every reference enrichment is a broadcast/cached LOOKUP join against a
side-loaded resource — never a shuffle join
(/root/reference/lib/plugins/output-filter/kubernetes-enrichment.js:230-290,
docker-log-enrichment.js:50-149, geoip.js:20-53). The rebuild is a
STATEFUL ACTOR POOL: the lookup table is ``ray.put`` once on the driver
and each actor resolves it ONCE in ``__init__`` (the analogue of the
reference's module-level LRU caches, SURVEY.md §3.4), then every batch is
a vectorized dictionary-encode + take against the in-memory arrays.

Also carries the docker-enrichment severity autodetect: error/warning
regex over the first 80 chars of the message
(docker-log-enrichment.js:127-142), vectorized.

Usage:
    ref = put_lookup(table_or_path)          # driver, once
    ds = ds.map_batches(Enricher, fn_constructor_kwargs={"lookup_ref": ref,
                        "key": "tool", "columns": [...]},
                        batch_format="pyarrow", concurrency=(2, 8))
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray

SEVERITY_DETECT_WINDOW = 80  # docker-log-enrichment.js:15-48 scans a prefix


def put_lookup(table_or_path) -> "ray.ObjectRef":
    """Broadcast the small dimension table once (ray.put); workers read it
    zero-copy from the object store instead of re-shipping per batch."""
    if isinstance(table_or_path, str):
        table_or_path = pq.read_table(table_or_path)
    return ray.put(table_or_path)


class Enricher:
    """Actor-pool callable: broadcast-lookup enrichment keyed on ``key``."""

    def __init__(self, lookup_ref, key: str, columns: list[str] | None = None,
                 detect_severity: bool = False):
        pa.set_cpu_count(1)  # actor-pool rule: no Arrow thread fan-out
        lookup: pa.Table = ray.get(lookup_ref) if not isinstance(
            lookup_ref, pa.Table) else lookup_ref
        self.key = key
        self.columns = columns or [c for c in lookup.column_names if c != key]
        # build the index once per actor (kubernetes-enrichment.js's LRU
        # cache analogue, but immutable for a batch run); the per-batch
        # probe is ONE pc.index_in C++ kernel, not a Python dict loop.
        # index_in returns the FIRST occurrence while the historical
        # dict build was last-wins on duplicate keys — reverse the
        # lookup once at init so duplicate-key catalogs keep resolving
        # to the newest (last) row
        rev = lookup.take(pa.array(range(lookup.num_rows - 1, -1, -1)))
        self.keys_arr = rev[key].combine_chunks()
        self.values = {c: rev[c].combine_chunks() for c in self.columns}
        self.detect_severity = detect_severity
        # docker-log-enrichment.js:15-20 errorRegex/warningRegex — run as
        # Arrow RE2 kernels (match_substring_regex), not Python re per row
        self.err_pat = r"\b(error|exception|fail|fatal)\b"
        self.warn_pat = r"\b(warn|warning)\b"

    def __call__(self, batch: pa.Table) -> pa.Table:
        kcol = batch[self.key]
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        # null index where no match (or null key) -> take() yields null
        take_idx = pc.index_in(kcol, value_set=self.keys_arr)
        out = batch
        for c in self.columns:
            out = out.append_column(c, self.values[c].take(take_idx))
        if self.detect_severity:
            if "message" in out.column_names:
                msg = out["message"]
            elif "text" in out.column_names:
                msg = out["text"]
            else:
                return out  # nothing to scan
            if "severity" not in out.column_names:
                # the reference CREATES the field when autodetect fires
                # (docker-log-enrichment.js); a missing column must not
                # silently disable detection
                out = out.append_column(
                    "severity", pa.nulls(out.num_rows, pa.string()))
            head = pc.utf8_slice_codeunits(msg, 0, SEVERITY_DETECT_WINDOW)
            err = pc.match_substring_regex(head, self.err_pat,
                                           ignore_case=True)
            warn = pc.match_substring_regex(head, self.warn_pat,
                                            ignore_case=True)
            det = pc.if_else(
                err, pa.scalar("error", pa.string()),
                pc.if_else(warn, pa.scalar("warning", pa.string()),
                           pa.scalar(None, pa.string())))
            sev_idx = out.schema.get_field_index("severity")
            sev = pc.cast(out["severity"], pa.string())
            merged = pc.coalesce(sev, det)
            out = out.set_column(sev_idx, "severity", merged)
        return out


# ---------------------------------------------------------------------------
# Docker per-container logging gate (input/docker/dockerInspect.js)

_FALSY_ENABLED = {"0", "false", "no", False}
_DEFAULT_TAGGING_LABELS = ("com.docker.*", "io.kubernetes.*",
                           "annotation.io.*")


def _docker_env_var(name: str, env) -> str | None:
    """dockerInspect.js getEnvVar (js:48-70): labels dict -> exact key
    (trimmed); env list of 'K=V' strings -> first entry whose key
    equals ``name``, value = the FIRST '='-segment after the key
    ('A=b=c' yields 'b' — the reference splits, it doesn't partition).
    """
    if not env:
        return None
    if isinstance(env, dict):
        return env[name].strip() if name in env else None
    for entry in env:
        if name in entry:
            rv = entry.split("=")
            if len(rv) > 1 and rv[0] == name:
                return rv[1]
    return None


def _docker_glob_tags(pattern: str, labels_or_env, tags: dict) -> None:
    """dockerInspect.js getValue (js:72-101): minimatch keys of a
    labels dict, or whole 'K=V' env strings, against ``pattern``;
    matches land in ``tags`` (env value = first '='-segment)."""
    import fnmatch
    if not labels_or_env:
        return
    if isinstance(labels_or_env, dict):
        for k, v in labels_or_env.items():
            if fnmatch.fnmatchcase(k, pattern):
                tags[k] = v
    else:
        for entry in labels_or_env:
            if fnmatch.fnmatchcase(entry, pattern):
                kv = entry.split("=")
                if len(kv) > 1:
                    tags[kv[0]] = kv[1]


def docker_container_gate(info: dict, default_enabled: bool = True,
                          tagging_labels=None) -> dict:
    """Per-container logging decision + tag extraction — the pure half
    of dockerInspect.js getLogseneEnabled (js:120-181), which docker.js
    runs in its attachFilter (docker.js:67-78) to decide whether a
    container's log stream is collected at all:

      * tags: every label key / env entry matching a TAGGING_LABELS
        glob (default com.docker.*, io.kubernetes.*, annotation.io.* —
        docker.js:47-53) with '*' appended (js:103-119);
      * enabled: Labels LOGSENE_ENABLED || LOGS_ENABLED, else the env
        vars of the same names (LOGS_ENABLED wins when both env vars
        exist, js:142-147), else ``default_enabled`` (the
        FINAL_LOGS_ENABLED_DEFAULT conjunction, js:17-22); the values
        '0'/'false'/'no'/false gate off, anything else on
        (js:154-173);
      * token: Labels LOGSENE_TOKEN else env LOGSENE_TOKEN
        (js:175-180).

    ``info`` is one docker-inspect document ({'Id', 'Name', 'Config':
    {'Labels': {...}, 'Env': [...]}}). Used as a broadcast-side filter:
    inspect docs are a tiny per-node table; the gate result joins
    against log rows by container id in the normal Enricher."""
    config = info.get("Config") or {}
    labels = config.get("Labels") or {}
    env = config.get("Env")
    tags: dict = {}
    patterns = list(tagging_labels) if tagging_labels \
        else list(_DEFAULT_TAGGING_LABELS)
    for pat in patterns:
        _docker_glob_tags(pat + "*", labels, tags)
        _docker_glob_tags(pat + "*", env, tags)

    enabled = labels.get("LOGSENE_ENABLED") or labels.get("LOGS_ENABLED") \
        or None
    if enabled is None:
        for name in ("LOGSENE_ENABLED", "LOGS_ENABLED"):  # js:139-147
            v = _docker_env_var(name, env)
            if v is not None:
                enabled = v
    if enabled is None:
        enabled = default_enabled
    enabled = enabled not in _FALSY_ENABLED

    token = labels.get("LOGSENE_TOKEN") or _docker_env_var(
        "LOGSENE_TOKEN", env)
    return {"id": info.get("Id"), "name": info.get("Name"),
            "enabled": enabled, "token": token, "tags": tags}
