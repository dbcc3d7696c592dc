"""Wire-format normalizers — the FORMAT logic of logagent-js's HTTP
receiver inputs (SURVEY.md §2.2), re-expressed as batch stages. The
live servers themselves are out of scope (no network services in a batch
engine); what carries over is how each payload becomes parsed events.

  * influx_line_parse —
    /root/reference/lib/plugins/input/influxHttp.js:137-186 parses
    InfluxDB line protocol (``measurement[,tag=v...] field=v[,...] [ts]``)
    into objects: ``measurement``, ns ``timestamp`` -> ``@timestamp``,
    fields flattened under ``{measurement}_{key}`` (js:153-159), tags
    into a nested dict (js:160-167). Unparseable lines are skipped
    (js:179-183). DEVIATION: missing timestamps yield NULL rather than
    "now" (js:145-147) — this repo derives all time from input so reruns
    are deterministic (SURVEY.md §7.5).
  * es_bulk_parse —
    /root/reference/lib/plugins/input/elasticsearchHttp.js:35-42,158-198
    parses an ES ``_bulk`` body (action line + source line pairs): only
    the ``index`` action is supported, ``_index``/``_type`` fall back to
    the request path's defaults (createIndexCall, js:35-42), other
    commands are skipped with a log. One input row = one request body;
    output is the exploded stream of source documents.
"""

from __future__ import annotations

import json
import re

import pyarrow as pa

# measurement ⟶ first comma/space (escapes: '\,', '\ ', '\=')
_UNESCAPE = re.compile(r"\\([,= ])")


def _split_escaped(s: str, sep: str) -> list[str]:
    """Split on unescaped ``sep``; backslash escapes and double-quoted
    spans (string field values) protect the separator."""
    out, cur, i, in_quotes = [], [], 0, False
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            cur.append(c)
            cur.append(s[i + 1])
            i += 2
            continue
        if c == '"':
            in_quotes = not in_quotes
            cur.append(c)
        elif c == sep and not in_quotes:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(c)
        i += 1
    out.append("".join(cur))
    return out


def _unescape(s: str) -> str:
    return _UNESCAPE.sub(r"\1", s)


def _field_value(raw: str):
    """Line-protocol field literal: "str", 123i, 1.5, t/f/true/false."""
    if len(raw) >= 2 and raw[0] == '"' and raw[-1] == '"':
        return raw[1:-1].replace('\\"', '"')
    if raw.endswith("i"):
        try:
            return int(raw[:-1])
        except ValueError:
            pass
    low = raw.lower()
    if low in ("t", "true"):
        return True
    if low in ("f", "false"):
        return False
    try:
        return float(raw)
    except ValueError:
        return raw


def parse_influx_line(line: str) -> dict | None:
    """One line -> {measurement, tags: dict, fields: dict, timestamp}."""
    if not line or line.startswith("#"):
        return None
    parts = _split_escaped(line.strip(), " ")
    parts = [p for p in parts if p != ""]
    if len(parts) < 2:
        return None
    head = _split_escaped(parts[0], ",")
    measurement = _unescape(head[0])
    if not measurement:
        return None
    tags = {}
    for t in head[1:]:
        kv = _split_escaped(t, "=")
        if len(kv) == 2:
            tags[_unescape(kv[0])] = _unescape(kv[1])
    fields = {}
    for f in _split_escaped(parts[1], ","):
        kv = _split_escaped(f, "=")
        if len(kv) == 2:
            fields[_unescape(kv[0])] = _field_value(kv[1])
    if not fields:
        return None
    ts = None
    if len(parts) >= 3:
        try:
            ts = int(parts[2])
        except ValueError:
            ts = None
    return {"measurement": measurement, "tags": tags, "fields": fields,
            "timestamp": ts}


def influx_line_parse(batch: pa.Table, line_col: str = "text",
                      db: str | None = None) -> pa.Table:
    """Batch form of InputInfluxHttp.parse: appends measurement,
    timestamp (raw ns), @timestamp (µs), tags_json, fields_json (keys
    prefixed ``{measurement}_`` per js:156) to the passthrough columns;
    unparseable rows keep nulls (the reference logs + skips — here the
    null measurement marks them, filterable downstream)."""
    lines = batch[line_col].to_numpy(zero_copy_only=False)
    n = len(lines)
    meas = [None] * n
    raw_ts = [None] * n
    at_ts = [None] * n
    tags_json = [None] * n
    fields_json = [None] * n
    for i, line in enumerate(lines):
        try:
            ir = parse_influx_line(line)
        except Exception:
            ir = None  # js:179-183 error path: skip the line
        if not ir:
            continue
        meas[i] = ir["measurement"]
        if ir["timestamp"] is not None:
            raw_ts[i] = ir["timestamp"]
            at_ts[i] = ir["timestamp"] // 1000  # ns -> µs (js:145-147)
        tags_json[i] = json.dumps(ir["tags"], sort_keys=True,
                                  separators=(",", ":"))
        fields_json[i] = json.dumps(
            {f"{ir['measurement']}_{k}": v for k, v in ir["fields"].items()},
            sort_keys=True, separators=(",", ":"))
    out = batch.append_column("measurement", pa.array(meas, pa.string()))
    out = out.append_column("timestamp", pa.array(raw_ts, pa.int64()))
    out = out.append_column("@timestamp",
                            pa.array(at_ts, pa.timestamp("us")))
    out = out.append_column("tags_json", pa.array(tags_json, pa.string()))
    out = out.append_column("fields_json",
                            pa.array(fields_json, pa.string()))
    if db is not None:
        out = out.append_column(
            "influxDbName", pa.array([db] * n, pa.string()))
    return out


def es_bulk_parse(batch: pa.Table, body_col: str = "body",
                  default_index: str | None = None,
                  default_type: str | None = None,
                  passthrough: tuple = ()) -> pa.Table:
    """Explode ES ``_bulk`` bodies into their source documents.
    Mirrors elasticsearchHttp.js:158-198: pairs of (action, source)
    lines; ``index`` is the only supported action; `_index`/`_type`
    default from the request path; `_id` only set when given."""
    bodies = batch[body_col].to_numpy(zero_copy_only=False)
    pass_np = {c: batch[c].to_numpy(zero_copy_only=False)
               for c in passthrough}
    out_idx, out_type, out_id, out_src = [], [], [], []
    out_pass: dict = {c: [] for c in passthrough}
    for r, body in enumerate(bodies):
        if not body:
            continue
        lines = body.split("\n")
        off = 0
        while off < len(lines):
            try:
                action = json.loads(lines[off])
            except ValueError:
                off += 1
                continue
            if not isinstance(action, dict) or "index" not in action:
                off += 1  # "Command not supported yet" (js:194-196)
                continue
            if off + 1 >= len(lines):
                break
            try:
                source = json.loads(lines[off + 1])
            except ValueError:
                off += 2
                continue
            off += 2
            act = action["index"] or {}
            out_idx.append(act.get("_index") or default_index)
            out_type.append(act.get("_type") or default_type)
            out_id.append(act.get("_id"))
            out_src.append(json.dumps(source, sort_keys=True,
                                      separators=(",", ":")))
            for c in passthrough:
                out_pass[c].append(pass_np[c][r])
    cols = {c: pa.array(list(v)) for c, v in out_pass.items()}
    cols["_index"] = pa.array(out_idx, pa.string())
    cols["_type"] = pa.array(out_type, pa.string())
    cols["_id"] = pa.array(out_id, pa.string())
    cols["source_json"] = pa.array(out_src, pa.string())
    return pa.table(cols)


# --------------------------------------------------------------------
# GELF chunked-UDP reassembly — the transport framing the reference's
# gelf input delegates to graygelf/server
# (/root/reference/lib/plugins/input/gelf.js:23-35): each datagram is
# either a whole GELF JSON document or a chunk
# ``0x1e 0x0f | msg_id(8B) | seq(1B) | total(1B) | payload`` of one.

GELF_MAGIC = b"\x1e\x0f"


def _bytes_at(arr: pa.Array, start: int, width: int,
              dtype) -> "np.ndarray":
    """Fixed-offset byte extraction over a binary array, vectorized:
    slice -> fixed_size_binary -> one zero-copy numpy view."""
    import numpy as np
    import pyarrow.compute as pc
    sl = pc.binary_slice(arr, start, start + width)
    fb = sl.combine_chunks() if isinstance(sl, pa.ChunkedArray) else sl
    fb = fb.cast(pa.binary(width))
    raw = np.frombuffer(fb.buffers()[1], dtype=np.uint8)
    raw = raw[fb.offset * width:(fb.offset + len(fb)) * width]
    return raw.view(dtype).copy()


def gelf_chunk_split(batch: pa.Table,
                     datagram_col: str = "datagram") -> pa.Table:
    """Split raw GELF datagrams into (gelf_msg_id, gelf_seq, gelf_total,
    payload) rows. Unchunked datagrams (no magic) pass through as their
    own single-chunk message with a null msg_id. Vectorized: magic test
    + fixed-offset header views, no per-row Python."""
    import numpy as np
    import pyarrow.compute as pc
    dg = batch[datagram_col]
    dg = dg.combine_chunks() if isinstance(dg, pa.ChunkedArray) else dg
    if dg.null_count:
        # a null datagram would propagate a null gelf_chunked, and the
        # reassembly bucket task's boolean numpy invert then dies on the
        # object-dtype None — drop them here (an empty UDP read is noise)
        keep = pc.is_valid(dg)
        batch = batch.filter(keep)
        dg = batch[datagram_col]
        dg = dg.combine_chunks() if isinstance(dg, pa.ChunkedArray) else dg
    is_chunk = pc.and_(
        pc.greater_equal(pc.binary_length(dg), 12),
        pc.equal(pc.binary_slice(dg, 0, 2), GELF_MAGIC))
    is_chunk_np = is_chunk.to_numpy(zero_copy_only=False)
    n = len(dg)
    msg_id = np.full(n, -1, dtype=np.int64)
    seq = np.zeros(n, dtype=np.int64)
    total = np.ones(n, dtype=np.int64)
    if is_chunk_np.any():
        # header fields are only meaningful on chunk rows; extract over
        # the chunk subset so short plain datagrams don't break the
        # fixed-size cast
        idx = np.flatnonzero(is_chunk_np)
        sub = dg.take(pa.array(idx))
        msg_id[idx] = _bytes_at(sub, 2, 8, np.int64)
        seq[idx] = _bytes_at(sub, 10, 1, np.uint8)
        total[idx] = _bytes_at(sub, 11, 1, np.uint8)
    payload = pc.if_else(is_chunk, pc.binary_slice(dg, 12, 1 << 30), dg)
    cols = {c: batch[c] for c in batch.column_names if c != datagram_col}
    cols["gelf_chunked"] = is_chunk  # NOT a msg_id sentinel: a spec-
    # random id of 0xFF..FF wraps to -1 and must still reassemble
    cols["gelf_msg_id"] = pa.array(msg_id)
    cols["gelf_seq"] = pa.array(seq)
    cols["gelf_total"] = pa.array(total)
    cols["payload"] = payload
    return pa.table(cols)


def gelf_reassemble(ds: "ray.data.Dataset",
                    num_buckets: int = 256) -> "ray.data.Dataset":
    """Reassemble split chunks into whole GELF JSON strings: shuffle by
    COARSE ``hash(msg_id) % num_buckets`` (per-group dispatch is
    Python-priced — repo rule), then order-by-(msg_id, seq) binary join
    per message inside the bucket. Messages missing chunks
    (count != gelf_total) are dropped, like a reassembly timeout.
    Unchunked rows (``gelf_chunked`` false) never enter the per-message
    merge: each is already a whole document, so they are spread
    round-robin over the buckets (no hot key) and pass through
    one-to-one with msg_id -1. Returns (gelf_msg_id, message:string)."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    def key(b: pa.Table) -> pa.Table:
        mid = b["gelf_msg_id"].to_numpy(zero_copy_only=False)
        bkt = ((mid * np.int64(0x9E3779B9)) & (num_buckets - 1)) \
            .astype(np.int32)
        un = ~b["gelf_chunked"].to_numpy(zero_copy_only=False)
        if un.any():
            bkt[un] = (np.arange(len(mid))[un] % num_buckets) \
                .astype(np.int32)
        return b.append_column("_b", pa.array(bkt))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        un = ~g["gelf_chunked"].to_numpy()
        frames = []
        if un.any():
            frames.append(pd.DataFrame({
                "gelf_msg_id": np.full(int(un.sum()), -1, dtype=np.int64),
                "message": [p.decode("utf-8", "replace")
                            for p in g.loc[un, "payload"]]}))
        ch = g[~un]
        if len(ch):
            ch = ch.sort_values(["gelf_msg_id", "gelf_seq"],
                                kind="stable")
            joined = ch.groupby("gelf_msg_id", sort=False).agg(
                message=("payload", lambda s: b"".join(s)),
                _n=("gelf_seq", "size"),
                _want=("gelf_total", "first"))
            joined = joined[joined["_n"] == joined["_want"]]
            frames.append(pd.DataFrame({
                "gelf_msg_id": joined.index.to_numpy(dtype=np.int64),
                "message": [p.decode("utf-8", "replace")
                            for p in joined["message"]]}))
        if not frames:
            return pd.DataFrame({
                "gelf_msg_id": pd.Series([], dtype=np.int64),
                "message": pd.Series([], dtype=str)})
        return pd.concat(frames, ignore_index=True)

    return (ds.map_batches(key, batch_format="pyarrow")
            .groupby("_b").map_groups(per_bucket, batch_format="pandas"))


_DOCKER_STREAMS = {0: "stdin", 1: "stdout", 2: "stderr"}


def docker_stream_demux(batch: pa.Table, body_col: str = "body",
                        source_col: str = "source") -> pa.Table:
    """Docker attach/logs multiplexed stream framing (the Engine API's
    public stdcopy format — 8-byte header ``[stream, 0, 0, 0,
    len_be32]`` + chunk; docker-loghose consumes exactly these frames
    for the reference's input/docker/docker.js when a container runs
    without a TTY). One input row = one captured byte stream per
    container (``source`` = container id); frames concatenate per
    stream type and the rebuilt byte stream line-splits (loghose's
    ``newline: true``), yielding one ``(source, stream, line)`` row per
    log line, stream 0/1/2 named stdin/stdout/stderr. A truncated
    trailing frame or an unterminated final line is still emitted (the
    batch reader sees a closed capture, not a live tail); unknown
    stream bytes pass through with their numeric name."""
    bodies = batch[body_col].to_pylist()
    sources = (batch[source_col].to_pylist()
               if source_col in batch.column_names
               else [None] * batch.num_rows)
    out_src, out_stream, out_line = [], [], []
    for src, payload in zip(sources, bodies):
        if payload is None:
            continue
        if isinstance(payload, str):
            payload = payload.encode("latin-1")
        per_stream: dict[int, bytearray] = {}
        i = 0
        while i + 8 <= len(payload):
            stream = payload[i]
            size = int.from_bytes(payload[i + 4:i + 8], "big")
            chunk = payload[i + 8:i + 8 + size]
            per_stream.setdefault(stream, bytearray()).extend(chunk)
            i += 8 + size
        for stream in sorted(per_stream):
            text = per_stream[stream].decode("utf-8", "replace")
            for line in text.splitlines():
                out_src.append(src)
                out_stream.append(_DOCKER_STREAMS.get(stream, str(stream)))
                out_line.append(line)
    return pa.table({
        "source": pa.array(out_src, pa.string()),
        "stream": pa.array(out_stream, pa.string()),
        "line": pa.array(out_line, pa.string()),
    })
