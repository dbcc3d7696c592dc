"""HTTP/stream receiver payload formats — the body-handling half of the
reference's remaining live inputs (SURVEY.md §2.2), as batch stages.
One input row = one received payload; output = the exploded event
stream, exactly what each receiver's emit loop produces.

  * azure_eventhub_format —
    /root/reference/lib/plugins/input/azure-event-hub.js:43-62: an
    event whose body carries a ``records`` array explodes one event per
    record, each stamped ``@timestamp = enqueuedTimeUtc``; other bodies
    pass through whole under ``bodyField``.
  * k8s_audit_parse —
    /root/reference/lib/plugins/input/kubernetesAudit.js:37-103: a POST
    body is a JSON doc; ``items[]`` explodes with ``@timestamp`` from
    each item's ``timestamp``, unknown structures index whole for
    troubleshooting, configured default tags fill only missing keys.
  * k8s_events_format —
    /root/reference/lib/plugins/input/kubernetesEvents.js:81-99: one
    watch event per row, ``@timestamp = firstTimestamp``, tags applied
    unconditionally.

All three serialize the event payload as sorted-key ``source_json``
(the engine's JSON fast-path parses it downstream) so schemas stay
stable however ragged the documents are.
"""

from __future__ import annotations

import json

import pyarrow as pa


def _dump(obj) -> str:
    return json.dumps(obj, sort_keys=True, separators=(",", ":"))


def azure_eventhub_format(batch: pa.Table, body_col: str = "body",
                          enqueued_col: str = "enqueuedTimeUtc",
                          body_field: str = "body") -> pa.Table:
    """Explode Event Hub events (azure-event-hub.js:43-62). ``body`` is
    the JSON text of one event body; rows whose body has ``records``
    emit one row per record with the enqueued time as ``@timestamp``,
    others emit the whole body under ``body_field``."""
    bodies = batch[body_col].to_pylist()
    n = batch.num_rows
    enq = (batch[enqueued_col].to_pylist()
           if enqueued_col in batch.column_names else [None] * n)
    out_ts, out_src = [], []
    for body, ts in zip(bodies, enq):
        try:
            doc = json.loads(body) if body is not None else None
        except ValueError:
            doc = None
        if isinstance(doc, dict) and isinstance(doc.get("records"), list):
            for rec in doc["records"]:
                if isinstance(rec, dict):
                    rec = dict(rec)
                    rec["@timestamp"] = ts
                out_ts.append(ts)
                out_src.append(_dump(rec))
        else:
            out_ts.append(ts)
            out_src.append(_dump({body_field: doc, "@timestamp": ts}))
    return pa.table({"@timestamp": pa.array(out_ts, pa.string()),
                     "source_json": pa.array(out_src, pa.string())})


def k8s_audit_parse(batch: pa.Table, body_col: str = "body",
                    tags: dict | None = None,
                    index_col: str | None = None) -> pa.Table:
    """Explode k8s audit POST bodies (kubernetesAudit.js:87-103):
    ``items[]`` each with ``@timestamp`` from the item's ``timestamp``;
    non-items docs emit whole ("unknown structure ... ease trouble
    shooting"). ``tags`` fill only keys the event doesn't already have
    (addTags, js:46-57); ``index_col`` propagates a per-request routing
    token to ``_index`` like the URL token (js:37-44)."""
    bodies = batch[body_col].to_pylist()
    n = batch.num_rows
    toks = (batch[index_col].to_pylist()
            if index_col and index_col in batch.column_names
            else [None] * n)
    out_ts, out_idx, out_src = [], [], []

    def emit(log: dict, token):
        if tags:
            for k, v in tags.items():
                log.setdefault(k, v)
        out_ts.append(log.get("@timestamp"))
        out_idx.append(token)
        out_src.append(_dump(log))

    for body, tok in zip(bodies, toks):
        if not body:
            continue
        try:
            docs = json.loads(body)
        except ValueError:
            continue
        items = docs.get("items") if isinstance(docs, dict) else None
        if items:
            for item in items:
                log = dict(item) if isinstance(item, dict) else {"v": item}
                log["@timestamp"] = log.get("timestamp")
                emit(log, tok)
        elif isinstance(docs, dict):
            emit(dict(docs), tok)
    return pa.table({"@timestamp": pa.array(out_ts, pa.string()),
                     "_index": pa.array(out_idx, pa.string()),
                     "source_json": pa.array(out_src, pa.string())})


def k8s_events_format(batch: pa.Table, body_col: str = "body",
                      tags: dict | None = None) -> pa.Table:
    """One k8s watch event per row (kubernetesEvents.js:91-99):
    ``@timestamp`` from ``firstTimestamp``, tags applied
    unconditionally (addTags, js:81-89 — unlike audit's
    fill-if-missing)."""
    bodies = batch[body_col].to_pylist()
    out_ts, out_src = [], []
    for body in bodies:
        try:
            ev = json.loads(body) if body is not None else None
        except ValueError:
            continue
        if not isinstance(ev, dict):
            continue
        ev = dict(ev)
        if tags:
            ev.update(tags)
        ev["@timestamp"] = ev.get("firstTimestamp")
        out_ts.append(ev["@timestamp"])
        out_src.append(_dump(ev))
    return pa.table({"@timestamp": pa.array(out_ts, pa.string()),
                     "source_json": pa.array(out_src, pa.string())})


def docker_event_format(batch: pa.Table, body_col: str = "body",
                        hostname: str = "host") -> pa.Table:
    """Docker daemon event normalization — the format half of
    /root/reference/lib/plugins/input/docker/dockerEvents.js:17-95
    (the live half, a dockerode events subscription over the daemon
    socket, is a protocol daemon and stays at the edge; each event JSON
    arrives here as one row). Per event:

      * ``status`` defaults to ``"{Type} {Action}"`` (js:21-25);
      * ``Actor.Attributes`` promote: ``container``->``id``, ``name``->
        ``containerName`` (skipped for network events), ``image``->
        ``imageName``; all attributes flatten into ``"k:v, k2:v2"``
        ``message`` in key order (js:26-46);
      * ``msgStr = 'Docker Event: {status} {containerName||from||""}
        {id||""} {message||""}'`` (js:48-56);
      * output fields + ``tags=['docker', host, status, id[:12]]``
        (js:57-78) and ``title`` (js:88-92).

    JS artifacts are mirrored observably: missing ``Type`` / ``Action``
    / ``from`` stringify to ``'undefined'`` (``'' + undefined``,
    js:58-60). The computed-but-never-emitted ``type`` variable
    (js:82-87) is dead code in the reference and not reproduced.
    ``hostname`` stands in for SPM_REPORTED_HOSTNAME || os.hostname().
    """
    bodies = batch[body_col].to_pylist()
    out = []
    for body in bodies:
        try:
            ev = json.loads(body) if body is not None else None
        except ValueError:
            continue
        if not isinstance(ev, dict):
            continue
        ev = dict(ev)
        if ev.get("Type") and not ev.get("status"):
            ev["status"] = f"{ev['Type']} {ev.get('Action') or ''}"
        attrs = (ev.get("Actor") or {}).get("Attributes")
        container_name = image_name = None
        message = None
        if isinstance(attrs, dict):
            if attrs.get("container"):
                ev["id"] = attrs["container"]
            if attrs.get("name") and ev.get("Type") != "network":
                container_name = attrs["name"]
            if attrs.get("image"):
                image_name = attrs["image"]
            message = ", ".join(f"{k}:{v}" for k, v in attrs.items())
        def _js(v):  # JS '' + undefined
            return "undefined" if v is None else str(v)
        status = ev.get("status")
        evid = ev.get("id")
        msg_str = (f"Docker Event: {_js(status)} "
                   f"{container_name or ev.get('from') or ''} "
                   f"{evid or ''} {message or ''}")
        tags = ["docker", hostname, status]
        if isinstance(evid, str):
            tags.append(evid[:12])
        out.append(_dump({
            "dockerEventType": _js(ev.get("Type")),
            "dockerEventAction": _js(ev.get("Action")),
            "dockerEventFrom": _js(ev.get("from")),
            "dockerEventImageName": image_name,
            "message": msg_str,
            "image_name": ev.get("from"),
            "container_id": evid,
            "container_name": container_name,
            "dockerEventHost": hostname,
            "tags": tags,
            "title": (f"docker {_js(status)} "
                      f"{container_name or image_name or ''}"),
        }))
    return pa.table({"source_json": pa.array(out, pa.string())})
