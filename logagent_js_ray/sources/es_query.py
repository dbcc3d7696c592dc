"""Elasticsearch-query input — the batch rebuild of the reference's
polling ES reader (/root/reference/lib/plugins/input/elasticsearchQuery.js).

The reference runs ``client.search(query)`` on an interval and emits one
event per hit, unwrapping ``_source`` and carrying ``_id``/``_type``
(elasticsearchQuery.js:90-117); the index name supports ``YYYY/MM/DD``
date tokens (js:71-88). No live cluster exists in this sandbox, so the
transport is a page-file stand-in: each input file holds one ES search
RESPONSE body (the exact JSON a real ``_search`` or scroll page
returns), and a deployment swaps the file listing for an HTTP pager.
Everything downstream of the transport — hit unwrapping, `_source`
flattening, id/type propagation, index templating — is the real logic,
and the parse runs in WORKER tasks over ``ray.data.read_binary_files``
so a million-page scroll never funnels through the driver.
"""

from __future__ import annotations

import json

import pyarrow as pa


def render_index_template(template: str, now) -> str:
    """``YYYY/MM/DD`` token substitution in an index name
    (elasticsearchQuery.js:71-88; same tokens as the ES output's
    date-templated indices). ``now`` is an explicit datetime — time is
    an input here, never sampled, so reruns are deterministic."""
    return (template.replace("YYYY", f"{now.year:04d}")
            .replace("MM", f"{now.month:02d}")
            .replace("DD", f"{now.day:02d}"))


def es_hits_parse(batch: pa.Table, body_col: str = "bytes") -> pa.Table:
    """One input row = one ES search-response body; output = the
    exploded stream of hits (elasticsearchQuery.js:93-110): ``_source``
    becomes sorted-key ``source_json`` with ``_id`` / ``_type`` /
    ``_index`` beside it; hits without ``_source`` (stored-fields
    queries) serialize the whole hit, matching the reference's
    ``data = result`` fallback."""
    out_id, out_type, out_index, out_src = [], [], [], []
    bodies = batch[body_col].to_pylist()
    for body in bodies:
        if body is None:
            continue
        if isinstance(body, bytes):
            body = body.decode("utf-8", "replace")
        try:
            resp = json.loads(body)
        except ValueError:
            continue
        hits = (resp.get("hits") or {}).get("hits")
        if not hits:
            continue  # "if (!body.hits) return" (js:93-95)
        for h in hits:
            src = h.get("_source")
            if src is None:
                # mirror the reference fallback (`var data = result`):
                # keep every hit key — including _score — except the
                # three meta keys promoted to their own columns
                src = {k: v for k, v in h.items()
                       if k not in ("_id", "_type", "_index")}
            out_id.append(h.get("_id"))
            out_type.append(h.get("_type"))
            out_index.append(h.get("_index"))
            out_src.append(json.dumps(src, sort_keys=True,
                                      separators=(",", ":")))
    return pa.table({
        "_id": pa.array(out_id, pa.string()),
        "_type": pa.array(out_type, pa.string()),
        "_index": pa.array(out_index, pa.string()),
        "source_json": pa.array(out_src, pa.string()),
    })


def read_es_query(page_paths: list[str]) -> "ray.data.Dataset":
    """Read saved ES search-response pages into the exploded hit
    stream. Page fetch + parse both run distributed: each file is a
    worker-side read, each body a worker-side parse. For a live
    deployment the page listing comes from a scroll/search_after
    driver loop that only moves cursor scalars, never rows."""
    import ray.data
    ds = ray.data.read_binary_files(page_paths)
    return ds.map_batches(es_hits_parse, batch_format="pyarrow")
