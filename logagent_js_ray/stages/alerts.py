"""Alerting-sink payload builders — the format half of the reference's
notification outputs (the HTTP POST itself is a live service, out of
scope; what carries over is the exact payload a deployment would ship).

  * make_slack_payload_fn —
    /root/reference/lib/plugins/output/slack-webhook.js:22-72: render
    each event as json / yaml / ld-json / a ``{field}`` template, then
    place the text into ``payload.attachments[0].text`` if the
    configured payload has attachments, else ``payload.text``.
  * make_prometheus_alerts_fn —
    /root/reference/lib/plugins/output/prometheus-alertmanager.js:39-66:
    build one Alertmanager alert per event from an alertTemplate whose
    ``labels`` / ``annotations`` / ``generatorURL`` values are
    ``{field}`` templates over the event.

Both follow string-template semantics: ``{field}`` substitutes the
event's value, missing fields render empty.
"""

from __future__ import annotations

import json
import re

import pyarrow as pa

_FIELD_RE = re.compile(r"\{(\w+)\}")


def render_template(template: str, data: dict) -> str:
    """``string-template``'s format(): ``{key}`` -> ``data[key]``,
    missing keys -> empty string."""
    def sub(m):
        v = data.get(m.group(1))
        return "" if v is None else str(v)
    return _FIELD_RE.sub(sub, template)


def _rows(batch: pa.Table) -> list[dict]:
    cols = {c: batch[c].to_pylist() for c in batch.column_names}
    return [{c: v[i] for c, v in cols.items() if v[i] is not None}
            for i in range(batch.num_rows)]


def make_slack_payload_fn(payload: dict, fmt: str | None = None,
                          template: str | None = None):
    """Batch stage producing ``slack_payload`` — the exact JSON body the
    reference POSTs (slack-webhook.js:27-52). ``payload`` is the
    configured base message; the rendered event text lands in
    ``attachments[0].text`` when attachments exist, else ``text``."""
    use_attachment = bool(payload.get("attachments"))

    def _slack(batch: pa.Table) -> pa.Table:
        out = []
        for row in _rows(batch):
            if fmt == "json":
                msg = json.dumps(row, indent="\t", sort_keys=True)
            elif fmt == "yaml":
                import yaml
                msg = yaml.safe_dump(row, sort_keys=True)
            elif fmt == "ld-json":
                msg = json.dumps(row, sort_keys=True,
                                 separators=(",", ":"))
            elif template:
                msg = render_template(template, row)
            else:
                msg = ""
            p = json.loads(json.dumps(payload))  # deep copy
            if use_attachment:
                p["attachments"][0]["text"] = msg
            else:
                p["text"] = msg
            out.append(json.dumps(p, sort_keys=True,
                                  separators=(",", ":")))
        cols = {c: batch[c] for c in batch.column_names}
        cols["slack_payload"] = pa.array(out, pa.string())
        return pa.table(cols)

    return _slack


def make_prometheus_alerts_fn(alert_template: dict):
    """Batch stage producing ``alert_json`` — one Alertmanager v1 alert
    per event (prometheus-alertmanager.js:39-66): templated ``labels``
    and ``annotations`` maps plus an optional ``generatorURL``."""
    labels = alert_template.get("labels") or {}
    annotations = alert_template.get("annotations") or {}
    gen_url = alert_template.get("generatorURL")

    def _alerts(batch: pa.Table) -> pa.Table:
        out = []
        for row in _rows(batch):
            alert = {
                "labels": {k: render_template(v, row)
                           for k, v in labels.items()},
                "annotations": {k: render_template(v, row)
                                for k, v in annotations.items()},
            }
            if gen_url:
                alert["generatorURL"] = render_template(gen_url, row)
            out.append(json.dumps(alert, sort_keys=True,
                                  separators=(",", ":")))
        cols = {c: batch[c] for c in batch.column_names}
        cols["alert_json"] = pa.array(out, pa.string())
        return pa.table(cols)

    return _alerts
