"""Network-shipper outputs: output-sematext-events and
aws-elasticsearch — the last two reference sinks without a rebuild
counterpart.

  * make_sematext_events_fn / SematextEventsShipper —
    /root/reference/lib/plugins/output/output-sematext-events.js:
    per-event regex filter (filter.field default 'logSource',
    js:174-190), static ``tags`` enrichment (js:166-169), receiver
    resolution from ``region`` us/eu (js:149-154), target URL
    ``{receiver}/{token}/event`` (js:164), ldjson buffering with the
    output-http defaults (js:46-61) and the reference's exact
    double-newline body framing (addTobuffer pushes ``line + '\\n'``
    and sendBuffer joins with another ``'\\n'``, js:84-99).
    The constructor's ``ignoreFields`` dict (js:40-45) is dead code in
    the reference — eventHandler never reads it — so it is
    deliberately NOT implemented here (observable behavior parity).

  * sign_v4 / make_aws_es_requests_fn / AwsEsShipper —
    /root/reference/lib/plugins/output/aws-elasticsearch.js: one index
    request per event against ``{url}/{index}/{type}`` with the
    YYYY/MM/DD tokens of the configured index replaced from the
    event's ``@timestamp`` date parts (js:49-61), signed with AWS
    Signature Version 4 (the reference delegates to http-aws-es; the
    signing algorithm itself is the public AWS SigV4 spec, implemented
    here from that spec with hmac/hashlib — known-answer tested
    against the AWS documentation's published IAM ListUsers example).

Scale shape: payload building is a per-batch stage at the sink edge
(same regime as stages/alerts.py — per-row JSON serialization is
inherent to the wire format); shipping state (buffers, retry counters)
lives per actor/worker, never on the driver.
"""

from __future__ import annotations

import datetime
import hashlib
import hmac
import json
import re
import urllib.parse
import urllib.request

import pyarrow as pa

from ..sources.live import HttpBatchShipper

_REGION_RECEIVERS = {
    # output-sematext-events.js:149-154 (public endpoints from the
    # reference's own source)
    "us": "https://event-receiver.sematext.com",
    "eu": "https://event-receiver.eu.sematext.com",
}


def resolve_events_receiver(token: str, receiver: str | None = None,
                            region: str | None = None) -> str | None:
    """js:141-164: region overrides receiver; no receiver or no token
    -> the event is silently skipped (returns None)."""
    if region and region.lower() in _REGION_RECEIVERS:
        receiver = _REGION_RECEIVERS[region.lower()]
    if not receiver or not token:
        return None
    return f"{receiver}/{token}/event"


def make_sematext_events_fn(token: str, receiver: str | None = None,
                            region: str | None = None,
                            tags: dict | None = None,
                            filter_field: str | None = None,
                            filter_match: str | None = None):
    """Batch stage producing ``event_url`` + ``event_payload`` — the
    exact URL and JSON body the reference POSTs per event. Rows failing
    the configured filter regex are dropped (the reference never
    buffers them, js:179-190); with no receiver/token every row drops
    (js:141-161). ``tags`` overwrites ``data.tags`` verbatim
    (js:166-169)."""
    url = resolve_events_receiver(token, receiver, region)
    match_re = re.compile(filter_match) if filter_match else None
    field = filter_field or "logSource"

    def _events(batch: pa.Table) -> pa.Table:
        cols = {c: batch[c].to_pylist() for c in batch.column_names}
        keep, payloads = [], []
        if url is not None:
            for i in range(batch.num_rows):
                row = {c: v[i] for c, v in cols.items() if v[i] is not None}
                if match_re is not None:
                    value = row.get(field)
                    if not match_re.search(str(value if value is not None
                                                else "")):
                        continue
                if tags:
                    row["tags"] = tags
                keep.append(i)
                payloads.append(json.dumps(row, sort_keys=True,
                                           separators=(",", ":")))
        out = batch.take(pa.array(keep, pa.int64()))
        out = out.append_column("event_url",
                                pa.array([url] * len(keep), pa.string()))
        out = out.append_column("event_payload",
                                pa.array(payloads, pa.string()))
        return out

    return _events


class SematextEventsShipper(HttpBatchShipper):
    """Live transport for output-sematext-events: output-http's buffer
    / flush / 20-attempt retry machinery (the reference uses the same
    requestretry options, js:110-117) with the events plugin's body
    framing — each buffered message is followed by a blank line
    (js:84-99)."""

    def add_payloads(self, payloads) -> None:
        for p in payloads:
            self.add(p)

    def flush(self) -> None:  # body framing differs from output-http
        import time
        self._last_flush = time.monotonic()
        if not self._buffer:
            return
        body = "".join(msg + "\n\n" for msg in self._buffer)
        self._buffer = []
        self._send(body)


# ---------------------------------------------------------------------------
# AWS Signature Version 4 (public spec; known-answer tested)

def _uri_encode(s: str, *, encode_slash: bool = True) -> str:
    safe = "-._~" + ("" if encode_slash else "/")
    return urllib.parse.quote(s, safe=safe)


def sign_v4(method: str, url: str, headers: dict[str, str], body: bytes,
            *, access_key: str, secret_key: str, region: str,
            service: str, amz_date: str) -> dict[str, str]:
    """Produce the SigV4 ``Authorization`` header (plus ``x-amz-date``)
    for one HTTP request. ``amz_date`` is the ISO-basic timestamp
    (YYYYMMDDTHHMMSSZ) — passed in, never generated, so signing is
    deterministic and testable. Steps follow the published AWS spec:
    canonical request -> string to sign -> derived signing key ->
    signature."""
    parts = urllib.parse.urlsplit(url)
    canonical_uri = _uri_encode(parts.path or "/", encode_slash=False)
    query = urllib.parse.parse_qsl(parts.query, keep_blank_values=True)
    canonical_query = "&".join(
        f"{_uri_encode(k)}={_uri_encode(v)}"
        for k, v in sorted(query))
    all_headers = {k.lower(): " ".join(v.split()) for k, v in headers.items()}
    all_headers.setdefault("host", parts.netloc)
    all_headers["x-amz-date"] = amz_date
    signed_names = sorted(all_headers)
    canonical_headers = "".join(f"{k}:{all_headers[k]}\n"
                                for k in signed_names)
    signed_headers = ";".join(signed_names)
    payload_hash = hashlib.sha256(body).hexdigest()
    canonical_request = "\n".join([
        method.upper(), canonical_uri, canonical_query,
        canonical_headers, signed_headers, payload_hash])

    date = amz_date[:8]
    scope = f"{date}/{region}/{service}/aws4_request"
    string_to_sign = "\n".join([
        "AWS4-HMAC-SHA256", amz_date, scope,
        hashlib.sha256(canonical_request.encode()).hexdigest()])

    def _hmac(key: bytes, msg: str) -> bytes:
        return hmac.new(key, msg.encode(), hashlib.sha256).digest()

    k_date = _hmac(("AWS4" + secret_key).encode(), date)
    k_region = _hmac(k_date, region)
    k_service = _hmac(k_region, service)
    k_signing = _hmac(k_service, "aws4_request")
    signature = hmac.new(k_signing, string_to_sign.encode(),
                         hashlib.sha256).hexdigest()

    return {
        "x-amz-date": amz_date,
        "Authorization": (
            f"AWS4-HMAC-SHA256 Credential={access_key}/{scope}, "
            f"SignedHeaders={signed_headers}, Signature={signature}"),
    }


_INDEX_TOKEN_RE = re.compile(r"YYYY|MM|DD")


def template_index(index: str, ts: datetime.datetime) -> str:
    """aws-elasticsearch.js:49-61: replace YYYY/MM/DD tokens in the
    configured index from the event timestamp's date parts."""
    parts = {"YYYY": f"{ts.year:04d}", "MM": f"{ts.month:02d}",
             "DD": f"{ts.day:02d}"}
    return _INDEX_TOKEN_RE.sub(lambda m: parts[m.group(0)], index)


def make_aws_es_requests_fn(url: str, index: str, doc_type: str,
                            *, access_key: str, secret_key: str,
                            region: str, amz_date: str,
                            ts_col: str = "@timestamp",
                            service: str = "es"):
    """Batch stage producing the signed index request per event:
    ``req_url`` (``{url}/{index}/{type}``, index date-templated per
    row), ``req_body`` (the event JSON the client.index call ships,
    js:63-67) and ``req_auth`` (the SigV4 Authorization header).
    ``amz_date`` is a parameter for determinism — a live deployment
    passes now()."""
    def _reqs(batch: pa.Table) -> pa.Table:
        cols = {c: batch[c].to_pylist() for c in batch.column_names}
        urls, bodies, auths = [], [], []
        for i in range(batch.num_rows):
            row = {c: v[i] for c, v in cols.items() if v[i] is not None}
            ts = row.get(ts_col)
            if isinstance(ts, (int, float)):
                ts = datetime.datetime.fromtimestamp(
                    ts, tz=datetime.timezone.utc)
            elif isinstance(ts, str):
                ts = datetime.datetime.fromisoformat(ts)
            elif ts is None:
                ts = datetime.datetime(1970, 1, 1,
                                       tzinfo=datetime.timezone.utc)
            req_url = (f"{url.rstrip('/')}/"
                       f"{template_index(index, ts)}/{doc_type}")
            body = json.dumps(row, sort_keys=True, default=str,
                              separators=(",", ":")).encode()
            signed = sign_v4(
                "POST", req_url, {"content-type": "application/json"},
                body, access_key=access_key, secret_key=secret_key,
                region=region, service=service, amz_date=amz_date)
            urls.append(req_url)
            bodies.append(body.decode())
            auths.append(signed["Authorization"])
        out = batch.append_column("req_url", pa.array(urls, pa.string()))
        out = out.append_column("req_body", pa.array(bodies, pa.string()))
        out = out.append_column("req_auth", pa.array(auths, pa.string()))
        return out

    return _reqs


class AwsEsShipper:
    """Transport half: POST each signed request with output-http's
    bounded retry (the reference's elasticsearch client retries
    internally; 3 attempts here, js semantics are fire-and-log)."""

    def __init__(self, max_attempts: int = 3, retry_delay: float = 0.05):
        self.max_attempts = max_attempts
        self.retry_delay = retry_delay
        self.delivered = 0
        self.errors = 0

    def ship(self, req_url: str, req_body: str, req_auth: str,
             amz_date: str) -> bool:
        import time
        data = req_body.encode()
        for attempt in range(self.max_attempts):
            req = urllib.request.Request(
                req_url, data=data, method="POST",
                headers={"Content-Type": "application/json",
                         "x-amz-date": amz_date,
                         "Authorization": req_auth})
            try:
                with urllib.request.urlopen(req, timeout=10) as resp:
                    if 200 <= resp.status < 300:
                        self.delivered += 1
                        return True
            except OSError:
                pass
            if attempt + 1 < self.max_attempts:
                time.sleep(self.retry_delay)
        self.errors += 1
        return False
