"""Network shippers (sinks/shippers.py): output-sematext-events
payload build + framing and the aws-elasticsearch SigV4 signer
(known-answer tested against the AWS documentation's published
IAM ListUsers example)."""

import datetime
import http.server
import json
import socketserver
import threading

import pyarrow as pa
import pytest


class _CaptureSink(http.server.BaseHTTPRequestHandler):
    requests: list = []
    fail_first = 0
    lock = threading.Lock()

    def log_message(self, *a):
        pass

    def do_POST(self):
        body = self.rfile.read(int(self.headers.get("Content-Length") or 0))
        with _CaptureSink.lock:
            if _CaptureSink.fail_first > 0:
                _CaptureSink.fail_first -= 1
                self.send_response(500)
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            _CaptureSink.requests.append(
                (self.path, dict(self.headers), body.decode()))
        self.send_response(200)
        self.send_header("Content-Length", "0")
        self.end_headers()


@pytest.fixture()
def capture_sink():
    class Server(socketserver.ThreadingTCPServer):
        allow_reuse_address = True
        daemon_threads = True

    srv = Server(("127.0.0.1", 0), _CaptureSink)
    _CaptureSink.requests = []
    _CaptureSink.fail_first = 0
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    srv.server_close()


def test_sigv4_known_answer():
    """The AWS SigV4 documentation's worked example: GET ListUsers
    against IAM with the published test credentials. Both the
    canonical-request hash and the final signature are pinned in the
    public docs — matching them proves every canonicalization step."""
    from logagent_js_ray.sinks.shippers import sign_v4
    signed = sign_v4(
        "GET",
        "https://iam.amazonaws.com/?Action=ListUsers&Version=2010-05-08",
        {"content-type": "application/x-www-form-urlencoded; charset=utf-8"},
        b"",
        access_key="AKIDEXAMPLE",
        secret_key="wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
        region="us-east-1", service="iam",
        amz_date="20150830T123600Z")
    assert signed["Authorization"] == (
        "AWS4-HMAC-SHA256 "
        "Credential=AKIDEXAMPLE/20150830/us-east-1/iam/aws4_request, "
        "SignedHeaders=content-type;host;x-amz-date, "
        "Signature=5d672d79c15b13162d9279b0855cfba6789a8edb4c"
        "82c400e06b5924a6f2b5d7")
    assert signed["x-amz-date"] == "20150830T123600Z"


def test_sigv4_query_sorting_and_body_hash():
    from logagent_js_ray.sinks.shippers import sign_v4
    a = sign_v4("POST", "http://h/x?b=2&a=1", {}, b"body",
                access_key="k", secret_key="s", region="r", service="es",
                amz_date="20260101T000000Z")
    b = sign_v4("POST", "http://h/x?a=1&b=2", {}, b"body",
                access_key="k", secret_key="s", region="r", service="es",
                amz_date="20260101T000000Z")
    assert a == b                      # query order canonicalized
    c = sign_v4("POST", "http://h/x?a=1&b=2", {}, b"other",
                access_key="k", secret_key="s", region="r", service="es",
                amz_date="20260101T000000Z")
    assert c != a                      # body participates in the hash


def _batch():
    return pa.table({
        "logSource": ["sensor.a", "web.b", "sensor.c"],
        "message": ["m1", "m2", "m3"],
    })


def test_sematext_events_filter_tags_and_url():
    from logagent_js_ray.sinks.shippers import make_sematext_events_fn
    fn = make_sematext_events_fn(
        "TOK", region="eu", tags={"role": "backend"},
        filter_field="logSource", filter_match="sensor.*")
    out = fn(_batch())
    assert out.num_rows == 2          # web.b dropped (js:179-190)
    assert set(out["event_url"].to_pylist()) == {
        "https://event-receiver.eu.sematext.com/TOK/event"}
    p = json.loads(out["event_payload"].to_pylist()[0])
    assert p["tags"] == {"role": "backend"} and p["message"] == "m1"


def test_sematext_events_no_receiver_drops_all():
    from logagent_js_ray.sinks.shippers import make_sematext_events_fn
    assert make_sematext_events_fn("TOK")(_batch()).num_rows == 0
    assert make_sematext_events_fn("", receiver="http://r")(
        _batch()).num_rows == 0


def test_sematext_events_default_filter_field():
    from logagent_js_ray.sinks.shippers import make_sematext_events_fn
    fn = make_sematext_events_fn("T", receiver="http://r",
                                 filter_match="^web")
    out = fn(_batch())                # field defaults to logSource
    assert out["logSource"].to_pylist() == ["web.b"]


def test_sematext_shipper_double_newline_framing(capture_sink):
    from logagent_js_ray.sinks.shippers import SematextEventsShipper
    sh = SematextEventsShipper(capture_sink + "/TOK/event",
                               max_buffer_size=2, retry_delay=0.01)
    sh.add_payloads(['{"a":1}', '{"b":2}'])
    assert sh.delivered == 1
    path, _, body = _CaptureSink.requests[0]
    assert path == "/TOK/event"
    assert body == '{"a":1}\n\n{"b":2}\n\n'   # js:84-99 framing


def test_template_index():
    from logagent_js_ray.sinks.shippers import template_index
    ts = datetime.datetime(2026, 3, 7, tzinfo=datetime.timezone.utc)
    assert template_index("logs-YYYY.MM.DD", ts) == "logs-2026.03.07"
    assert template_index("static", ts) == "static"


def test_aws_es_requests_and_loopback_ship(capture_sink):
    from logagent_js_ray.sinks.shippers import (AwsEsShipper,
                                                make_aws_es_requests_fn)
    batch = pa.table({
        "@timestamp": [datetime.datetime(2026, 1, 2,
                                         tzinfo=datetime.timezone.utc),
                       datetime.datetime(2026, 11, 30,
                                         tzinfo=datetime.timezone.utc)],
        "message": ["x", "y"],
    })
    fn = make_aws_es_requests_fn(
        capture_sink, "logs-YYYY.MM.DD", "_doc",
        access_key="AK", secret_key="SK", region="us-east-1",
        amz_date="20260102T000000Z")
    out = fn(batch)
    urls = out["req_url"].to_pylist()
    assert urls[0].endswith("/logs-2026.01.02/_doc")
    assert urls[1].endswith("/logs-2026.11.30/_doc")
    auth = out["req_auth"].to_pylist()[0]
    assert auth.startswith("AWS4-HMAC-SHA256 Credential=AK/20260102/"
                           "us-east-1/es/aws4_request")
    # determinism: same inputs -> same signature
    assert fn(batch)["req_auth"].to_pylist()[0] == auth

    _CaptureSink.fail_first = 1       # one 500, then success -> retry path
    sh = AwsEsShipper(max_attempts=3, retry_delay=0.01)
    ok = sh.ship(urls[0], out["req_body"].to_pylist()[0], auth,
                 "20260102T000000Z")
    assert ok and sh.delivered == 1
    path, headers, body = _CaptureSink.requests[-1]
    assert path == "/logs-2026.01.02/_doc"
    assert headers["Authorization"] == auth
    assert json.loads(body)["message"] == "x"
