"""Live transports (sources/live.py): loopback TCP/UDP/HTTP receivers
spooling to parquet segments, read back through ray.data, plus the
output-http shipper's buffer/retry contract."""

import gzip
import http.server
import json
import socket
import socketserver
import threading
import time
import urllib.request

import pytest


def _wait_for(pred, timeout=5.0):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if pred():
            return True
        time.sleep(0.02)
    return False


def _spool_rows(spooler):
    with spooler._lock:
        return len(spooler._rows)


def test_tcp_lines_roundtrip(ray_session, tmp_path):
    from logagent_js_ray.sources.live import Spooler, TcpLineServer, read_spool
    sp = Spooler(str(tmp_path / "spool"))
    srv = TcpLineServer(sp, source_name="app-logs")
    try:
        with socket.create_connection(srv.address) as c:
            # partial line across sends + \r\n + unterminated trailing line
            c.sendall(b"alpha line\nbeta ")
            time.sleep(0.05)
            c.sendall(b"continued\r\ngamma-no-newline")
        assert _wait_for(lambda: _spool_rows(sp) == 3)
    finally:
        srv.stop()
    ds = read_spool(str(tmp_path / "spool"))
    rows = sorted(r["body"] for r in ds.take_all())
    assert rows == ["alpha line", "beta continued", "gamma-no-newline"]
    first = ds.take(1)[0]
    assert first["transport"] == "tcp" and first["source"] == "app-logs"


def test_tcp_default_source_is_peer(ray_session, tmp_path):
    from logagent_js_ray.sources.live import Spooler, TcpLineServer, read_spool
    sp = Spooler(str(tmp_path / "spool"))
    srv = TcpLineServer(sp)
    try:
        with socket.create_connection(srv.address) as c:
            c.sendall(b"hello\n")
        assert _wait_for(lambda: _spool_rows(sp) == 1)
    finally:
        srv.stop()
    (row,) = read_spool(str(tmp_path / "spool")).take_all()
    host, port = row["source"].rsplit(":", 1)
    assert host == "127.0.0.1" and int(port) > 0  # tcp.js:48-52 parity


def test_unix_socket_reader(ray_session, tmp_path):
    from logagent_js_ray.sources.live import (Spooler, UnixSocketLineReader,
                                              read_spool)
    sp = Spooler(str(tmp_path / "spool"))
    path = str(tmp_path / "eve.socket")
    srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    srv.bind(path)
    srv.listen(1)
    reader = UnixSocketLineReader(sp, path)
    conn, _ = srv.accept()
    try:
        conn.sendall(b'{"event":"alert"}\n{"event":"dns"}\n')
        assert _wait_for(lambda: _spool_rows(sp) == 2)
    finally:
        conn.close()
        reader.stop()
        srv.close()
    rows = read_spool(str(tmp_path / "spool")).take_all()
    assert sorted(json.loads(r["body"])["event"] for r in rows) == \
        ["alert", "dns"]
    assert rows[0]["source"] == path and rows[0]["transport"] == "unix"


def test_udp_syslog_through_frame_parse(ray_session, tmp_path):
    from logagent_js_ray.sources.live import Spooler, UdpServer, read_spool
    from logagent_js_ray.stages.formats import syslog_frame_parse
    sp = Spooler(str(tmp_path / "spool"))
    srv = UdpServer(sp)
    try:
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        s.sendto(b"<13>Feb  5 17:32:18 host01 app[42]: cold start",
                 srv.address)
        s.sendto(b"<165>1 2026-01-01T00:00:00Z web01 nginx 7 - - req done",
                 srv.address)
        s.close()
        assert _wait_for(lambda: _spool_rows(sp) == 2)
    finally:
        srv.stop()
    ds = read_spool(str(tmp_path / "spool")).map_batches(
        syslog_frame_parse, batch_format="pyarrow",
        fn_kwargs={"line_col": "body"})
    by_tag = {r["syslog_tag"]: r for r in ds.take_all()}
    assert by_tag["app"]["severity"] == "notice"      # 13 & 7 = 5
    assert by_tag["app"]["message"] == "cold start"
    assert by_tag["nginx"]["facility"] == "local4"    # 165 >> 3 = 20
    assert by_tag["nginx"]["message"] == "req done"


def test_http_receiver_paths_and_gzip(ray_session, tmp_path):
    from logagent_js_ray.sources.live import HttpReceiver, Spooler, read_spool
    from logagent_js_ray.sources.wire_formats import (es_bulk_parse,
                                                      influx_line_parse)
    sp = Spooler(str(tmp_path / "spool"))
    srv = HttpReceiver(sp)
    host, port = srv.address
    base = f"http://{host}:{port}"
    try:
        bulk = (json.dumps({"index": {"_index": "logs"}}) + "\n"
                + json.dumps({"message": "from-bulk", "level": "info"}) + "\n")
        r1 = urllib.request.urlopen(
            urllib.request.Request(f"{base}/_bulk", data=bulk.encode(),
                                   method="POST"))
        assert r1.status == 200
        assert json.loads(r1.read())["errors"] is False  # elasticsearchHttp.js:199
        r2 = urllib.request.urlopen(urllib.request.Request(
            f"{base}/write?db=metrics",
            data=b"cpu,host=web01 usage=0.5 1700000000000000000",
            method="POST"))
        assert r2.status == 204                          # influxHttp.js:92-102
        gz = gzip.compress(b"plain gz payload")
        r3 = urllib.request.urlopen(urllib.request.Request(
            f"{base}/ingest", data=gz, method="POST",
            headers={"Content-Encoding": "gzip"}))
        assert r3.status == 200
        assert _wait_for(lambda: _spool_rows(sp) == 3)
    finally:
        srv.stop()
    ds = read_spool(str(tmp_path / "spool"))
    rows = {r["path"].split("?")[0]: r for r in ds.take_all()}
    assert rows["/ingest"]["body"] == "plain gz payload"
    import pyarrow as pa
    bulk_tbl = pa.table({"body": [rows["/_bulk"]["body"]]})
    parsed = es_bulk_parse(bulk_tbl)
    assert parsed["_index"][0].as_py() == "logs"
    assert json.loads(parsed["source_json"][0].as_py())["message"] == "from-bulk"
    influx_tbl = pa.table({"body": [rows["/write"]["body"]]})
    pts = influx_line_parse(influx_tbl, line_col="body")
    assert pts["measurement"][0].as_py() == "cpu"


def test_spooler_segments_atomic(ray_session, tmp_path):
    from logagent_js_ray.sources.live import Spooler, read_spool
    d = str(tmp_path / "spool")
    sp = Spooler(d, max_rows=2)
    for i in range(5):
        sp.add("tcp", "s", "", f"line-{i}")
    sp.flush()
    import glob
    import os
    segs = glob.glob(os.path.join(d, "segment-*.parquet"))
    assert len(segs) == 3                     # 2+2+1
    assert not glob.glob(os.path.join(d, ".tmp-*"))
    assert read_spool(d).count() == 5


def test_read_spool_empty(ray_session, tmp_path):
    from logagent_js_ray.sources.live import read_spool
    d = str(tmp_path / "empty")
    import os
    os.makedirs(d)
    ds = read_spool(d)
    assert ds.count() == 0
    assert set(ds.schema().names) == {"ts", "transport", "source", "path",
                                      "body"}
    assert read_spool(d, columns=["body"]).schema().names == ["body"]


class _FlakySink(http.server.BaseHTTPRequestHandler):
    fail_first = 0
    bodies: list = []
    lock = threading.Lock()

    def log_message(self, *a):
        pass

    def do_POST(self):
        body = self.rfile.read(int(self.headers.get("Content-Length") or 0))
        with _FlakySink.lock:
            if _FlakySink.fail_first > 0:
                _FlakySink.fail_first -= 1
                self.send_response(500)
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            _FlakySink.bodies.append(body.decode())
        self.send_response(200)
        self.send_header("Content-Length", "0")
        self.end_headers()


@pytest.fixture()
def flaky_sink():
    class Server(socketserver.ThreadingTCPServer):
        allow_reuse_address = True
        daemon_threads = True

    srv = Server(("127.0.0.1", 0), _FlakySink)
    _FlakySink.bodies = []
    _FlakySink.fail_first = 0
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/events"
    srv.shutdown()
    srv.server_close()


def test_shipper_buffer_and_retry(flaky_sink):
    from logagent_js_ray.sources.live import HttpBatchShipper
    _FlakySink.fail_first = 2
    sh = HttpBatchShipper(flaky_sink, max_buffer_size=3, retry_delay=0.05,
                          max_attempts=5)
    sh.add('{"n":1}')
    sh.add('{"n":2}')
    assert sh.attempts == 0                   # buffer below maxBufferSize
    sh.add('{"n":3}')                         # triggers flush
    assert sh.delivered == 1 and sh.attempts == 3
    assert _FlakySink.bodies == ['{"n":1}\n{"n":2}\n{"n":3}\n']


def test_shipper_dead_letter_and_raise(flaky_sink, tmp_path):
    from logagent_js_ray.sources.live import HttpBatchShipper
    _FlakySink.fail_first = 10**6
    dl = str(tmp_path / "dead")
    sh = HttpBatchShipper(flaky_sink, max_buffer_size=1, retry_delay=0.01,
                          max_attempts=2, dead_letter_dir=dl)
    sh.add('{"n":1}')
    assert sh.dead_lettered == 1 and sh.attempts == 2
    import glob
    (f,) = glob.glob(dl + "/dead-*.ndjson")
    assert open(f).read() == '{"n":1}\n'
    sh2 = HttpBatchShipper(flaky_sink, max_buffer_size=1, retry_delay=0.01,
                           max_attempts=2)
    with pytest.raises(RuntimeError, match="dropped batch after 2"):
        sh2.add('{"n":2}')


def test_shipper_reference_defaults():
    from logagent_js_ray.sources.live import HttpBatchShipper
    sh = HttpBatchShipper("http://example.invalid/", max_buffer_size=0,
                          flush_interval=0.1)
    assert sh.max_buffer_size == 100          # output-http.js:40-44
    assert sh.flush_interval == 1.0           # output-http.js:47-50
    assert HttpBatchShipper("u").max_buffer_size == 1
