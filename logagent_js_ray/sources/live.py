"""Live transport receivers + HTTP shipper (SURVEY.md §2.2 / §2.7).

Rebuilds the reference's live socket plugins — input/tcp.js,
input/syslog.js (UDP), input/elasticsearchHttp.js, input/influxHttp.js
and output/output-http.js — in the shape a BATCH engine on a cluster
actually wants: each receiver is a tiny loopback-tested server that
SPOOLS what it receives into atomically-published parquet segment
files, and the Dataset side treats the spool directory as a normal
files source (``read_spool``) with fragment-granular resume via
state/manifest.py, exactly like every other source here. That is the
idiomatic Ray split: unbounded ingestion lives at the edge (one
receiver process per node, no Ray dependency), while parsing /
enrichment / aggregation stay vectorized Dataset stages that stream
the segments with backpressure. A 256-node cluster runs N receivers
writing to a shared prefix; the pipeline picks up whole segments, so a
crashed run never re-ships or tears a partially-written file.

All FORMAT logic stays where it already lives (stages/formats.py
syslog, sources/wire_formats.py es_bulk/influx/gelf): the servers only
capture ``(ts, transport, source, path, body)`` rows — the analogue of
logagent's single ``data.raw`` event (reference lib/plugins/input/
tcp.js:57-60 emits each line with a context whose sourceName is
``remoteAddress:remotePort`` when not configured, tcp.js:48-52).

The servers bind 127.0.0.1 with an ephemeral port by default (the
sandbox has no external network; on a real node you bind the NIC).
"""

from __future__ import annotations

import gzip
import http.server
import json
import os
import socket
import socketserver
import threading
import time
import urllib.error
import urllib.request

import pyarrow as pa
import pyarrow.parquet as pq

SPOOL_SCHEMA = pa.schema([
    ("ts", pa.timestamp("us")),
    ("transport", pa.string()),
    ("source", pa.string()),
    ("path", pa.string()),
    ("body", pa.string()),
])


class Spooler:
    """Thread-safe raw-event buffer that publishes parquet segments.

    Segments are written to ``<dir>/.tmp-...`` and renamed into place,
    so a concurrent ``read_spool`` glob never observes a torn file —
    the property logagent's in-memory event bus gets for free and a
    distributed file handoff has to construct.
    """

    def __init__(self, spool_dir: str, max_rows: int = 4096,
                 max_bytes: int = 4 << 20):
        self.spool_dir = spool_dir
        self.max_rows = max_rows
        self.max_bytes = max_bytes
        os.makedirs(spool_dir, exist_ok=True)
        self._lock = threading.Lock()
        self._rows: list[tuple[int, str, str, str, str]] = []
        self._bytes = 0
        self._seq = 0

    def add(self, transport: str, source: str, path: str, body: str) -> None:
        with self._lock:
            self._rows.append((time.time_ns() // 1000, transport, source,
                               path, body))
            self._bytes += len(body)
            if len(self._rows) >= self.max_rows or self._bytes >= self.max_bytes:
                self._flush_locked()

    def flush(self) -> None:
        with self._lock:
            self._flush_locked()

    def _flush_locked(self) -> None:
        if not self._rows:
            return
        ts, transport, source, path, body = zip(*self._rows)
        tbl = pa.table({
            "ts": pa.array(ts, pa.timestamp("us")),
            "transport": pa.array(transport, pa.string()),
            "source": pa.array(source, pa.string()),
            "path": pa.array(path, pa.string()),
            "body": pa.array(body, pa.string()),
        }, schema=SPOOL_SCHEMA)
        name = f"segment-{ts[0]:020d}-{self._seq:06d}.parquet"
        tmp = os.path.join(self.spool_dir, f".tmp-{name}")
        pq.write_table(tbl, tmp)
        os.replace(tmp, os.path.join(self.spool_dir, name))
        self._seq += 1
        self._rows, self._bytes = [], 0


def read_spool(spool_dir: str, columns: list[str] | None = None):
    """The Dataset side of a spool directory: a plain pruned parquet
    read over whole published segments. Empty spool -> empty Dataset
    with the pinned schema (a pipeline scheduled before traffic arrives
    must not crash)."""
    import glob as _glob

    import ray.data
    frags = sorted(_glob.glob(os.path.join(spool_dir, "segment-*.parquet")))
    if not frags:
        empty = SPOOL_SCHEMA.empty_table()
        if columns:
            empty = empty.select(columns)
        return ray.data.from_arrow(empty)
    return ray.data.read_parquet(frags, columns=columns)


class TcpLineServer:
    """Line-delimited TCP receiver (reference input/tcp.js).

    Each connection is split on newlines with a carry buffer for
    partial lines across recv() chunks (tcp.js pipes through split2);
    every complete line becomes one spool row whose ``source`` is the
    configured sourceName or ``remoteAddress:remotePort``
    (tcp.js:48-52). Default port in the reference is 4545; here the
    default is an ephemeral loopback port.
    """

    def __init__(self, spooler: Spooler, host: str = "127.0.0.1",
                 port: int = 0, source_name: str | None = None):
        self.spooler = spooler
        self.source_name = source_name
        outer = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self) -> None:
                peer = "%s:%s" % self.client_address
                src = outer.source_name or peer
                carry = b""
                while True:
                    try:
                        chunk = self.request.recv(65536)
                    except OSError:
                        break
                    if not chunk:
                        break
                    carry += chunk
                    *lines, carry = carry.split(b"\n")
                    for line in lines:
                        outer.spooler.add(
                            "tcp", src, "",
                            line.decode("utf-8", "replace").rstrip("\r"))
                if carry:  # unterminated trailing line still counts
                    outer.spooler.add("tcp", src, "",
                                      carry.decode("utf-8", "replace"))

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server((host, port), Handler)
        self.address = self._server.server_address
        self._thread = threading.Thread(target=self._server.serve_forever,
                                        daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        self.spooler.flush()


class UnixSocketLineReader:
    """Unix-socket line CLIENT (reference input/unixSocketReader.js):
    connects to an existing AF_UNIX stream socket (e.g. suricata's
    eve.socket) and spools each received line; ``source`` defaults to
    the socket path (unixSocketReader.js:38 context.sourceName). The
    reference throttles by maxInputRateMBs; a batch engine gets
    backpressure from the spool instead (segments accumulate, the
    Dataset read paces itself)."""

    def __init__(self, spooler: Spooler, path: str,
                 source_name: str | None = None):
        self.spooler = spooler
        self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        self._sock.connect(path)
        self._sock.settimeout(0.2)
        self._stop = threading.Event()
        src = source_name or path

        def loop() -> None:
            carry = b""
            while not self._stop.is_set():
                try:
                    chunk = self._sock.recv(65536)
                except socket.timeout:
                    continue
                except OSError:
                    break
                if not chunk:
                    break
                carry += chunk
                *lines, carry = carry.split(b"\n")
                for line in lines:
                    spooler.add("unix", src, "",
                                line.decode("utf-8", "replace").rstrip("\r"))
            if carry:
                spooler.add("unix", src, "", carry.decode("utf-8", "replace"))

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        self._thread.join(timeout=2)
        self._sock.close()
        self.spooler.flush()


class UdpServer:
    """UDP datagram receiver (reference input/syslog.js — syslogd
    listens on config.udp/config.port, one datagram = one message).
    Priority decode / RFC3164/5424 parsing stays in
    stages/formats.syslog_parse; this only captures the raw datagram
    with the sender address as source."""

    def __init__(self, spooler: Spooler, host: str = "127.0.0.1",
                 port: int = 0, transport: str = "udp",
                 source_name: str | None = None):
        self.spooler = spooler
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self._sock.bind((host, port))
        self._sock.settimeout(0.2)
        self.address = self._sock.getsockname()
        self._stop = threading.Event()

        def loop() -> None:
            while not self._stop.is_set():
                try:
                    data, addr = self._sock.recvfrom(65535)
                except socket.timeout:
                    continue
                except OSError:
                    break
                src = source_name or "%s:%s" % addr
                spooler.add(transport, src, "",
                            data.decode("utf-8", "replace"))

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        self._thread.join(timeout=2)
        self._sock.close()
        self.spooler.flush()


class HttpReceiver:
    """HTTP POST receiver shell for the reference's http-based inputs
    (elasticsearchHttp.js, influxHttp.js, webhooks): records
    ``(path, body)`` verbatim; the Dataset side applies
    wire_formats.es_bulk_parse / influx_line_parse / webhook parsers
    keyed on the recorded path. Response codes mirror the reference:
    ``*/_bulk`` answers an ES-ish JSON 200
    (elasticsearchHttp.js:199), ``/write`` answers 204
    (influxHttp.js:92-102), anything else 200. Gzip request bodies are
    transparently inflated (both reference receivers accept gzip)."""

    def __init__(self, spooler: Spooler, host: str = "127.0.0.1",
                 port: int = 0, source_name: str | None = None):
        outer = self
        self.spooler = spooler
        self.source_name = source_name

        class Handler(http.server.BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a) -> None:  # keep tests quiet
                pass

            def do_POST(self) -> None:
                n = int(self.headers.get("Content-Length") or 0)
                raw = self.rfile.read(n)
                if self.headers.get("Content-Encoding") == "gzip":
                    try:
                        raw = gzip.decompress(raw)
                    except OSError:
                        self.send_response(400)
                        self.send_header("Content-Length", "0")
                        self.end_headers()
                        return
                src = outer.source_name or "%s:%s" % self.client_address
                outer.spooler.add("http", src, self.path,
                                  raw.decode("utf-8", "replace"))
                if self.path.rstrip("/").endswith("_bulk"):
                    body = json.dumps(
                        {"took": 0, "errors": False, "items": []}).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                elif self.path.split("?")[0].endswith("/write"):
                    self.send_response(204)
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                else:
                    self.send_response(200)
                    self.send_header("Content-Length", "0")
                    self.end_headers()

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server((host, port), Handler)
        self.address = self._server.server_address
        self._thread = threading.Thread(target=self._server.serve_forever,
                                        daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        self.spooler.flush()


class HttpBatchShipper:
    """output-http (reference lib/plugins/output/output-http.js).

    Buffers ldjson lines; a full buffer or an elapsed flushInterval
    POSTs the concatenation to ``url``. Defaults mirror the reference:
    maxBufferSize default 1, <=0 coerced to 100 (output-http.js:36-44),
    flushInterval default 10 s with a 1 s floor below 0.5
    (output-http.js:45-50), and up to 20 attempts with a fixed retry
    delay on HTTP/network error (output-http.js:100-103 requestretry
    options). The reference drops the batch after the 20th failure and
    emits an error event; here the exhausted body is additionally
    spooled to ``dead_letter_dir`` when one is configured — a batch
    engine restart can re-ship it (documented extension).
    """

    def __init__(self, url: str, max_buffer_size: int = 1,
                 flush_interval: float = 10.0, max_attempts: int = 20,
                 retry_delay: float = 3.0,
                 dead_letter_dir: str | None = None):
        self.url = url
        if max_buffer_size <= 0:
            max_buffer_size = 100
        self.max_buffer_size = max_buffer_size
        if flush_interval < 0.5:
            flush_interval = 1.0
        self.flush_interval = flush_interval
        self.max_attempts = max_attempts
        self.retry_delay = retry_delay
        self.dead_letter_dir = dead_letter_dir
        self._buffer: list[str] = []
        self._last_flush = time.monotonic()
        self.attempts = 0          # lifetime POST attempts (tests/metrics)
        self.delivered = 0         # successfully shipped batches
        self.dead_lettered = 0

    def add(self, line: str) -> None:
        """Buffer one ldjson line (output-http.js addTobuffer)."""
        self._buffer.append(line)
        if len(self._buffer) >= self.max_buffer_size:
            self.flush()
        elif time.monotonic() - self._last_flush >= self.flush_interval:
            self.flush()

    def add_rows(self, rows) -> None:
        """Convenience for Dataset consumers: iter_batches -> shipper."""
        for row in rows:
            self.add(json.dumps(row, default=str))

    def flush(self) -> None:
        self._last_flush = time.monotonic()
        if not self._buffer:
            return
        body = "\n".join(self._buffer) + "\n"
        self._buffer = []
        self._send(body)

    def _send(self, body: str) -> None:
        data = body.encode()
        last_err: Exception | None = None
        for attempt in range(self.max_attempts):
            self.attempts += 1
            req = urllib.request.Request(
                self.url, data=data, method="POST",
                headers={"Content-Type": "application/x-ndjson"})
            try:
                with urllib.request.urlopen(req, timeout=10) as resp:
                    if 200 <= resp.status < 300:
                        self.delivered += 1
                        return
                    last_err = urllib.error.HTTPError(
                        self.url, resp.status, "bad status", resp.headers,
                        None)
            except (urllib.error.URLError, OSError) as e:
                last_err = e
            if attempt + 1 < self.max_attempts:
                time.sleep(self.retry_delay)
        self.dead_lettered += 1
        if self.dead_letter_dir:
            os.makedirs(self.dead_letter_dir, exist_ok=True)
            name = f"dead-{time.time_ns()}.ndjson"
            tmp = os.path.join(self.dead_letter_dir, "." + name)
            with open(tmp, "w") as f:
                f.write(body)
            os.replace(tmp, os.path.join(self.dead_letter_dir, name))
        else:
            raise RuntimeError(
                f"output-http: dropped batch after {self.max_attempts} "
                f"attempts: {last_err}")
