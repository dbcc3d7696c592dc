"""Minimal MQTT 3.1.1 transport (wire format from the public OASIS
spec) — the live halves of the reference's three MQTT plugins:

  * MqttBroker — input/mqtt-broker.js: the reference embeds the aedes
    broker and turns every PUBLISH whose topic does not match
    ``ignoreTopic`` (default ``^\\$SYS``, js:5,37-44,101-116) into one
    raw event whose context carries sourceName=topic, qos and retain
    (js:106-115). Optional username/password auth answers CONNACK
    rc=5 on mismatch (aedes authenticate callback, js:62-78); an
    ``authenticate`` callable mirrors js:70-78. Received payloads
    spool to live.Spooler parquet segments exactly like the other
    receivers, so the Dataset side is the usual ``read_spool``.
  * MqttSubscriberClient — input/mqtt-client.js: connect + SUBSCRIBE
    to the configured topics, every received message becomes a raw
    event with sourceName=topic (js:53-72).
  * MqttPublisher — output/mqtt.js: JSON-serialize each parsed event
    and publish it to the configured topic, with the same
    filter.field/filter.match regex gate as output-sematext-events
    (js:52-76) and a dynamic-topic hook (js:39-50 ``eval``s a JS
    expression; here a named/callable hook — no config eval — whose
    falsy result falls back to the static topic, matching js:42-50).

Only the packets the plugins exercise are implemented: CONNECT /
CONNACK / PUBLISH (QoS 0-1) / PUBACK / SUBSCRIBE / SUBACK / PINGREQ /
PINGRESP / DISCONNECT. QoS 2 handshakes and retained-message replay
are out of scope (the reference ingests; it never requests QoS 2).

Scale shape: identical to live.py — one broker process per ingest
node spooling atomically-published segments; parsing stays in
vectorized Dataset stages downstream.
"""

from __future__ import annotations

import json
import re
import socket
import socketserver
import struct
import threading

from .live import Spooler

CONNECT, CONNACK, PUBLISH, PUBACK = 1, 2, 3, 4
SUBSCRIBE, SUBACK, PINGREQ, PINGRESP, DISCONNECT = 8, 9, 12, 13, 14


# ---------------------------------------------------------------------------
# Wire codec (MQTT 3.1.1 §2: fixed header + variable-length body)

def encode_remaining_length(n: int) -> bytes:
    out = bytearray()
    while True:
        n, digit = divmod(n, 128)
        out.append(digit | (0x80 if n else 0))
        if not n:
            return bytes(out)


def decode_remaining_length(buf: bytes, i: int) -> tuple[int, int] | None:
    """Returns (value, next_index) or None if more bytes are needed;
    raises on a 5th continuation byte (spec maximum is 4)."""
    value, mult = 0, 1
    for k in range(4):
        if i + k >= len(buf):
            return None
        byte = buf[i + k]
        value += (byte & 0x7F) * mult
        if not byte & 0x80:
            return value, i + k + 1
        mult *= 128
    raise ValueError("malformed remaining length (continuation on 4th byte)")


def _utf8(s: str) -> bytes:
    b = s.encode()
    return struct.pack(">H", len(b)) + b


def _read_utf8(body: bytes, i: int) -> tuple[str, int]:
    (n,) = struct.unpack_from(">H", body, i)
    return body[i + 2:i + 2 + n].decode(), i + 2 + n


def _packet(ptype: int, flags: int, body: bytes) -> bytes:
    return bytes([ptype << 4 | flags]) + encode_remaining_length(len(body)) \
        + body


def encode_connect(client_id: str, username: str | None = None,
                   password: str | None = None, keepalive: int = 60) -> bytes:
    flags = 0x02                                   # clean session
    payload = _utf8(client_id)
    if username is not None:
        flags |= 0x80
        payload += _utf8(username)
    if password is not None:
        flags |= 0x40
        payload += _utf8(password)
    body = _utf8("MQTT") + bytes([4, flags]) + struct.pack(">H", keepalive) \
        + payload
    return _packet(CONNECT, 0, body)


def encode_connack(rc: int) -> bytes:
    return _packet(CONNACK, 0, bytes([0, rc]))


def encode_publish(topic: str, payload: bytes, qos: int = 0,
                   retain: bool = False, packet_id: int = 0,
                   dup: bool = False) -> bytes:
    flags = (8 if dup else 0) | (qos << 1) | (1 if retain else 0)
    body = _utf8(topic)
    if qos:
        body += struct.pack(">H", packet_id)
    return _packet(PUBLISH, flags, body + payload)


def encode_puback(packet_id: int) -> bytes:
    return _packet(PUBACK, 0, struct.pack(">H", packet_id))


def encode_subscribe(packet_id: int, topics: list[str]) -> bytes:
    body = struct.pack(">H", packet_id)
    for t in topics:
        body += _utf8(t) + b"\x00"                 # requested QoS 0
    return _packet(SUBSCRIBE, 2, body)


def encode_suback(packet_id: int, count: int) -> bytes:
    return _packet(SUBACK, 0, struct.pack(">H", packet_id) + b"\x00" * count)


def parse_packet(buf: bytes) -> tuple[int, int, bytes, int] | None:
    """(type, flags, body, bytes_consumed) or None when incomplete."""
    if len(buf) < 2:
        return None
    decoded = decode_remaining_length(buf, 1)
    if decoded is None:
        return None
    length, start = decoded
    if len(buf) < start + length:
        return None
    return buf[0] >> 4, buf[0] & 0x0F, buf[start:start + length], \
        start + length


def parse_connect(body: bytes) -> dict:
    proto, i = _read_utf8(body, 0)
    level, flags = body[i], body[i + 1]
    (keepalive,) = struct.unpack_from(">H", body, i + 2)
    i += 4
    client_id, i = _read_utf8(body, i)
    will_topic = will_msg = None
    if flags & 0x04:                               # will flag
        will_topic, i = _read_utf8(body, i)
        (n,) = struct.unpack_from(">H", body, i)
        will_msg, i = body[i + 2:i + 2 + n], i + 2 + n
    username = password = None
    if flags & 0x80:
        username, i = _read_utf8(body, i)
    if flags & 0x40:
        password, i = _read_utf8(body, i)
    return {"proto": proto, "level": level, "keepalive": keepalive,
            "client_id": client_id, "username": username,
            "password": password, "will_topic": will_topic}


def parse_publish(flags: int, body: bytes) -> dict:
    qos = (flags >> 1) & 0x03
    topic, i = _read_utf8(body, 0)
    packet_id = 0
    if qos:
        (packet_id,) = struct.unpack_from(">H", body, i)
        i += 2
    return {"topic": topic, "qos": qos, "retain": bool(flags & 1),
            "dup": bool(flags & 8), "packet_id": packet_id,
            "payload": body[i:]}


def parse_subscribe(body: bytes) -> tuple[int, list[str]]:
    (packet_id,) = struct.unpack_from(">H", body, 0)
    i, topics = 2, []
    while i < len(body):
        t, i = _read_utf8(body, i)
        i += 1                                     # requested QoS byte
        topics.append(t)
    return packet_id, topics


def topic_matches(filter_: str, topic: str) -> bool:
    """MQTT 3.1.1 §4.7 wildcard matching: '+' one level, '#' the rest
    (must be last). '$'-prefixed topics never match a wildcard first
    level (the $SYS carve-out)."""
    f_parts, t_parts = filter_.split("/"), topic.split("/")
    if t_parts and t_parts[0].startswith("$") and f_parts[0] in ("+", "#"):
        return False
    for k, f in enumerate(f_parts):
        if f == "#":
            return True
        if k >= len(t_parts):
            return False
        if f != "+" and f != t_parts[k]:
            return False
    return len(f_parts) == len(t_parts)


def _recv_packet(sock: socket.socket, buf: bytearray):
    """Blocking read of one full packet from ``sock`` into/out of
    ``buf`` (leftover bytes stay for the next call)."""
    while True:
        got = parse_packet(bytes(buf))
        if got is not None:
            del buf[:got[3]]
            return got[:3]
        chunk = sock.recv(65536)
        if not chunk:
            return None
        buf.extend(chunk)


# ---------------------------------------------------------------------------

class MqttBroker:
    """Loopback MQTT broker shell (input/mqtt-broker.js semantics):
    PUBLISH payloads spool as raw events unless the topic matches
    ``ignore_topic`` (default ``^\\$SYS``); subscribers receive
    forwarded publishes at QoS 0 (enough for the reference's ingest
    use and for loopback-testing the output client)."""

    def __init__(self, spooler: Spooler, host: str = "127.0.0.1",
                 port: int = 0, username: str | None = None,
                 password: str | None = None,
                 authenticate=None, ignore_topic: str = r"^\$SYS"):
        self.spooler = spooler
        self.ignore_re = re.compile(ignore_topic)
        if username is not None and password is not None:
            def authenticate(u, p, _u=username, _p=password):  # js:62-69
                return u == _u and p == _p
        self.authenticate = authenticate
        self._subs_lock = threading.Lock()
        self._subs: dict[socket.socket, list[str]] = {}
        outer = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self) -> None:
                buf = bytearray()
                sock = self.request
                connected = False
                try:
                    while True:
                        pkt = _recv_packet(sock, buf)
                        if pkt is None:
                            return
                        ptype, flags, body = pkt
                        if ptype == CONNECT:
                            info = parse_connect(body)
                            if info["proto"] != "MQTT" or info["level"] != 4:
                                sock.sendall(encode_connack(1))
                                return
                            if outer.authenticate is not None and \
                                    not outer.authenticate(info["username"],
                                                           info["password"]):
                                sock.sendall(encode_connack(5))
                                return
                            connected = True
                            sock.sendall(encode_connack(0))
                        elif not connected:
                            return                  # spec: CONNECT first
                        elif ptype == PUBLISH:
                            pub = parse_publish(flags, body)
                            if pub["qos"] == 1:
                                sock.sendall(encode_puback(pub["packet_id"]))
                            elif pub["qos"] == 2:
                                return              # unsupported; drop conn
                            outer._on_publish(pub)
                        elif ptype == SUBSCRIBE:
                            pid, topics = parse_subscribe(body)
                            with outer._subs_lock:
                                outer._subs.setdefault(sock, []).extend(topics)
                            sock.sendall(encode_suback(pid, len(topics)))
                        elif ptype == PINGREQ:
                            sock.sendall(_packet(PINGRESP, 0, b""))
                        elif ptype == DISCONNECT:
                            return
                finally:
                    with outer._subs_lock:
                        outer._subs.pop(sock, None)

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server((host, port), Handler)
        self.address = self._server.server_address
        self._thread = threading.Thread(target=self._server.serve_forever,
                                        daemon=True)
        self._thread.start()

    def _on_publish(self, pub: dict) -> None:
        payload = pub["payload"].decode("utf-8", "replace")
        if not self.ignore_re.search(pub["topic"]):   # js:101-105
            self.spooler.add(
                "mqtt", pub["topic"],
                json.dumps({"qos": pub["qos"],
                            "retain": pub["retain"]}),
                payload)
        frame = encode_publish(pub["topic"], pub["payload"], qos=0,
                               retain=pub["retain"])
        with self._subs_lock:
            targets = [s for s, filters in self._subs.items()
                       if any(topic_matches(f, pub["topic"])
                              for f in filters)]
        for s in targets:
            try:
                s.sendall(frame)
            except OSError:
                pass

    def stop(self) -> None:
        self.spooler.flush()
        self._server.shutdown()
        self._server.server_close()


class _MqttConnection:
    """Shared connect/close for the two clients."""

    def __init__(self, host: str, port: int, client_id: str,
                 username: str | None = None, password: str | None = None):
        self._sock = socket.create_connection((host, port), timeout=10)
        self._buf = bytearray()
        self._sock.sendall(encode_connect(client_id, username, password))
        pkt = _recv_packet(self._sock, self._buf)
        if pkt is None or pkt[0] != CONNACK or pkt[2][1] != 0:
            rc = pkt[2][1] if pkt else -1
            self._sock.close()
            raise ConnectionError(f"MQTT CONNACK refused (rc={rc})")

    def close(self) -> None:
        try:
            self._sock.sendall(_packet(DISCONNECT, 0, b""))
        except OSError:
            pass
        self._sock.close()


class MqttPublisher(_MqttConnection):
    """output/mqtt.js: publish each parsed event as compact JSON to
    ``topic``. ``filter_field``/``filter_match`` gate rows exactly like
    the reference (field default logSource, js:52-69); ``dynamic_topic``
    is a callable row->topic whose falsy result falls back to the
    static topic (js:39-50, without the reference's config eval)."""

    def __init__(self, host: str, port: int, topic: str,
                 client_id: str = "logagent-output-mqtt",
                 username: str | None = None, password: str | None = None,
                 filter_field: str | None = None,
                 filter_match: str | None = None,
                 dynamic_topic=None, qos: int = 0):
        super().__init__(host, port, client_id, username, password)
        self.topic = topic
        self.qos = qos
        self.dynamic_topic = dynamic_topic
        self._match = re.compile(filter_match) if filter_match else None
        self._field = filter_field or "logSource"
        self._pid = 0
        self.published = 0

    def publish(self, topic: str, message: str) -> None:
        self._pid = (self._pid % 65535) + 1
        self._sock.sendall(encode_publish(topic, message.encode(),
                                          qos=self.qos, packet_id=self._pid))
        if self.qos == 1:
            pkt = _recv_packet(self._sock, self._buf)
            if pkt is None or pkt[0] != PUBACK:
                raise ConnectionError("expected PUBACK")
        self.published += 1

    def publish_rows(self, rows) -> None:
        """Dataset consumer: iter_rows/take -> filter -> publish."""
        for row in rows:
            if self._match is not None:
                value = row.get(self._field)
                if not self._match.search(str(value if value is not None
                                              else "")):
                    continue
            topic = None
            if self.dynamic_topic is not None:
                topic = self.dynamic_topic(row)
            self.publish(topic or self.topic,
                         json.dumps(row, sort_keys=True, default=str,
                                    separators=(",", ":")))


class MqttSubscriberClient(_MqttConnection):
    """input/mqtt-client.js: subscribe to ``topics`` and spool every
    received message with sourceName=topic (js:53-72)."""

    def __init__(self, spooler: Spooler, host: str, port: int,
                 topics: list[str],
                 client_id: str = "logagent-input-mqtt",
                 username: str | None = None, password: str | None = None):
        super().__init__(host, port, client_id, username, password)
        self.spooler = spooler
        self._sock.sendall(encode_subscribe(1, topics))
        pkt = _recv_packet(self._sock, self._buf)
        if pkt is None or pkt[0] != SUBACK:
            raise ConnectionError("expected SUBACK")
        self._thread = threading.Thread(target=self._reader, daemon=True)
        self._thread.start()

    def _reader(self) -> None:
        try:
            while True:
                pkt = _recv_packet(self._sock, self._buf)
                if pkt is None:
                    return
                ptype, flags, body = pkt
                if ptype == PUBLISH:
                    pub = parse_publish(flags, body)
                    self.spooler.add(
                        "mqtt", pub["topic"],
                        json.dumps({"qos": pub["qos"],
                                    "retain": pub["retain"]}),
                        pub["payload"].decode("utf-8", "replace"))
        except OSError:
            pass

    def close(self) -> None:
        super().close()
        self.spooler.flush()
