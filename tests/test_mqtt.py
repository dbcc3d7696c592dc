"""MQTT 3.1.1 transport (sources/mqtt_live.py): codec known vectors,
loopback broker->spool, auth, ignoreTopic, subscriber forwarding and
the output publisher's filter/dynamic-topic gates."""

import json
import time

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


# --- codec -----------------------------------------------------------------

def test_remaining_length_spec_vectors():
    from logagent_js_ray.sources.mqtt_live import (decode_remaining_length,
                                                   encode_remaining_length)
    # the OASIS spec's table: 127 -> 0x7F, 128 -> 0x80 0x01,
    # 16383 -> 0xFF 0x7F, 268435455 -> 0xFF 0xFF 0xFF 0x7F
    vectors = {0: b"\x00", 127: b"\x7f", 128: b"\x80\x01",
               16383: b"\xff\x7f", 16384: b"\x80\x80\x01",
               268435455: b"\xff\xff\xff\x7f"}
    for n, b in vectors.items():
        assert encode_remaining_length(n) == b
        assert decode_remaining_length(b, 0) == (n, len(b))
    assert decode_remaining_length(b"\x80", 0) is None     # incomplete
    with pytest.raises(ValueError):
        decode_remaining_length(b"\xff\xff\xff\xff\x7f", 0)


def test_publish_roundtrip_and_partial_parse():
    from logagent_js_ray.sources.mqtt_live import (encode_publish,
                                                   parse_packet,
                                                   parse_publish)
    frame = encode_publish("a/b", b"payload", qos=1, retain=True,
                           packet_id=7)
    assert parse_packet(frame[:3]) is None                 # incomplete
    ptype, flags, body, used = parse_packet(frame + b"extra")
    assert ptype == 3 and used == len(frame)
    pub = parse_publish(flags, body)
    assert pub == {"topic": "a/b", "qos": 1, "retain": True, "dup": False,
                   "packet_id": 7, "payload": b"payload"}


def test_topic_matches_wildcards():
    from logagent_js_ray.sources.mqtt_live import topic_matches
    assert topic_matches("a/b", "a/b")
    assert not topic_matches("a/b", "a/b/c")
    assert topic_matches("a/+/c", "a/x/c")
    assert topic_matches("a/#", "a/b/c")
    assert topic_matches("#", "a/b")
    assert not topic_matches("#", "$SYS/x")                # spec §4.7.2
    assert not topic_matches("+/x", "$SYS/x")


# --- broker ----------------------------------------------------------------

@pytest.fixture()
def broker(tmp_path):
    from logagent_js_ray.sources.live import Spooler
    from logagent_js_ray.sources.mqtt_live import MqttBroker
    sp = Spooler(str(tmp_path / "spool"))
    b = MqttBroker(sp)
    yield b, sp
    b.stop()


def test_broker_publish_spools_and_ignores_sys(broker, ray_session,
                                               tmp_path):
    from logagent_js_ray.sources.live import read_spool
    from logagent_js_ray.sources.mqtt_live import MqttPublisher
    b, sp = broker
    pub = MqttPublisher(*b.address, topic="sensors/t1", qos=1)
    pub.publish("sensors/t1", '{"v":1}')
    pub.publish("$SYS/broker/uptime", "99")                # ignored
    pub.publish("sensors/t2", '{"v":2}')
    pub.close()
    assert _wait_for(lambda: _spool_rows(sp) == 2)
    sp.flush()
    rows = sorted(read_spool(str(tmp_path / "spool")).take_all(),
                  key=lambda r: r["source"])
    assert [r["source"] for r in rows] == ["sensors/t1", "sensors/t2"]
    assert rows[0]["transport"] == "mqtt"
    assert json.loads(rows[0]["path"]) == {"qos": 1, "retain": False}
    assert json.loads(rows[0]["body"]) == {"v": 1}


def test_broker_auth(tmp_path):
    from logagent_js_ray.sources.live import Spooler
    from logagent_js_ray.sources.mqtt_live import MqttBroker, MqttPublisher
    sp = Spooler(str(tmp_path / "spool"))
    b = MqttBroker(sp, username="mqtt", password="secret")
    try:
        with pytest.raises(ConnectionError, match="rc=5"):
            MqttPublisher(*b.address, topic="t")           # no credentials
        ok = MqttPublisher(*b.address, topic="t",
                           username="mqtt", password="secret")
        ok.publish("t", "x")
        ok.close()
        assert _wait_for(lambda: _spool_rows(sp) == 1)
    finally:
        b.stop()


def test_subscriber_forwarding(broker, tmp_path):
    from logagent_js_ray.sources.live import Spooler
    from logagent_js_ray.sources.mqtt_live import (MqttPublisher,
                                                   MqttSubscriberClient)
    b, _ = broker
    sub_spool = Spooler(str(tmp_path / "subspool"))
    sub = MqttSubscriberClient(sub_spool, *b.address,
                               topics=["log-messages", "sensor-data/#"])
    pub = MqttPublisher(*b.address, topic="log-messages")
    pub.publish("log-messages", "m1")
    pub.publish("sensor-data/room1", "m2")
    pub.publish("other-topic", "m3")                       # not subscribed
    assert _wait_for(lambda: _spool_rows(sub_spool) == 2)
    pub.close()
    sub.close()                                            # flushes spool
    import glob

    import pyarrow.parquet as pq
    frags = glob.glob(str(tmp_path / "subspool" / "segment-*.parquet"))
    tbl = pq.read_table(frags)
    assert sorted(tbl["body"].to_pylist()) == ["m1", "m2"]
    assert sorted(tbl["source"].to_pylist()) == ["log-messages",
                                                 "sensor-data/room1"]


def test_publisher_filter_and_dynamic_topic(broker):
    from logagent_js_ray.sources.mqtt_live import MqttPublisher
    b, sp = broker
    pub = MqttPublisher(*b.address, topic="all_events",
                        filter_match="sensor.*",
                        dynamic_topic=lambda row: row.get("topic_override"))
    pub.publish_rows([
        {"logSource": "sensor.a", "v": 1},                 # -> all_events
        {"logSource": "web.b", "v": 2},                    # filtered out
        {"logSource": "sensor.c", "v": 3,
         "topic_override": "special"},                     # -> special
    ])
    pub.close()
    assert pub.published == 2
    assert _wait_for(lambda: _spool_rows(sp) == 2)
    with sp._lock:
        by_topic = {r[2]: json.loads(r[4]) for r in sp._rows}
    assert set(by_topic) == {"all_events", "special"}
    assert by_topic["all_events"]["logSource"] == "sensor.a"
    assert by_topic["special"]["v"] == 3
