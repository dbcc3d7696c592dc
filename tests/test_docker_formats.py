"""Docker socket formats: dockerEvents.js normalization
(stages/receivers.docker_event_format) and the Engine API stdcopy
stream demux (sources/wire_formats.docker_stream_demux)."""

import json

import pyarrow as pa


def _fmt(events, **kw):
    from logagent_js_ray.stages.receivers import docker_event_format
    batch = pa.table({"body": pa.array([json.dumps(e) if e is not None
                                        else None for e in events],
                                       pa.string())})
    out = docker_event_format(batch, hostname="node-1", **kw)
    return [json.loads(s) for s in out["source_json"].to_pylist()]


def test_docker_event_container_start():
    (msg,) = _fmt([{
        "Type": "container", "Action": "start", "from": "nginx:1",
        "id": "abcdef0123456789",
        "Actor": {"Attributes": {"image": "nginx:1", "name": "web-1"}},
    }])
    # status defaults to 'Type Action' (js:21-25)
    assert msg["dockerEventType"] == "container"
    assert msg["dockerEventAction"] == "start"
    assert msg["container_name"] == "web-1"
    assert msg["dockerEventImageName"] == "nginx:1"
    assert msg["image_name"] == "nginx:1"
    assert msg["container_id"] == "abcdef0123456789"
    # attributes flatten in key order into msgStr (js:38-46,48-56)
    assert msg["message"] == ("Docker Event: container start web-1 "
                              "abcdef0123456789 image:nginx:1, name:web-1")
    assert msg["tags"] == ["docker", "node-1", "container start",
                           "abcdef012345"]          # id[:12] (js:75-77)
    assert msg["title"] == "docker container start web-1"
    assert msg["dockerEventHost"] == "node-1"


def test_docker_event_network_skips_name_and_container_attr():
    (msg,) = _fmt([{
        "Type": "network", "Action": "connect",
        "Actor": {"Attributes": {"container": "c0ffee0123456789abcd",
                                 "name": "bridge"}},
    }])
    assert msg["container_name"] is None            # js:30-35 Type!=network
    assert msg["container_id"] == "c0ffee0123456789abcd"  # js:27-29
    assert msg["tags"][-1] == "c0ffee012345"


def test_docker_event_js_undefined_coercions():
    (msg,) = _fmt([{"status": "die"}])              # bare legacy event
    assert msg["dockerEventType"] == "undefined"    # JS '' + undefined
    assert msg["dockerEventAction"] == "undefined"
    assert msg["dockerEventFrom"] == "undefined"
    assert msg["message"] == "Docker Event: die   "
    assert msg["title"] == "docker die "
    # invalid rows drop
    assert _fmt([None, "not json"[:0]]) == []


def _frame(stream: int, chunk: bytes) -> bytes:
    return bytes([stream, 0, 0, 0]) + len(chunk).to_bytes(4, "big") + chunk


def test_docker_stream_demux():
    from logagent_js_ray.sources.wire_formats import docker_stream_demux
    payload = (_frame(1, b"out line 1\npartial ")
               + _frame(2, b"err line\n")
               + _frame(1, b"continued\n"))
    batch = pa.table({"source": ["c1"],
                      "body": pa.array([payload], pa.binary())})
    out = docker_stream_demux(batch)
    rows = sorted(zip(out["stream"].to_pylist(), out["line"].to_pylist()))
    # frames concatenate PER STREAM before line-splitting
    assert rows == [("stderr", "err line"),
                    ("stdout", "out line 1"),
                    ("stdout", "partial continued")]
    assert set(out["source"].to_pylist()) == {"c1"}


def test_docker_stream_demux_truncated_and_unterminated():
    from logagent_js_ray.sources.wire_formats import docker_stream_demux
    payload = _frame(1, b"whole\nno newline") + b"\x01\x00\x00"  # torn header
    batch = pa.table({"source": ["c2"],
                      "body": pa.array([payload], pa.binary())})
    out = docker_stream_demux(batch)
    assert out["line"].to_pylist() == ["whole", "no newline"]
    assert docker_stream_demux(
        pa.table({"source": pa.array([], pa.string()),
                  "body": pa.array([], pa.binary())})).num_rows == 0


def _gate(**info_kw):
    from logagent_js_ray.stages.enrich import docker_container_gate
    return docker_container_gate(dict(info_kw))


def test_container_gate_label_priority_and_falsy():
    g = _gate(Id="abc", Name="/web",
              Config={"Labels": {"LOGSENE_ENABLED": "false"},
                      "Env": ["LOGS_ENABLED=true"]})
    assert g["enabled"] is False                    # label wins (js:127-132)
    assert _gate(Config={"Labels": {"LOGS_ENABLED": "no"}})["enabled"] is False
    assert _gate(Config={"Labels": {"LOGS_ENABLED": "0"}})["enabled"] is False
    assert _gate(Config={"Labels": {"LOGS_ENABLED": "yes"}})["enabled"] is True


def test_container_gate_env_fallback_and_default():
    # env checked only with no label; LOGS_ENABLED overrides
    # LOGSENE_ENABLED when both exist (js:142-147)
    g = _gate(Config={"Env": ["LOGSENE_ENABLED=true", "LOGS_ENABLED=false"]})
    assert g["enabled"] is False
    from logagent_js_ray.stages.enrich import docker_container_gate
    assert docker_container_gate({}, default_enabled=True)["enabled"] is True
    assert docker_container_gate({}, default_enabled=False)["enabled"] is False


def test_container_gate_token_and_tags():
    g = _gate(Id="abc", Config={
        "Labels": {"io.kubernetes.pod.name": "p1", "unrelated": "x",
                   "LOGSENE_TOKEN": "tok-label"},
        "Env": ["com.docker.compose.service=api", "PATH=/bin",
                "LOGSENE_TOKEN=tok-env"]})
    assert g["token"] == "tok-label"                # label beats env
    assert g["tags"] == {"io.kubernetes.pod.name": "p1",
                         "com.docker.compose.service": "api"}
    g2 = _gate(Config={"Env": ["LOGSENE_TOKEN=tok=extra"]})
    assert g2["token"] == "tok"                     # first '='-segment only
