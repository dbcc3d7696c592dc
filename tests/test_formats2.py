"""vercel/aws-ecs/influx/geoip-style format stages + globalTransform +
CRI pattern (SURVEY.md §2.1, §2.5, §2.7 coverage)."""

import datetime as dt

import numpy as np
import pyarrow as pa


def test_vercel_report():
    from logagent_js_ray.stages.formats import vercel_format
    t = pa.table({"message": [
        "REPORT RequestId: x Duration: 12.3 ms\tBilled Duration: 13.0 ms"
        "\tMemory Size: 128 MB\tMax Memory Used: 64 MB\tInit Duration: 2 ms",
        "plain line",
    ]})
    out = vercel_format(t)
    assert out["lambda_duration_ms"][0].as_py() == 12.3
    assert out["lambda_memory_mb"][0].as_py() == 128.0
    assert out["lambda_cold_start"][0].as_py() is True
    assert np.isnan(out["lambda_duration_ms"][1].as_py())


def test_aws_ecs_severity_from_stream():
    from logagent_js_ray.stages.formats import aws_ecs_format
    t = pa.table({"logSource": ["app/error-stream", "app/warnish", "app/ok"],
                  "severity": [None, None, "info"]})
    out = aws_ecs_format(t)
    assert out["severity"].to_pylist() == ["error", "warning", "info"]


def test_influx_projection():
    from logagent_js_ray.stages.formats import influx_projection
    t = pa.table({
        "count": pa.array([1.5, None], pa.float64()),
        "host": pa.array(["h1", "h2"], pa.string()),
        "message": pa.array(["skip", "skip"], pa.string()),
        "@timestamp": pa.array([dt.datetime(2025, 1, 1)] * 2,
                               pa.timestamp("us")),
    })
    out = influx_projection(t)
    assert out["fields"][0].as_py() == '{"count": 1.5}'
    assert out["fields"][1].as_py() == "{}"  # null numeric dropped
    assert out["tags"][0].as_py() == '{"host": "h1"}'
    assert out["time_ns"][0].as_py() == 1735689600000000000


def test_geo_prefix_enricher():
    from logagent_js_ray.stages.formats import GeoPrefixEnricher
    enr = GeoPrefixEnricher()
    t = pa.table({"client_ip": ["1.2.3.4", "200.1.1.1", None, "junk"]})
    out = enr(t)
    vals = out["geo_region"].to_pylist()
    assert vals[0] in enr.REGIONS and vals[1] in enr.REGIONS
    assert vals[2] is None and vals[3] is None
    # deterministic: same input -> same region
    assert enr(t)["geo_region"].to_pylist() == vals


def test_cri_pattern():
    from logagent_js_ray.registry import load_registry
    from logagent_js_ray.stages.parse import parse_batch
    t = pa.table({
        "conv_id": ["c"] * 2, "turn_idx": pa.array([0, 1], pa.int32()),
        "role": ["pod"] * 2,
        "text": ["2025-01-02T03:04:05Z stdout F all good",
                 "2025-01-02T03:04:06Z stderr F boom"],
        "tool": ["none"] * 2,
        "ts": pa.array([dt.datetime(2025, 1, 1)] * 2, pa.timestamp("us")),
    })
    out = parse_batch(t, load_registry())
    assert out["_type"].to_pylist() == ["cri_containerd"] * 2
    assert out["message"].to_pylist() == ["all good", "boom"]
    assert out["severity"].to_pylist() == [None, "error"]
    assert out["stream"].to_pylist() == ["stdout", "stderr"]
    assert out["@timestamp"][0].as_py() == dt.datetime(2025, 1, 2, 3, 4, 5)


def test_global_transform():
    from logagent_js_ray.stages.parse import make_global_transform_fn
    def add_flag(b: pa.Table) -> pa.Table:
        return b.append_column("flagged", pa.array([True] * b.num_rows))
    t = pa.table({"x": [1, 2]})
    out = make_global_transform_fn(add_flag)(t)
    assert out["flagged"].to_pylist() == [True, True]


def test_gelf_projection():
    from logagent_js_ray.stages.formats import gelf_projection
    t = pa.table({
        "@timestamp": pa.array([dt.datetime(2024, 1, 5, 10)] * 2,
                               pa.timestamp("us")),
        "severity": pa.array(["error", None], pa.string()),
        "message": pa.array(["boom", "fine"], pa.string()),
        "extra": pa.array([1, 2], pa.int64()),
    })
    out = gelf_projection(t, source_name="files")
    assert out.column_names == ["timestamp", "level", "full_message",
                                "short_message"]
    assert out["level"].to_pylist() == ["error", "INFO"]  # default INFO
    assert out["short_message"].to_pylist() == ["src:logagent-files"] * 2
    assert out["full_message"].to_pylist() == ["boom", "fine"]


def test_cloudfoundry_format():
    # cloudfoundry-format.js:20-82 — tag list explode, index suffix
    # strip, JSON-object message surfaced
    from logagent_js_ray.stages.formats import make_cloudfoundry_format_fn
    fn = make_cloudfoundry_format_fn(["deployment", "job"], index="li1")
    t = pa.table({
        "tags": ['deployment="cf" job="router" index="3"',
                 'job=diego_cell', None],
        "_type": ["cf_li1", "cf_li1", "other"],
        "logSource": ["RTR_li1", "APP_li1", "x"],
        "message": ['{"status":200,"path":"/x"}', "plain text", None],
    })
    out = fn(t)
    assert out["tag_deployment"].to_pylist() == ["cf", None, None]
    assert out["tag_job"].to_pylist() == ["router", "diego_cell", None]
    assert out["_type"].to_pylist() == ["cf", "cf", "other"]
    assert out["logSource"].to_pylist() == ["RTR", "APP", "x"]
    assert out["cf_json"].to_pylist() == [
        '{"status":200,"path":"/x"}', None, None]


def test_device_detector_ios_before_macos():
    import pyarrow as pa

    from logagent_js_ray.stages.formats import DeviceDetector
    uas = ["Mozilla/5.0 (iPhone; CPU iPhone OS 16_6 like Mac OS X) "
           "AppleWebKit/605.1.15 Version/16.6 Mobile/15E148 Safari/604.1",
           "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) "
           "AppleWebKit/537.36 Chrome/120.0 Safari/537.36"]
    out = DeviceDetector()(pa.table({"user_agent": uas}))
    # every iPhone UA contains 'like Mac OS X': iOS must win
    assert out["ua_os"].to_pylist() == ["iOS", "macOS"]


def test_vercel_verify_signature_known_answers():
    """Known-answer vectors lifted from the reference's OWN spec
    (test/vercel/vercelSignature.spec.js): secret
    'idmnMEd7Yx4QmgzZpZ4axXoe', body JSON.stringify({id:1,message:'1'}),
    HMAC-SHA1 hex ec20b54c03db09dffd39fe1465a6a7a4bc34bfc3."""
    import pyarrow as pa
    from logagent_js_ray.stages.formats import (vercel_signature_batch,
                                                vercel_verify_signature)
    secret = "idmnMEd7Yx4QmgzZpZ4axXoe"
    body = '{"id":1,"message":"1"}'
    sig = "ec20b54c03db09dffd39fe1465a6a7a4bc34bfc3"
    # two secrets / one secret / many-with-one-valid (spec cases)
    assert vercel_verify_signature(body, sig, [secret, secret]) is True
    assert vercel_verify_signature(body, sig, [secret]) is True
    assert vercel_verify_signature(
        body, sig, [secret, "kjsdfakslf", "aslsadslkjdkld"]) is True
    # wrong-secret-only array -> False; non-array config -> None
    # (the reference returns undefined, js:109-115)
    assert vercel_verify_signature(body, sig, ["nope"]) is False
    assert vercel_verify_signature(body, sig, "not-an-array") is None
    # bytes body == str body (the reference hashes the raw buffer)
    assert vercel_verify_signature(body.encode(), sig, [secret]) is True
    out = vercel_signature_batch(pa.table({
        "body": pa.array([body, body], pa.string()),
        "x_zeit_signature": pa.array([sig, "bad"], pa.string()),
    }), [secret])
    assert out["sig_verified"].to_pylist() == [True, False]
