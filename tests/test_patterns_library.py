"""Broad source library (patterns_library.yml) — one representative
line per reference source group (/root/reference/patterns.yml:84-1176),
parsed via the real parse stage with the library merged before the
defaults (mergePatternFiles.js:48 order)."""

import datetime as dt

import pyarrow as pa
import pytest

from logagent_js_ray.registry import LIBRARY_PATTERNS, load_registry
from logagent_js_ray.stages.parse import parse_batch

ROW_TS = dt.datetime(2030, 6, 1, 12, 0, 0)


def parse_one(source: str, line: str) -> dict:
    reg = load_registry([LIBRARY_PATTERNS])
    t = pa.table({
        "text": pa.array([line], pa.string()),
        "role": pa.array([source], pa.string()),
        "ts": pa.array([ROW_TS], pa.timestamp("us")),
    })
    out = parse_batch(t, reg)
    assert out.num_rows == 1
    return {k: v[0] for k, v in out.to_pydict().items()}


CASES = [
    # (source, line, type, expectations)
    ("sematext/agent",
     'time=2024-01-05T10:00:00Z level=info msg="started agent" source="a.go"',
     "sematext_agent_golang",
     {"severity": "info", "message": "started agent"}),
    ("swarm",
     'time="2024-01-05T10:00:00Z" level=warning msg="node joined"',
     "docker", {"severity": "warning", "message": "node joined"}),
    ("clickhouse",
     "2024.01.05 10:00:00.123456 [ 42 ] {q-1} <Debug> executeQuery: Read",
     "clickhouse",
     {"severity": "Debug", "thread_number": 42.0, "query_id": "q-1",
      "module": "executeQuery"}),
    ("elasticsearch",
     "[2024-01-05T10:00:00,123][INFO ][o.e.n.Node] [node-1] started",
     "elasticsearch",
     {"severity": "INFO", "class_name": "o.e.n.Node",
      "node_name": "node-1", "message": "started"}),
    ("solr",
     "2024-01-05 10:00:00.123 INFO  (qtp1-12) [collection1] "
     "o.a.s.c.S.Request [shard1]  webapp=/solr path=/select "
     "params={q=*:*} hits=42 status=0 QTime=3",
     "apache_solr_7_8_hits",
     {"hits": 42.0, "status": 0.0, "qtime": 3.0, "path": "/select"}),
    ("hyperkube",
     "I0105 10:00:00.123456 12345 wrap.go:42 GET /api/v1/nodes: (2.271ms) "
     "200 [[hyperkube/v1.8.0 (linux/amd64) kubernetes/abc] 10.0.0.1:52310]",
     "hyperkube",
     {"method": "GET", "url": "/api/v1/nodes", "status_code": 200.0,
      "duration": "2.271", "duration_unit": "ms", "port": 52310.0}),
    ("elasticsearch",
     "[2024-01-05T10:00:00,123][WARN ][index.search.slowlog.query] "
     "[node-1] [myidx][2] took[5ms], took_millis[5], types[doc], stats[], "
     'search_type[QUERY_THEN_FETCH], total_shards[5], source[{"q":1}],',
     "elasticsearch_slow_log",
     {"severity": "WARN", "node_name": "node-1", "index_name": "myidx",
      "shard_number": 2.0, "took_millis": 5.0, "total_shards": 5.0,
      "search_type": "QUERY_THEN_FETCH"}),
    ("solr",
     "2024-01-05 10:00:00.123 INFO  (qtp1-12) [collection1] "
     "o.a.s.c.S.Request [shard1]  webapp=/solr path=/select "
     "params={q=*:*} status=0 QTime=3",
     "apache_solr_7_8",
     {"status": 0.0, "qtime": 3.0, "shard": "shard1", "path": "/select"}),
    ("solr",
     "2024-01-05 10:00:00.123 INFO  (qtp1-12) [c1] o.a.s.s.SolrLog "
     'type="REJECTED" message="Unauthorized request" method="GET" '
     'status="401" requestType="ADMIN" username="bob" resource="/admin" '
     'queryString="q=1" collections=[c1]',
     "apache_solr_audit_log",
     {"status": 401.0, "username": "bob", "audit_type": "REJECTED",
      "message": "Unauthorized request"}),
    ("solr",
     "2024-01-05 10:00:00.123 WARN  (main) [c1] o.a.s.SolrCore slow commit",
     "apache_solr_7_8_generic",
     {"severity": "WARN", "thread": "main", "core": "c1",
      "message": "slow commit"}),
    ("solr",
     "INFO  - 2024-01-05 10:00:00.123; org.apache.solr.core.SolrCore; "
     "[collection1] webapp=/solr path=/select params={q=foo} hits=7 "
     "status=0 QTime=2",
     "apache_solr_v4.6",
     {"hits": 7.0, "status": 0.0, "qtime": 2.0,
      "application": "collection1"}),
    ("solr",
     "INFO  - 2024-01-05 10:00:00.123; [ collection1] "
     "org.apache.solr.core.SolrCore; webapp=/solr path=/select "
     "params={q=x} hits=3 status=0 QTime=1",
     "apache_solr",
     {"hits": 3.0, "application": "collection1",
      "class": "org.apache.solr.core.SolrCore"}),
    ("solr",
     "12345 [qtp1-11] INFO org.apache.solr.core.SolrCore "
     "[collection1 shard1 core1 replica1] x:core_node1 [c1] webapp=/solr "
     "path=/select params={q=y} status=0 QTime=4",
     "apache_solr_v5_1",
     {"status": 0.0, "qtime": 4.0, "core_name": "c1",
      "collection": "collection1"}),
    ("solr",
     "ERROR - 2024-01-05 10:00:00.123; org.apache.solr.common.SolrException; "
     "java.lang.NullPointerException: boom",
     "apache_solr",
     {"severity": "ERROR",
      "message": "java.lang.NullPointerException: boom"}),
    ("solr",
     "WARN  - 2024-01-05 10:00:00.123; no class here",
     "apache_solr_5_generic",
     {"severity": "WARN", "message": "no class here"}),
    ("solr",
     "987 INFO (qtp1-8) [x:collection1] o.a.s.c.SolrCore config loaded",
     "apache_solr4",
     {"severity": "INFO", "thread": "qtp1-8", "thread_id": "x:collection1",
      "message": "config loaded"}),
    ("kafka",
     "[2024-01-05 10:00:00,123] INFO [Controller id=1] processing",
     "apache_kafka",
     {"severity": "INFO", "message": "[Controller id=1] processing"}),
    ("hdfs",
     "2024-01-05 10:00:00,123 INFO org.apache.hadoop.hdfs.DataNode: recv",
     "apache_hdfs_data_node",
     {"severity": "INFO", "class_name": "org.apache.hadoop.hdfs.DataNode:"
      .rstrip(":"), "message": "recv"}),
    ("yarn",
     "2024-01-05 10:00:00,123 INFO org.apache.hadoop.yarn.NodeManager: up",
     "apache_hadoop_yarn_node_manager",
     {"severity": "INFO", "message": "up"}),
    ("hbase",
     "2024-01-05 10:00:00,123 INFO [RS:0;h:16020] "
     "o.a.h.hbase.HRegionServer: started",
     "apache_hbase_region_server",
     {"thread": "RS:0;h:16020", "message": "started"}),
    ("zookeeper",
     "2024-01-05 10:00:00,123 [myid:2] - INFO "
     "[NIOServerCxn.Factory:0.0.0.0/0.0.0.0:2181:NIOServerCnxn@1007] - "
     "Closed socket connection for client /10.0.0.5:51234 which had "
     "sessionid 0x14f8054fbbb0004",
     "apache_zookeeper",
     {"client_ip": "10.0.0.5", "client_port": 51234.0,
      "session_id": "0x14f8054fbbb0004"}),
    ("zookeeper",
     "2024-01-05 10:00:00,123 [myid:2] - INFO "
     "[NIOServerCxn.Factory:0.0.0.0/0.0.0.0:2181:NIOServerCnxnFactory@197]"
     " - Accepted socket connection from /10.0.0.6:40123",
     "apache_zookeeper",
     {"client_ip": "10.0.0.6", "client_port": 40123.0}),
    ("zookeeper",
     "2024-01-05 10:00:00,123 [myid:1] - INFO [main:QuorumPeer@123] - "
     "Starting quorum peer",
     "apache_zookeeper",
     {"severity": "INFO", "machine_id": "myid:1",
      "message": "Starting quorum peer"}),
    ("cassandra",
     "INFO  [main] 2024-01-05 10:00:00,123 CassandraDaemon.java:507 - "
     "Hostname: node1",
     "apache_cassandra",
     {"module": "main", "java_file": "CassandraDaemon.java",
      "code_line": 507.0, "message": "Hostname: node1"}),
    ("mongo",
     "2015-07-28T00:35:46.329+0000 I JOURNAL  [initandlisten] journal dir",
     "mongodb",
     {"severity": "I", "component": "JOURNAL", "context": "initandlisten",
      "message": "journal dir"}),
    ("redis",
     "1:M 22 Jul 21:58:28.146 # Server started, Redis version 3.0.2",
     "redis",
     {"pid": 1.0, "redis_role": "master", "severity": "warning",
      "message": "Server started, Redis version 3.0.2"}),
    ("nexus",
     "2024-01-05 10:00:00,123+0000 INFO  [qtp-1] *SYSTEM "
     "org.sonatype.nexus.BootstrapListener - Begin",
     "nexus",
     {"severity": "INFO", "thread": "qtp-1", "nexus_user": "*SYSTEM"}),
    ("nodebb",
     "2024-01-05T10:00:00.123Z - info: [plugins] loaded",
     "nodebb_forum",
     {"severity": "info", "module": "plugins", "message": "loaded"}),
    ("mysql",
     "2015-07-25 14:11:35 0 [Note] mysqld starting as process 1",
     "mysql",
     {"pid": 0.0, "level": "Note",
      "message": "mysqld starting as process 1"}),
    ("nsqio/nsq",
     "2024/01/05 10:00:00 INF 1 [nsqd] TCP: listening",
     "nsq", {"level": "INF", "module": "nsqd",
             "message": "TCP: listening"}),
    ("traefik",
     '10.0.0.1 - u1 [05/Jan/2024:10:00:00 +0000] "GET /p HTTP/1.1" 200 '
     '123 "http://r" "curl/8" 5 "front" "http://back:80" 12ms',
     "traefik_access_log",
     {"status_code": 200.0, "size": 123.0, "response_time": 12.0,
      "user_agent": "curl/8", "message": "GET /p"}),
    ("httpd",
     'nginx-proxy web.example.com 10.0.0.9 [05/Jan/2024:10:00:00 +0000] '
     '"GET /i HTTP/1.1" 200 512 "http://example.com/i" "curl/8"',
     "access_common",
     {"proxy_service": "nginx-proxy", "virtual_host": "web.example.com",
      "client_ip": "10.0.0.9", "status_code": 200.0, "size": 512.0,
      "url": "http://example.com/i", "user_agent": "curl/8"}),
    ("nginx",
     '10.0.0.1 - - [05/Jan/2024:10:00:00 +0000] "GET /x HTTP/1.1" 200 5 '
     '"-" "Mozilla"',
     "access_log_combined",
     {"status_code": 200.0, "referer": "-", "user_agent": "Mozilla",
      "message": "GET /x"}),
    ("nginx",
     "2024/01/05 10:00:00 [error] 123#456: *1 open() failed",
     "nginx_error_log",
     {"level": "error", "pid": 123.0, "tid": 456.0,
      "message": "*1 open() failed"}),
    ("apache2",
     "[Wed Oct 11 14:32:52 2000] [error] [client 127.0.0.1] denied",
     "apache_error_log",
     {"level": "error", "client_ip": "127.0.0.1", "message": "denied"}),
    ("flink",
     "2024-01-05 10:00:00,123 INFO org.apache.flink.JobManager - Starting",
     "flink_manager", {"severity": "INFO", "message": "Starting"}),
    ("flink",
     "Jul 22, 2015 1:58:28 PM org.apache.flink.JobManager main "
     "INFO: Starting JobManager",
     "flink_manager",
     {"severity": "INFO", "message": "Starting JobManager"}),
    ("apache2",
     "[Wed Jan 05 10:00:00.123456 2024] [mpm_prefork:notice] [pid 123] "
     "AH00163: Apache configured",
     "apache_mpm",
     {"event_type": "mpm_prefork:notice", "process_info": "pid 123",
      "message": "AH00163: Apache configured"}),
    ("tutum/cleanup",
     "2024/01/05 10:00:00 removing exited container",
     "tutum_cleanup", {"message": "removing exited container"}),
    ("rabbitmq",
     "2024-01-05 10:00:00.123 [info] <0.33.0>\n"
     " Starting RabbitMQ 3.7.8 on Erlang 21.0\n"
     " Copyright (c) 2007-2018 Pivotal Software, Inc.\n"
     " Licensed under the MPL 1.1. See https://rabbitmq.com",
     "rabbitmq_startup",
     {"severity": "info", "rabbitmq_version": "3.7.8",
      "erlang_version": "21.0", "license": "MPL 1.1"}),
    ("rabbitmq",
     "2024-01-05 10:00:00.123 [info] <0.33.0> WAL: recovering "
     '["/var/lib/rabbitmq/quorum/wal"]',
     "rabbitmq_wal_recovery",
     {"wal_path": '"/var/lib/rabbitmq/quorum/wal"'}),
    ("rabbitmq",
     "2024-01-05 10:00:00.123 [error] <0.99.0> HTTP access denied: "
     "user 'guest' - invalid credentials",
     "rabbitmq_access_denied",
     {"user": "guest", "reason": "invalid credentials"}),
    ("rabbitmq",
     "2024-01-05 10:00:00.123 [error] <0.100.0> Error on AMQP connection "
     "<0.101.0> (10.0.0.1:49152 -> 10.0.0.2:5672, state: starting):\n"
     "PLAIN login refused: user 'bob' - invalid credentials",
     "rabbitmq_login_refused",
     {"auth_method": "PLAIN", "user": "bob", "source_port": 49152.0,
      "state": "starting", "reason": "invalid credentials"}),
    ("rabbitmq",
     "2024-01-05 10:00:00.123 [info] <0.105.0> connection <0.106.0> "
     "(10.0.0.1:49153 -> 10.0.0.2:5672): user 'alice' authenticated and "
     "granted access to vhost '/prod'",
     "rabbitmq_connections_authenticated",
     {"user": "alice", "vhost": "/prod", "source_port": 49153.0}),
    ("rabbitmq",
     "2024-01-05 10:00:00.123 [info] <0.107.0> closing AMQP connection "
     "<0.108.0> (10.0.0.3:49200 -> 10.0.0.2:5672, vhost: '/', "
     "user: 'carol'):",
     "rabbitmq_connections_vhost_user",
     {"connection_event": "closing", "vhost": "/", "user": "carol",
      "destination_port": 5672.0}),
    ("rabbitmq",
     "2024-01-05 10:00:00.123 [info] <0.123.0> accepting AMQP connection "
     "<0.124.0> (10.0.0.1:5672 -> 10.0.0.2:5672)",
     "rabbitmq_connections",
     {"severity": "info", "connection_event": "accepting",
      "source_address": "10.0.0.1", "destination_port": 5672.0}),
    ("rabbitmq",
     "2024-01-05 10:00:00.123 [warning] <0.1.0> memory alarm set",
     "rabbitmq", {"severity": "warning", "message": "memory alarm set"}),
    ("postgres",
     "2024-01-05 10:00:00.123 UTC [77] alice@appdb LOG:  duration: "
     "1001.0 ms  execute stmt: SELECT 1",
     "postgres_slowlog",
     {"pg_user": "alice", "database": "appdb", "duration_ms": 1001.0,
      "statement": "SELECT 1"}),
    ("postgres",
     '2024-01-05 10:00:00.123 UTC [88] bob@shop ERROR:  relation "x" '
     "does not exist",
     "postgres_with_user",
     {"pg_user": "bob", "database": "shop", "severity": "ERROR",
      "pid": 88.0, "message": 'relation "x" does not exist'}),
    ("postgres",
     "2024-01-05 10:00:00.123 UTC [77] LOG:  database system is ready",
     "postgres",
     {"pid": 77.0, "severity": "LOG",
      "message": "database system is ready"}),
    ("couchdb",
     "[notice] 2024-01-05T10:00:00.000000Z couchdb@node1 chttpd "
     "1a2b3c4d5e 10.0.0.2:5984 10.0.0.9 admin GET /db/_all_docs 200 ok",
     "couchdb_http",
     {"severity": "notice", "server_ip": "10.0.0.2", "server_port": 5984.0,
      "client_ip": "10.0.0.9", "couch_user": "admin", "method": "GET",
      "url": "/db/_all_docs", "status_code": 200.0}),
    ("couchdb",
     "[info] 2024-01-05T10:00:00.000000Z couchdb@node1 couch_log "
     "abc12345 Apache CouchDB has started",
     "couchdb",
     {"severity": "info", "os_host": "couchdb@node1",
      "message": "Apache CouchDB has started"}),
    ("heroku",
     "83 <40>1 2024-01-05T10:00:00+00:00 host app web.1 - State changed",
     "heroku",
     {"severity": "emerg", "facility": 5.0, "app": "app",
      "message": "State changed"}),
    ("cloudfoundry",
     "<14>1 2024-01-05T10:00:00+00:00 host proc-1 [app-1] - [t1 t2] hello",
     "cloudfoundry",
     {"severity": "info", "facility": 1.0, "tags": "t1 t2",
      "message": "hello"}),
    ("syslog.log",
     "Jan  5 10:00:00 myhost sshd[123]: Accepted publickey for root",
     "system_log",
     {"syslog_host": "myhost", "service": "sshd", "pid": 123.0,
      "message": "Accepted publickey for root"}),
    ("app.log",
     "2024-01-05 10:00:00,123 [WARN] low disk space",
     "log", {"severity": "WARN", "message": "low disk space"}),
    ("logagent",
     "2024-01-05T10:00:00Z parsed 100 lines",
     "logagent-js", {"message": "parsed 100 lines"}),
]


@pytest.mark.parametrize("source,line,ptype,expect",
                         CASES, ids=[c[2] + "/" + c[0] for c in CASES])
def test_library_pattern(source, line, ptype, expect):
    row = parse_one(source, line)
    assert row["_type"] == ptype
    for k, v in expect.items():
        assert row[k] == v, f"{k}: {row[k]!r} != {v!r}"


def test_library_dates_parse_or_fall_back():
    # parsed ts from the line wherever a deterministic format exists
    for source, line, expected in [
        ("kafka", "[2024-01-05 10:00:00,123] INFO x",
         dt.datetime(2024, 1, 5, 10, 0, 0)),
        ("clickhouse", "2024.01.05 10:00:00.12 [ 1 ] {} <Trace> m: x",
         dt.datetime(2024, 1, 5, 10, 0, 0)),
        ("nginx", "2024/01/05 10:00:00 [error] 1#2: x",
         dt.datetime(2024, 1, 5, 10, 0, 0)),
        ("apache2", "[Wed Oct 11 14:32:52 2000] [error] "
         "[client 127.0.0.1] x", dt.datetime(2000, 10, 11, 14, 32, 52)),
        ("mongo", "2015-07-28T00:35:46.329+0000 I J  [i] x",
         dt.datetime(2015, 7, 28, 0, 35, 46)),
        # year-less redis format: deterministic row-ts fallback
        ("redis", "1:M 22 Jul 21:58:28.146 # x", ROW_TS),
    ]:
        row = parse_one(source, line)
        assert row["@timestamp"] == expected, (source, row["@timestamp"])


def test_library_does_not_shadow_transcript_defaults():
    # transcript roles match no library source gate; the lean default
    # registry output is unchanged with the library merged in front
    line = ('9.8.7.6 - - [05/Jan/2024:10:00:00 +0000] '
            '"GET /about/ HTTP/1.1" 200 512')
    row = parse_one("user", line)
    assert row["_type"] == "access_log_combined"
    assert row["message"] == "GET /about/"
    assert row["client_ip"] == "9.8.7.6"


def test_es_stack_trace_multiline_then_library_parse(ray_session):
    """ES java log with a stack trace: multiline merge (blockStart =
    reference patterns.yml:111) then the library's elasticsearch pattern
    — the full §2.1 multiline + §2.1 parse composition."""
    import ray.data
    from logagent_js_ray.registry import LIBRARY_PATTERNS
    from logagent_js_ray.stages.multiline import multiline_merge
    from logagent_js_ray.stages.parse import make_parse_fn
    lines = [
        "[2024-01-05T10:00:00,123][ERROR][o.e.b.Bootstrap] [node-1] fatal",
        "java.lang.OutOfMemoryError: Java heap space",
        "\tat org.elasticsearch.Boot.main(Boot.java:12)",
        "[2024-01-05T10:00:01,000][INFO ][o.e.n.Node] [node-1] stopping",
    ]
    t = pa.table({
        "conv_id": pa.array(["es-host"] * 4, pa.string()),
        "turn_idx": pa.array(range(4), pa.int32()),
        "text": pa.array(lines, pa.string()),
        "role": pa.array(["elasticsearch"] * 4, pa.string()),
        "ts": pa.array([ROW_TS] * 4, pa.timestamp("us")),
    })
    ds = multiline_merge(ray.data.from_arrow(t),
                         block_start=r"^\[\d{4}-\d{2}-\d{2}[ T]")
    parsed = ds.map_batches(make_parse_fn(pattern_paths=[LIBRARY_PATTERNS]),
                            batch_format="pyarrow")
    rows = sorted(parsed.take_all(), key=lambda r: r["turn_idx"])
    assert len(rows) == 2
    assert rows[0]["_type"] == "elasticsearch"
    assert rows[0]["severity"] == "ERROR"
    assert "OutOfMemoryError" in rows[0]["message"]
    assert "Boot.java:12" in rows[0]["message"]
    assert rows[1]["severity"].strip() == "INFO"
    assert rows[1]["@timestamp"] == dt.datetime(2024, 1, 5, 10, 0, 1)
