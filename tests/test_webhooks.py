"""GitHub webhook format stages + access-watch reputation enricher
(SURVEY.md §2.5: github-events-format.js, github-logs-format.js,
access-watch.js)."""

import hashlib
import json

import pyarrow as pa


def _payload(event, **body):
    return event, json.dumps(body)


REPO = {"full_name": "acme/widget", "html_url": "https://gh.test/acme/widget"}
SENDER = {"login": "alice", "html_url": "https://gh.test/alice",
          "avatar_url": "https://gh.test/alice.png"}


def _table(rows):
    evs, bodies = zip(*rows)
    return pa.table({"row_id": pa.array(range(len(rows)), pa.int64()),
                     "gh_event": pa.array(evs, pa.string()),
                     "gh_body": pa.array(bodies, pa.string())})


def test_github_events_format_templating_and_drops():
    from logagent_js_ray.stages.webhooks import github_events_format
    rows = [
        _payload("issues", action="opened", repository=REPO, sender=SENDER,
                 issue={"html_url": "https://gh.test/i/7", "number": 7}),
        _payload("push", ref="refs/heads/main", repository=REPO,
                 sender=SENDER,
                 commits=[{"id": "c1"}, {"id": "c2"}],
                 head_commit={"id": "c2", "url": "https://gh.test/c2"}),
        _payload("push", ref="refs/tags/v1", repository=REPO, sender=SENDER,
                 commits=[{"id": "c1"}]),          # tag push -> dropped
        _payload("create", ref="feat", ref_type="branch", repository=REPO,
                 sender=SENDER),
        _payload("create", ref="v1", ref_type="tag", repository=REPO,
                 sender=SENDER),                   # tag create -> dropped
        _payload("watch", action="started", repository=REPO,
                 sender=SENDER),                   # unsupported -> dropped
        ("issues", "{not json"),                   # parse error -> dropped
    ]
    out = github_events_format(_table(rows))
    assert out["row_id"].to_pylist() == [0, 1, 3]
    assert out["severity"].to_pylist() == ["info"] * 3
    assert out["type"].to_pylist() == ["GitHub"] * 3
    assert out["title"][0].as_py() == "GitHub | Issues Opened"
    assert out["title"][1].as_py() == "GitHub | Push Branch"
    assert out["message"][0].as_py() == (
        "#### [[acme/widget](https://gh.test/acme/widget)]\n"
        "[issues #7](https://gh.test/i/7) opened by "
        "![](https://gh.test/alice.png&s=25) [alice](https://gh.test/alice)\n")
    assert "[2 commit(s)](https://gh.test/c2) pushed to branch "\
           "[main](https://gh.test/acme/widget/tree/main)" \
        in out["message"][1].as_py()


def test_github_logs_format_flat_projection():
    from logagent_js_ray.stages.webhooks import github_logs_format
    rows = [
        _payload("pull_request", action="closed", repository=REPO,
                 sender=SENDER,
                 pull_request={"html_url": "https://gh.test/p/3", "number": 3,
                               "title": "Fix+the+bug", "state": "closed"}),
        _payload("push", ref="refs/heads/dev", repository=REPO, sender=SENDER,
                 commits=[{"id": "a"}],
                 head_commit={"id": "a", "url": "https://gh.test/a"}),
        _payload("release", action="published", repository=REPO,
                 sender=SENDER,
                 release={"html_url": "https://gh.test/r/1",
                          "tag_name": "v2.0", "name": "Big+Release",
                          "prerelease": False}),
    ]
    out = github_logs_format(_table(rows))
    assert out.num_rows == 3
    assert out["title"].to_pylist() == [
        "Closed Pull Request", "Branch Push", "Published Release"]
    assert out["number"][0].as_py() == 3.0
    assert json.loads(out["gh_json"][0].as_py())["pr_title"] == "Fix the bug"
    assert out["branch_name"][1].as_py() == "dev"
    assert out["commit_count"][1].as_py() == 1.0
    # the reference keeps a stray ')' after the branch url (js:489)
    assert "https://gh.test/acme/widget/tree/dev) by alice" \
        in out["message"][1].as_py()
    assert out["tag"][2].as_py() == "v2.0"
    assert out["repo_name"].to_pylist() == ["acme/widget"] * 3
    assert out["sender_username"].to_pylist() == ["alice"] * 3


def test_reputation_enricher_gate_and_determinism(ray_session):
    import ray.data
    from logagent_js_ray.stages.webhooks import ReputationEnricher
    t = pa.table({
        "_type": ["access_log_combined", "access_log_combined", "login_event",
                  "access_common", "access_log_combined"],
        "client_ip": ["1.2.3.4", None, "1.2.3.4", "9.9.9.9", None],
        "user_agent": ["SpiderBot/1.0", "Mozilla/5.0", "curl/8", "-", None],
    })
    ds = ray.data.from_arrow(t).map_batches(
        ReputationEnricher, batch_format="pyarrow", concurrency=1)
    out = ds.take_all()
    h = hashlib.md5(b"1.2.3.4").hexdigest()
    flag = int(h[:2], 16)
    # row 0: matched type, address + bot UA
    assert out[0]["reputation_status"] == ("suspicious" if flag < 32
                                           else "ok")
    assert out[0]["reputation_threats"] == int(h[2:4], 16) % 4
    assert out[0]["identity_type"] == "robot"
    assert out[0]["robot_name"] == "bot-" + hashlib.md5(
        b"SpiderBot/1.0").hexdigest()[:6]
    assert out[0]["address_value"] == "1.2.3.4"
    # row 1: UA only -> identity, no address/reputation
    assert out[1]["identity_type"] == "browser"
    assert out[1]["reputation_status"] is None
    # row 2: _type not in matchTypes -> untouched
    assert out[2]["reputation_status"] is None
    assert out[2]["identity_type"] is None
    # row 3: '-' UA treated as absent (js:279-281); address still looked up
    assert out[3]["identity_type"] is None
    assert out[3]["address_country_code"] is not None
    # row 4: nothing to look up
    assert out[4]["address_value"] is None


def test_reputation_enricher_lru_cache():
    from logagent_js_ray.stages.webhooks import ReputationEnricher
    calls = []

    def resolver(addr, ua):
        calls.append((addr, ua))
        return {"reputation": {"status": "ok", "threats": 0}}

    enr = ReputationEnricher(resolver=resolver, cache_size=2)
    t = pa.table({"_type": ["access_common"] * 4,
                  "client_ip": ["a", "b", "a", "c"],
                  "user_agent": [None] * 4})
    out = enr(t)
    assert out["reputation_status"].to_pylist() == ["ok"] * 4
    assert calls == [("a", None), ("b", None), ("c", None)]  # 'a' cached


def test_github_events_minimal_columns():
    # regression: with ONLY the event/body columns, select([]).take()
    # collapsed to 0 rows and the record append crashed
    import json

    import pyarrow as pa

    from logagent_js_ray.stages.webhooks import github_events_format
    body = json.dumps({"action": "opened",
                       "repository": {"full_name": "o/r",
                                      "html_url": "https://x"},
                       "sender": {"login": "u", "html_url": "https://u"},
                       "issue": {"title": "T", "html_url": "https://i",
                                 "number": 1}})
    out = github_events_format(pa.table({
        "gh_event": pa.array(["issues"], pa.string()),
        "gh_body": pa.array([body], pa.string())}))
    assert out.num_rows == 1
    assert out["type"][0].as_py()
