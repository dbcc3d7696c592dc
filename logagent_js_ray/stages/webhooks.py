"""Webhook-format stages — rebuild of logagent-js's GitHub webhook
output filters and the access-watch reputation enricher (SURVEY.md §2.5)
as batch projections over a JSON payload column.

  * github_events_format —
    /root/reference/lib/plugins/output-filter/github-events-format.js:18-260
    maps an ``(event, body)`` webhook payload to a sematext-events record
    ``{severity:'info', type:'GitHub', title, message}`` with markdown
    templating per event kind; unsupported kinds (or guard failures, e.g.
    a tag push) are DROPPED (the reference's ``parseGithubEvent`` returns
    null and the callback is never invoked).
  * github_logs_format —
    /root/reference/lib/plugins/output-filter/github-logs-format.js:26-500
    richer flat projection: repo/sender fields, plain-text message,
    word-capitalized title, ``+``→space field cleanup, per-kind extras
    (issue/PR number, branch, release tag, commit count).
  * ReputationEnricher —
    /root/reference/lib/plugins/output-filter/access-watch.js:9-295
    per-IP / user-agent reputation lookup with an LRU cache and a
    ``matchTypes`` gate on ``_type``. The external api.access.watch
    service has no offline analogue, so the resolver is PLUGGABLE with a
    deterministic md5-keyed fake as default (clearly marked); the Ray
    side — actor pool, per-actor cache, destination/properties
    projection — is the real rebuild of the plugin's dataflow.

The reference receives one webhook per HTTP request; the rebuild's input
is a table with the event name and the JSON body as columns (the batch
analogue of ``{event, body}`` — github.js webhook receiver,
/root/reference/lib/plugins/input/webhooks/github.js).
"""

from __future__ import annotations

import hashlib
import json
from collections import OrderedDict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SUPPORTED = (
    "issues", "issue_comment", "pull_request", "pull_request_review",
    "pull_request_review_comment", "commit_comment", "push", "release",
    "create", "delete",
)


def _cap_first(s) -> str:
    # github-events-format.js:29-32 — first character only
    if not isinstance(s, str):
        return ""
    return s[:1].upper() + s[1:]


def _cap_words(s) -> str:
    # github-logs-format.js:41-44 — every word
    if not isinstance(s, str):
        return ""
    return " ".join(_cap_first(w) for w in s.split(" "))


def _plus_to_space(s):
    # github-logs-format.js:39 parseTextFields
    return s.replace("+", " ") if isinstance(s, str) else s


def _repo(body: dict) -> tuple[str | None, str | None]:
    r = body.get("repository") or {}
    return r.get("full_name"), r.get("html_url")


def _sender(body: dict) -> tuple[str | None, str | None, str | None]:
    s = body.get("sender") or {}
    return s.get("login"), s.get("html_url"), s.get("avatar_url")


def _events_record(event: str, body: dict) -> dict | None:
    """One webhook -> sematext-events record; None = drop.
    Mirrors github-events-format.js:34-260 templating exactly."""
    repo_name, repo_url = _repo(body)
    name, url, avatar = _sender(body)
    repo_md = f"[[{repo_name}]({repo_url})]"
    author_md = f"![]({avatar}&s=25) [{name}]({url})"
    action = body.get("action")

    if event in ("issues", "issue_comment", "pull_request",
                 "pull_request_review", "pull_request_review_comment"):
        pr, issue = body.get("pull_request"), body.get("issue")
        if not (pr or issue):
            return None
        ev_url = (pr or {}).get("html_url") or (issue or {}).get("html_url")
        number = (pr or {}).get("number") or (issue or {}).get("number")
        msg = (f"#### {repo_md}\n[{event} #{number}]({ev_url}) {action} "
               f"by {author_md}\n")
    elif event == "commit_comment":
        c = body.get("comment")
        if not c:
            return None
        msg = (f"#### {repo_md}\n[{event} ({c.get('commit_id')})]"
               f"({c.get('html_url')}) {action} by {author_md}\n")
    elif event == "push":
        commits = body.get("commits") or []
        if not commits:
            return None
        parts = (body.get("ref") or "").split("/")
        if len(parts) < 3 or parts[1] != "heads":
            return None  # tag pushes dropped (events-format.js:168-171)
        branch = parts[2]
        head = body.get("head_commit") or {}
        action = "branch"
        msg = (f"#### {repo_md}\n[{len(commits)} commit(s)]"
               f"({head.get('url') or repo_url}) pushed to branch "
               f"[{branch}]({repo_url}/tree/{branch}) by {author_md}\n")
    elif event == "release":
        rel = body.get("release")
        if not rel:
            return None
        msg = (f"#### {repo_md}\n[{event} ({rel.get('tag_name')})]"
               f"({rel.get('html_url')}) {action} by {author_md}\n")
    elif event in ("create", "delete"):
        if body.get("ref_type") != "branch":
            return None
        branch = body.get("ref")
        verb = "created" if event == "create" else "deleted"
        action = "Branch"
        msg = (f"#### {repo_md}\nBranch [{branch}]({repo_url}/tree/{branch})"
               f" {verb} by {author_md}\n")
    else:
        return None

    return {
        "severity": "info",
        "type": "GitHub",
        "title": f"GitHub | {_cap_first(event)} {_cap_first(action)}",
        "message": msg,
    }


def github_events_format(batch: pa.Table, event_col: str = "gh_event",
                         body_col: str = "gh_body") -> pa.Table:
    """Batch form of github-events-format.js: rows whose payload parses
    become event records; unparseable/unsupported rows are dropped."""
    events = batch[event_col].to_numpy(zero_copy_only=False)
    bodies = batch[body_col].to_numpy(zero_copy_only=False)
    keep, recs = [], []
    for i, (ev, bj) in enumerate(zip(events, bodies)):
        if ev not in _SUPPORTED or not bj:
            continue
        try:
            rec = _events_record(ev, json.loads(bj))
        except (ValueError, AttributeError, TypeError):
            continue  # formatSematextEventsOutput try/catch (js:8-15)
        if rec is not None:
            keep.append(i)
            recs.append(rec)
    passthrough = [c for c in batch.column_names
                   if c not in (event_col, body_col)]
    # build from a dict: select([]).take() collapses a zero-column table
    # to 0 rows and the record append then crashes on length mismatch
    ki = pa.array(keep, pa.int64())
    cols = {c: pc.take(batch[c], ki) for c in passthrough}
    for name in ("severity", "type", "title", "message"):
        cols[name] = pa.array([r[name] for r in recs], pa.string())
    return pa.table(cols)


def _logs_record(event: str, body: dict) -> dict | None:
    """github-logs-format.js:46-500 — flat projection + plain-text
    message. Extras beyond the fixed columns land in ``gh_json``."""
    repo_name, repo_url = _repo(body)
    name, url, _ = _sender(body)
    repo_msg = f"{repo_name} - {repo_url}"
    author_msg = f"{name} - {url}"
    action = body.get("action")
    number = None
    branch = None
    tag = None
    commit_count = None
    extra: dict = {}

    if event in ("issues", "issue_comment"):
        issue = body.get("issue")
        if not issue:
            return None
        number = issue.get("number")
        extra["issue_title"] = _plus_to_space(issue.get("title"))
        extra["issue_state"] = issue.get("state")
        msg = (f"{repo_msg} | {event} #{number} - {issue.get('html_url')} "
               f"{action} by {author_msg}")
    elif event in ("pull_request", "pull_request_review",
                   "pull_request_review_comment"):
        pr = body.get("pull_request")
        if not pr:
            return None
        number = pr.get("number")
        extra["pr_title"] = _plus_to_space(pr.get("title"))
        extra["pr_state"] = pr.get("state")
        msg = (f"{repo_msg} | {event} #{number} - {pr.get('html_url')} "
               f"{action} by {author_msg}")
    elif event == "commit_comment":
        c = body.get("comment")
        if not c:
            return None
        extra["commit_id"] = c.get("commit_id")
        msg = (f"{repo_msg} - {event} {c.get('commit_id')} - "
               f"{c.get('html_url')} {action} by {author_msg}")
    elif event == "push":
        commits = body.get("commits") or []
        if not commits:
            return None
        parts = (body.get("ref") or "").split("/")
        if len(parts) < 3 or parts[1] != "heads":
            return None
        branch = parts[2]
        head = body.get("head_commit") or {}
        action = "Branch"
        commit_count = len(commits)
        extra["head_commit_id"] = head.get("id")
        # logs-format.js:489 keeps the stray ')' after the branch url
        msg = (f"{repo_msg} {commit_count} commit(s) - "
               f"{head.get('url') or repo_url} pushed to branch: {branch} - "
               f"{repo_url}/tree/{branch}) by {author_msg}")
    elif event == "release":
        rel = body.get("release")
        if not rel:
            return None
        tag = rel.get("tag_name")
        extra["release_name"] = _plus_to_space(rel.get("name"))
        extra["prerelease"] = rel.get("prerelease")
        msg = (f"{repo_msg} {event} {tag} - {rel.get('html_url')} "
               f"{action} by {author_msg}")
    elif event in ("create", "delete"):
        if body.get("ref_type") != "branch":
            return None
        branch = body.get("ref")
        verb = "created" if event == "create" else "deleted"
        action = "Branch"
        msg = (f"{repo_msg} Branch {branch} - {repo_url}/tree/{branch}) "
               f"{verb} by {author_msg}")
    else:
        return None

    title_event = event.replace("_", " ")  # parseEventTitle (js:37)
    return {
        "severity": "info", "type": "GitHub",
        "title": f"{_cap_words(action)} {_cap_words(title_event)}",
        "event": event, "action": action, "message": msg,
        "repo_name": repo_name, "repo_url": repo_url,
        "sender_username": name, "sender_url": url,
        "number": number, "branch_name": branch, "tag": tag,
        "commit_count": commit_count,
        "gh_json": json.dumps(extra, sort_keys=True) if extra else None,
    }


_LOGS_SCHEMA = [
    ("severity", pa.string()), ("type", pa.string()), ("title", pa.string()),
    ("event", pa.string()), ("action", pa.string()), ("message", pa.string()),
    ("repo_name", pa.string()), ("repo_url", pa.string()),
    ("sender_username", pa.string()), ("sender_url", pa.string()),
    ("number", pa.float64()), ("branch_name", pa.string()),
    ("tag", pa.string()), ("commit_count", pa.float64()),
    ("gh_json", pa.string()),
]


def github_logs_format(batch: pa.Table, event_col: str = "gh_event",
                       body_col: str = "gh_body") -> pa.Table:
    events = batch[event_col].to_numpy(zero_copy_only=False)
    bodies = batch[body_col].to_numpy(zero_copy_only=False)
    keep, recs = [], []
    for i, (ev, bj) in enumerate(zip(events, bodies)):
        if ev not in _SUPPORTED or not bj:
            continue
        try:
            rec = _logs_record(ev, json.loads(bj))
        except (ValueError, AttributeError, TypeError):
            continue
        if rec is not None:
            keep.append(i)
            recs.append(rec)
    passthrough = [c for c in batch.column_names
                   if c not in (event_col, body_col)]
    ki = pa.array(keep, pa.int64())
    cols = {c: pc.take(batch[c], ki) for c in passthrough}
    for name, typ in _LOGS_SCHEMA:
        cols[name] = pa.array([r[name] for r in recs], typ)
    return pa.table(cols)


# --------------------------------------------------------------------
# access-watch analogue


def fake_reputation_resolver(address: str | None,
                             user_agent: str | None) -> dict:
    """DETERMINISTIC STAND-IN for the api.access.watch identity call
    (access-watch.js:169-227) — no network in this environment. Keyed on
    md5 like the reference's cache ids (js:125,146,173); field layout
    follows defaultConfig's *Properties lists (js:20-23)."""
    out: dict = {}
    if address:
        h = hashlib.md5(address.encode()).hexdigest()
        flag = int(h[:2], 16)
        out["address"] = {
            "value": address,
            "hostname": f"host-{h[:8]}.example",
            "country_code": ["us", "de", "jp", "br", "in", "fr", "gb",
                             "au"][flag % 8],
            "flags": [],
        }
        out["reputation"] = {
            "status": "suspicious" if flag < 32 else "ok",
            "threats": int(h[2:4], 16) % 4,
        }
    if user_agent:
        hu = hashlib.md5(user_agent.encode()).hexdigest()
        lowered = user_agent.lower()
        is_bot = any(k in lowered for k in ("bot", "crawler", "spider"))
        out["identity"] = {"type": "robot" if is_bot else "browser"}
        if is_bot:
            out["robot"] = {"id": hu[:12], "name": f"bot-{hu[:6]}",
                            "url": f"https://robots.example/{hu[:6]}"}
    return out


class ReputationEnricher:
    """Actor-pool rebuild of the access-watch output filter
    (access-watch.js:257-295): gate on ``_type`` in ``match_types``, look
    up address/user-agent through a per-actor LRU cache (the reference's
    ``LRU({max: cacheSize})``, js:62), project the configured property
    subsets into destination-prefixed columns (augmentData, js:229-246).

    ``resolver(address, user_agent) -> dict`` is injected state loaded
    once per actor — swap in a real client outside this sandbox.
    """

    PROPS = {
        # defaultConfig *Properties (access-watch.js:20-23)
        "identity": ("type",),
        "address": ("value", "hostname", "country_code", "flags"),
        "robot": ("id", "name", "url"),
        "reputation": ("status", "threats"),
    }

    def __init__(self, match_types=("access_common", "access_log_combined"),
                 address_source: str = "client_ip",
                 user_agent_source: str = "user_agent",
                 type_col: str = "_type", cache_size: int = 10000,
                 resolver=None, destinations=("reputation", "address",
                                              "identity", "robot")):
        pa.set_cpu_count(1)
        self.match_types = set(match_types) if match_types else None
        self.address_source = address_source
        self.user_agent_source = user_agent_source
        self.type_col = type_col
        self.cache: OrderedDict = OrderedDict()
        self.cache_size = cache_size
        self.resolver = resolver or fake_reputation_resolver
        self.destinations = destinations
        self.out_cols = [(f"{d}_{p}", d, p) for d in destinations
                         for p in self.PROPS[d]]

    def _lookup(self, address, user_agent) -> dict:
        key = (address, user_agent)
        hit = self.cache.get(key)
        if hit is not None:
            self.cache.move_to_end(key)
            return hit
        res = self.resolver(address, user_agent) or {}
        self.cache[key] = res
        if len(self.cache) > self.cache_size:
            self.cache.popitem(last=False)
        return res

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows

        def col(name):
            if name and name in batch.column_names:
                return batch[name].to_numpy(zero_copy_only=False)
            return np.full(n, None, dtype=object)

        types = col(self.type_col)
        addrs = col(self.address_source)
        uas = col(self.user_agent_source)
        outs = {name: np.full(n, None, dtype=object)
                for name, _, _ in self.out_cols}
        for i in range(n):
            if self.match_types is not None and types[i] not in \
                    self.match_types:
                continue  # js:268-272 — non-matching rows pass unchanged
            ua = uas[i]
            if ua == "-":  # js:279-281
                ua = None
            addr = addrs[i] or None
            if not (addr or ua):
                continue
            res = self._lookup(addr, ua)
            for name, dest, prop in self.out_cols:
                section = res.get(dest)
                if section is not None and prop in section:
                    outs[name][i] = section[prop]
        for name, _, _ in self.out_cols:
            vals = outs[name]
            if name.endswith(("_threats",)):
                arr = pa.array([None if v is None else int(v)
                                for v in vals], pa.int64())
            elif name.endswith("_flags"):
                arr = pa.array([None if v is None else json.dumps(v)
                                for v in vals], pa.string())
            else:
                arr = pa.array([None if v is None else str(v)
                                for v in vals], pa.string())
            batch = batch.append_column(name, arr)
        return batch
