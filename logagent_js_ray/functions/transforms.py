"""Named per-pattern transforms — the rebuild of logagent's YAML-embedded
``!!js/function`` transforms (/root/reference/lib/parser/parser.js:333-338;
examples /root/reference/patterns.yml:559-568,885-938) as registered,
VECTORIZED Python functions. No code is eval'd from config: patterns.yml
refers to these by name (SURVEY.md §2.9 rebuild extension surface).

Contract: ``fn(cols: dict[str, pa.Array]) -> None`` — mutate the column
dict for the matched row subset. All arrays are equal-length pyarrow
arrays; use pyarrow.compute kernels only (these run inside the hot parse
``map_batches`` stage).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# RFC5424 severity names, lowest number = highest severity.
SYSLOG_SEVERITY = pa.array(
    ["emerg", "alert", "crit", "err", "warning", "notice", "info", "debug"])

# bunyan numeric level -> severity name (parser.js:424-439 analogue).
BUNYAN_LEVELS = {10: "trace", 20: "debug", 30: "info",
                 40: "warn", 50: "error", 60: "fatal"}


def access_log(cols: dict[str, pa.Array]) -> None:
    """Combined access log: ``message = method + ' ' + path``; '-' status
    and size become 0 (/root/reference/patterns.yml:559-568)."""
    cols["message"] = pc.binary_join_element_wise(
        cols["method"], cols["path"], " ")
    for f in ("status_code", "size"):
        cols[f] = pc.replace_substring_regex(cols[f], r"^-$", "0")


def syslog_pri(cols: dict[str, pa.Array]) -> None:
    """Syslog priority decode: facility = prio >> 3, severity = prio & 7
    mapped to its RFC5424 name (/root/reference/patterns.yml:885-938);
    message becomes the free-text tail."""
    prio = pc.cast(cols["prio"], pa.int64())
    sev_idx = pc.bit_wise_and(prio, 7)
    cols["facility"] = pc.cast(
        pc.divide(pc.subtract(prio, sev_idx), 8), pa.float64())
    cols["severity"] = SYSLOG_SEVERITY.take(sev_idx)
    cols["message"] = cols.pop("msg_text")


syslog_pri.derived = {"facility": pa.float64()}


def cri_line(cols: dict[str, pa.Array]) -> None:
    """CRI log line: message becomes the payload; stderr lines default
    to severity 'error' (mirrors docker/CRI stream semantics,
    kubernetesContainerd.js:65-130)."""
    cols["message"] = cols.pop("msg_text")
    cols["severity"] = pc.if_else(
        pc.equal(cols["stream"], "stderr"),
        pa.scalar("error", pa.string()), pa.scalar(None, pa.string()))


def tail_message(cols: dict[str, pa.Array]) -> None:
    """message = the captured free-text tail (patterns whose reference
    field list ends in ``message``)."""
    cols["message"] = cols.pop("msg_text")


def redis_line(cols: dict[str, pa.Array]) -> None:
    """Redis log decode (/root/reference/patterns.yml:476-504): role
    letter -> role name (as ``redis_role`` — ``role`` is the transcript
    source column), level symbol -> severity; level is consumed."""
    role_in = cols["redis_role"]
    role = pa.scalar(None, pa.string())
    for letter, name in (("X", "sentinel"), ("C", "RDB/AOF writing child"),
                         ("S", "slave"), ("M", "master")):
        role = pc.if_else(pc.equal(role_in, letter),
                          pa.scalar(name, pa.string()), role)
    cols["redis_role"] = role
    level = cols.pop("level")
    sev = pc.cast(level, pa.string())
    for sym, name in ((".", "debug"), ("-", "verbose"),
                      ("*", "notice"), ("#", "warning")):
        sev = pc.if_else(pc.equal(level, sym),
                         pa.scalar(name, pa.string()), sev)
    cols["severity"] = sev
    cols["message"] = cols.pop("msg_text")


def couchdb_host(cols: dict[str, pa.Array]) -> None:
    """os.host from the node field, flattened to ``os_host``
    (/root/reference/patterns.yml:870-873)."""
    cols["os_host"] = cols["node"]
    if "msg_text" in cols:
        cols["message"] = cols.pop("msg_text")


TRANSFORMS = {
    "access_log": access_log,
    "syslog_pri": syslog_pri,
    "cri_line": cri_line,
    "tail_message": tail_message,
    "redis_line": redis_line,
    "couchdb_host": couchdb_host,
}

couchdb_host.derived = {"os_host": pa.string()}


def get_transform(name: str):
    """Registered name, or a ``pkg.mod:callable`` dotted path — the
    reference's require-by-module-name plugin fallback
    (bin/logagent.js:226-277; functions/dynamic.py)."""
    fn = TRANSFORMS.get(name)
    if fn is not None:
        return fn
    from .dynamic import is_dotted_path, load_callable
    if is_dotted_path(name):
        return load_callable(name)
    raise KeyError(name)


def register_transform(name: str, fn) -> None:
    """User-extension hook (SURVEY.md §2.9): third-party pattern files
    refer to transforms by NAME; registering a Python callable here is
    the rebuild of logagent's npm-plugin / !!js/function surface, with
    no code ever eval'd from config."""
    TRANSFORMS[name] = fn


# ---------------------------------------------------------------------
# Per-pattern post-parse filters — rebuild of the reference's
# ``p.filter(parsed, p)`` callable hook (parser.js:339-357): a pattern
# entry may name a registered predicate; rows of that pattern where it
# returns False are dropped (the logagentDropMessage analogue).
# Contract: ``fn(cols: dict[str, pa.Array]) -> pa.BooleanArray`` — a
# full-batch keep mask built with pyarrow.compute kernels; it is only
# consulted on the rows the pattern matched.

FILTERS: dict[str, object] = {}


def register_filter(name: str, fn) -> None:
    FILTERS[name] = fn


def get_filter(name: str):
    """Registered name or ``pkg.mod:callable`` (see get_transform)."""
    fn = FILTERS.get(name)
    if fn is not None:
        return fn
    from .dynamic import is_dotted_path, load_callable
    if is_dotted_path(name):
        return load_callable(name)
    raise KeyError(name)
