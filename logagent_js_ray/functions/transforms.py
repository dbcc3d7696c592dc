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


def cri_line(cols: dict[str, pa.Array]) -> None:
    """CRI log line: message becomes the payload; stderr lines default
    to severity 'error' (mirrors docker/CRI stream semantics,
    kubernetesContainerd.js:65-130)."""
    cols["message"] = cols.pop("msg_text")
    cols["severity"] = pc.if_else(
        pc.equal(cols["stream"], "stderr"),
        pa.scalar("error", pa.string()), pa.scalar(None, pa.string()))


TRANSFORMS = {
    "access_log": access_log,
    "syslog_pri": syslog_pri,
    "cri_line": cri_line,
}


def get_transform(name: str):
    return TRANSFORMS[name]


def register_transform(name: str, fn) -> None:
    """User-extension hook (SURVEY.md §2.9): third-party pattern files
    refer to transforms by NAME; registering a Python callable here is
    the rebuild of logagent's npm-plugin / !!js/function surface, with
    no code ever eval'd from config."""
    TRANSFORMS[name] = fn
