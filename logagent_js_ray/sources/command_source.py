"""Command input — rebuild of the reference's shell-command poller
(/root/reference/lib/plugins/input/command.js).

The reference execs a command template, splits stdout into lines
(stderr opt-in, js:83-93), substitutes ``$NOW`` and ``$QUERY_TIME``
(js:71-77), and persists the last run time to a file so restarts
resume incrementally (js:104-112). Here one invocation = one batch
read: the exec happens once on the driver (exactly like the reference's
single host), the captured lines fan out into an ``override_num_blocks``
Dataset so all downstream parsing is distributed, and the watermark
reuses the crash-safe :class:`..sources.sql_source.Watermark` file.

DEVIATION (documented): time is an explicit ``now`` argument, never
sampled — reruns are deterministic (SURVEY.md §7.5) — and the date
format is a Python ``strftime`` pattern rather than a moment.js one.
"""

from __future__ import annotations

import subprocess

import pyarrow as pa

from .sql_source import Watermark

DEFAULT_QUERY_TIME = "2001-01-01T00:00:00"  # "query this century" (js:26)


def read_command(command: str, now, watermark: Watermark | None = None,
                 date_format: str = "%Y-%m-%dT%H:%M:%S",
                 include_stderr: bool = False,
                 max_buffer: int = 50_000_000,
                 num_blocks: int = 16) -> "ray.data.Dataset":
    """Run one poll of ``command`` and return its output lines as a
    Dataset of ``{"text", "logSource"}`` rows.

    ``$NOW`` -> ``now`` formatted with ``date_format``; ``$QUERY_TIME``
    -> the watermark's stored time (default 2001-01-01, the reference's
    century default). After a successful run the watermark advances to
    ``now`` — the same order of operations as the reference
    (js:80-81,104-112), so a crashed run re-reads rather than skips.
    ``max_buffer`` mirrors the 50 MB pipe cap (js:45-46): longer output
    is truncated at the last whole line.
    """
    import ray.data
    cmd = command.replace("$NOW", now.strftime(date_format))
    if "$QUERY_TIME" in command:
        if watermark is None:
            raise ValueError("$QUERY_TIME needs a watermark")
        watermark.initial = DEFAULT_QUERY_TIME  # century default (js:26)
        cmd = cmd.replace("$QUERY_TIME", watermark.read())
    proc = subprocess.run(cmd, shell=True, capture_output=True)
    out = proc.stdout[:max_buffer]
    if len(proc.stdout) > max_buffer:
        nl = out.rfind(b"\n")
        if nl != -1:  # one giant line: keep the capped bytes whole
            out = out[:nl + 1]
    lines = out.decode("utf-8", "replace").splitlines()
    if include_stderr:
        lines += proc.stderr[:max_buffer].decode(
            "utf-8", "replace").splitlines()
    # advance only on success: a failed poll (connection refused etc.)
    # must re-read its window next run, never skip it
    if (watermark is not None and "$QUERY_TIME" in command
            and proc.returncode == 0):
        watermark.write(now.strftime(date_format))
    src = command  # sourceName defaults to the command (js:49-51)
    tbl = pa.table({"text": pa.array(lines, pa.string()),
                    "logSource": pa.array([src] * len(lines),
                                          pa.string())})
    return ray.data.from_arrow(tbl).repartition(
        min(num_blocks, max(1, len(lines))))
