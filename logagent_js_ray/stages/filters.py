"""Line/event filters — rebuild of logagent-js's grep input filter and
drop-events output filter as vectorized boolean masks.

  * grep        — /root/reference/lib/plugins/input-filter/grep.js:7-27
                  ``matchSource`` gate + ``include``/``exclude`` regex
                  over the raw line; include wins only if exclude does
                  not also match.
  * drop_events — /root/reference/lib/plugins/output-filter/dropEventsFilter.js:23-76
                  per-FIELD include/exclude regex conditions; an event
                  failing ANY condition is dropped. (The reference tests
                  object fields via JSON.stringify; our fields are typed
                  columns cast to string.)
  * prep        — pre-parse line hygiene from the CLI driver: ANSI escape
                  strip + ``maxLogSize`` truncation
                  (/root/reference/bin/logagent.js:204,660-664;
                  lib/core/cliArgs.js:247-251 — 240 KB default).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

MAX_LOG_SIZE = 240 * 1024  # cliArgs.js:247-251 default
_ANSI_RE = r"\x1b\[[0-9;]*[A-Za-z]"


def make_prep_fn(text_col: str = "text", max_size: int = MAX_LOG_SIZE):
    def _prep(batch: pa.Table) -> pa.Table:
        txt = pc.fill_null(pc.cast(batch[text_col], pa.string()), "")
        txt = pc.replace_substring_regex(txt, _ANSI_RE, "")
        txt = pc.utf8_slice_codeunits(txt, 0, max_size)
        i = batch.schema.get_field_index(text_col)
        return batch.set_column(i, text_col, txt)
    return _prep


def make_grep_fn(include: str | None = None, exclude: str | None = None,
                 match_source: str | None = None,
                 text_col: str = "text", source_col: str = "role"):
    """grep.js semantics: events from non-matching sources PASS untouched;
    gated events must match include (if set) and not match exclude."""
    def _grep(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        # typed: a zero-length untyped [True]*0 array is null-typed and
        # pc.and_ has no (null, bool) kernel — empty blocks crashed
        keep = pa.array([True] * n, pa.bool_())
        # null source = not gated (passes untouched); null text = no
        # match — fill both so if_else/and_ never see null masks
        gate = (pc.fill_null(pc.match_substring_regex(
            batch[source_col], match_source), False)
            if match_source else keep)
        txt = batch[text_col]
        if include is not None:
            keep = pc.and_(keep, pc.if_else(
                gate, pc.fill_null(
                    pc.match_substring_regex(txt, include), False),
                pa.scalar(True)))
        if exclude is not None:
            keep = pc.and_(keep, pc.if_else(
                gate, pc.invert(pc.fill_null(
                    pc.match_substring_regex(txt, exclude), False)),
                pa.scalar(True)))
        return batch.filter(keep)
    return _grep


def make_drop_events_fn(include: dict[str, str] | None = None,
                        exclude: dict[str, str] | None = None):
    """dropEventsFilter.js: keep a row only if every include-field matches
    its regex and no exclude-field matches its regex."""
    inc = dict(include or {})
    exc = dict(exclude or {})

    def _drop(batch: pa.Table) -> pa.Table:
        keep = pa.array([True] * batch.num_rows, pa.bool_())
        for fld, rx in inc.items():
            if fld in batch.column_names:
                s = pc.cast(batch[fld], pa.string())
                m = pc.match_substring_regex(s, rx)
                keep = pc.and_(keep, pc.fill_null(m, False))
        for fld, rx in exc.items():
            if fld in batch.column_names:
                s = pc.cast(batch[fld], pa.string())
                m = pc.fill_null(pc.match_substring_regex(s, rx), False)
                keep = pc.and_(keep, pc.invert(m))
        return batch.filter(keep)
    return _drop
