"""Route stage — rebuild of logagent-js's sink routing as a vectorized
``sink`` column assignment.

Mirrors the elasticsearch output's precedence chain
(/root/reference/lib/plugins/output/elasticsearch.js:181-207):
``_index`` field on the event -> context index -> first-match regex
routing over ``logSource`` (LogSourceToIndexMapper,
/root/reference/lib/core/logSourceToIndexMapper.js:24-49) -> default
index, with optional drop-unmatched
(elasticsearch.js:193-195). First-match order over the routing table is
semantics, exactly like the pattern registry.

The regex evaluation is vectorized (one ``pc.match_substring_regex`` per
route, applied to the still-unrouted subset), so per-batch cost is
O(#routes) kernel calls, not O(rows × routes) Python work. The mapper's
per-source memo cache (logSourceToIndexMapper.js:22) is unnecessary here:
vectorization amortizes strictly better.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

# ES-style time-based index tokens (applyDateFormatToIndex,
# /root/reference/lib/plugins/output/elasticsearch.js:227-241)
_DATE_TOKEN_RE = re.compile(r"YYYY|MM|DD")
_TOKEN_TO_STRFTIME = {"YYYY": "%Y", "MM": "%m", "DD": "%d"}


def index_strftime_format(template: str) -> str | None:
    """Convert a date-templated index name ('logs-YYYY.MM.DD') into a
    strftime format ('logs-%Y.%m.%d'); None when the name is static."""
    if not _DATE_TOKEN_RE.search(template):
        return None
    esc = template.replace("%", "%%")
    return _DATE_TOKEN_RE.sub(lambda m: _TOKEN_TO_STRFTIME[m.group(0)], esc)


def _expand_date_templates(sink: pa.Array, batch: pa.Table,
                           ts_col: str) -> pa.Array:
    """Replace YYYY/MM/DD tokens in sink names with the row's event time
    — one vectorized strftime per DISTINCT template (a handful: the
    routing table entries plus any _index overrides), never per row.

    Bare-substring token matching is PARITY: the reference replaces
    /YYYY|MM|DD/g blindly (elasticsearch.js:227-241), so 'COMM-logs'
    becomes 'CO<month>-logs' there too. Rows with a null/missing
    timestamp keep the LITERAL template name (deterministic; the
    reference would throw on undefined @timestamp)."""
    templates = [s for s in pc.unique(sink).to_pylist()
                 if s and _DATE_TOKEN_RE.search(s)]
    if not templates:
        return sink
    ts = (batch[ts_col] if ts_col in batch.column_names
          else pa.nulls(batch.num_rows, pa.timestamp("us")))
    for tmpl in templates:
        expanded = pc.strftime(ts, format=index_strftime_format(tmpl))
        expanded = pc.fill_null(expanded, tmpl)
        sink = pc.if_else(pc.equal(sink, tmpl), expanded, sink)
    return sink


class RouteConfig:
    def __init__(self, routes: list[tuple[str, str]],
                 default_sink: str | None = "default",
                 drop_unmatched: bool = False,
                 source_col: str = "logSource",
                 index_override_col: str = "_index",
                 ts_col: str = "@timestamp"):
        """``routes``: ordered [(sink_name, source_regex), ...] — the
        analogue of the ES output's ``indices: {token: [regex, ...]}``.
        Sink names (and _index overrides) may carry YYYY/MM/DD tokens,
        expanded per row from ``ts_col`` (elasticsearch.js:202,227).

        A sink name or ``default_sink`` may also be a CALLABLE CONFIG
        VALUE — ``"$fn:name"`` referencing functions/config_fns.py, the
        no-eval analogue of the reference's index-as-function-of-event
        (config-reducer.js:3-20, elasticsearch.js:180) — resolved here
        once and evaluated vectorized per batch."""
        from ..functions.config_fns import resolve_config_value
        self.routes = [(resolve_config_value(n), rx) for n, rx in routes]
        self.default_sink = resolve_config_value(default_sink)
        self.drop_unmatched = drop_unmatched
        self.source_col = source_col
        self.index_override_col = index_override_col
        self.ts_col = ts_col


def route_batch(batch: pa.Table, cfg: RouteConfig) -> pa.Table:
    n = batch.num_rows
    src = batch[cfg.source_col]
    sink = pa.nulls(n, pa.string())
    # precedence 1: per-event _index override (elasticsearch.js:181-186)
    if (cfg.index_override_col and
            cfg.index_override_col in batch.column_names):
        sink = pc.cast(batch[cfg.index_override_col], pa.string())
    # precedence 2: ordered first-match regex routing. fill_null on the
    # match: a null logSource must mean "no match", not a null hit mask
    # that erases an already-set _index override through if_else
    for name, regex in cfg.routes:
        todo = pc.is_null(sink)
        hit = pc.and_(todo, pc.fill_null(
            pc.match_substring_regex(src, regex), False))
        if callable(name):  # callable config value: per-event sink
            from ..functions.config_fns import fn_values
            sink = pc.if_else(hit, fn_values(name, batch), sink)
        else:
            sink = pc.if_else(hit, pa.scalar(name, pa.string()), sink)
    # precedence 3: default / drop
    if cfg.drop_unmatched:
        sink = _expand_date_templates(sink, batch, cfg.ts_col)
        out = batch.append_column("sink", sink)
        return out.filter(pc.is_valid(sink))
    if cfg.default_sink is not None:
        if callable(cfg.default_sink):
            from ..functions.config_fns import fn_values
            sink = pc.coalesce(sink, fn_values(cfg.default_sink, batch))
        else:
            sink = pc.coalesce(sink,
                               pa.scalar(cfg.default_sink, pa.string()))
    sink = _expand_date_templates(sink, batch, cfg.ts_col)
    return batch.append_column("sink", sink)


def make_route_fn(cfg: RouteConfig):
    def _route(batch: pa.Table) -> pa.Table:
        return route_batch(batch, cfg)
    return _route


# the reference's receiver-list entry regex (parseReceiverList,
# /root/reference/lib/util/parser.js:8-29): comma-separated
# '<scheme>://<host>/<index>' strings; the index may carry YYYY/MM/DD
_RECEIVER_LIST_RE = re.compile(r"(\S+://\S+?)/(\S+)$")


def parse_receiver_list(receivers: str | None) -> list | None:
    """``LOGS_RECEIVER_URL``-style comma-separated receiver list ->
    ``[{"url": ..., "index": ...}, ...]``; entries that don't match
    map to None exactly like the reference's undefined (parser.js:
    17-26). Returns None for empty input (parser.js:9-11)."""
    if not receivers:
        return None
    out = []
    for r in receivers.split(","):
        m = _RECEIVER_LIST_RE.search(r)
        out.append({"url": m.group(1), "index": m.group(2)}
                   if m else None)
    return out


def make_fanout_fn(receivers: list, ts_col: str = "@timestamp",
                   include_primary: bool = True):
    """One-event→many-sinks fan-out — the multi-receiver loop of the ES
    output (context.logsReceivers, elasticsearch.js:210-224): every row
    is ADDITIONALLY emitted once per receiver with that receiver's
    (date-templated) index as its sink. Apply AFTER the route stage (the
    batch must already have a ``sink`` column). Output rows =
    input × (1 + len(receivers)); at scale prefer routing receivers to
    distinct partition values over materializing copies upstream of the
    sink write (the copies are zero-copy column substitutions here —
    only the sink column is new).

    Receivers may be index-template strings or ``{"url", "index"}``
    dicts (the :func:`parse_receiver_list` shape — each reference
    receiver carries its own endpoint, elasticsearch.js:215-222); with
    dict receivers every output row also carries a ``receiver_url``
    column (null on primary rows — the primary's url is transport
    config, not row data). None entries (unparseable list items) are
    skipped."""
    plans = []
    with_url = any(isinstance(r, dict) for r in receivers if r)
    for r in receivers:
        if r is None:
            continue
        tmpl = r["index"] if isinstance(r, dict) else r
        url = r.get("url") if isinstance(r, dict) else None
        plans.append((tmpl, index_strftime_format(tmpl), url))

    def _fan(batch: pa.Table) -> pa.Table:
        base = batch
        if with_url:
            base = base.append_column(
                "receiver_url", pa.nulls(batch.num_rows, pa.string()))
        tables = [base] if include_primary else []
        i = base.schema.get_field_index("sink")
        iu = (base.schema.get_field_index("receiver_url")
              if with_url else -1)
        for tmpl, fmt, url in plans:
            if fmt is not None:
                col = pc.strftime(base[ts_col], format=fmt)
            else:
                col = pa.array([tmpl] * base.num_rows, pa.string())
            t = base.set_column(i, "sink", col)
            if with_url:
                t = t.set_column(iu, "receiver_url",
                                 pa.array([url] * base.num_rows,
                                          pa.string()))
            tables.append(t)
        return pa.concat_tables(tables)
    return _fan
