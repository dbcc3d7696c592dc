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

import pyarrow as pa
import pyarrow.compute as pc


class RouteConfig:
    def __init__(self, routes: list[tuple[str, str]],
                 default_sink: str | None = "default",
                 drop_unmatched: bool = False,
                 source_col: str = "logSource",
                 index_override_col: str = "_index"):
        """``routes``: ordered [(sink_name, source_regex), ...] — the
        analogue of the ES output's ``indices: {token: [regex, ...]}``."""
        self.routes = list(routes)
        self.default_sink = default_sink
        self.drop_unmatched = drop_unmatched
        self.source_col = source_col
        self.index_override_col = index_override_col


def route_batch(batch: pa.Table, cfg: RouteConfig) -> pa.Table:
    n = batch.num_rows
    src = batch[cfg.source_col]
    sink = pa.nulls(n, pa.string())
    # precedence 1: per-event _index override (elasticsearch.js:181-186)
    if (cfg.index_override_col and
            cfg.index_override_col in batch.column_names):
        sink = pc.cast(batch[cfg.index_override_col], pa.string())
    # precedence 2: ordered first-match regex routing
    for name, regex in cfg.routes:
        todo = pc.is_null(sink)
        hit = pc.and_(todo, pc.match_substring_regex(src, regex))
        sink = pc.if_else(hit, pa.scalar(name, pa.string()), sink)
    # precedence 3: default / drop
    if cfg.drop_unmatched:
        out = batch.append_column("sink", sink)
        return out.filter(pc.is_valid(sink))
    if cfg.default_sink is not None:
        sink = pc.coalesce(sink, pa.scalar(cfg.default_sink, pa.string()))
    return batch.append_column("sink", sink)


def make_route_fn(cfg: RouteConfig):
    def _route(batch: pa.Table) -> pa.Table:
        return route_batch(batch, cfg)
    return _route
