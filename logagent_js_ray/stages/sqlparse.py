"""SQL-string interface for the sql output filter — the reference
accepts a literal SQL query in config and runs it over the window
buffer with alasql (/root/reference/lib/plugins/output-filter/sql.js:
29-53, config example ``sql: 'SELECT SUM(size) AS s, path FROM ?
GROUP BY path'``). This module parses that config surface into the
distributed :func:`..stages.aggregate.sql_select` plan (per-block
partials + tree merge), so a reference user's ``sql:`` config line
drops in unchanged.

Supported grammar (the aggregate subset alasql is actually used for in
the reference's configs and tests, plus WHERE/HAVING/AVG):

    SELECT <item> [, <item> ...] FROM ?
      [WHERE <predicate>] [GROUP BY <col> [, <col> ...]]
      [HAVING <predicate>]
      [ORDER BY <out> [ASC|DESC] [, ...]] [LIMIT <n>]

    item       := COUNT(*) | COUNT(col) | COUNT(DISTINCT col)
                  | SUM(col) | MIN(col)
                  | MAX(col) | AVG(col)   [AS alias]
                  | col [AS alias]              (must be GROUPed)
    predicate  := SQL comparison/boolean expression over columns —
                  translated token-wise (= -> ==, <> -> !=, AND/OR/NOT
                  lowercased) into the Ray Dataset filter-expression
                  language; string literals pass through quoted.

ORDER BY names OUTPUT columns (aliases included) and sorts the tiny
merged result (a distributed sort over |groups| rows — free at the
sql filter's group cardinalities); LIMIT composes after it (top-N).
A LIMIT without a total-order ORDER BY is the same arbitrary-pick
alasql gives. Unnamed aggregates get deterministic names: ``n`` for
COUNT(*), else ``{fn}_{col}`` (``sum_size``, ``count_distinct_path``).
Joins, subqueries, expressions inside aggregates, DISTINCT outside
COUNT and SELECT * are out of grammar and raise ValueError loudly at
config time (the no-silent-subset rule).
"""

from __future__ import annotations

import re

_SQL_RE = re.compile(
    r"^\s*select\s+(?P<items>.+?)\s+from\s+\?"
    r"(?:\s+where\s+(?P<where>.+?))?"
    r"(?:\s+group\s+by\s+(?P<group>.+?))?"
    r"(?:\s+having\s+(?P<having>.+?))?"
    r"(?:\s+order\s+by\s+(?P<order>.+?))?"
    r"(?:\s+limit\s+(?P<limit>\d+))?\s*;?\s*$",
    re.I | re.S)

_AGG_ITEM_RE = re.compile(
    r"^(?P<fn>count|sum|min|max|avg)\s*\(\s*(?:(?P<dist>distinct)\s+)?"
    r"(?P<col>\*|[A-Za-z_]\w*)\s*\)"
    r"(?:\s+as\s+(?P<alias>[A-Za-z_]\w*))?$", re.I)

_ORDER_ITEM_RE = re.compile(
    r"^(?P<col>[A-Za-z_]\w*)(?:\s+(?P<dir>asc|desc))?$", re.I)

_KEY_ITEM_RE = re.compile(
    r"^(?P<col>[A-Za-z_]\w*)(?:\s+as\s+(?P<alias>[A-Za-z_]\w*))?$", re.I)

# predicate translation: word operators by token, = / <> by symbol;
# single-quoted SQL strings are protected from both
_STR_RE = re.compile(r"'(?:[^']|'')*'")
_WORD_OPS = {"and": "and", "or": "or", "not": "not",
             "true": "True", "false": "False",
             "null": None, "is": None, "like": None, "in": None,
             "between": None}


def _translate_predicate(pred: str) -> str:
    """SQL predicate -> Ray filter-expression string. LIKE / IN /
    BETWEEN / IS NULL are out of grammar and raise loudly (NULL
    comparison semantics differ between SQL and the expression
    language — refusing beats silently diverging)."""
    parts: list[str] = []
    pos = 0
    for m in _STR_RE.finditer(pred):
        parts.append(_translate_ops(pred[pos:m.start()]))
        parts.append('"' + m.group(0)[1:-1].replace("''", "'") + '"')
        pos = m.end()
    parts.append(_translate_ops(pred[pos:]))
    return "".join(parts)


def _translate_ops(frag: str) -> str:
    frag = frag.replace("<>", "!=")
    # a lone = (not ==, !=, <=, >=) becomes ==
    frag = re.sub(r"(?<![=<>!])=(?!=)", "==", frag)

    def word(m: re.Match) -> str:
        w = m.group(0)
        t = _WORD_OPS.get(w.lower(), w)
        if t is None:
            raise ValueError(f"SQL operator {w.upper()!r} is out of the "
                             "sql-filter grammar (stages/sqlparse.py)")
        return t
    return re.sub(r"[A-Za-z_]\w*", word, frag)


def parse_sql(sql: str) -> dict:
    """Parse the supported grammar into
    ``{keys, key_aliases, aggs, where, having}`` (sql_select inputs)."""
    m = _SQL_RE.match(sql)
    if not m:
        raise ValueError(f"unsupported sql-filter query (expected "
                         f"SELECT ... FROM ?): {sql!r}")
    keys: list[str] = []
    key_aliases: dict[str, str] = {}
    aggs: dict[str, tuple[str, str | None]] = {}
    group = [g.strip() for g in (m.group("group") or "").split(",")
             if g.strip()]
    for raw in m.group("items").split(","):
        item = raw.strip()
        am = _AGG_ITEM_RE.match(item)
        if am:
            fn = am.group("fn").lower()
            col = am.group("col")
            if am.group("dist"):
                if fn != "count" or col == "*":
                    raise ValueError(
                        f"DISTINCT is only supported inside COUNT(col) "
                        f"(got {item!r})")
                fn = "count_distinct"
            if col == "*":
                if fn != "count":
                    raise ValueError(f"{fn.upper()}(*) is not SQL")
                col = None
            out = am.group("alias") or (
                "n" if (fn == "count" and col is None)
                else f"{fn}_{col}")
            aggs[out] = (fn, col)
            continue
        km = _KEY_ITEM_RE.match(item)
        if km and km.group("col").lower() not in ("count", "sum", "min",
                                                  "max", "avg"):
            col = km.group("col")
            if col not in group:
                raise ValueError(
                    f"bare column {col!r} must appear in GROUP BY "
                    f"(got {group})")
            keys.append(col)
            if km.group("alias"):
                key_aliases[col] = km.group("alias")
            continue
        raise ValueError(f"unsupported SELECT item: {item!r}")
    for g in group:
        if g not in keys:
            # grouped-but-not-selected keys still shape the aggregate
            keys.append(g)
    if not aggs:
        raise ValueError("sql-filter query needs at least one aggregate")
    out_names = {key_aliases.get(k, k) for k in keys} | set(aggs)
    order: list[tuple[str, bool]] = []
    for raw in (m.group("order") or "").split(","):
        item = raw.strip()
        if not item:
            continue
        om = _ORDER_ITEM_RE.match(item)
        if not om:
            raise ValueError(f"unsupported ORDER BY item: {item!r}")
        col = om.group("col")
        if col not in out_names:
            raise ValueError(f"ORDER BY column {col!r} is not an output "
                             f"column (have {sorted(out_names)})")
        order.append((col, (om.group("dir") or "asc").lower() == "desc"))
    return {"keys": keys, "key_aliases": key_aliases, "aggs": aggs,
            "where": (_translate_predicate(m.group("where"))
                      if m.group("where") else None),
            "having": (_translate_predicate(m.group("having"))
                       if m.group("having") else None),
            "order": order,
            "limit": int(m.group("limit")) if m.group("limit") else None}


def run_sql(ds: "ray.data.Dataset", sql: str,
            approx_distinct: int | None = None) -> "ray.data.Dataset":
    """Execute a reference-style ``sql:`` config query distributed:
    parse, run :func:`..stages.aggregate.sql_select`, apply key
    aliases. Event-time windowing composes upstream exactly as in the
    reference (its windows are the buffer-flush interval; here a
    time-bucket column in GROUP BY — see stages/aggregate docstring).
    ``approx_distinct=k`` switches COUNT(DISTINCT) to the per-group
    KMV sketch (YAML: ``sql: {query: ..., approxDistinct: k}``) — the
    declared high-cardinality scale mode; exact is the default."""
    from .aggregate import sql_select
    spec = parse_sql(sql)
    out = sql_select(ds, spec["keys"], spec["aggs"],
                     where=spec["where"], having=spec["having"],
                     approx_distinct=approx_distinct)
    if spec["key_aliases"]:
        ren = spec["key_aliases"]

        def rename(b):
            return b.rename_columns([ren.get(c, c)
                                     for c in b.column_names])
        out = out.map_batches(rename, batch_format="pyarrow")
    if spec["order"]:
        out = out.sort([c for c, _ in spec["order"]],
                       descending=[d for _, d in spec["order"]])
    if spec["limit"] is not None:
        out = out.limit(spec["limit"])
    return out
