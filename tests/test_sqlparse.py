"""SQL-string sql-filter interface (stages/sqlparse.py) — the
reference's literal ``sql:`` config line (sql.js:29-53) parsed into
the distributed sql_select plan."""

import pytest

from logagent_js_ray.stages.sqlparse import parse_sql, run_sql

REF_QUERY = "SELECT SUM(size) AS s, path FROM ? GROUP BY path"


def test_parse_reference_test_query():
    # the exact query shape from the reference's own sql-filter test
    # (test/sql-filter-test.js:14-40)
    spec = parse_sql(REF_QUERY)
    assert spec["keys"] == ["path"]
    assert spec["aggs"] == {"s": ("sum", "size")}
    assert spec["where"] is None and spec["having"] is None


def test_parse_implicit_alias_rejected():
    # implicit alias (no AS) is out of grammar: loud error
    with pytest.raises(ValueError, match="unsupported SELECT item"):
        parse_sql("SELECT path p, count(*) FROM ? GROUP BY path")


def test_parse_full_clause_set_explicit():
    spec = parse_sql(
        "SELECT path AS p, count(*), AVG(size), MIN(size) AS lo FROM ? "
        "WHERE status = 200 AND path <> '/x' "
        "GROUP BY path HAVING n > 1")
    assert spec["keys"] == ["path"]
    assert spec["key_aliases"] == {"path": "p"}
    assert spec["aggs"] == {"n": ("count", None),
                            "avg_size": ("avg", "size"),
                            "lo": ("min", "size")}
    assert spec["where"] == 'status == 200 and path != "/x"'
    assert spec["having"] == "n > 1"


def test_parse_rejects_out_of_grammar():
    with pytest.raises(ValueError, match="unsupported sql-filter"):
        parse_sql("DELETE FROM ?")
    with pytest.raises(ValueError, match="GROUP BY"):
        parse_sql("SELECT path, count(*) FROM ?")
    with pytest.raises(ValueError, match="at least one aggregate"):
        parse_sql("SELECT path FROM ? GROUP BY path")
    with pytest.raises(ValueError, match="LIKE"):
        parse_sql("SELECT count(*) FROM ? WHERE path LIKE '/a%'")
    with pytest.raises(ValueError, match="unsupported SELECT item"):
        parse_sql("SELECT size + 1 FROM ? GROUP BY path")


def test_parse_count_distinct_order_limit():
    spec = parse_sql(
        "SELECT severity, COUNT(DISTINCT host) AS hosts, COUNT(*) AS n "
        "FROM ? GROUP BY severity ORDER BY n DESC, severity LIMIT 3")
    assert spec["aggs"]["hosts"] == ("count_distinct", "host")
    assert spec["order"] == [("n", True), ("severity", False)]
    assert spec["limit"] == 3
    # deterministic default name
    spec2 = parse_sql("SELECT COUNT(DISTINCT host) FROM ? GROUP BY severity")
    assert spec2["aggs"] == {"count_distinct_host": ("count_distinct", "host")}
    # DISTINCT only inside COUNT(col); ORDER BY must name an output col
    with pytest.raises(ValueError, match="DISTINCT"):
        parse_sql("SELECT SUM(DISTINCT size) FROM ? GROUP BY path")
    with pytest.raises(ValueError, match="DISTINCT"):
        parse_sql("SELECT COUNT(DISTINCT *) FROM ? GROUP BY path")
    with pytest.raises(ValueError, match="not an output"):
        parse_sql("SELECT COUNT(*) AS n FROM ? GROUP BY path ORDER BY size")


def test_parse_having_then_order_limit():
    # HAVING's non-greedy group must stop at ORDER BY, not swallow it
    spec = parse_sql("SELECT path, COUNT(*) AS n FROM ? GROUP BY path "
                     "HAVING n > 1 ORDER BY n DESC LIMIT 1")
    assert spec["having"] == "n > 1"
    assert spec["order"] == [("n", True)] and spec["limit"] == 1
    spec2 = parse_sql("SELECT path, COUNT(*) AS n FROM ? "
                      "GROUP BY path LIMIT 5")
    assert spec2["order"] == [] and spec2["limit"] == 5


def test_parse_global_aggregate():
    # no GROUP BY is legal when every item is an aggregate (the most
    # common sql-filter query in the reference's docs: a global COUNT)
    spec = parse_sql("SELECT COUNT(*) AS c FROM ? WHERE severity = 'error'")
    assert spec["keys"] == [] and spec["aggs"] == {"c": ("count", None)}


def test_run_sql_count_distinct_order_limit(ray_session):
    import ray.data
    rows = [{"severity": sv, "host": h, "size": s}
            for sv, h, s in [("error", "a", 10), ("info", "b", 20),
                             ("error", "a", 30), ("warn", "c", 5),
                             ("info", "b", 15), ("error", "b", 25),
                             (None, "a", 7)]]
    ds = ray.data.from_items(rows)
    out = run_sql(
        ds, "SELECT severity, COUNT(*) AS n, COUNT(DISTINCT host) AS hosts, "
            "SUM(size) AS total FROM ? GROUP BY severity "
            "ORDER BY n DESC, severity LIMIT 2").to_pandas()
    assert out["severity"].tolist() == ["error", "info"]
    assert out["hosts"].tolist() == [2, 1]
    assert out["total"].tolist() == [65, 35]


def test_run_sql_order_by_key_alias(ray_session):
    import ray.data
    ds = ray.data.from_items(
        [{"path": p, "size": s} for p, s in
         [("/a", 1), ("/b", 2), ("/c", 3), ("/b", 4)]])
    out = run_sql(ds, "SELECT path AS p, SUM(size) AS s FROM ? "
                      "GROUP BY path ORDER BY p DESC LIMIT 2").to_pandas()
    assert out.columns.tolist() == ["p", "s"]
    assert out["p"].tolist() == ["/c", "/b"]
    assert out["s"].tolist() == [3, 6]


def test_run_sql_global_aggregate(ray_session):
    import ray.data
    ds = ray.data.from_items(
        [{"host": h, "size": s} for h, s in
         [("a", 10), ("b", 20), ("a", 30), (None, 5)]])
    out = run_sql(ds, "SELECT COUNT(*) AS n, COUNT(DISTINCT host) AS hosts, "
                      "AVG(size) AS mean, MIN(size) AS lo FROM ?").to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["n"] == 4 and out.iloc[0]["hosts"] == 2
    assert out.iloc[0]["mean"] == 16.25 and out.iloc[0]["lo"] == 5
    # SQL: a global aggregate over zero rows is still ONE row
    empty = run_sql(ds, "SELECT COUNT(*) AS n, SUM(size) AS total FROM ? "
                        "WHERE size > 1000").to_pandas()
    assert len(empty) == 1
    assert empty.iloc[0]["n"] == 0
    import pandas as pd
    assert pd.isna(empty.iloc[0]["total"])


def test_run_sql_end_to_end(ray_session):
    import ray.data
    rows = [{"path": p, "size": s, "status": st}
            for p, s, st in [("/a", 10, 200), ("/a", 20, 200),
                             ("/a", 30, 500), ("/b", 100, 200),
                             ("/c", 7, 404)]]
    ds = ray.data.from_items(rows)
    out = run_sql(ds, REF_QUERY).to_pandas().sort_values("path")
    assert out["path"].tolist() == ["/a", "/b", "/c"]
    assert out["s"].tolist() == [60, 100, 7]
    out2 = run_sql(
        ds, "SELECT path AS route, COUNT(*) AS hits, AVG(size) FROM ? "
            "WHERE status = 200 GROUP BY path HAVING hits > 1") \
        .to_pandas()
    assert out2.columns.tolist() == ["route", "hits", "avg_size"]
    assert out2["route"].tolist() == ["/a"]
    assert out2["hits"].tolist() == [2]
    assert out2["avg_size"].tolist() == [15.0]
