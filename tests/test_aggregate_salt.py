"""tree_merge / salt_column / CubeAccumulator unit coverage."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_tree_merge_specs(ray_session):
    import ray.data
    from logagent_js_ray.stages.aggregate import tree_merge
    partials = pd.DataFrame({
        "k": ["a", "a", "b", "b"],
        "n": [1, 2, 3, 4],
        "lo": [5, 3, 9, 1],
        "hi": [5, 3, 9, 1],
    })
    out = tree_merge(ray.data.from_pandas(partials), ["k"],
                     {"n": "sum", "lo": "min", "hi": "max"}) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    assert out["n"].tolist() == [3, 7]
    assert out["lo"].tolist() == [3, 1]
    assert out["hi"].tolist() == [5, 9]


def test_agg_counts_null_groups_and_sums(ray_session):
    import ray.data
    from logagent_js_ray.stages.aggregate import agg_counts
    df = pd.DataFrame({"k": ["a", "a", None, None],
                       "v": [1.0, None, None, None]})
    out = agg_counts(ray.data.from_pandas(df), ["k"], sum_cols=["v"]) \
        .to_pandas()
    got = {(r["k"] if r["k"] == r["k"] and r["k"] is not None else None):
           (r["n"], r["sum_v"]) for r in out.to_dict("records")}
    assert got[ "a"][0] == 2 and got["a"][1] == 1.0
    assert got[None][0] == 2
    assert got[None][1] != got[None][1] or got[None][1] is None  # NaN/None


def test_salt_column_distributes_hot_key():
    from logagent_js_ray.stages.aggregate import salt_column
    t = pa.table({"conv_id": ["hot"] * 1000 + ["cold"]})
    out = salt_column(t, "conv_id", buckets=16)
    salts = out["_salt"].to_pylist()[:1000]
    # a hot key's rows spread over all 16 sub-buckets
    assert len(set(salts)) == 16
    counts = pd.Series(salts).value_counts()
    assert counts.max() - counts.min() <= 2  # near-uniform


def test_cube_accumulator_retry_dedup(ray_session):
    import ray
    from logagent_js_ray.pipelines.fused import CubeAccumulator
    acc = CubeAccumulator.remote()
    part = pd.DataFrame({"sink": ["s"], "role": ["user"], "tool": ["none"],
                         "time_bucket": [pd.Timestamp("2025-01-01")],
                         "n": [5], "sum_size": [10.0]})
    ray.get(acc.add.remote(123, part))
    ray.get(acc.add.remote(123, part))  # task retry: same key, no dup
    ray.get(acc.add.remote(456, part))
    merged = ray.get(acc.merged.remote())
    assert ray.get(acc.n_batches.remote()) == 2
    assert merged["n"].sum() == 10  # 5 + 5, not 15


def test_sql_select_avg_where_having(ray_session):
    """General sql-output-filter SELECT (sql.js:29-53 parity): WHERE
    pushed upstream of the partials, AVG derived sum/count at the
    merge, HAVING on the merged result."""
    import pandas as pd

    import ray.data
    from logagent_js_ray.stages.aggregate import sql_select
    rows = [{"path": p, "size": s, "status": st}
            for p, s, st in [("/a", 10, 200), ("/a", 20, 200),
                             ("/a", 30, 500), ("/b", 100, 200),
                             ("/b", None, 200), ("/c", 7, 404)]]
    ds = ray.data.from_items(rows)
    out = sql_select(ds, ["path"],
                     {"n": ("count", None), "total": ("sum", "size"),
                      "avg_size": ("avg", "size"),
                      "max_size": ("max", "size")},
                     where="status == 200").to_pandas() \
        .sort_values("path").reset_index(drop=True)
    want = pd.DataFrame({
        "path": ["/a", "/b"], "n": [2, 2], "total": [30, 100],
        # AVG skips nulls (SQL semantics): /b = 100/1
        "avg_size": [15.0, 100.0], "max_size": [20, 100]})
    assert out["path"].tolist() == want["path"].tolist()
    assert out["n"].tolist() == want["n"].tolist()
    assert out["total"].tolist() == want["total"].tolist()
    assert out["avg_size"].tolist() == want["avg_size"].tolist()
    assert out["max_size"].tolist() == want["max_size"].tolist()
    had = sql_select(ds, ["path"], {"n": ("count", None)},
                     having="n > 1").to_pandas()
    assert sorted(had["path"]) == ["/a", "/b"]  # /c filtered by HAVING


def test_sql_select_count_only_empty(ray_session):
    import pyarrow as pa

    import ray.data
    from logagent_js_ray.stages.aggregate import sql_select
    empty = ray.data.from_arrow(pa.table({
        "path": pa.array([], pa.string()),
        "size": pa.array([], pa.int64())}))
    out = sql_select(empty, ["path"], {"n": ("count", None),
                                       "avg_size": ("avg", "size")}) \
        .to_pandas()
    assert len(out) == 0


def test_sql_select_approx_distinct_kmv(ray_session):
    import ray.data

    from logagent_js_ray.stages.aggregate import sql_select

    # below k the sketch IS the distinct set: exact agreement with the
    # exact mode, including a null-keyed group and null values of d
    df = pd.DataFrame({
        "g": (["a"] * 40 + ["b"] * 30 + [None] * 10),
        "v": ([f"x{i % 13}" for i in range(40)]
              + [f"y{i % 7}" for i in range(30)]
              + [None] * 10),
    })
    ds = ray.data.from_pandas(df).repartition(4)
    aggs = {"u": ("count_distinct", "v"), "n": ("count", None)}
    exact = sql_select(ds, ["g"], aggs).to_pandas() \
        .sort_values("g", na_position="last").reset_index(drop=True)
    approx = sql_select(ds, ["g"], aggs, approx_distinct=64).to_pandas() \
        .sort_values("g", na_position="last").reset_index(drop=True)
    pd.testing.assert_frame_equal(exact, approx)
    assert exact["u"].tolist() == [13, 7, 0]

    # above k: estimate within the sketch's error band, and the
    # exchange stays k rows per group per block by construction
    big = pd.DataFrame({"g": ["hot"] * 20000,
                        "v": [f"id-{i}" for i in range(20000)]})
    dsb = ray.data.from_pandas(big).repartition(8)
    est = sql_select(dsb, ["g"], {"u": ("count_distinct", "v")},
                     approx_distinct=512).to_pandas()["u"].iloc[0]
    assert abs(est - 20000) / 20000 < 0.15  # ~1/sqrt(512) ≈ 4.4%
    # global (no GROUP BY) sketch path
    gl = sql_select(dsb, [], {"u": ("count_distinct", "v")},
                    approx_distinct=512).to_pandas()["u"].iloc[0]
    assert gl == est
