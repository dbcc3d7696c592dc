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
