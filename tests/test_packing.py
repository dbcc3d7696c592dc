"""Concat-and-chunk sequence packing (ops/packing)."""

import numpy as np
import pyarrow as pa

import ray.data


def _docs(n, tok_fn, parts):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "n_tokens_ws": pa.array([tok_fn(i) for i in range(n)],
                                pa.int64()),
    })).repartition(parts)


def test_pack_reference_layout(ray_session):
    from logagent_js_ray.ops.packing import pack_concat_chunk
    # one bucket, budget 10, tokens 4 each: exclusive cumsums
    # 0,4,8,12,... -> windows 0,0,0,1,1,2,... offsets 0,4,8,2,6,0
    out = pack_concat_chunk(_docs(6, lambda i: 4, 2), budget=10,
                            num_buckets=1).to_pandas() \
        .sort_values("doc_id")
    assert out["window"].tolist() == [0, 0, 0, 1, 1, 2]
    assert out["offset"].tolist() == [0, 4, 8, 2, 6, 0]


def test_pack_partitioning_invariant(ray_session):
    from logagent_js_ray.ops.packing import pack_concat_chunk
    tok = lambda i: 1 + (i * 7) % 13
    a = pack_concat_chunk(_docs(200, tok, 1), budget=64,
                          num_buckets=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = pack_concat_chunk(_docs(200, tok, 16), budget=64,
                          num_buckets=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a[["bucket", "window", "offset"]].equals(
        b[["bucket", "window", "offset"]])
    # per-bucket token conservation: last doc's offset chain == cumsum
    for bk, g in a.groupby("bucket"):
        toks = g.sort_values("doc_id")["n_tokens_ws"].to_numpy()
        cum = np.concatenate([[0], np.cumsum(toks)[:-1]])
        assert (g.sort_values("doc_id")["window"].to_numpy()
                == cum // 64).all()


def test_window_stats(ray_session):
    from logagent_js_ray.ops.packing import (pack_concat_chunk,
                                             window_stats)
    packed = pack_concat_chunk(_docs(50, lambda i: 5, 4), budget=20,
                               num_buckets=2)
    s = window_stats(packed).to_pandas()
    # 25 docs x 5 tok per bucket = 125 tok -> windows 0..6, 4 docs each
    # except the last
    assert s["n"].sum() == 50
    assert s["sum_n_tokens_ws"].sum() == 250
    assert (s.groupby("bucket")["window"].max() == 6).all()


def test_pack_and_group_stats_matches_composition(ray_session):
    """Fused single-shuffle stats == pack_concat_chunk + window_stats
    + a separate key aggregation (round-3 verdict item #8)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from logagent_js_ray.ops.packing import (pack_and_group_stats,
                                             pack_concat_chunk,
                                             window_stats)
    rng = np.random.default_rng(5)
    n = 300
    t = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "lang": pa.array([("en", "de", "fr")[i % 3] for i in range(n)]),
        "n_tokens_ws": pa.array(rng.integers(1, 200, n), pa.int64()),
    })
    ds = ray.data.from_arrow(t).repartition(5)
    fused = pack_and_group_stats(ds, budget=128, num_buckets=4) \
        .to_pandas().sort_values(["which", "key"]).reset_index(drop=True)
    packed = pack_concat_chunk(ray.data.from_arrow(t), budget=128,
                               num_buckets=4)
    w = window_stats(packed).to_pandas()
    w["key"] = w["bucket"].astype(str) + ":" + w["window"].astype(str)
    w.insert(0, "which", "pack")
    df = t.to_pandas()
    lg = df.groupby("lang", as_index=False).agg(
        n=("doc_id", "size"), sum_n_tokens_ws=("n_tokens_ws", "sum"))
    lg = lg.rename(columns={"lang": "key"})
    lg.insert(0, "which", "lang")
    want = pd.concat([w[["which", "key", "n", "sum_n_tokens_ws"]], lg],
                     ignore_index=True).sort_values(["which", "key"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(fused, want, check_dtype=False)
