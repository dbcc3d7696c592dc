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
