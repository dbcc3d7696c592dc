"""Distributed connected components + canonical keep (ops/dedup)."""

import numpy as np
import pyarrow as pa

import ray.data


def _uf(pairs):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _pairs_ds(pairs):
    return ray.data.from_arrow(pa.table(
        {"id_a": pa.array([p[0] for p in pairs], pa.int64()),
         "id_b": pa.array([p[1] for p in pairs], pa.int64())})) \
        .repartition(4)


def test_connected_components_vs_union_find(ray_session):
    """Both the distributed alternating-star path (driver_threshold=0)
    and the driver union-find fast path must match the reference."""
    from logagent_js_ray.ops.dedup import connected_components
    rng = np.random.default_rng(7)
    a = rng.integers(0, 300, 260)
    b = rng.integers(0, 300, 260)
    pairs = [(int(x), int(y)) for x, y in zip(a, b) if x != y]
    # plus a long chain (worst-case diameter) and a cycle
    pairs += [(1000 + i, 1001 + i) for i in range(20)]
    pairs += [(2000, 2001), (2001, 2002), (2002, 2000)]
    ref = _uf(pairs)
    for thr in (0, 1_000_000):
        comp = connected_components(_pairs_ds(pairs),
                                    driver_threshold=thr).to_pandas()
        got = dict(zip(comp["node"], comp["component"]))
        assert got == ref, f"driver_threshold={thr}"


def test_connected_components_duplicate_and_reversed_edges(ray_session):
    from logagent_js_ray.ops.dedup import connected_components
    pairs = [(5, 3), (3, 5), (5, 3), (7, 9)]
    for thr in (0, 1_000_000):
        comp = connected_components(_pairs_ds(pairs),
                                    driver_threshold=thr).to_pandas()
        got = dict(zip(comp["node"], comp["component"]))
        assert got == {3: 3, 5: 3, 7: 7, 9: 7}, f"driver_threshold={thr}"


def test_keep_canonical(ray_session):
    from logagent_js_ray.ops.dedup import (connected_components,
                                           keep_canonical)
    pairs = [(1, 2), (2, 3), (10, 11)]
    comp = connected_components(_pairs_ds(pairs))
    docs = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array([1, 2, 3, 4, 10, 11, 12], pa.int64())}))
    kept = sorted(keep_canonical(docs, comp).to_pandas()["doc_id"])
    # cluster {1,2,3} keeps 1; {10,11} keeps 10; 4 and 12 unpaired
    assert kept == [1, 4, 10, 12]
