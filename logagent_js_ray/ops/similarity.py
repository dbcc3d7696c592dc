"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — the query matrix is broadcast once
(``ray.put``), each batch does one numpy matmul and emits only its LOCAL
top-k partial (k rows per batch), and the global top-k merge happens over
those partials — never over the full corpus. Scale path: random-
hyperplane LSH bucketing so only matching buckets are scanned.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

# Per-worker-process scorer cache for TASK-based map_batches: the
# scorer state (normalize a broadcast query matrix / pick probe lists)
# is microseconds to build, so a fixed actor POOL pays ~1-2 s spin-up
# for nothing — measured 3.3 s (pool) vs 0.4 s (tasks) for the same
# top-k on 2k rows. Tasks also scale to whatever CPUs are free with no
# pool sizing decision; the cache still amortizes state across the
# batches one worker processes.
_SCORER_CACHE: dict = {}


def _make_scorer_fn(cls, key: tuple, **kwargs):
    def fn(batch: pa.Table) -> pa.Table:
        sc = _SCORER_CACHE.get(key)
        if sc is None:
            if len(_SCORER_CACHE) > 16:  # bounded per-process memory
                _SCORER_CACHE.clear()
            sc = cls(**kwargs)
            _SCORER_CACHE[key] = sc
        return sc(batch)
    return fn


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n



def _empty_topk(batch: pa.Table, id_col: str) -> pa.Table:
    return pa.table({"query_idx": pa.array([], pa.int32()),
                     id_col: pa.array([], batch[id_col].type),
                     "cosine": pa.array([], pa.float64())})


class BruteForceScorer:
    """Actor-pool stage: the normalized query matrix is resolved ONCE per
    actor from the broadcast ref; per batch = one matmul + local top-k."""

    def __init__(self, query_ref, k: int, id_col: str = "vec_id",
                 vec_col: str = "embedding"):
        q = ray.get(query_ref) if not isinstance(query_ref, np.ndarray) \
            else query_ref
        self.q = _normalize(np.atleast_2d(np.asarray(q, np.float64)))
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:  # Ray emits empty blocks routinely
            return _empty_topk(batch, self.id_col)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        vecs = _normalize(np.stack(
            batch[self.vec_col].to_numpy(zero_copy_only=False)).astype(np.float64))
        sims = vecs @ self.q.T  # (n, n_queries)
        out_q, out_id, out_sim = [], [], []
        for qi in range(self.q.shape[0]):
            col = sims[:, qi]
            k = min(self.k, len(ids))
            # lexsort honors the documented (-cosine, id) tiebreak even
            # AT the k boundary (argpartition dropped tied low ids)
            top = np.lexsort((ids, -col))[:k]
            out_q.extend([qi] * k)
            out_id.extend(ids[top])
            out_sim.extend(col[top])
        return pa.table({"query_idx": pa.array(out_q, pa.int32()),
                         self.id_col: pa.array(
                             out_id, batch[self.id_col].type),
                         "cosine": pa.array(out_sim, pa.float64())})


def topk_cosine(ds: "ray.data.Dataset", query_vecs: np.ndarray, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                concurrency=None) -> pd.DataFrame:
    """Global top-k per query: per-batch partial top-k, merged on the
    driver (the merge input is ~k × n_blocks rows, never the corpus).
    Deterministic tiebreak: (-cosine, id). Runs as stateless TASKS
    with a per-worker scorer cache (see _SCORER_CACHE); concurrency
    caps concurrent tasks only when set."""
    ref = ray.put(np.asarray(query_vecs, np.float64))
    partials = ds.map_batches(
        _make_scorer_fn(BruteForceScorer,
                        ("bf", ref.hex(), k, id_col, vec_col),
                        query_ref=ref, k=k, id_col=id_col,
                        vec_col=vec_col),
        batch_format="pyarrow",
        **({"concurrency": concurrency} if concurrency else {}))
    pdf = partials.to_pandas()
    out = []
    for qi, g in pdf.groupby("query_idx"):
        rows = heapq.nsmallest(
            k, g.itertuples(index=False),
            key=lambda r: (-r.cosine, getattr(r, id_col)))
        out.extend(rows)
    res = pd.DataFrame(out)
    return res.reset_index(drop=True)


class LSHIndexScorer:
    """Scale path: scan only rows whose random-hyperplane bucket matches
    one of the query's probe buckets (multi-probe = flip one bit)."""

    def __init__(self, query_ref, k: int, n_planes: int = 8, seed: int = 11,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
        q = ray.get(query_ref) if not isinstance(query_ref, np.ndarray) \
            else query_ref
        self.q = _normalize(np.atleast_2d(np.asarray(q, np.float64)))
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col
        self.n_planes = n_planes
        self.seed = seed
        self.planes = None  # built lazily when dim is known
        self.q_buckets: list[set[int]] = []

    def _ensure_planes(self, dim: int) -> None:
        if self.planes is not None:
            return
        rng = np.random.default_rng(self.seed)
        self.planes = rng.standard_normal((dim, self.n_planes))
        signs = (self.q @ self.planes) > 0
        pows = 1 << np.arange(self.n_planes)
        for row in signs:
            base = int((row * pows).sum())
            probes = {base}
            for b in range(self.n_planes):  # multi-probe: 1-bit flips
                probes.add(base ^ (1 << b))
            self.q_buckets.append(probes)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_topk(batch, self.id_col)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        vecs = np.stack(
            batch[self.vec_col].to_numpy(zero_copy_only=False)).astype(np.float64)
        self._ensure_planes(vecs.shape[1])
        nv = _normalize(vecs)
        keys = ((nv @ self.planes) > 0) @ (1 << np.arange(self.n_planes))
        out_q, out_id, out_sim = [], [], []
        for qi in range(self.q.shape[0]):
            mask = np.isin(keys, list(self.q_buckets[qi]))
            if not mask.any():
                continue
            col = nv[mask] @ self.q[qi]
            sel = ids[mask]
            k = min(self.k, len(sel))
            top = np.lexsort((sel, -col))[:k]
            out_q.extend([qi] * k)
            out_id.extend(sel[top])
            out_sim.extend(col[top])
        return pa.table({"query_idx": pa.array(out_q, pa.int32()),
                         self.id_col: pa.array(
                             out_id, batch[self.id_col].type),
                         "cosine": pa.array(out_sim, pa.float64())})


def topk_cosine_lsh(ds: "ray.data.Dataset", query_vecs: np.ndarray,
                    k: int = 10, n_planes: int = 8,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    concurrency=None) -> pd.DataFrame:
    ref = ray.put(np.asarray(query_vecs, np.float64))
    partials = ds.map_batches(
        _make_scorer_fn(LSHIndexScorer,
                        ("lsh", ref.hex(), k, n_planes, id_col, vec_col),
                        query_ref=ref, k=k, n_planes=n_planes,
                        id_col=id_col, vec_col=vec_col),
        batch_format="pyarrow",
        **({"concurrency": concurrency} if concurrency else {}))
    pdf = partials.to_pandas()
    out = []
    for qi, g in pdf.groupby("query_idx"):
        rows = heapq.nsmallest(
            k, g.itertuples(index=False),
            key=lambda r: (-r.cosine, getattr(r, id_col)))
        out.extend(rows)
    return pd.DataFrame(out).reset_index(drop=True)


# --------------------------------------------------------------------
# IVF-Flat: k-means coarse quantizer + inverted lists


def train_ivf_centroids(ds: "ray.data.Dataset", n_lists: int = 16,
                        sample_size: int = 4096, n_iters: int = 10,
                        seed: int = 7, id_col: str = "vec_id",
                        vec_col: str = "embedding") -> np.ndarray:
    """Deterministic Lloyd's k-means over a bounded sample (first
    ``sample_size`` rows — only the sample is materialized, never the
    corpus). Returns L2-normalized (n_lists, dim) centroids; cosine
    assignment = argmax dot product against them.

    The sample is canonicalized by sorting on ``id_col``: take_all
    returns blocks in completion order, so without the sort the SAME
    dataset trains different centroids run to run (observed 124/500
    rows displaced) — k-means init and mean order are both
    order-sensitive. With the sort, centroids are a pure function of
    the sampled row set."""
    sample = ds.limit(sample_size).select_columns(
        [id_col, vec_col]).take_all()
    sample.sort(key=lambda r: r[id_col])
    x = _normalize(np.stack([r[vec_col] for r in sample]).astype(np.float64))
    n_lists = min(n_lists, len(x))
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), n_lists, replace=False)]
    for _ in range(n_iters):
        assign = np.argmax(x @ cents.T, axis=1)
        for j in range(n_lists):
            members = x[assign == j]
            if len(members):
                cents[j] = members.mean(axis=0)
        cents = _normalize(cents)
    return cents


class IVFScorer:
    """Scale path #2: scan only rows whose nearest-centroid list is one
    of the query's ``nprobe`` closest lists. Centroids are broadcast
    once (ray.put) and resolved per actor; per batch = one assignment
    matmul + masked scoring (classic IVF-Flat, trained quantizer vs
    LSHIndexScorer's data-independent hyperplanes)."""

    def __init__(self, query_ref, centroids_ref, k: int, nprobe: int = 4,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
        q = ray.get(query_ref) if not isinstance(query_ref, np.ndarray) \
            else query_ref
        cents = ray.get(centroids_ref) if not isinstance(
            centroids_ref, np.ndarray) else centroids_ref
        self.q = _normalize(np.atleast_2d(np.asarray(q, np.float64)))
        self.cents = np.asarray(cents, np.float64)
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col
        nprobe = min(nprobe, len(self.cents))
        qsims = self.q @ self.cents.T  # (n_queries, n_lists)
        self.probes = [set(np.argsort(-row)[:nprobe].tolist())
                       for row in qsims]

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_topk(batch, self.id_col)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        vecs = _normalize(np.stack(
            batch[self.vec_col].to_numpy(zero_copy_only=False)
        ).astype(np.float64))
        lists = np.argmax(vecs @ self.cents.T, axis=1)
        out_q, out_id, out_sim = [], [], []
        for qi in range(self.q.shape[0]):
            mask = np.isin(lists, list(self.probes[qi]))
            if not mask.any():
                continue
            col = vecs[mask] @ self.q[qi]
            sel = ids[mask]
            k = min(self.k, len(sel))
            top = np.lexsort((sel, -col))[:k]
            out_q.extend([qi] * k)
            out_id.extend(sel[top])
            out_sim.extend(col[top])
        return pa.table({"query_idx": pa.array(out_q, pa.int32()),
                         self.id_col: pa.array(
                             out_id, batch[self.id_col].type),
                         "cosine": pa.array(out_sim, pa.float64())})


def topk_cosine_ivf(ds: "ray.data.Dataset", query_vecs: np.ndarray,
                    k: int = 10, n_lists: int = 16, nprobe: int = 4,
                    centroids: np.ndarray | None = None,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    concurrency=None) -> pd.DataFrame:
    """IVF-Flat ANN without a prebuilt index: assign + probe-filter at
    scan time. Same partial-top-k merge shape as topk_cosine."""
    if centroids is None:
        centroids = train_ivf_centroids(ds, n_lists=n_lists,
                                        id_col=id_col, vec_col=vec_col)
    q_ref = ray.put(np.asarray(query_vecs, np.float64))
    c_ref = ray.put(np.asarray(centroids, np.float64))
    partials = ds.map_batches(
        _make_scorer_fn(IVFScorer,
                        ("ivf", q_ref.hex(), c_ref.hex(), k, nprobe,
                         id_col, vec_col),
                        query_ref=q_ref, centroids_ref=c_ref, k=k,
                        nprobe=nprobe, id_col=id_col, vec_col=vec_col),
        batch_format="pyarrow",
        **({"concurrency": concurrency} if concurrency else {}))
    pdf = partials.to_pandas()
    out = []
    for qi, g in pdf.groupby("query_idx"):
        rows = heapq.nsmallest(
            k, g.itertuples(index=False),
            key=lambda r: (-r.cosine, getattr(r, id_col)))
        out.extend(rows)
    return pd.DataFrame(out).reset_index(drop=True)


def build_ivf_index(ds: "ray.data.Dataset", centroids: np.ndarray,
                    out_dir: str, vec_col: str = "embedding") -> str:
    """Materialize the inverted lists as hive-partitioned parquet
    (``ivf_list=<j>/``). At 100 TB this is the index-build job: one pass,
    one shuffle-free partitioned write; queries then READ ONLY the
    probed partitions (partition pruning at the read, not a scan)."""
    c_ref = ray.put(np.asarray(centroids, np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("ivf_list",
                                       pa.array([], pa.int32()))
        cents = ray.get(c_ref)
        vecs = _normalize(np.stack(
            batch[vec_col].to_numpy(zero_copy_only=False)
        ).astype(np.float64))
        lists = np.argmax(vecs @ cents.T, axis=1)
        return batch.append_column("ivf_list",
                                   pa.array(lists, pa.int32()))

    from ..sinks import PARQUET_WRITE_OPTS
    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["ivf_list"], **PARQUET_WRITE_OPTS)
    return out_dir


def topk_cosine_ivf_index(index_dir: str, query_vecs: np.ndarray,
                          centroids: np.ndarray, k: int = 10,
                          nprobe: int = 4, id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          concurrency=None) -> pd.DataFrame:
    """Query a prebuilt IVF index: compute the probe lists on the
    driver, read ONLY those partitions, brute-force within them."""
    import pyarrow.dataset as pads
    q = _normalize(np.atleast_2d(np.asarray(query_vecs, np.float64)))
    cents = np.asarray(centroids, np.float64)
    nprobe = min(nprobe, len(cents))
    probe = set()
    for row in q @ cents.T:
        probe.update(np.argsort(-row)[:nprobe].tolist())
    frag_paths = [f for f in pads.dataset(
        index_dir, partitioning="hive").files
        if any(f"ivf_list={j}/" in f for j in probe)]
    ds = ray.data.read_parquet(frag_paths, columns=[id_col, vec_col])
    return topk_cosine(ds, query_vecs, k=k, id_col=id_col, vec_col=vec_col,
                       concurrency=concurrency)
